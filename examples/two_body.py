"""Two-body circular orbit — the smallest end-to-end example.

Run:  python examples/two_body.py  [--cpu]
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nbody_tpu import Simulation

    # equal-mass binary, separation 2, circular speed v^2 = G m / (4 r)
    v = np.sqrt(0.25)
    sim = Simulation(
        pos=[[1.0, 0, 0], [-1.0, 0, 0]],
        vel=[[0, v, 0], [0, -v, 0]],
        mass=[1.0, 1.0],
        engine="brute",
        dt=1e-3,
        bounds_width=100.0,
        dtype=jnp.float64,
    )
    period = 2 * np.pi / v
    n = int(round(period / 1e-3))
    e0 = sim.energy()
    sim.run(n)
    p, _, _, _ = sim.get_points()
    print(f"after one period ({n} steps):")
    print(f"  position error : {np.abs(p - [[1, 0, 0], [-1, 0, 0]]).max():.2e}")
    print(f"  energy drift   : {abs((sim.energy() - e0) / e0):.2e}")


if __name__ == "__main__":
    main()
