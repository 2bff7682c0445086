"""The benchmark scene end-to-end: evolve the self-gravitating disc and plot
face-on snapshots (the reference's visual-inspection validation, done
headlessly).

Run:  python examples/disc_collapse.py [--cpu] [-n 20000] [--engine auto]
Writes disc_evolution.png next to this script.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-n", type=int, default=20000)
    p.add_argument("--engine", default="auto")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--snapshots", type=int, default=4)
    p.add_argument("--steps-per-snapshot", type=int, default=250)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from nbody_tpu import Simulation
    from nbody_tpu.scenes import self_gravitating_disc

    pos, vel, mass = self_gravitating_disc(args.n, seed=0)
    sim = Simulation(pos, vel, mass, engine=args.engine,
                     dt=3e-2, g_soft=0.02, theta2=1.0, dtype=jnp.float32)

    fig, axes = plt.subplots(1, args.snapshots, figsize=(4 * args.snapshots, 4))
    for i, ax in enumerate(axes):
        if i:
            sim.run(args.steps_per_snapshot)
        pts, _, _, _ = sim.get_points()
        ax.scatter(pts[:, 0], pts[:, 1], s=0.3, lw=0, alpha=0.4, c="#204060")
        ax.set_xlim(-5, 5)
        ax.set_ylim(-5, 5)
        ax.set_aspect("equal")
        ax.set_title(f"t = {sim.elapsed:.1f}   N = {sim.n_alive}")
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "disc_evolution.png")
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
