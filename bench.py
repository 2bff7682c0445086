"""Headline benchmark — prints ONE JSON line.

Round-1 metric: brute-force all-pairs throughput at N=64k on one chip
(BASELINE.json: target >=100x the reference's serial Rust direct sum,
src/manual/brute_force.rs:64-82).

Reported as steps/second on the benchmark config (disc scene, dt=3e-2,
eps=0.02, 64k particles).  ``vs_baseline`` compares against an estimated
reference brute-force rate at N=64k, extrapolated from the reference's own
measured data: its committed CSVs contain no brute-force rows (SURVEY.md §6),
but the serial tree-code rates at N=10k (~27-28 steps/s for ALL three
implementations, BASELINE.md) pin the per-interaction cost of the scalar
pipeline; a serial O(N^2) sweep at N=64k does 64k^2/2 ~ 2.1e9 symmetric pair
interactions/step.  Measured with the C++ oracle in native/ (same force law,
-O3, single thread — see native/README.md): ~0.11 steps/s at N=64k.  We use
0.12 steps/s as a slightly generous baseline.
"""

import json
import time

import jax
import jax.numpy as jnp


N = 65536
STEPS = 25
RUST_BF_64K_STEPS_PER_S = 0.12  # estimated serial reference brute force


def main():
    from nbody_tpu.core.state import ParticleState, SimParams
    from nbody_tpu.core.stepper import make_run
    from nbody_tpu.engines import get_engine
    from nbody_tpu.scenes import self_gravitating_disc

    pos, vel, mass = self_gravitating_disc(N - 1, seed=0)
    state = ParticleState.create(pos, vel, mass, dtype=jnp.float32)
    params = SimParams.create(
        dt=3e-2, g_soft=0.02, theta2=1.0, bounds_width=10.0, dtype=jnp.float32
    )

    engine = get_engine(
        "brute-pallas" if jax.default_backend() == "tpu" else "brute"
    )
    run = make_run(engine.force, "leapfrog")
    run.lower(state, params, STEPS, None).compile()

    t0 = time.perf_counter()
    out = run(state, params, STEPS, None)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0

    steps_per_s = STEPS / elapsed
    pairs_per_s = steps_per_s * float(N) * float(N)
    print(
        json.dumps(
            {
                "metric": "brute_force_steps_per_s_n64k",
                "value": round(steps_per_s, 3),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_s / RUST_BF_64K_STEPS_PER_S, 1),
                "pairs_per_s": f"{pairs_per_s:.3e}",
                "n": N,
                "engine": engine.name,
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
