#!/usr/bin/env python
"""Is f64 practical on TPU? (VERDICT round-1 weak #6)

The 1e-6 energy-drift target is demonstrated in CPU f64
(tests/test_native_oracle.py); the CLI exposes --f64 but no TPU f64 run was
recorded.  This probe times the brute engine at N=8192 in f32 vs f64 on the
real chip (XLA:TPU emulates f64 in software) and records the resolved-dt
energy drift each achieves, so VALIDATION.md can answer with a measurement
instead of a guess.  Appends JSON lines to results/f64_tpu.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from nbody_tpu.core.energy import total_energy  # noqa: E402
from nbody_tpu.core.state import ParticleState, SimParams  # noqa: E402
from nbody_tpu.core.stepper import make_run  # noqa: E402
from nbody_tpu.engines import get_engine  # noqa: E402
from nbody_tpu.scenes import self_gravitating_disc  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "results",
                   "f64_tpu.jsonl")
N = 8192
STEPS = 100


def main():
    pos, vel, mass = self_gravitating_disc(N - 1, seed=0)
    run = make_run(get_engine("brute").force)
    for dtype in (jnp.float32, jnp.float64):
        state = ParticleState.create(pos, vel, mass, capacity=N, dtype=dtype)
        params = SimParams.create(dt=1e-3, g_soft=0.02, theta2=1.0,
                                  bounds_width=10.0, dtype=dtype)
        e0 = float(total_energy(state, params))
        t0 = time.perf_counter()
        out = run(state, params, STEPS)
        float(out.time)  # relay-safe sync (CLAUDE.md)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = run(out, params, STEPS)
        float(out.time)
        wall = time.perf_counter() - t0
        e1 = float(total_energy(out, params))
        rec = {
            "dtype": jnp.dtype(dtype).name,
            "n": N,
            "steps_per_s": round(STEPS / wall, 2),
            "energy_drift_rel": abs(e1 - e0) / abs(e0),
            "compile_s": round(compile_s, 1),
            "backend": jax.default_backend(),
            "ts": time.time(),
        }
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, flush=True)


if __name__ == "__main__":
    main()
