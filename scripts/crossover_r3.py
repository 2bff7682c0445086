#!/usr/bin/env python
"""Round-3 brute-pallas vs bh crossover sweep (VERDICT r2 #3).

resolve_auto_engine still encodes the round-1 crossover (~95k); round-2
data says the v8 tree wins well below that.  Measure both engines on the
fused engine path at 32k-131k, locate the crossover +-1 point, then fix
api.resolve_auto_engine and the README claims.

Appends JSON lines to results/crossover_r3.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.core.stepper import make_run
from nbody_tpu.engines import get_engine
from nbody_tpu.scenes import self_gravitating_disc

# optional argv[1] suffix starts a fresh sweep file (e.g. "b" after an
# engine change invalidates the old rows' skip cache)
_SUF = sys.argv[1] if len(sys.argv) > 1 else ""
OUT = os.path.join(os.path.dirname(__file__), "..", "results",
                   f"crossover_r3{_SUF}.jsonl")
STEPS = 50
NS = [1 << 15, 49152, 1 << 16, 81920, 100352, 1 << 17]
ENGINES = ["brute-pallas", "bh"]


def main():
    done = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            for line in f:
                try:
                    r = json.loads(line)
                    done.add((r["engine"], r["n"]))
                except Exception:
                    pass
    params = SimParams.create(dt=3e-2, g_soft=0.02, theta2=1.0,
                              bounds_width=10.0, dtype=jnp.float32)
    for n in NS:
        pos, vel, mass = self_gravitating_disc(n - 1, seed=0)
        state = ParticleState.create(pos, vel, mass, capacity=n,
                                     dtype=jnp.float32)
        for ename in ENGINES:
            if (ename, n) in done:
                continue
            run = make_run(get_engine(ename).force)
            t0 = time.perf_counter()
            out = run(state, params, STEPS)
            float(out.time)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = run(out, params, STEPS)
            float(out.time)
            rate = STEPS / (time.perf_counter() - t0)
            rec = {"engine": ename, "n": n,
                   "steps_per_s": round(rate, 2),
                   "compile_s": round(compile_s, 1),
                   "ts": time.time()}
            os.makedirs(os.path.dirname(OUT), exist_ok=True)
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(rec, flush=True)


if __name__ == "__main__":
    main()
