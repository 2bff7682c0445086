#!/usr/bin/env python
"""Tree-based potential energy at scale, on TPU (VERDICT r2 #8 closure).

The reference computes no energy diagnostics (SURVEY.md §4); our exact
pair PE is O(N^2) and stops being a diagnostic above ~1M.  This measures
`potential_energy_bh` (ops/traversal.py:690 accumulator riding the BH
walk) on the real chip:

  * @1M:  relative error of the BH potential vs the EXACT tiled pair
    PE (the same exact PE the drift-attribution runs used), plus both
    wall times.
  * @4M:  BH potential wall time (exact is ~1.76e13 pairs — the dispatch
    size that crashed the TPU worker in the force gates; skipped).

Appends JSON lines to results/energy_scale_tpu.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from nbody_tpu.core.energy import potential_energy, potential_energy_bh
from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.scenes import self_gravitating_disc

OUT = os.path.join(os.path.dirname(__file__), "..", "results",
                   "energy_scale_tpu.jsonl")


def timed(fn, *a, **k):
    t0 = time.perf_counter()
    out = float(fn(*a, **k))  # scalar transfer = relay-safe sync (CLAUDE.md)
    t_cold = time.perf_counter() - t0
    t1 = time.perf_counter()
    out = float(fn(*a, **k))
    t_warm = time.perf_counter() - t1
    return out, t_cold, t_warm


def main():
    params = SimParams.create(dt=3e-2, g_soft=0.02, theta2=1.0,
                              bounds_width=10.0, dtype=jnp.float32)
    rows = []
    for n, want_exact in ((1 << 20, True), (1 << 22, False)):
        pos, vel, mass = self_gravitating_disc(n - 1, seed=0)
        st = ParticleState.create(pos, vel, mass, capacity=n,
                                  dtype=jnp.float32)
        # cfg=None: potential_energy_bh's own tuned default (mono walk,
        # generous fb budget — see its docstring)
        pe_bh, bh_cold, bh_warm = timed(potential_energy_bh, st, params)
        rec = {"n": n, "pe_bh": pe_bh, "bh_warm_s": round(bh_warm, 3),
               "bh_cold_s": round(bh_cold, 1), "ts": time.time()}
        if want_exact:
            pe_ex, ex_cold, ex_warm = timed(
                potential_energy, st, params, tile=4096)
            rec.update(pe_exact=pe_ex,
                       exact_warm_s=round(ex_warm, 3),
                       exact_cold_s=round(ex_cold, 1),
                       rel_err=abs(pe_bh - pe_ex) / abs(pe_ex))
        rows.append(rec)
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, flush=True)


if __name__ == "__main__":
    main()
