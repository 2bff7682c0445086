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

`--theta` runs the 1M error row at theta2 in {1.0, 0.5, 0.25} instead:
theta2 is traced through the walk, so the sweep reuses one compile and
documents how the estimator's bound tightens with the opening angle.
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


def theta_sweep():
    """1M estimator error vs opening angle (one compile; theta2 is traced)."""
    params = SimParams.create(dt=3e-2, g_soft=0.02, theta2=1.0,
                              bounds_width=10.0, dtype=jnp.float32)
    n = 1 << 20
    pos, vel, mass = self_gravitating_disc(n - 1, seed=0)
    st = ParticleState.create(pos, vel, mass, capacity=n,
                              dtype=jnp.float32)
    pe_ex, _, ex_warm = timed(potential_energy, st, params, tile=1024)
    print({"pe_exact": pe_ex, "exact_warm_s": ex_warm}, flush=True)
    for t2 in (1.0, 0.5, 0.25):
        pe_bh, bh_cold, bh_warm = timed(potential_energy_bh, st, params,
                                        theta2=t2)
        rec = {"n": n, "theta2": t2, "pe_bh": pe_bh, "pe_exact": pe_ex,
               "rel_err": abs(pe_bh - pe_ex) / abs(pe_ex),
               "bh_warm_s": round(bh_warm, 3),
               "bh_cold_s": round(bh_cold, 1), "ts": time.time()}
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, flush=True)


def main():
    params = SimParams.create(dt=3e-2, g_soft=0.02, theta2=1.0,
                              bounds_width=10.0, dtype=jnp.float32)
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
            print(rec, flush=True)  # observability before the exact pass
            # tile=1024 keeps the [T, N] f32 temporaries ~4 GB of HBM;
            # tile=4096 at 1M OOMs (16 GB HLO temp, measured)
            pe_ex, ex_cold, ex_warm = timed(
                potential_energy, st, params, tile=1024)
            rec.update(pe_exact=pe_ex,
                       exact_warm_s=round(ex_warm, 3),
                       exact_cold_s=round(ex_cold, 1),
                       rel_err=abs(pe_bh - pe_ex) / abs(pe_ex))
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, flush=True)


if __name__ == "__main__":
    theta_sweep() if "--theta" in sys.argv else main()
