#!/usr/bin/env python
"""Flagship-config energy drift: plain vs compensated f32 at N=1M (TPU).

VERDICT r2 weak #3 asked for the measurement on the BENCHMARK config, not
beside it: round-2 recorded 1.2e-4 relative drift over 200 steps at 1M
(benchmark dt=3e-2), while the 1e-6 parity target was only met at resolved
dt.  The compensated (double-float TwoSum) integrator option
(core/stepper.py make_run_comp) removes the state-update rounding term;
this script prices it on the flagship config: drift AND step cost, plain
vs compensated, same scene/seed/steps.

Energy is the EXACT O(N^2) pair PE (core/energy.py potential_energy,
method='exact') — the tree estimator's ~1e-4 relative bias is the same
magnitude as the drift being measured, so it cannot gate this.  The exact
1M^2 pass rides the Pallas pair kernel (~6 s at 1.7e11 pairs/s): two
evaluations per variant are noise next to the 200-step run.

Appends JSON lines to results/comp_drift_1m.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from nbody_tpu.core.energy import kinetic_energy, potential_energy
from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.core.stepper import init_comp, make_run, make_run_comp
from nbody_tpu.engines import get_engine
from nbody_tpu.scenes import self_gravitating_disc

OUT = os.path.join(os.path.dirname(__file__), "..", "results",
                   "comp_drift_1m.jsonl")
N = 1 << 20
STEPS = 200
CHUNK = 25  # steps per fused scan (same program shape as the benchmarks)

# (name, compensated?, engine options) — the *_r2cfg / *_dualonly rows
# attribute the round-3 drift: the 2026-08-18 run measured 1.34e-3 plain vs
# 1.43e-3 compensated at the round-3 defaults (cap 512 / wp 512), i.e. drift
# at 1M benchmark dt is FORCE-approximation dominated, not state-update
# rounding.  r2cfg re-measures at the round-2 accuracy config to price the
# cuts; dualonly isolates block_dual (measured accuracy-free on forces).
R2CFG = dict(block_dual=False, near_particle_cap=8192, window_pad=2048)
CASES = [
    ("plain", False, {}),
    ("compensated", True, {}),
    ("plain_r2cfg", False, R2CFG),
    ("plain_dualonly", False,
     dict(block_dual=True, near_particle_cap=8192, window_pad=2048)),
    # split the cut contributions (dual stays on, the preset default):
    # measured 2026-08-18 — r3 defaults 1.34e-3, r2cfg 2.11e-4, so the
    # cuts cost ~6.4x drift; these price cap vs wp separately to decide
    # whether the wp cut's +9% perf is worth its drift share.
    ("plain_caponly", False, dict(near_particle_cap=512, window_pad=2048)),
    ("plain_wponly", False, dict(near_particle_cap=8192, window_pad=512)),
]


def exact_energy(state, params):
    return float(kinetic_energy(state)
                 + potential_energy(state, params, tile=2048))


def main():
    wanted = [a for a in sys.argv[1:] if not a.startswith("--")]
    done = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            for line in f:
                try:
                    done.add(json.loads(line)["name"])
                except Exception:
                    pass

    pos, vel, mass = self_gravitating_disc(N - 1, seed=0)
    state0 = ParticleState.create(pos, vel, mass, capacity=N,
                                  dtype=jnp.float32)
    params = SimParams.create(dt=3e-2, g_soft=0.02, theta2=1.0,
                              bounds_width=10.0, dtype=jnp.float32)

    print("exact E0 (1M^2 pair PE)...", flush=True)
    e0 = exact_energy(state0, params)
    print(f"E0 = {e0:.9e}", flush=True)

    for name, comp, opts in CASES:
        if wanted and not any(s in name for s in wanted):
            continue
        if not wanted and name in done:
            continue
        engine = get_engine("bh", **opts)
        if not comp:
            run = make_run(engine.force, "leapfrog")
            out = run(state0, params, CHUNK)
            float(out.time)  # compile + program load outside timing
            t0 = time.perf_counter()
            out = state0
            for _ in range(STEPS // CHUNK):
                out = run(out, params, CHUNK)
            float(out.time)
            wall = time.perf_counter() - t0
        else:
            run = make_run_comp(engine.force, "leapfrog")
            lo0 = init_comp(state0)
            out, lo = run(state0, lo0, params, CHUNK)
            float(out.time)
            t0 = time.perf_counter()
            out, lo = state0, lo0
            for _ in range(STEPS // CHUNK):
                out, lo = run(out, lo, params, CHUNK)
            float(out.time)
            wall = time.perf_counter() - t0
        e1 = exact_energy(out, params)
        rec = {
            "name": name,
            "n": N,
            "steps": STEPS,
            "steps_per_s": round(STEPS / wall, 3),
            "e0": e0,
            "e1": e1,
            "rel_drift": abs(e1 - e0) / abs(e0),
            "ts": time.time(),
        }
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, flush=True)


if __name__ == "__main__":
    main()
