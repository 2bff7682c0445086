#!/usr/bin/env python
"""BH force accuracy at mid N (default 131k) vs the exact Pallas direct
sum (TPU) — the accuracy gate for the MID preset's round-3 default flips
(block_dual, and a prospective near-cap cut: 131k dual_c2048 measured
31.91 steps/s vs 27.9 base, dual_r3.jsonl).  Same error metrics as
scripts/accuracy_1m.py; appends JSON lines (with an "n" field) to
results/accuracy_midn.jsonl."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.ops.pairwise import pairwise_acc_pallas
from nbody_tpu.ops.traversal import BHConfig, bh_accel
from nbody_tpu.scenes import self_gravitating_disc

OUT = os.path.join(os.path.dirname(__file__), "..", "results",
                   "accuracy_midn.jsonl")
N = 1 << 17

CONFIGS = {
    # round-2 mid defaults (no dual, cap 8192) — the regression baseline
    "mid_base": dict(block_dual=False),
    # shipped round-3 mid defaults (dual on, caps unchanged)
    "mid_dual": {},
    # prospective: the large-N cap cut applied at mid N
    "mid_dual_c2048": dict(near_particle_cap=2048),
    "mid_dual_c4096": dict(near_particle_cap=4096),
    # cap floor at mid N (the 1M gates stayed flat through cap 512)
    "mid_dual_c1024": dict(near_particle_cap=1024),
    "mid_dual_c512": dict(near_particle_cap=512),
    # round 3h: window shrink at the mid preset (defaults: dual + c2048)
    "mid_dual_wp1024": dict(window_pad=1024),
    "mid_dual_wp512": dict(window_pad=512),
}


def main():
    done = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            for line in f:
                try:
                    done.add(json.loads(line)["name"])
                except Exception:
                    pass

    pos, vel, mass = self_gravitating_disc(N - 1, seed=0)
    state = ParticleState.create(pos, vel, mass, capacity=N,
                                 dtype=jnp.float32)
    params = SimParams.create(dt=3e-2, g_soft=0.02, theta2=1.0,
                              bounds_width=10.0, dtype=jnp.float32)
    m = state.effective_mass()

    print(f"computing exact reference ({N}^2 pairs)...", flush=True)
    ref = pairwise_acc_pallas(state.pos, m, params.g, params.g_soft)
    r = np.asarray(ref)
    rn = np.linalg.norm(r, axis=1)
    alive = np.asarray(m) > 0

    for name, opts in CONFIGS.items():
        if name in done:
            continue
        cfg = BHConfig.auto_for(N, **opts)
        t0 = time.perf_counter()
        acc, stats = bh_accel(state.pos, m, params.bounds, params.theta2,
                              params.g, params.g_soft, cfg)
        float(acc[0, 0])
        a = np.asarray(acc)
        err = np.linalg.norm(a - r, axis=1)[alive] / np.maximum(rn[alive],
                                                                1e-30)
        rec = {
            "name": name,
            "n": N,
            "median": float(np.median(err)),
            "p99": float(np.percentile(err, 99)),
            "max": float(err.max()),
            "near_fallback": int(stats["near_fallback"]),
            "fb_spill": int(stats["fb_spill"]),
            "wall_s": round(time.perf_counter() - t0, 1),
            "ts": time.time(),
        }
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, flush=True)


if __name__ == "__main__":
    main()
