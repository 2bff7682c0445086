#!/usr/bin/env python
"""Mid-N steep-core probe (VERDICT r4 #3): put a 131k w40 Plummer core
INSIDE the 5e-2 disc accuracy envelope.

Round-4 state: tight stack p99_typ 0.055-0.078 (just outside), deep
stack 0.686 flat across refine thresholds (structural — at 131k the
core-shoulder level-7 cells hold < 128 particles, so sparse-ml7
refinement fires on nothing it needs; VALIDATION §20).  The natural
intermediates, none probed: R=5 below the ml6 grid (same floor
resolution as ml7+R4 but flagged from 8x-bigger cells), lower tight
thresholds, and bigger refined budgets at the §19 base.

Each probe measures force-only calls/s + sampled-exact error (4096
targets vs the brute-pallas direct sum, floored-relative) at N=131072,
width 40 Plummer.  Rows append to results/midn_adaptive_r5.jsonl
(resume-by-name).  TPU; ~1-3 min compile per config warm.

Usage: python scripts/probe_midn_adaptive.py [names...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from nbody_tpu.core.state import ParticleState, SimParams  # noqa: E402
from nbody_tpu.ops.pairwise import pairwise_acc_pallas_targets  # noqa: E402
from nbody_tpu.ops.traversal import (ADAPTIVE_OVERRIDES,  # noqa: E402
                                     ADAPTIVE_TIGHT_OVERRIDES,
                                     _ADAPTIVE_BIG_BUDGETS, BHConfig,
                                     bh_accel)
from nbody_tpu.scenes import plummer_sphere  # noqa: E402

N = 1 << 17
WIDTH = float(os.environ.get("MIDN_WIDTH", "40.0"))
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "results", "midn_adaptive_r5.jsonl")

# At 131k the resolvers restore the §19 big budgets (ADAPTIVE_CUT_MIN_N)
TIGHT = {**ADAPTIVE_TIGHT_OVERRIDES, **_ADAPTIVE_BIG_BUDGETS}
DEEP = {**ADAPTIVE_OVERRIDES, **_ADAPTIVE_BIG_BUDGETS}

# NOTE the 3D Morton depth limit: max_level + refine_levels <= 10
# (BHConfig.__post_init__), so ml6+R4 and ml7+R3 are already at the
# floor resolution ceiling — "R5 below ml6" does not exist.  The levers
# left: WHERE refinement fires (threshold), HOW MUCH budget the refined
# walk gets, and a coarser base grid (ml5+R5 flags from 8x-denser cells
# at the same ml10-equivalent floor).
PROBES = {
    # round-4 baselines, re-measured for back-to-back comparability
    "tight_base": TIGHT,
    "deep_base": DEEP,
    # lower tight threshold: refine 256+/128+ cells (512 may skip the
    # 131k core shoulder the way 128 skips it at ml7)
    "tight_t256": {**TIGHT, "refine_threshold": 256},
    "tight_t128": {**TIGHT, "refine_threshold": 128},
    # bigger refined walk budgets at the tight base (the §19 budgets were
    # tuned at 1M; 131k groups see a different pressure profile)
    "tight_rbig": {**TIGHT, "refine_frontier": 2048,
                   "refine_near_cell_cap": 8192,
                   "refine_near_particle_cap": 32768},
    "tight_t256_rbig": {**TIGHT, "refine_threshold": 256,
                        "refine_frontier": 2048,
                        "refine_near_cell_cap": 8192,
                        "refine_near_particle_cap": 32768},
    # near-field budget raise (no refinement change): the error may be
    # plain near-overflow at 131k group pressure
    "tight_near4k": {**TIGHT, "near_particle_cap": 4096},
    # coarser base grid + deeper refinement: ml5 cells are 8x denser than
    # ml6 -> the threshold flags the whole core region; R5 reaches the
    # same ml10-equivalent floor
    "ml5_r5_t2048": {**TIGHT, "max_level": 5, "refine_levels": 5,
                     "refine_threshold": 2048},
    "ml5_r5_t1024": {**TIGHT, "max_level": 5, "refine_levels": 5,
                     "refine_threshold": 1024},
    "ml5_r5_t1024_rbig": {**TIGHT, "max_level": 5, "refine_levels": 5,
                          "refine_threshold": 1024,
                          "refine_frontier": 2048,
                          "refine_near_cell_cap": 8192,
                          "refine_near_particle_cap": 32768},
    # frontier_fallback sits at 1365 across every tight row (first
    # sweep): mid-walk parent-cap overflow degrades 1365 cells to
    # self-excluded multipoles — raise the frontier to zero it
    "tight_t256_fr16k": {**TIGHT, "refine_threshold": 256,
                         "frontier_cap": 16384},
    "tight_t256_rbig_fr16k": {**TIGHT, "refine_threshold": 256,
                              "frontier_cap": 16384,
                              "refine_frontier": 2048,
                              "refine_near_cell_cap": 8192,
                              "refine_near_particle_cap": 32768},
    "tight_t128_rbig_fr16k": {**TIGHT, "refine_threshold": 128,
                              "frontier_cap": 16384,
                              "refine_frontier": 2048,
                              "refine_near_cell_cap": 8192,
                              "refine_near_particle_cap": 32768},
    # ml5_r5_t1024_rbig landed 0.0342 (first in-envelope row) at 4.41
    # calls/s vs 4.89 base — attribute the rbig components and claw the
    # 10% back
    "ml5_r5_t1024_rnp32": {**TIGHT, "max_level": 5, "refine_levels": 5,
                           "refine_threshold": 1024,
                           "refine_near_particle_cap": 32768},
    "ml5_r5_t1024_rfr2k": {**TIGHT, "max_level": 5, "refine_levels": 5,
                           "refine_threshold": 1024,
                           "refine_frontier": 2048,
                           "refine_near_cell_cap": 8192},
    "ml5_r5_t512_rbig": {**TIGHT, "max_level": 5, "refine_levels": 5,
                         "refine_threshold": 512, "refine_frontier": 2048,
                         "refine_near_cell_cap": 8192,
                         "refine_near_particle_cap": 32768},
    "ml5_r5_t1024_rbig_nc1k": {**TIGHT, "max_level": 5, "refine_levels": 5,
                               "refine_threshold": 1024,
                               "refine_frontier": 2048,
                               "refine_near_cell_cap": 8192,
                               "refine_near_particle_cap": 32768,
                               "near_particle_cap": 1024},
    # the mid-N ship candidate: w40 p99 0.0065 / w10 0.0452, but w10
    # shows 212 TRUE accept drops at accept 8192 — raise it
    "midn_final": {**TIGHT, "refine_threshold": 128,
                   "frontier_cap": 16384, "accept_cap": 16384,
                   "refine_frontier": 2048,
                   "refine_near_cell_cap": 8192,
                   "refine_near_particle_cap": 32768},
}


def main():
    done = set()
    if os.path.exists(OUT):
        for line in open(OUT):
            try:
                done.add(json.loads(line)["name"])
            except Exception:
                pass

    def rname(n):
        return n if WIDTH == 40.0 else f"w{int(WIDTH)}_{n}"

    names = sys.argv[1:] or list(PROBES)
    todo = [n for n in names if rname(n) not in done]
    if not todo:
        print("all probes recorded")
        return

    pos, vel, mass = plummer_sphere(N, scale=1.0, seed=0)
    keep = np.all(np.abs(np.asarray(pos)) <= WIDTH / 2, axis=1)
    pos, vel, mass = pos[keep], vel[keep], mass[keep]
    state = ParticleState.create(pos, vel, mass, capacity=N,
                                 dtype=jnp.float32)
    params = SimParams.create(g_soft=0.02, theta2=1.0, bounds_width=WIDTH,
                              dtype=jnp.float32)
    m = state.effective_mass()
    rng = np.random.default_rng(0)
    samp = np.sort(rng.choice(len(pos), 4096, replace=False))
    ref = np.asarray(pairwise_acc_pallas_targets(
        state.pos[samp], state.pos, m, params.g, params.g_soft))
    rn = np.linalg.norm(ref, axis=1)
    typ = float(np.median(rn))

    for name in todo:
        ov = PROBES[name]
        try:
            cfg = BHConfig.auto_for(N, **ov)
        except Exception as e:
            print(f"{name}: config rejected: {e}", flush=True)
            continue
        fn = jax.jit(lambda p, mm, c=cfg: bh_accel(
            p, mm, params.bounds, params.theta2, params.g, params.g_soft,
            c))
        t0 = time.perf_counter()
        acc, stats = fn(state.pos, m)
        float(acc[0, 0])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(5):
            acc, stats = fn(state.pos, m)
            float(acc[0, 0])
        per = (time.perf_counter() - t0) / 5
        a = np.asarray(acc)[samp]
        err = np.linalg.norm(a - ref, axis=1) / np.maximum(rn, typ)
        rec = {
            "name": rname(name), "n": N, "width": WIDTH,
            "force_ms": round(per * 1e3, 1),
            "calls_per_s": round(1 / per, 3),
            "p99_typ": float(np.percentile(err, 99)),
            "median": float(np.median(err)),
            "max_typ": float(err.max()),
            "near_fallback": int(stats["near_fallback"]),
            "fb_spill": int(stats["fb_spill"]),
            "frontier_fallback": int(stats["frontier_fallback"]),
            "accept_dropped": int(stats["accept_dropped"]),
            "config": {k: ov[k] for k in sorted(ov)},
            "compile_s": round(compile_s, 1),
            "ts": time.time(),
        }
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"{rec['name']:16s} p99 {rec['p99_typ']:.4f} "
              f"med {rec['median']:.2e} {rec['calls_per_s']:.2f} calls/s "
              f"nf {rec['near_fallback']} ff {rec['frontier_fallback']} "
              f"ad {rec['accept_dropped']}", flush=True)


if __name__ == "__main__":
    main()
