#!/usr/bin/env python
"""Adaptive-walk throughput probes at 1M Plummer w40 (VERDICT r3 #5).

The round-4 profile (scripts/profile_adaptive.py, /tmp/prof_ada.log,
2026-08-20) decomposed the 637 ms adaptive step: collect walk 271 ms
(the 4x frontier/accept budgets + 3 refined levels), pair kernel 150 ms
(window 9216 + near 2048 + refined-near 16384 slab rows), XLA fb eval
~100 ms (fb_cap 2048 — [B, 2048] dense per group, mostly padding), quad
kernel 42 ms.  Each probe halves ONE budget and gates sampled-exact
accuracy; winners combine.  Rows append to results/ada_tune_r4.jsonl
(resume-by-name).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.ops.pairwise import pairwise_acc_pallas_targets
from nbody_tpu.ops.traversal import (ADAPTIVE_OVERRIDES,
                                     ADAPTIVE_TIGHT_OVERRIDES, BHConfig,
                                     bh_accel)
from nbody_tpu.scenes import plummer_sphere

N = 1 << int(os.environ.get("ADA_LOG2N", "20"))
WIDTH = float(os.environ.get("ADA_WIDTH", "40.0"))
STACK = os.environ.get("ADA_STACK", "deep")  # 'deep' | 'tight'
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "results", "ada_tune_r4.jsonl")

PROBES = {
    "base": {},
    "fb1024": dict(fb_cap=1024),
    "fb512": dict(fb_cap=512),
    "rnp8k": dict(refine_near_particle_cap=8192),
    "fr4096": dict(frontier_cap=4096, accept_cap=4096),
    # combos (singles measured 2026-08-20: fb512 -92 ms FREE,
    # rnp8k -49 ms p99 0.0223, fr4096 -56 ms p99 0.0202)
    "fb512_fr4096": dict(fb_cap=512, frontier_cap=4096, accept_cap=4096),
    "fb512_rnp8k_fr4096": dict(fb_cap=512, refine_near_particle_cap=8192,
                               frontier_cap=4096, accept_cap=4096),
    "sg64": dict(subgroups=64),
    "fr2048": dict(frontier_cap=2048, accept_cap=4096),
    "fb512_fr4096_sg64": dict(fb_cap=512, frontier_cap=4096,
                              accept_cap=4096, subgroups=64),
    "fb512_fr2048": dict(fb_cap=512, frontier_cap=2048, accept_cap=4096),
    "fb512_rnp8k_fr2048": dict(fb_cap=512, refine_near_particle_cap=8192,
                               frontier_cap=2048, accept_cap=4096),
    "fb512_fr4096_a8k": dict(fb_cap=512, frontier_cap=4096),
    # round 5: walk-scatter consolidation A/B (bitwise-identical forces,
    # pure scheduling — see BHConfig.delta_onepass)
    "onepass": dict(delta_onepass=True),
    "base_r5": {},  # fresh baseline, back-to-back with onepass (A/B pairs
    # must share a session: remote-compile latency drifts across hours)
    "base_sssort": {},  # code-level A/B: fused sort-method searchsorted in
    # the refined build (ops/tree.py) vs base_r5's 430.6 ms scan rows
    # round 5: smaller eval tiles strand less of the 38% slab padding in
    # part-filled tiles (the pl.when whole-tile skip gets more purchase);
    # the round-3 et cuts lost at the DENSE stack but that slab was full
    "et1024": dict(eval_tile=1024),
    "et512": dict(eval_tile=512),
    # round 5: refined-near cap cut — ~21% of the pair-kernel slab width;
    # p99 headroom exists (0.0248 vs the 5e-2 envelope)
    "rnp4k": dict(refine_near_particle_cap=4096),
    "rnp4k_rnc2k": dict(refine_near_particle_cap=4096,
                        refine_near_cell_cap=2048),
    # tight-regime rnp cut (w10 gate is the close one: p99 0.0401 base)
    "rnp8k_rnc2k": dict(refine_near_particle_cap=8192,
                        refine_near_cell_cap=2048),
}


def main():
    done = set()
    if os.path.exists(OUT):
        for line in open(OUT):
            try:
                done.add(json.loads(line)["name"])
            except Exception:
                pass
    names = sys.argv[1:] or list(PROBES)
    def rname(n):
        tag = (n if (WIDTH == 40.0 and STACK == "deep")
               else f"{STACK}_w{int(WIDTH)}_{n}")
        return tag if N == 1 << 20 else f"n{N >> 10}k_{tag}"
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
        base_ov = (ADAPTIVE_OVERRIDES if STACK == "deep"
                   else ADAPTIVE_TIGHT_OVERRIDES)
        ov = {**base_ov, **PROBES[name]}
        cfg = BHConfig.auto_for(N, **ov)
        fn = jax.jit(lambda p, mm, c=cfg: bh_accel(
            p, mm, params.bounds, params.theta2, params.g, params.g_soft,
            c))
        t0 = time.perf_counter()
        acc, stats = fn(state.pos, m)
        float(acc[0, 0])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            acc, stats = fn(state.pos, m)
            float(acc[0, 0])
        per = (time.perf_counter() - t0) / 3
        a = np.asarray(acc)[samp]
        err = np.linalg.norm(a - ref, axis=1) / np.maximum(rn, typ)
        rec_name = rname(name)
        rec = {
            "name": rec_name, "n": N, "width": WIDTH, "stack": STACK,
            "force_ms": round(per * 1e3, 1),
            "calls_per_s": round(1 / per, 3),
            "p99_typ": float(np.percentile(err, 99)),
            "median": float(np.median(err)),
            "max_typ": float(err.max()),
            "near_fallback": int(stats["near_fallback"]),
            "fb_spill": int(stats["fb_spill"]),
            "frontier_fallback": int(stats["frontier_fallback"]),
            "accept_dropped": int(stats["accept_dropped"]),
            "compile_s": round(compile_s, 1),
            "overrides": PROBES[name],
            "ts": time.time(),
        }
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, flush=True)


if __name__ == "__main__":
    main()
