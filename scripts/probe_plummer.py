#!/usr/bin/env python
"""Density-adaptive-depth question, settled with data (round-3 session 9).

DESIGN.md's one open lever: "density-adaptive leaf depth remains the
unexplored answer if a future workload makes fallback pressure dominate".
The disc benchmark never exercises it (near_fallback ~1.7k cells at 1M,
priced-in — VALIDATION.md §7).  A Plummer sphere is the stress case the
note anticipates: central number density 3n/(4πa³) ≈ 2.4e5 particles/unit³
at n=1M (scale=1), so a level-7 leaf cell of a 40-wide box (the CLI
example's plummer box) holds thousands of particles in the core — far
over every shipped near cap.

CPU pre-probe at 8k (this file's history): the Plummer error tail is
THETA-INDEPENDENT (θ²=0.5 and 1.0 give identical p99 0.238), concentrated
in the core (worst-1% radius ~0.4-0.57 vs population median 1.3), and
4x smaller with a 4x finer grid (width 10: p99 5.5e-2) — i.e. it is leaf
RESOLUTION error on the steep core-density cells, precisely the
adaptive-depth failure mode, not multipole-acceptance error.

This probe measures on the real chip at N=1M Plummer (benchmark physics
θ²=1/ε=0.02/dt=3e-2) the static levers the framework already ships:

  * box width 40 (CLI example) vs 10 (tight box; culls the ~5% Plummer
    tail outside r≈5, open-boundary semantics) — bounds are traced data,
    so both share each config's compiled program;
  * max_level 8 (8x finer leaf cells at fixed box);
  * near_particle_cap 2048 (absorbs overflow core cells into the exact
    near path instead of multipole fallback).

Per (config, width): a sampled-exact force gate (K=8192 targets vs all
sources) and the fused engine-path steps/s.  Interpretation contract
(written before running): if some shipped static combination passes the
disc envelope (p99_typ < 5e-2; the typ metric because plain rel error
divides by near-zero central forces in spherical scenes) at acceptable
cost, density-ADAPTIVE depth stays closed — static depth+bounds+cap are
the supported answer, documented in VALIDATION.md; if nothing passes,
adaptivity is motivated and these rows say by how much.
Appends to results/plummer_1m.jsonl.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.core.stepper import make_run
from nbody_tpu.engines import get_engine
from nbody_tpu.scenes import plummer_sphere

OUT = os.path.join(os.path.dirname(__file__), "..", "results",
                   "plummer_1m.jsonl")
N = int(os.environ.get("PLUMMER_N", 1 << 20))  # CPU dry-runs shrink this
K = min(8192, N // 4)
STEPS = 25

# (config name, auto_for overrides) x (width tag, box width)
CONFIGS = [
    ("defaults", {}),
    ("ml8", dict(max_level=8)),
    ("cap2048", dict(near_particle_cap=2048)),
    # Combined follow-up: the single-lever rows showed ml8's residual error
    # rides budget overflow (accept_dropped 44-92k, frontier_fallback
    # 10-34k), not resolution — so pair depth 8 with doubled walk budgets
    # and the bigger near cap and measure whether the overflow error (not
    # the leaf-resolution error) was the remaining tail.
    ("dense", dict(max_level=8, near_particle_cap=2048, frontier_cap=4096,
                   accept_cap=4096, near_cell_cap=4096, fb_cap=512)),
    # Round-3 session 10: the genuinely density-ADAPTIVE build the static
    # rows motivated (BHConfig.refine_levels — per-octant levels below the
    # leaf grid for cells above the near cap).  Depth reaches 9-10 on the
    # core at the DEFAULT global grid; the question is whether the refined
    # near budget closes the envelope gap the dense stack could not
    # (p99_typ 0.147 vs the 5e-2 disc envelope) and at what step cost.
    # depth is bounded at 10 total (3D Morton int32), so the ml7 preset
    # allows at most refine_levels=3; a coarser global grid buys deeper
    # adaptive range (ml6+r4 = same total depth, more cells on the
    # adaptive route)
    ("refine3", dict(refine_levels=3)),
    ("refine3_rnp16k", dict(refine_levels=3,
                            refine_near_particle_cap=16384)),
    ("ml6_refine4", dict(max_level=6, refine_levels=4)),
    # threshold pinned at 512: the auto resolution (= near_particle_cap =
    # 2048 here) would flag nothing at w40/ml8, where core cells hold ~930
    # particles — the dense stack's 60k+ near-overflow cells come from MANY
    # sub-threshold cells sharing one group budget, not single giant cells
    ("dense_r2", dict(max_level=8, near_particle_cap=2048,
                      frontier_cap=4096, accept_cap=4096,
                      near_cell_cap=4096, fb_cap=512, refine_levels=2,
                      refine_threshold=512)),
    # round 2 of the adaptive sweep: dense_r2 is depth-capped (ml8+2 = the
    # Morton depth-10 limit) and its remaining error is budget pressure
    # (nf 58k / fs 27k / ad 3k at w40) — so refine DEEP from a coarser
    # grid and spend the budget headroom the shallow grid frees: fewer
    # leaf cells -> smaller frontier pressure, bigger fb/accept caps kill
    # the spill/drop degradation, wider refined budgets absorb the core.
    ("deep_l7r3", dict(max_level=7, refine_levels=3, refine_threshold=512,
                       near_particle_cap=2048, frontier_cap=8192,
                       accept_cap=8192, near_cell_cap=4096, fb_cap=2048,
                       refine_frontier=1024, refine_near_cell_cap=4096,
                       refine_near_particle_cap=16384)),
    # threshold 128: ALSO refine the core-shoulder cells (100-500
    # particles at w40) that flood the near budget as unrefined ranges
    ("deep_l7r3_t128", dict(max_level=7, refine_levels=3,
                            refine_threshold=128,
                            near_particle_cap=2048, frontier_cap=8192,
                            accept_cap=8192, near_cell_cap=4096,
                            fb_cap=2048, refine_frontier=1024,
                            refine_near_cell_cap=4096,
                            refine_near_particle_cap=16384)),
    ("deep_l6r4", dict(max_level=6, refine_levels=4, refine_threshold=512,
                       near_particle_cap=2048, frontier_cap=8192,
                       accept_cap=8192, near_cell_cap=4096, fb_cap=2048,
                       refine_frontier=1024, refine_near_cell_cap=4096,
                       refine_near_particle_cap=16384)),
]
WIDTHS = [("w40", 40.0), ("w10", 10.0)]


def build_state(width):
    pos, vel, mass = plummer_sphere(N, scale=1.0, seed=0)
    state = ParticleState.create(pos, vel, mass, capacity=N,
                                 dtype=jnp.float32)
    params = SimParams.create(dt=3e-2, g_soft=0.02, theta2=1.0,
                              bounds_width=width, dtype=jnp.float32)
    # Open-boundary semantics: the Plummer tail extends past any finite box
    # (r_max ~ 1200·scale at n=1M); particles outside the domain are dead on
    # arrival, exactly as the first step's cull would make them.
    alive = np.asarray(state.alive) & np.asarray(
        params.bounds.contains(state.pos))
    state = dataclasses.replace(state, alive=jnp.asarray(alive))
    return state, params, int(alive.sum())


def main():
    from _gate_lib import load_done, run_gate, sample_alive
    import jax

    wanted = [a for a in sys.argv[1:] if not a.startswith("--")]
    perf_only = "--perf-only" in sys.argv

    for wtag, width in WIDTHS:
        cases = [(f"pl_1m_{wtag}_{nm}", o) for nm, o in CONFIGS
                 if not wanted or any(s in f"{wtag}_{nm}" for s in wanted)]
        if not cases:
            continue
        state, params, n_in = build_state(width)
        print(f"plummer 1M {wtag}: {n_in} of {N} inside", flush=True)

        # --- accuracy gates (sampled exact targets) ----------------------
        gate_names = {f"{nm}_gate": o for nm, o in cases}
        if not perf_only and (set(gate_names) - load_done(OUT)):
            m = state.effective_mass()
            idx = sample_alive(state, K)
            print(f"sampled exact reference ({K} x {N})...", flush=True)
            if jax.default_backend() == "tpu":
                from nbody_tpu.ops.pairwise import pairwise_acc_pallas_targets
                ref = pairwise_acc_pallas_targets(
                    state.pos[jnp.asarray(idx)], state.pos, m, params.g,
                    params.g_soft)
            else:  # CPU dry-run path (Pallas is interpret-only there)
                from nbody_tpu.engines.brute_force import force_tiled
                ref = force_tiled(state.pos, m, params)[jnp.asarray(idx)]
            run_gate(gate_names, N, OUT, ref, state, params, sample_idx=idx,
                     extra_fields=lambda st: {
                         "accept_dropped": int(st["accept_dropped"]),
                         "frontier_fallback": int(st["frontier_fallback"]),
                         "refine_near_total": int(np.sum(np.asarray(
                             st.get("refine_near_totals", 0)))),
                         "refine_build_dropped": int(np.asarray(
                             st.get("refine_build_dropped", 0))),
                         "scene": "plummer", "width": width,
                     })

        # --- fused engine-path steps/s -----------------------------------
        done = load_done(OUT)
        for name, opts in cases:
            if name in done:
                continue
            engine = get_engine("bh", **opts)
            run = make_run(engine.force)
            tc0 = time.perf_counter()
            out = run(state, params, STEPS)
            float(out.time)  # relay-safe sync (CLAUDE.md)
            compile_s = time.perf_counter() - tc0
            t0 = time.perf_counter()
            out = run(out, params, STEPS)
            float(out.time)
            dt_s = time.perf_counter() - t0
            from nbody_tpu.ops.traversal import BHConfig

            rcfg = BHConfig.auto_for(N, **opts)
            rec = {
                "name": name,
                "n": N,
                "scene": "plummer",
                "width": width,
                "steps_per_s": round(STEPS / dt_s, 3),
                "ms_per_step": round(dt_s / STEPS * 1e3, 1),
                "compile_s": round(compile_s, 1),
                "n_alive_end": int(out.n_alive()),
                "ts": time.time(),
                "cfg": {"max_level": rcfg.max_level,
                        "group_size": rcfg.group_size,
                        "window_pad": rcfg.window_pad,
                        "near_particle_cap": rcfg.near_particle_cap,
                        "block_dual": rcfg.block_dual,
                        "multipole": rcfg.multipole,
                        "refine_levels": rcfg.refine_levels},
            }
            os.makedirs(os.path.dirname(OUT), exist_ok=True)
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(rec, flush=True)


if __name__ == "__main__":
    main()
