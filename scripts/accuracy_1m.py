#!/usr/bin/env python
"""BH force accuracy at N=1M vs the exact Pallas direct sum (TPU).

VERDICT.md #4 gate: p99 relative force error < 5e-2 at theta^2=1 on the
default auto_for(1M) config (round 1: 9.3e-2).  Appends JSON lines to
results/accuracy_1m.jsonl."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from nbody_tpu.ops.pairwise import pairwise_acc_pallas

OUT = os.path.join(os.path.dirname(__file__), "..", "results",
                   "accuracy_1m.jsonl")
N = 1 << 20

CONFIGS = {
    # round-1 rows (multipole defaulted to mono then; re-runs would now
    # pick up the quad default — keep explicit)
    "auto": dict(multipole="mono"),
    "fb512": dict(multipole="mono", fb_cap=512),
    "near16k_cells8k": dict(multipole="mono", near_particle_cap=16384,
                            near_cell_cap=8192, fb_cap=512),
    "near32k_cells16k": dict(multipole="mono", near_particle_cap=32768,
                             near_cell_cap=16384, fb_cap=1024),
    # round 2: quadrupole path.  Rows predating the round-2c/2d default
    # flips pin the then-defaults (quad_leaf=True, accept_margin=1.0) so
    # reruns reproduce the same program.
    "quad_auto": dict(fb_quad=True, quad_leaf=True, accept_margin=1.0),
    "quad_fb512": dict(fb_quad=True, quad_leaf=True, accept_margin=1.0,
                       fb_cap=512),
    "quad_near16k": dict(fb_quad=True, quad_leaf=True, accept_margin=1.0,
                         near_particle_cap=16384, near_cell_cap=8192,
                         fb_cap=512),
    # round 2c: fb_quad off (measured zero p99 effect) + theta margins
    "quad2_auto": dict(quad_leaf=True, accept_margin=1.0),
    "quad2_m09": dict(quad_leaf=True, accept_margin=0.9),
    "quad2_m08": dict(quad_leaf=True, accept_margin=0.8),
    # round 2d: no leaf-level quadrupoles; quad3_m08 == shipped defaults
    "quad3_auto": dict(quad_leaf=False, accept_margin=1.0),
    "quad3_m08": dict(quad_leaf=False, accept_margin=0.8),
    "defaults": {},  # whatever BHConfig currently defaults to (regression row)
    # round 3: block-dual far field (tile-pair acceptance over the eval
    # grid; dual approximates previously-EXACT window/near work, so its
    # accuracy cost is the decision gate for flipping the default)
    "dual": dict(block_dual=True),
    "dual_m12": dict(block_dual=True, dual_margin=1.2),
    "dual_mono": dict(multipole="mono", block_dual=True),
    # round 3c: the perf winner (4.83 steps/s) and its margin neighbor —
    # the halved near cap pushes more rows to the multipole fallback, so
    # accuracy must be re-gated before any default flip
    "dual_n4096": dict(block_dual=True, dual_margin=1.2,
                       near_particle_cap=4096),
    "dual_n4096_m16": dict(block_dual=True, dual_margin=1.6,
                           near_particle_cap=4096),
    # the 5.29 steps/s winner (beats the VERDICT #1 target) + a stricter
    # dual margin as accuracy insurance if n2048's fallback pressure
    # (near_fallback 7121, fb_spill 2129) blows the p99 gate
    "dual_n2048": dict(block_dual=True, dual_margin=1.2,
                       near_particle_cap=2048),
    "dual_n2048_m08": dict(block_dual=True, dual_margin=0.8,
                           near_particle_cap=2048),
    # no-dual cap-reduction controls: quad_1m_n4096_base showed the cap
    # cut ALONE is +16% — if its accuracy holds, the default near cap
    # moves regardless of the dual decision
    "n4096_nodual": dict(near_particle_cap=4096),
    "n2048_nodual": dict(near_particle_cap=2048),
    # round 3d: the cap-cut trend kept paying (c1024 @1M = 5.517 steps/s)
    "dual_n1024": dict(block_dual=True, dual_margin=1.2,
                       near_particle_cap=1024),
    "dual_n512": dict(block_dual=True, dual_margin=1.2,
                      near_particle_cap=512),
    "dual_n256": dict(block_dual=True, dual_margin=1.2,
                      near_particle_cap=256),
    # round 3h: WINDOW SHRINK winners (defaults otherwise: dual m1.2,
    # cap 512).  The pad cut moves previously window-exact near cells to
    # the gather/fallback path, so p99 must be re-gated before flipping.
    "dual_wp1024": dict(window_pad=1024),
    "dual_wp512": dict(window_pad=512),
    "dual_wp256": dict(window_pad=256),
    # round 3l: group-size cut candidate (CPU pre-gates pass at <=1.6x
    # through 262k, accuracy_wp_cpu.jsonl; g2048 FAILS >2x — do not ship
    # it regardless of perf).  Gated here at the flagship N before any
    # preset flip.
    "dual_g4096_wp512": dict(group_size=4096, subgroups=64,
                             window_pad=512),
}


def main():
    from _gate_lib import benchmark_state, run_gate

    state, params = benchmark_state(N)
    m = state.effective_mass()
    print("computing exact reference (1M^2 pairs)...", flush=True)
    ref = pairwise_acc_pallas(state.pos, m, params.g, params.g_soft)
    run_gate(CONFIGS, N, OUT, ref, state, params,
             extra_fields=lambda s: {
                 "max_near_total": int(s["near_totals"].max())})


if __name__ == "__main__":
    main()
