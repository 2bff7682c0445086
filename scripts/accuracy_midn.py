#!/usr/bin/env python
"""BH force accuracy at mid N (default 131k) vs the exact Pallas direct
sum (TPU) — the accuracy gate for the MID preset's round-3 default flips
(block_dual, and a prospective near-cap cut: 131k dual_c2048 measured
31.91 steps/s vs 27.9 base, dual_r3.jsonl).  Same error metrics as
scripts/accuracy_1m.py; appends JSON lines (with an "n" field) to
results/accuracy_midn.jsonl."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from nbody_tpu.ops.pairwise import pairwise_acc_pallas
from nbody_tpu.ops.traversal import BHConfig, bh_accel

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
    from _gate_lib import benchmark_state, run_gate

    state, params = benchmark_state(N)
    m = state.effective_mass()
    print(f"computing exact reference ({N}^2 pairs)...", flush=True)
    ref = pairwise_acc_pallas(state.pos, m, params.g, params.g_soft)
    run_gate(CONFIGS, N, OUT, ref, state, params)


if __name__ == "__main__":
    main()
