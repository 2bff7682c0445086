#!/usr/bin/env python
"""BH force accuracy at N=2M and 4M vs the exact Pallas direct sum (TPU).

The round-3 cut presets were accuracy-gated at 131k-1M; 2M and 4M shipped
the same tier ungated.  OUTCOME (results/accuracy_large.jsonl, run
2026-08-18): the window-pad-512 cut FAILS at 2M — defaults_2m p99 6.997e-2
vs the wp2048 control's 3.108e-2 (2.25x, over both the <=2x criterion and
the 5e-2 envelope) — so auto_for now restores window_pad 2048 above 1M
(traversal.py; VALIDATION.md §9).

The 2M truth is a full 2M² direct sum (~26 s kernel).  The 4M full sum
(1.76e13 pairs, ~105 s single dispatch) CRASHED the TPU worker mid-kernel,
so 4M (and a 2M cross-check of the estimator) gates on SAMPLED targets:
exact forces for K=8192 alive rows vs all N sources via
pairwise_acc_pallas_targets (~0.2 s), p99 over the sample.

Gate: p99 < 5e-2 (the VERDICT #4 envelope used at 1M) and within 2x the
same-tier control.  Appends JSON lines to results/accuracy_large.jsonl.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from nbody_tpu.ops.pairwise import (pairwise_acc_pallas,
                                    pairwise_acc_pallas_targets)

OUT = os.path.join(os.path.dirname(__file__), "..", "results",
                   "accuracy_large.jsonl")
K = 8192

# (suffix, N, full_truth, configs).  defaults_* rows take whatever
# auto_for ships AT RUN TIME — tiers have moved between sessions (the
# on-file defaults_2m rows measured the retracted wp512 preset; the 2M
# tier now ships wp1024), so key any comparison on the row's "config"
# snapshot (run_gate writes it since 2026-08-18), not the name.  wp512_*
# rows record the retracted cut's error at the same N.  *_sampled at 2M
# cross-checks the sampled estimator against the full-truth rows already
# on file.
PLANS = [
    ("2m", 1 << 21, True, {"defaults_2m": {},
                           "wp2048_control_2m": dict(window_pad=2048)}),
    ("2m_sampled", 1 << 21, False, {"defaults_2m_sampled": {},
                                    "wp512_2m_sampled":
                                        dict(window_pad=512)}),
    ("4m", 1 << 22, False, {"defaults_4m": {},
                            "wp512_4m": dict(window_pad=512)}),
    # round-3 session-3: the wp1024 middle ground (wp512 failed at 2.25x,
    # wp2048 ships) + cap-raise interaction (the 2M failure was fallback-
    # pressure driven).  Sampled gates, controls already on file.
    ("2m_wp1024", 1 << 21, False, {
        "wp1024_2m_sampled": dict(window_pad=1024),
        "wp1024_c2048_2m_sampled": dict(window_pad=1024,
                                        near_particle_cap=2048),
        "c2048_2m_sampled": dict(near_particle_cap=2048)}),
    ("4m_wp1024", 1 << 22, False, {"wp1024_4m": dict(window_pad=1024)}),
]


def main():
    from _gate_lib import benchmark_state, load_done, run_gate, sample_alive

    wanted = [a for a in sys.argv[1:]]
    for suffix, n, full, configs in PLANS:
        if wanted and suffix not in wanted:
            continue
        if not (set(configs) - load_done(OUT)):
            continue
        state, params = benchmark_state(n)
        m = state.effective_mass()
        if full:
            print(f"computing exact reference ({suffix}^2 pairs)...",
                  flush=True)
            ref = pairwise_acc_pallas(state.pos, m, params.g, params.g_soft)
            run_gate(configs, n, OUT, ref, state, params)
        else:
            print(f"computing sampled exact reference ({K} x {suffix})...",
                  flush=True)
            idx = sample_alive(state, K)
            ref = pairwise_acc_pallas_targets(state.pos[jnp.asarray(idx)],
                                              state.pos, m, params.g,
                                              params.g_soft)
            run_gate(configs, n, OUT, ref, state, params, sample_idx=idx)


if __name__ == "__main__":
    main()
