#!/usr/bin/env python
"""CPU accuracy gate for the round-3h window_pad flip (contingency path).

The TPU tunnel died mid-round (host OOM killed the relay — CLAUDE.md
hazards), so the usual 1M/131k on-TPU gates (scripts/accuracy_1m.py /
accuracy_midn.py) could not run for the window_pad defaults.  This script
gates the SAME traversal code path on the CPU backend at N=65536, where
the exact O(N^2) reference is single-core-feasible:

  * the mid preset (auto_for: group 4096, dual, cap 2048) at window_pad
    2048 (round-2 value) vs 1024 (new default) vs 512, and
  * the large-tier CONFIG (group 8192, subgroups 128, cap 512, dual 1.2 —
    what auto_for picks above 262k) applied at this N via explicit
    overrides, window_pad 2048 vs 512.

Numerics differ slightly from TPU (no Pallas kernel; XLA eval path), but
the window/fallback mechanics being gated are backend-independent: a
window cut moves near cells from window-exact rows to the gathered-near /
exact-multipole-fallback path, and the gate checks that p99 force error
does not move materially.  Appends to results/accuracy_wp_cpu.jsonl.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from nbody_tpu.engines import get_engine

OUT = os.path.join(os.path.dirname(__file__), "..", "results",
                   "accuracy_wp_cpu.jsonl")
N = 1 << 16 if len(sys.argv) < 2 else int(sys.argv[1])

LARGE = dict(group_size=8192, subgroups=128, block_dual=True,
             dual_margin=1.2, near_particle_cap=512)

CONFIGS = {
    # mid preset (what auto_for(65536) resolves, minus the wp default)
    "cpu_mid_wp2048": dict(window_pad=2048),
    "cpu_mid_wp1024": dict(window_pad=1024),
    "cpu_mid_wp512": dict(window_pad=512),
    # the large-N tier's config shape, applied at this N
    "cpu_large_wp2048": dict(LARGE, window_pad=2048),
    "cpu_large_wp1024": dict(LARGE, window_pad=1024),
    "cpu_large_wp512": dict(LARGE, window_pad=512),
    # round-3l group-size-cut candidates (pre-gated here so a TPU perf
    # win can flip defaults without another gate round): the large-tier
    # config at half/quarter groups.  Smaller groups shrink the window's
    # absolute coverage, shifting near/fb pressure — not a free knob.
    "cpu_large_g4096_wp512": dict(LARGE, group_size=4096, subgroups=64,
                                  window_pad=512),
    "cpu_large_g2048_wp512": dict(LARGE, group_size=2048, subgroups=64,
                                  window_pad=512),
    "cpu_large_g4096_wp1024": dict(LARGE, group_size=4096, subgroups=64,
                                   window_pad=1024),
}
if N != 1 << 16:  # non-default N: large rows always, mid rows in-tier
    CONFIGS = {f"{k}_n{N >> 10}k": v for k, v in CONFIGS.items()
               if "large" in k or N <= 262144}


def main():
    from _gate_lib import benchmark_state, run_gate

    state, params = benchmark_state(N)
    m = state.effective_mass()
    print(f"computing exact reference ({N}^2 pairs, CPU)...", flush=True)
    brute = get_engine("brute")
    t0 = time.perf_counter()
    ref = jax.jit(lambda p, mm: brute.force(p, mm, params))(state.pos, m)
    ref.block_until_ready()
    print(f"reference done in {time.perf_counter() - t0:.1f}s", flush=True)
    run_gate(CONFIGS, N, OUT, ref, state, params)


if __name__ == "__main__":
    main()
