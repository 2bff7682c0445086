#!/usr/bin/env python
"""Secular energy-drift ship gate at the benchmark scene (round 4, VERDICT
r3 #6): 200 fused steps at N=131k, exact pair-potential energies, each
shipped stack ratioed against the 'accurate' control (window_pad 2048 —
the drift-attribution winner, VALIDATION.md §10).

Run on TPU (or CPU with patience) whenever a default-config change is
proposed: a candidate drifting more than DRIFT_MAX_RATIO x the control
FAILS the ship criteria even if its per-step force gates pass — the
round-3 wp-cut lesson (10x drift on flat p99).  Resume-by-name:
re-running skips recorded rows.

Usage: python scripts/drift_gate_tpu.py  [writes results/drift_gate.jsonl]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _gate_lib import benchmark_state, run_drift_gate  # noqa: E402

N = 1 << 17
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "results", "drift_gate.jsonl")

#: ship criterion: <= 3x the accurate stack's drift per 200 steps.  The
#: round-3 attribution measured defaults 1.34e-3 vs accurate 3.73e-4 @1M
#: (3.6x) — that regression shipped knowingly (documented Pareto trade,
#: VALIDATION.md §10); the gate exists so the NEXT one cannot ship
#: silently.  At 131k the shipped defaults sit well inside 3x (the wp
#: cut there is 1024, not 512).
DRIFT_MAX_RATIO = 3.0

CONFIGS = {
    "control": dict(profile="accurate"),
    "defaults": {},
    "dense": dict(profile="dense"),
}


def main():
    state, params = benchmark_state(N)
    run_drift_gate(CONFIGS, N, OUT, state, params, steps=200,
                   control_name="control", max_ratio=DRIFT_MAX_RATIO)


if __name__ == "__main__":
    main()
