#!/usr/bin/env python
"""Temporal walk reuse (engine option walk_every) on TPU: fused steps/s
plus the staleness accuracy gate.

Perf rows: fused stateful-run steps/s at the benchmark scene for
walk_every in {1 (control), 2, 3, 4}.  The K=1 control uses the plain
stateless runner (the shipped path).  Cadence note: the timed window
starts at age = STEPS, and STEPS is a multiple of every probed K, so the
window contains exactly STEPS/K full walks.

Gate rows (--gate): evolve the benchmark state 10 steps with the standard
engine, walk once there, advance j more steps with the reuse engine
(walk_every huge, so the topology stays frozen), then compare the CACHED
force at the final state against (a) the exact sampled direct sum
(ops/pairwise.py pairwise_acc_pallas_targets) and (b) a fresh full walk at
the same positions.  Criterion: cached p99 <= 2x the fresh walk's p99
(the round-3 gate convention, VALIDATION.md §9).

Appends JSON lines to results/walk_reuse_tpu.jsonl.
Usage: bench_walk_reuse.py [name substrings...] [--gate]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from scripts._gate_lib import (append_record, benchmark_state, load_done,
                               sample_alive)
from nbody_tpu.core.stepper import make_run, make_run_stateful
from nbody_tpu.engines import get_engine

OUT = os.path.join(os.path.dirname(__file__), "..", "results",
                   "walk_reuse_tpu.jsonl")
STEPS = 24

PERF_CASES = [
    # back-to-back A/B: control first, then the reuse cadences
    ("wr_1m_k1", 1 << 20, 1),
    ("wr_1m_k2", 1 << 20, 2),
    ("wr_1m_k4", 1 << 20, 4),
    ("wr_1m_k3", 1 << 20, 3),
    ("wr_524k_k1", 1 << 19, 1),
    ("wr_524k_k2", 1 << 19, 2),
    ("wr_524k_k4", 1 << 19, 4),
    ("wr_2m_k1", 1 << 21, 1),
    ("wr_2m_k2", 1 << 21, 2),
    ("wr_2m_k4", 1 << 21, 4),
    ("wr_131k_k1", 1 << 17, 1),
    ("wr_131k_k2", 1 << 17, 2),
    ("wr_131k_k4", 1 << 17, 4),
    # 64k: the bottom of bh's auto range (crossover ~60k) — the reuse
    # engine's win region is below the 131k wash point, so this is where
    # a default flip would have to earn its keep
    ("wr_64k_k1", 1 << 16, 1),
    ("wr_64k_k2", 1 << 16, 2),
    ("wr_64k_k4", 1 << 16, 4),
]

GATE_CASES = [
    # (name, n, staleness steps j): topology walked at step 10, force
    # gated at step 10 + j — j covers the worst reuse slot of K = j
    ("wg_1m_j2", 1 << 20, 2),
    ("wg_1m_j4", 1 << 20, 4),
    ("wg_131k_j4", 1 << 17, 4),
    ("wg_2m_j4", 1 << 21, 4),
    ("wg_64k_j4", 1 << 16, 4),
]


def perf_case(name, n, k, state, params):
    if k == 1:
        engine = get_engine("bh")
        run = make_run(engine.force)
        tc0 = time.perf_counter()
        out = run(state, params, STEPS)
        float(out.time)  # relay-safe sync (CLAUDE.md)
        compile_s = time.perf_counter() - tc0
        t0 = time.perf_counter()
        out = run(out, params, STEPS)
        float(out.time)
    else:
        engine = get_engine("bh", walk_every=k)
        run = make_run_stateful(engine)
        carry = engine.init_carry(state.pos, state.effective_mass(), params)
        tc0 = time.perf_counter()
        out, carry = run(state, carry, params, STEPS)
        float(out.time)
        compile_s = time.perf_counter() - tc0
        t0 = time.perf_counter()
        out, carry = run(out, carry, params, STEPS)
        float(out.time)
    dt_s = time.perf_counter() - t0
    return {
        "name": name, "n": n, "walk_every": k,
        "steps_per_s": round(STEPS / dt_s, 3),
        "ms_per_step": round(dt_s / STEPS * 1e3, 1),
        "compile_s": round(compile_s, 1),
        "ts": time.time(),
    }


def gate_case(name, n, j, state, params):
    from nbody_tpu.ops.pairwise import pairwise_acc_pallas_targets
    from nbody_tpu.ops.traversal import BHConfig, bh_accel, bh_accel_reuse
    from nbody_tpu.ops.tree import build_octree
    from nbody_tpu.ops.traversal import empty_topo

    cfg = BHConfig.auto_for(n)
    # 10 standard steps to a representative mid-evolution state
    eng0 = get_engine("bh")
    run0 = make_run(eng0.force)
    state = run0(state, params, 10)
    float(state.time)

    # walk once here, then advance j steps on the frozen topology
    engine = get_engine("bh", walk_every=1 << 20)  # never re-walk
    carry = engine.init_carry(state.pos, state.effective_mass(), params)
    run = make_run_stateful(engine)
    state, carry = run(state, carry, params, j)
    float(state.time)
    tree, topo, age = carry
    m = state.effective_mass()

    acc_cached, stats, *_ = bh_accel_reuse(
        state.pos, m, params.bounds, params.theta2, params.g, params.g_soft,
        tree, topo, age, cfg, 1 << 20,
    )
    assert int(stats["full_walk"]) == 0, "gate must hit the cached branch"
    acc_full, _ = bh_accel(state.pos, m, params.bounds, params.theta2,
                           params.g, params.g_soft, cfg)

    idx = sample_alive(state, 8192)
    ref = pairwise_acc_pallas_targets(
        state.pos[jnp.asarray(idx)], state.pos, m, params.g, params.g_soft
    )
    r = np.asarray(ref)
    rn = np.maximum(np.linalg.norm(r, axis=1), 1e-30)

    def p99(acc):
        a = np.asarray(acc)[idx]
        err = np.linalg.norm(a - r, axis=1) / rn
        return float(np.percentile(err, 99)), float(np.median(err))

    p99_c, med_c = p99(acc_cached)
    p99_f, med_f = p99(acc_full)
    return {
        "name": name, "n": n, "staleness_steps": j,
        "p99_cached": p99_c, "p99_full": p99_f,
        "ratio": round(p99_c / p99_f, 3),
        "median_cached": med_c, "median_full": med_f,
        "passes_2x": bool(p99_c <= 2.0 * p99_f),
        "ts": time.time(),
    }


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    want_gate = "--gate" in sys.argv
    done = load_done(OUT)
    cases = GATE_CASES if want_gate else PERF_CASES
    fn = gate_case if want_gate else perf_case
    for name, n, k in cases:
        if args and not any(s in name for s in args):
            continue
        if name in done:
            continue
        state, params = benchmark_state(n)
        rec = fn(name, n, k, state, params)
        append_record(OUT, rec)


if __name__ == "__main__":
    main()
