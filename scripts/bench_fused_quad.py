#!/usr/bin/env python
"""Fused engine-path steps/s at the final round-2 BH defaults (TPU).

The tune_bh_r2.jsonl rows are force-only probes (one dispatch per call,
~25 ms relay overhead each); these are the quotable numbers: the full
jitted lax.scan step loop through the engine path (build + traverse +
integrate), exactly what a user of Simulation.run gets.  Cases cover the
quad defaults (multipole="quad", quad_leaf=False, accept_margin=0.8) and
the mono config at the same N for the speed/accuracy trade table.
Appends JSON lines to results/fused_r2.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.core.stepper import make_run
from nbody_tpu.engines import get_engine
from nbody_tpu.scenes import self_gravitating_disc

OUT = os.path.join(os.path.dirname(__file__), "..", "results",
                   "fused_r2.jsonl")
STEPS = 25

SUFFIX = "_v8"  # v2 = scatter->sort + lane-dense segsums; v3 = + auto
# chunk_groups=8 (vmapped collect walk); v4 = maskless pair kernels
# (self-pairs vanish via d=0) + prefix-scan leaf build (ops/tree.py
# _prefix_leaf_stats); v5 = + post-walk flat near-cell expansion
# (_expand_ranges replaces the vmapped per-group _ranges_to_pidx);
# v6 = + merged expansion gather (row-packed + quad-prefix variants
# measured worse, reverted); v7 = scale-safe r2==0 guards (the review
# fixes); v8 = + scalar pl.when branch skips the guard when eps2 > 0
# — the FINAL round-2 numbers
# Optional CLI args filter cases by substring: bench_fused_quad.py 1m 131k
CASES = [
    # (name, n, engine_options)
    ("quad_1m", 1 << 20, None),                          # the defaults
    ("mono_1m", 1 << 20, dict(multipole="mono")),
    ("quad_2m", 1 << 21, None),
    ("mono_2m", 1 << 21, dict(multipole="mono")),
    ("quad_131k", 1 << 17, None),
    ("mono_131k", 1 << 17, dict(multipole="mono")),
    ("quad_524k", 1 << 19, None),
    # scaling tail: 4M on one chip (no exact reference possible; perf row)
    ("quad_4m", 1 << 22, None),
    # 8M was tried and OOMs HBM by ~306 MB (16.05 of 15.75 GB — the
    # [G, S, 8] slab assembly buffers dominate): the single-chip ceiling
    # sits between 4M and 8M.  Beyond it is exactly what the
    # domain-decomposed multi-chip path (parallel/domain.py) is for.
]


def main():
    done = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            for line in f:
                try:
                    done.add(json.loads(line)["name"])
                except Exception:
                    pass

    params = SimParams.create(dt=3e-2, g_soft=0.02, theta2=1.0,
                              bounds_width=10.0, dtype=jnp.float32)
    states = {}

    sel = sys.argv[1:]
    for name, n, opts in CASES:
        if sel and not any(s in name for s in sel):
            continue
        name = name + SUFFIX
        if name in done:
            continue
        if n not in states:
            pos, vel, mass = self_gravitating_disc(n - 1, seed=0)
            states[n] = ParticleState.create(pos, vel, mass, capacity=n,
                                             dtype=jnp.float32)
        state = states[n]
        engine = get_engine("bh", **(opts or {}))
        run = make_run(engine.force)
        tc0 = time.perf_counter()
        out = run(state, params, STEPS)
        float(out.time)  # relay-safe sync (CLAUDE.md)
        compile_s = time.perf_counter() - tc0
        t0 = time.perf_counter()
        out = run(out, params, STEPS)
        float(out.time)
        dt_s = time.perf_counter() - t0
        rec = {
            "name": name,
            "n": n,
            "steps_per_s": round(STEPS / dt_s, 3),
            "ms_per_step": round(dt_s / STEPS * 1e3, 1),
            "compile_s": round(compile_s, 1),
            "ts": time.time(),
        }
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, flush=True)


if __name__ == "__main__":
    main()
