#!/usr/bin/env python
"""One-off BH N=1M config tuner (TPU).  Times build-only and force-only
(build+traverse) for a few BHConfig variants; appends JSON lines to
results/tune_bh_1m.jsonl as it goes (resumable — already-done configs are
skipped).

Knobs follow the empirical TPU rule (CLAUDE.md): irregular gathers are the
bottleneck, so trade them for dense work via bigger groups / fewer chunks.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.ops.traversal import BHConfig, bh_accel
from nbody_tpu.ops.tree import build_octree
from nbody_tpu.scenes import self_gravitating_disc

OUT = os.path.join(os.path.dirname(__file__), "..", "results", "tune_bh_1m.jsonl")
N = 1 << 20
REPS = 3

CONFIGS = {
    "cg4": dict(chunk_groups=4),
    "g4096_s64_cg1": dict(group_size=4096, subgroups=64, chunk_groups=1),
    "g4096_s128_cg1": dict(group_size=4096, subgroups=128, chunk_groups=1),
    "near16k": dict(near_particle_cap=16384),
    "base": dict(),
    # round 2: scale groups further / window sizing / mid-N regression check
    "g8192_s128_cg1": dict(group_size=8192, subgroups=128, chunk_groups=1),
    "g4096_p1024": dict(group_size=4096, subgroups=64, chunk_groups=1,
                        window_pad=1024),
    "g4096_p4096": dict(group_size=4096, subgroups=64, chunk_groups=1,
                        window_pad=4096),
    "g2048_cg1": dict(chunk_groups=1),
    "g4096_s64_cg1_n131k": dict(group_size=4096, subgroups=64, chunk_groups=1,
                                n=131072),
    "base_n131k": dict(n=131072),
    # round 3: ablations to decompose the step (accuracy is NOT the point
    # here — fallback counts explode; only the timing signal matters)
    "g4_near2k": dict(group_size=4096, subgroups=64, chunk_groups=1,
                      near_particle_cap=2048),
    "g4_near4k": dict(group_size=4096, subgroups=64, chunk_groups=1,
                      near_particle_cap=4096),
    "g4_pad512": dict(group_size=4096, subgroups=64, chunk_groups=1,
                      window_pad=512),
    # round 4: MXU block formulation A/B (norm-trick matmul pair evals)
    "g4_mxu": dict(group_size=4096, subgroups=64, chunk_groups=1,
                   mxu_blocks=True),
    "g4_novpu": dict(group_size=4096, subgroups=64, chunk_groups=1,
                     mxu_blocks=False),
    "g4_mxu_131k": dict(group_size=4096, subgroups=64, chunk_groups=1,
                        mxu_blocks=True, n=131072),
    "g4_mxu_near16k": dict(group_size=4096, subgroups=64, chunk_groups=1,
                           mxu_blocks=True, near_particle_cap=16384),
    "g8_mxu": dict(group_size=8192, subgroups=128, chunk_groups=1,
                   mxu_blocks=True),
    # round 5: group scaling continues under the MXU formulation
    "g16_mxu": dict(group_size=16384, subgroups=256, chunk_groups=1,
                    mxu_blocks=True),
    "g8_s64_mxu": dict(group_size=8192, subgroups=64, chunk_groups=1,
                       mxu_blocks=True),
    "g8_mxu_pad4096": dict(group_size=8192, subgroups=128, chunk_groups=1,
                           window_pad=4096, mxu_blocks=True),
    "g8_mxu_131k": dict(group_size=8192, subgroups=128, chunk_groups=1,
                        mxu_blocks=True, n=131072),
    # round 6: walk-depth micro-tuning under the winning config
    "g8_sl3": dict(group_size=8192, subgroups=128, chunk_groups=1,
                   mxu_blocks=True, start_level=3),
    "g8_acc4096": dict(group_size=8192, subgroups=128, chunk_groups=1,
                       mxu_blocks=True, accept_cap=4096, frontier_cap=4096),
    "g4_sl3_131k": dict(group_size=4096, subgroups=64, chunk_groups=1,
                        mxu_blocks=True, start_level=3, n=131072),
    "g8_sl4": dict(group_size=8192, subgroups=128, chunk_groups=1,
                   mxu_blocks=True, start_level=4),
}


def emit(rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(rec, flush=True)


def main():
    done = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            for line in f:
                try:
                    done.add(json.loads(line)["name"])
                except Exception:
                    pass

    states = {}

    def get_state(n):
        if n not in states:
            pos, vel, mass = self_gravitating_disc(n - 1, seed=0)
            states[n] = ParticleState.create(
                pos, vel, mass, capacity=n, dtype=jnp.float32
            )
        return states[n]

    state = get_state(N)
    params = SimParams.create(
        dt=3e-2, g_soft=0.02, theta2=1.0, bounds_width=10.0, dtype=jnp.float32
    )

    if "build_only" not in done:
        build = jax.jit(lambda p, m: build_octree(p, m, params.bounds, 7))
        t = build(state.pos, state.mass)
        float(t.mass_s[0])  # compile + load
        t0 = time.perf_counter()
        for _ in range(5):
            t = build(state.pos, state.mass)
            float(t.mass_s[0])
        emit({"name": "build_only", "ms": (time.perf_counter() - t0) / 5 * 1e3})

    for name, opts in CONFIGS.items():
        if name in done:
            continue
        opts = dict(opts)
        n_cfg = opts.pop("n", N)
        state = get_state(n_cfg)
        cfg = BHConfig(max_level=7, **opts)
        fn = jax.jit(
            lambda p, m, cfg=cfg: bh_accel(
                p, m, params.bounds, params.theta2, params.g, params.g_soft, cfg
            )
        )
        tc0 = time.perf_counter()
        acc, stats = fn(state.pos, state.mass)
        float(acc[0, 0])
        compile_s = time.perf_counter() - tc0
        t0 = time.perf_counter()
        for _ in range(REPS):
            acc, stats = fn(state.pos, state.mass)
            float(acc[0, 0])
        ms = (time.perf_counter() - t0) / REPS * 1e3
        emit({
            "name": name,
            "n": n_cfg,
            "ms": ms,
            "steps_per_s": 1e3 / ms,
            "compile_s": round(compile_s, 1),
            "near_fallback": int(stats["near_fallback"]),
            "frontier_fallback": int(stats["frontier_fallback"]),
            "accept_dropped": int(stats["accept_dropped"]),
        })


if __name__ == "__main__":
    main()
