#!/usr/bin/env python
"""Round-2 step decomposition at N=1M (TPU): where do the 343 ms go?

Times each stage of the default bh path in isolation (same jit'd shapes as
the engine): Morton encode+sort, leaf segment-sums + pyramid, quad pyramid,
the full build, build+walk (force with near/far caps zeroed is not
expressible, so walk cost = full force - stage sums is reported as the
residual).  Appends JSON lines to results/decompose_r2.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.ops import morton
from nbody_tpu.ops.traversal import BHConfig, bh_accel
from nbody_tpu.ops.tree import build_octree, grid_bounds
from nbody_tpu.scenes import self_gravitating_disc

OUT = os.path.join(os.path.dirname(__file__), "..", "results",
                   "decompose_r2.jsonl")
N = 1 << 20
REPS = 5


def _sync(out):
    # scalar transfer: block_until_ready is unreliable under the axon relay
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).reshape(-1)[0].astype(jnp.float32))


def timeit(name, fn, *args):
    f = jax.jit(fn)
    _sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(REPS):
        _sync(f(*args))
    ms = (time.perf_counter() - t0) / REPS * 1e3
    rec = {"name": name, "n": N, "ms": round(ms, 1), "ts": time.time()}
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f_:
        f_.write(json.dumps(rec) + "\n")
    print(rec, flush=True)
    return ms


def main():
    pos, vel, mass = self_gravitating_disc(N - 1, seed=0)
    state = ParticleState.create(pos, vel, mass, capacity=N,
                                 dtype=jnp.float32)
    params = SimParams.create(dt=3e-2, g_soft=0.02, theta2=1.0,
                              bounds_width=10.0, dtype=jnp.float32)
    cfg = BHConfig.auto_for(N)
    m = state.effective_mass()
    gb = grid_bounds(params.bounds, cfg.max_level)

    # stage 1: Morton encode only
    def encode(p):
        return morton.cell_codes(p[:, :cfg.dim], gb, cfg.max_level)

    timeit("encode", encode, state.pos)

    # stage 2: encode + payload sort (the build's irregular backbone)
    def enc_sort(p, mm):
        code = morton.cell_codes(p[:, :cfg.dim], gb, cfg.max_level)
        n = p.shape[0]
        idx = jnp.arange(n, dtype=jnp.int32)
        code_s, idx_s = jax.lax.sort((code, idx), num_keys=1)
        return code_s, p[idx_s], mm[idx_s]

    timeit("encode_sort_gather", enc_sort, state.pos, m)

    # stage 3: full tree build, mono vs quad
    def build_mono(p, mm):
        return build_octree(p, mm, params.bounds, cfg.max_level,
                            dim=cfg.dim, quad=False)

    def build_quad(p, mm):
        return build_octree(p, mm, params.bounds, cfg.max_level,
                            dim=cfg.dim, quad=True,
                            quad_leaf=cfg.quad_leaf)

    timeit("build_mono", build_mono, state.pos, m)
    timeit("build_quad", build_quad, state.pos, m)

    # stage 4: full force (build + walk + eval), defaults
    def force(p, mm):
        acc, _ = bh_accel(p, mm, params.bounds, params.theta2, params.g,
                          params.g_soft, cfg)
        return acc

    timeit("force_full", force, state.pos, m)


if __name__ == "__main__":
    main()
