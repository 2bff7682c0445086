#!/usr/bin/env python
"""Probe two build-side levers at N=1M (TPU):

  1. build v2: one multi-operand lax.sort carrying (code, index, x, y, z, m)
     instead of argsort + two big payload gathers.
  2. bh-lazy end-to-end steps/s (refresh skips the argsort most steps).

Appends JSON lines to results/tune_build_1m.jsonl.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.ops import morton
from nbody_tpu.ops.tree import build_octree, grid_bounds, _pyramid_tables
from nbody_tpu.scenes import self_gravitating_disc

OUT = os.path.join(os.path.dirname(__file__), "..", "results",
                   "tune_build_1m.jsonl")
N = 1 << 20
L = 7


def emit(rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(rec, flush=True)


@partial(jax.jit, static_argnames=("max_level",))
def build_v2(pos, mass, bounds, max_level):
    """Sort-with-payload build: no post-sort gathers."""
    n = pos.shape[0]
    n_leaf = 8 ** max_level
    gb = grid_bounds(bounds, max_level)
    codes = morton.cell_codes(pos, gb, max_level)
    codes = jnp.where(mass > 0, codes, jnp.int32(n_leaf))
    iota = jnp.arange(n, dtype=jnp.int32)
    code_s, order, xs, ys, zs, ms = jax.lax.sort(
        (codes, iota, pos[:, 0], pos[:, 1], pos[:, 2], mass), num_keys=1
    )
    pos_s = jnp.stack([xs, ys, zs], axis=1)
    seg = partial(jax.ops.segment_sum, segment_ids=code_s,
                  num_segments=n_leaf, indices_are_sorted=True)
    leaf_mass = seg(ms)
    leaf_mpos = seg(pos_s * ms[:, None])
    leaf_counts = seg(jnp.ones_like(code_s))
    return _pyramid_tables(leaf_mass, leaf_mpos, leaf_counts, max_level, 8,
                           pos.dtype)


def main():
    pos, vel, mass = self_gravitating_disc(N - 1, seed=0)
    state = ParticleState.create(pos, vel, mass, capacity=N, dtype=jnp.float32)
    params = SimParams.create(dt=3e-2, g_soft=0.02, theta2=1.0,
                              bounds_width=10.0, dtype=jnp.float32)

    b1 = jax.jit(lambda p, m: build_octree(p, m, params.bounds, L))
    t = b1(state.pos, state.mass)
    float(t.mass_s[0])
    t0 = time.perf_counter()
    for _ in range(5):
        t = b1(state.pos, state.mass)
        float(t.mass_s[0])
    emit({"name": "build_v1_argsort_gather",
          "ms": (time.perf_counter() - t0) / 5 * 1e3})

    out = build_v2(state.pos, state.mass, params.bounds, L)
    float(out[0][0][0])
    t0 = time.perf_counter()
    for _ in range(5):
        out = build_v2(state.pos, state.mass, params.bounds, L)
        float(out[0][0][0])
    emit({"name": "build_v2_payload_sort",
          "ms": (time.perf_counter() - t0) / 5 * 1e3})

    # bh-lazy end-to-end at 1M (group preset matched to the bh engine)
    from nbody_tpu.api import Simulation

    sim = Simulation(
        pos, vel, mass, engine="bh-lazy", capacity=N,
        engine_options=dict(group_size=8192, subgroups=128, chunk_groups=1),
        dt=3e-2, g_soft=0.02, theta2=1.0, bounds_width=10.0,
        dtype=jnp.float32,
    )
    sim.run(10)
    sim.block_until_ready()
    t0 = time.perf_counter()
    sim.run(10)
    sim.block_until_ready()
    emit({"name": "bh_lazy_1m",
          "steps_per_s": 10 / (time.perf_counter() - t0)})


if __name__ == "__main__":
    main()
