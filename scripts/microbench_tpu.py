#!/usr/bin/env python
"""Microbenchmarks of the irregular-memory primitives the BH step is built
from, on the real TPU.  Informs layout choices (8-wide row gathers vs
lane-dense 1-D gathers, segment-sum output sizes, prefix-sum costs) with
measurements instead of pattern-matching — the [N,6] quad segment-sum
regression (CLAUDE.md) showed these calls are NOT predictable from lane
arithmetic alone.

Harness notes (hard-won, see CLAUDE.md):
  * ALL data is built in numpy and device_put once — eager TPU ops pay a
    per-op remote compile; host->device rides a ~MB/s tunnel, so arrays are
    flushed (block_until_ready) before timing.
  * Each case runs REPS iterations inside one jitted lax.fori_loop whose
    gather/scatter indices depend on the loop carry — otherwise XLA hoists
    the loop-invariant op and the loop measures nothing.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

REPS = 20
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "microbench_tpu.jsonl")


_baseline_ms = [0.0]


def bench(name, fn, *args):
    """fn(carry, jitter, *args) -> f32 scalar; ``jitter`` is an i32 in {0,1}
    derived from the carry — mix it into indices so each dispatch depends on
    the previous result (no caching/reordering).  Carried fori_loops with
    gathers hang the axon remote compile, so this times REPS *chained
    dispatches* and subtracts the measured empty-dispatch baseline."""
    @jax.jit
    def step(c, *a):
        jitter = jnp.asarray(c, jnp.int32) & 1
        return fn(c, jitter, *a) * jnp.float32(1e-6)

    for a in args:
        jax.block_until_ready(a)
    c = step(jnp.float32(1.0), *args)
    float(c)  # compile + first-load + sync
    t0 = time.perf_counter()
    for _ in range(REPS):
        c = step(c, *args)
    float(c)
    ms = (time.perf_counter() - t0) * 1e3 / REPS - _baseline_ms[0]
    row = {"name": name, "ms": round(ms, 3), "ts": time.time()}
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def main():
    rng = np.random.default_rng(0)
    N = 1 << 20          # particles
    C = 1 << 21          # leaf cells (8^7)
    F = 262144           # gathered rows per step (walk leaf frontier, all groups)

    t_all = time.perf_counter()
    table = jnp.asarray(rng.standard_normal((C, 8)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, C - 2, F), jnp.int32)
    print(f"# setup A {time.perf_counter()-t_all:.1f}s", flush=True)

    # dispatch-overhead baseline (subtracted from every case)
    bench("empty_dispatch", lambda c, j: c + jnp.float32(j))
    with open(OUT) as f:
        _baseline_ms[0] = json.loads(f.readlines()[-1])["ms"]

    # -- gather layouts ------------------------------------------------------
    bench("gather_rows_8wide_262k_from_2M",
          lambda c, j, t, ix: c + t[ix + j].sum(), table, idx)
    bench("gather_1d_262k_from_2M",
          lambda c, j, t, ix: c + t[:, 0][ix + j].sum(), table, idx)
    bench("gather_8x1d_262k_from_2M",
          lambda c, j, t, ix: c + sum(t[:, k][ix + j].sum()
                                      for k in range(8)), table, idx)

    vals = jnp.asarray(rng.standard_normal(N), jnp.float32)
    bench("gather_1d_262k_from_1M",
          lambda c, j, v, ix: c + v[(ix & (N - 1)) + j].sum(), vals, idx)

    # -- segment sums (sorted ids, the tree-build shape) ---------------------
    seg_np = np.sort(rng.integers(0, C - 2, N)).astype(np.int32)
    seg = jnp.asarray(seg_np)
    seg6 = jnp.asarray(seg_np // 8)
    bench("segsum_1d_1M_into_2M",
          lambda c, j, v, s: c + jax.ops.segment_sum(
              v, s + j, num_segments=C, indices_are_sorted=True).sum(),
          vals, seg)
    bench("segsum_1d_1M_into_262k",
          lambda c, j, v, s: c + jax.ops.segment_sum(
              v, s + j, num_segments=262144, indices_are_sorted=True).sum(),
          vals, seg6)
    vals3 = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)
    bench("segsum_wide3_1M_into_2M",
          lambda c, j, v, s: c + jax.ops.segment_sum(
              v, s + j, num_segments=C, indices_are_sorted=True).sum(),
          vals3, seg)

    # -- scans ---------------------------------------------------------------
    bench("cumsum_1M", lambda c, j, v: c + jnp.cumsum(
        v + c * jnp.float32(1e-9))[-1], vals)

    def df_cumsum(c, j, v):
        # double-float (TwoSum-compensated) prefix sum via associative_scan
        def comb(a, b):
            (ah, al), (bh, bl) = a, b
            s = ah + bh
            z = s - ah
            e = (ah - (s - z)) + (bh - z)
            return s, e + al + bl
        hi, lo = jax.lax.associative_scan(
            comb, (v + c * jnp.float32(1e-9), jnp.zeros_like(v)))
        return c + hi[-1] + lo[-1]
    bench("cumsum_1M_doublefloat", df_cumsum, vals)

    # -- prefix-difference leaf values: 4 quantities x 2 gathers each --------
    pref = jnp.asarray(rng.standard_normal((4, N + 1)), jnp.float32)
    rstart = jnp.asarray(np.searchsorted(
        seg_np, np.arange(C - 2)).astype(np.int32)[rng.integers(0, C - 2, F)])
    bench("leafvals_8x1d_prefix_gathers",
          lambda c, j, p, rs: c + sum(
              (p[q][rs + 1 + j] - p[q][rs + j]).sum() for q in range(4)),
          pref, rstart)

    # -- gather rows for slab assembly (near list) ---------------------------
    pm8 = jnp.asarray(rng.standard_normal((N, 8)), jnp.float32)
    pidx = jnp.asarray(rng.integers(0, N - 2, (128, 8192)), jnp.int32)
    bench("gather_rows_8wide_1M_from_1M",
          lambda c, j, t, ix: c + t[ix + j].sum(), pm8, pidx)

    print(f"# total {time.perf_counter()-t_all:.1f}s", flush=True)


if __name__ == "__main__":
    main()
