#!/usr/bin/env python
"""A/B the Newton-3 symmetric brute kernel against the plain kernel on the
real TPU (chained dispatches, CLAUDE.md harness rules: numpy + device_put
once, carry-dependent inputs so nothing is hoisted or cached, scalar
transfer as the sync point)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from nbody_tpu.ops.pairwise import pairwise_acc_pallas, pairwise_acc_pallas_sym
from nbody_tpu.scenes import self_gravitating_disc

REPS = 10
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "sym_kernel_tpu.jsonl")


def bench(name, kernel, pos, m, n, n_nominal):
    @jax.jit
    def step(c, pos, m):
        acc = kernel(pos + c * jnp.float32(1e-30), m,
                     jnp.float32(1.0), jnp.float32(0.02))
        return jnp.sum(acc[0])

    c = step(jnp.float32(0.0), pos, m)
    float(c)  # compile + sync
    t0 = time.perf_counter()
    for _ in range(REPS):
        c = step(c, pos, m)
    float(c)
    ms = (time.perf_counter() - t0) * 1e3 / REPS
    # n is the PADDED capacity (the kernel really evaluates the zero-mass
    # padding lanes, so n^2/t is the true lane rate); n_nominal is the
    # scene size a reader comparing against bench.py's "@64k" expects —
    # the nominal-N rate is ~6% lower at 64k.  plain/sym speedups are
    # unaffected (both padded identically).
    row = {"name": name, "n": n, "n_nominal": n_nominal, "ms": round(ms, 3),
           "pairs_per_s": round(n * n / (ms * 1e-3), 3), "ts": time.time()}
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    return ms


def main():
    for n in (65536, 102400, 131072):
        n_nominal = n
        pos_np, _, m_np = self_gravitating_disc(n, seed=7)
        # scene returns n+1 rows (central body); pad to the tile multiple
        # with zero-mass rows at the origin, like capacity padding
        cap = -(-pos_np.shape[0] // 2048) * 2048
        pos_np = np.concatenate(
            [pos_np, np.zeros((cap - pos_np.shape[0], 3), np.float32)])
        m_np = np.concatenate(
            [m_np, np.zeros(cap - m_np.shape[0], np.float32)])
        n = cap
        pos = jax.device_put(jnp.asarray(pos_np, jnp.float32))
        m = jax.device_put(jnp.asarray(m_np, jnp.float32))
        jax.block_until_ready((pos, m))
        a = bench(f"plain_{n}", pairwise_acc_pallas, pos, m, n, n_nominal)
        b = bench(f"sym_{n}", pairwise_acc_pallas_sym, pos, m, n, n_nominal)
        print(json.dumps({"n": n, "speedup": round(a / b, 3)}), flush=True)


if __name__ == "__main__":
    main()
