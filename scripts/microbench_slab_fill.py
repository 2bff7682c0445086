#!/usr/bin/env python
"""Bound the refined-slab compaction win BEFORE building it (VERDICT r4
#2: 'the refined-near slab is ~60% padding, slab_fill 0.62').

The pair kernel (ops/group_force.py _kernel) already skips whole
all-empty source tiles via pl.when, so the question is what padding
actually COSTS in each placement:

  * dense      — S rows, all occupied (the lower bound)
  * trailing   — same occupied rows, slab padded ~1.6x with all padding
                 at the tail (whole tiles skip; measures skip overhead:
                 DMA + grid steps)
  * interleave — same total rows, padding spread inside each segment so
                 most tiles are PART-filled (the current assembly's worst
                 case; measures what compaction would reclaim)

If trailing ~= dense, whole-tile skip is effectively free and slab
compaction's ceiling is (interleave - dense).  Rows append to
results/slab_fill_tpu.jsonl.  TPU.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from nbody_tpu.ops.group_force import group_force_pallas  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "results", "slab_fill_tpu.jsonl")

G, B = 128, 8192          # the 1M adaptive shape
S_DENSE = 16384           # occupied rows per group
TILE = 2048
PAD_FRACTION = 0.62       # the measured adaptive slab_fill


def make_slab(rng, mode):
    """[G, 8, S] transposed slab in the requested padding placement."""
    occ = S_DENSE
    if mode == "dense":
        S = occ
    else:
        S = int(round(occ / PAD_FRACTION / TILE)) * TILE
    rows = np.zeros((G, S, 8), np.float32)
    data = rng.standard_normal((G, occ, 4)).astype(np.float32)
    data[..., 3] = np.abs(data[..., 3]) + 0.1  # strictly positive masses
    if mode in ("dense", "trailing"):
        rows[:, :occ, :4] = data
    else:  # interleave: two segments, each ~fill-fraction occupied
        half = occ // 2
        seg = S // 2
        rows[:, :half, :4] = data[:, :half]
        rows[:, seg:seg + (occ - half), :4] = data[:, half:]
    return jnp.asarray(np.swapaxes(rows, 1, 2))


def main():
    rng = np.random.default_rng(0)
    tgt = rng.standard_normal((G, B, 8)).astype(np.float32)
    tgt[..., 3] = 1.0
    tgt8 = jnp.asarray(tgt)
    recs = {}
    for mode in ("dense", "trailing", "interleave"):
        slabT = make_slab(rng, mode)
        fn = jax.jit(lambda t, s: group_force_pallas(t, s, 1.0, 0.02,
                                                     tile=TILE))
        acc = fn(tgt8, slabT)
        float(acc[0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(10):
            acc = fn(tgt8, slabT)
            float(acc[0, 0, 0])
        per = (time.perf_counter() - t0) / 10
        recs[mode] = per
        rec = {"mode": mode, "G": G, "B": B, "S": int(slabT.shape[2]),
               "tile": TILE, "occupied": S_DENSE,
               "ms": round(per * 1e3, 2), "ts": time.time()}
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"{mode:10s} S={slabT.shape[2]:6d} {per * 1e3:7.2f} ms",
              flush=True)
    d, t, i = (recs[m] for m in ("dense", "trailing", "interleave"))
    print(f"skip overhead (trailing vs dense): {(t / d - 1) * 100:.1f}%")
    print(f"compaction ceiling (interleave vs trailing): "
          f"{(i / t - 1) * 100:.1f}%", flush=True)


if __name__ == "__main__":
    main()
