#!/usr/bin/env python
"""Microbench: the collect walk's box-distance reduction, [F,S,3]-form vs
per-axis lane-dense form (and a bf16 probe), on the real TPU.

The walk's acceptance test (ops/traversal.py:829-832) computes

    d = max(|com[:, None, :] - gc[None, :, :]| - gh[None, :, :], 0)  # [F,S,3]
    rmin2 = min(sum(d*d, -1), -1)                                    # [F]

inside a vmap over chunk_groups.  The [F, S, 3] intermediate has minor
dimension 3 — the same lane-padding trap this repo already fixed twice
([N,3] scatter -> sort-by-payload; [N,3] leaf segsum -> 3 lane-dense 1-D
segsums).  The per-axis form computes dx, dy, dz as [F, S] arrays (lane
dim = S = 128, fully dense) and is BITWISE exact-equivalent (same adds in
the same order per element).

Shapes mirror the 1M walk: CG=8 chunk groups, S=128 subgroups, F = the
frontier schedule {512 dense start, 512, 512, 1024, 2048}; one "step" of
tensor work = 128/CG map iterations x all levels.  We time 20 fused
repetitions of the full per-chunk level stack and report ms per step.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CG = 8
S = 128
SCHED = (512, 512, 512, 1024, 2048)
N_MAP = 128 // CG  # lax.map iterations per step at 1M
REPS = 20


def form_vec(com, gc, gh):
    d = jnp.maximum(jnp.abs(com[:, :, None, :] - gc[:, None, :, :])
                    - gh[:, None, :, :], 0.0)
    return jnp.min(jnp.sum(d * d, axis=-1), axis=-1)


def form_axis(com, gc, gh):
    r2 = None
    for k in range(3):
        d = jnp.maximum(jnp.abs(com[:, :, k, None] - gc[:, None, :, k])
                        - gh[:, None, :, k], 0.0)
        r2 = d * d if r2 is None else r2 + d * d
    return jnp.min(r2, axis=-1)


def step(fn, coms, gc, gh, cast=None):
    # one walk step's worth of tensor work: N_MAP chunks x the level stack
    def body(carry, _):
        acc = carry
        for com in coms:
            c, h = (gc, gh) if cast is None else (gc.astype(cast),
                                                  gh.astype(cast))
            cm = com if cast is None else com.astype(cast)
            acc = acc + jnp.sum(fn(cm, c, h).astype(jnp.float32))
        return acc, 0
    out, _ = jax.lax.scan(body, jnp.float32(0), None, length=N_MAP)
    return out


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    coms = [jnp.asarray(rng.standard_normal((CG, f, 3)), jnp.float32)
            for f in SCHED]
    gc = jnp.asarray(rng.standard_normal((CG, S, 3)), jnp.float32)
    gh = jnp.asarray(abs(rng.standard_normal((CG, S, 3))) * 0.1, jnp.float32)

    rows = []
    for name, fn, cast in [("vec_f32", form_vec, None),
                           ("axis_f32", form_axis, None),
                           ("axis_bf16", form_axis, jnp.bfloat16),
                           ("vec_bf16", form_vec, jnp.bfloat16)]:
        f = jax.jit(lambda cs, c, h, fn=fn, cast=cast:
                    jax.lax.scan(lambda a, _: (a + step(fn, cs, c, h, cast), 0),
                                 jnp.float32(0), None, length=REPS)[0])
        r = f(coms, gc, gh)
        float(r)  # compile + sync
        t0 = time.perf_counter()
        r = f(coms, gc, gh)
        float(r)
        dt = (time.perf_counter() - t0) / REPS * 1e3
        rows.append({"form": name, "ms_per_step": round(dt, 3)})
        print(json.dumps(rows[-1]), flush=True)

    # bitwise equivalence of the two f32 forms
    a = form_vec(coms[-1], gc, gh)
    b = form_axis(coms[-1], gc, gh)
    same = bool(jnp.all(a == b))
    print(json.dumps({"bitwise_equal_f32": same}), flush=True)

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "results",
            "microbench_walk_dist.jsonl"), "a") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
