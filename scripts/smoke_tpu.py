#!/usr/bin/env python
"""Pinned on-TPU smoke (VERDICT r2 #5): one command that catches a
Mosaic/kernel regression without the full sweep.

All 100+ CPU tests cover Pallas kernels in interpret mode only — exactly
the layer where real Mosaic lowering has bitten before (SMEM hangs,
narrow-dot miscompiles, (1, 128) mask blocks, scoped-VMEM OOMs).  This
runs the two production paths on the real chip with known-good bounds:

  * brute-pallas @64k x 25 steps — the flagship pair kernel;
  * bh (quad defaults) @131k x 10 steps — tree build + walk + fused slab
    Pallas kernels;
  * a 4k-particle force cross-check of both engines against the XLA f32
    dense sum (catches silent miscompiles, not just crashes/slowdowns).

Perf bounds are LOOSE (tunnel noise is +-8%, and remote-compile latency
degrades over long sessions — CLAUDE.md): they catch 2x regressions, not
5% ones.  Total ~2-4 min after compile cache warmup.  Exit code != 0 on
any violation.  Run: make smoke-tpu
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.core.stepper import make_run
from nbody_tpu.engines import get_engine
from nbody_tpu.scenes import self_gravitating_disc

# (name, engine, n, steps, min_steps_per_s) — floors are ~0.5x the measured
# rates with generous tunnel-noise headroom (round 3: 54.5 @64k
# brute-pallas after the Newton-3 sym kernel, 33.3 @131k bh-quad+dual);
# a floor trip means a REGRESSION (e.g. the sym kernel silently falling
# back), not noise
CASES = [
    ("brute-pallas@64k", "brute-pallas", 1 << 16, 25, 30.0),
    ("bh-quad@131k", "bh", 1 << 17, 10, 16.0),
]


def main() -> int:
    assert jax.default_backend() == "tpu", jax.default_backend()
    params = SimParams.create(dt=3e-2, g_soft=0.02, theta2=1.0,
                              bounds_width=10.0, dtype=jnp.float32)
    failures = []

    # ---- accuracy cross-check @4k: engines vs XLA dense f32 ----
    pos, vel, mass = self_gravitating_disc(4095, seed=0)
    st = ParticleState.create(pos, vel, mass, capacity=4096,
                              dtype=jnp.float32)
    m = st.effective_mass()
    from nbody_tpu.engines.brute_force import force_dense

    ref = np.asarray(jax.jit(force_dense)(st.pos, m, params))
    rn = np.maximum(np.linalg.norm(ref, axis=1), 1e-30)
    for ename in ("brute-pallas", "bh"):
        eng = get_engine(ename)
        acc = np.asarray(jax.jit(eng.force)(st.pos, m, params))
        err = np.linalg.norm(acc - ref, axis=1) / rn
        med = float(np.median(err))
        bound = 1e-4 if ename.startswith("brute") else 5e-3
        ok = np.isfinite(err).all() and med < bound
        print(f"[accuracy] {ename}@4k median rel err {med:.2e} "
              f"(bound {bound:.0e}) {'OK' if ok else 'FAIL'}", flush=True)
        if not ok:
            failures.append(f"accuracy:{ename}")

    # ---- perf floors ----
    for name, ename, n, steps, floor in CASES:
        pos, vel, mass = self_gravitating_disc(n - 1, seed=0)
        state = ParticleState.create(pos, vel, mass, capacity=n,
                                     dtype=jnp.float32)
        run = make_run(get_engine(ename).force)
        t0 = time.perf_counter()
        out = run(state, params, steps)
        float(out.time)  # relay-safe sync
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = run(out, params, steps)
        float(out.time)
        rate = steps / (time.perf_counter() - t0)
        ok = rate >= floor and bool(np.isfinite(np.asarray(out.pos)).all())
        print(f"[perf] {name}: {rate:.1f} steps/s (floor {floor}, "
              f"compile {compile_s:.0f}s) {'OK' if ok else 'FAIL'}",
              flush=True)
        if not ok:
            failures.append(f"perf:{name}")

    # ---- steep-core profiles (round 4, VERDICT r3 #6): dense + adaptive
    # on a 131k Plummer core — steps/s floor plus a sampled-exact accuracy
    # cross-check, so a default change can't silently regress the paths
    # shipped for steep scenes.  Measured 2026-08-20 (v5e, this harness):
    # dense 23.0 steps/s / p99_typ 0.78 — the STATIC stack does not
    # resolve the 131k shoulder (same mechanism as its 1M 0.147; its row
    # here is a regression pin, not an envelope claim).  Round 5: the
    # resolver ships ADAPTIVE_MIDN_OVERRIDES below ADAPTIVE_CUT_MIN_N
    # (midn_adaptive_r5.jsonl: p99 0.0065 @ w40 / 0.0440 @ w10 at
    # 4.0-4.2 force calls/s) — the adaptive bound is the DISC ENVELOPE
    # 5e-2 now (VERDICT r4 #3 'done' criterion), not a 2x-measured pin.
    from nbody_tpu.ops.pairwise import pairwise_acc_pallas_targets
    from nbody_tpu.ops.traversal import resolve_adaptive_overrides
    from nbody_tpu.scenes import plummer_sphere

    n_pl = 1 << 17
    width = 40.0
    pparams = SimParams.create(dt=3e-2, g_soft=0.02, theta2=1.0,
                               bounds_width=width, dtype=jnp.float32)
    pos, vel, mass = plummer_sphere(n_pl, scale=1.0, seed=0)
    keep = np.all(np.abs(np.asarray(pos)) <= width / 2, axis=1)
    pos, vel, mass = pos[keep], vel[keep], mass[keep]
    stp = ParticleState.create(pos, vel, mass, capacity=n_pl,
                               dtype=jnp.float32)
    mp = stp.effective_mass()
    rng = np.random.default_rng(0)
    samp = np.sort(rng.choice(len(pos), 4096, replace=False))
    ref_s = np.asarray(pairwise_acc_pallas_targets(
        stp.pos[samp], stp.pos, mp, pparams.g, pparams.g_soft))
    typ = float(np.median(np.linalg.norm(ref_s, axis=1)))
    for pname, opts, floor, abound in (
            ("bh-dense@131k-plummer", dict(profile="dense"), 11.0, 1.2),
            ("bh-adaptive@131k-plummer",
             dict(profile="adaptive",
                  **resolve_adaptive_overrides(pos, (0., 0., 0.), width)),
             3.0, 5e-2),
    ):
        eng = get_engine("bh", **opts)
        acc = np.asarray(jax.jit(eng.force)(stp.pos, mp, pparams))[samp]
        err = np.linalg.norm(acc - ref_s, axis=1) / typ
        p99 = float(np.percentile(err, 99))
        ok = np.isfinite(err).all() and p99 < abound
        print(f"[accuracy] {pname} sampled p99_typ {p99:.2e} "
              f"(bound {abound:.0e}) {'OK' if ok else 'FAIL'}", flush=True)
        if not ok:
            failures.append(f"accuracy:{pname}")
        run = make_run(eng.force)
        steps = 10
        out = run(stp, pparams, steps)
        float(out.time)
        t0 = time.perf_counter()
        out = run(out, pparams, steps)
        float(out.time)
        rate = steps / (time.perf_counter() - t0)
        ok = rate >= floor and bool(np.isfinite(np.asarray(out.pos)).all())
        print(f"[perf] {pname}: {rate:.1f} steps/s (floor {floor}) "
              f"{'OK' if ok else 'FAIL'}", flush=True)
        if not ok:
            failures.append(f"perf:{pname}")

    if failures:
        print("SMOKE FAILED:", ", ".join(failures))
        return 1
    print("SMOKE OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
