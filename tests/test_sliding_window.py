"""Sliding-window (gather-free) slab assembly — ``BHConfig.sliding_window``.

The walk's window start is a static function of the group index except at
the array edges (traversal.py ``_group_collect``); with ``sliding_window``
the clamp is dropped and assembly builds the [G, W, 8] window rows from
three dense shifted reshapes instead of a vmapped ``dynamic_slice`` (an
irregular row gather on TPU).  Claims pinned here:

  * the dense construction equals per-group slices of the zero-padded
    array exactly (helper-level, bitwise);
  * end-to-end forces are bit-identical to the clamped path for every
    particle OUTSIDE the first/last Morton-sorted group (interior groups
    see the same wstart either way);
  * boundary-group particles change ROUTING only: cells the clamp used
    to cover re-enter the standard walk (θ-accepted / opened / near /
    fallback), so their error stays inside the walk's own acceptance
    envelope — but it is NOT roundoff-exact in general (an uncovered
    cell past a Morton octant seam can be far enough to θ-accept);
  * the predicate turns itself off whenever the construction would be
    invalid (clipped window, pad > group, near_sym, wide).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.engines.brute_force import force_dense
from nbody_tpu.ops.tree import build_octree
from nbody_tpu.ops.traversal import (
    BHConfig,
    _sliding_ok,
    _window_rows,
    bh_accel,
    bh_potential,
)
from nbody_tpu.scenes import self_gravitating_disc

CFG = BHConfig(
    max_level=4,
    group_size=512,
    window_pad=128,
    frontier_cap=4096,
    near_cell_cap=2048,
    near_particle_cap=4096,
    accept_cap=2048,
    start_level=1,
    chunk_groups=2,
    sliding_window=True,
)
CFG_OFF = dataclasses.replace(CFG, sliding_window=False)


def disc_state(n, dtype, seed=0):
    pos, vel, mass = self_gravitating_disc(n, seed=seed)
    return ParticleState.create(pos, vel, mass, dtype=dtype)


def test_window_rows_matches_padded_slices():
    """Dense sliding construction == per-group slices of the zero-padded
    source array, bitwise, covered-mass masking included."""
    rng = np.random.default_rng(7)
    B, p, G = 256, 64, 5
    n_tot = B * G
    W = B + 2 * p
    cfg = dataclasses.replace(CFG, group_size=B, window_pad=p)
    assert _sliding_ok(cfg, W)
    pmass8 = rng.normal(size=(n_tot, 8)).astype(np.float32)
    wmask = rng.random((G, W)) < 0.7
    wstart = np.arange(G, dtype=np.int32) * B - p  # unclamped

    got = np.asarray(
        _window_rows(jnp.asarray(pmass8), jnp.asarray(wstart),
                     jnp.asarray(wmask), W, cfg, sliding=True)
    )

    padded = np.concatenate(
        [np.zeros((p, 8), np.float32), pmass8, np.zeros((p, 8), np.float32)]
    )
    want = np.stack([padded[g * B: g * B + W] for g in range(G)])
    want[:, :, 3] = np.where(wmask, want[:, :, 3], 0.0)
    np.testing.assert_array_equal(got, want)


def test_window_rows_sharded_slab_matches_padded_slices():
    """Sharded branch (G_my < G, gstart given): the local-slab
    construction equals the shard's per-group slices of the zero-padded
    full array, bitwise, for every shard including both edges."""
    rng = np.random.default_rng(11)
    B, p, G, G_my = 256, 64, 8, 2
    n_tot = B * G
    W = B + 2 * p
    cfg = dataclasses.replace(CFG, group_size=B, window_pad=p)
    pmass8 = rng.normal(size=(n_tot, 8)).astype(np.float32)
    padded = np.concatenate(
        [np.zeros((p, 8), np.float32), pmass8, np.zeros((p, 8), np.float32)]
    )
    for gfirst in range(0, G, G_my):
        wmask = rng.random((G_my, W)) < 0.7
        gs = np.arange(G_my, dtype=np.int32) * B + gfirst * B
        wstart = gs - p  # unclamped, global
        got = np.asarray(
            _window_rows(jnp.asarray(pmass8), jnp.asarray(wstart),
                         jnp.asarray(wmask), W, cfg, sliding=True,
                         gstart=jnp.asarray(gs))
        )
        want = np.stack(
            [padded[g * B: g * B + W] for g in range(gfirst, gfirst + G_my)]
        )
        want[:, :, 3] = np.where(wmask, want[:, :, 3], 0.0)
        np.testing.assert_array_equal(got, want)


def test_window_rows_zero_pad_degenerates_to_reshape():
    rng = np.random.default_rng(3)
    B, G = 128, 4
    cfg = dataclasses.replace(CFG, group_size=B, window_pad=0)
    pmass8 = rng.normal(size=(B * G, 8)).astype(np.float32)
    wmask = np.ones((G, B), bool)
    wstart = np.arange(G, dtype=np.int32) * B
    got = np.asarray(
        _window_rows(jnp.asarray(pmass8), jnp.asarray(wstart),
                     jnp.asarray(wmask), B, cfg, sliding=True)
    )
    np.testing.assert_array_equal(got, pmass8.reshape(G, B, 8))


def test_predicate_gates():
    W = CFG.group_size + 2 * CFG.window_pad
    assert _sliding_ok(CFG, W)
    # clipped window (small n): W < B + 2p
    assert not _sliding_ok(CFG, W - 128)
    # pad wider than a group: rims would span two neighbor blocks
    wide_pad = dataclasses.replace(CFG, window_pad=CFG.group_size + 128)
    assert not _sliding_ok(wide_pad,
                           wide_pad.group_size + 2 * wide_pad.window_pad)
    # near_sym keeps the clamped path (negative-wstart rim gather)
    assert not _sliding_ok(dataclasses.replace(CFG, near_sym=True), W)
    # wide rows are domain-only; the domain path requires the clamp
    assert not _sliding_ok(dataclasses.replace(CFG, wide=True), W)
    # explicit opt-out
    assert not _sliding_ok(CFG_OFF, W)


def _forces(st, params, cfg):
    acc, stats = bh_accel(
        st.pos, st.effective_mass(), params.bounds, params.theta2,
        params.g, params.g_soft, cfg,
    )
    return np.asarray(acc), stats


def test_end_to_end_interior_bitwise_boundary_enveloped():
    """sliding on/off: interior groups bit-identical (same wstart, same
    routing, same summation).  Boundary groups (the only place the wstart
    formula differs) change ROUTING only — clamp-covered cells re-enter
    the standard walk, where they may be θ-accepted as multipoles rather
    than summed exactly — so they are gated at the walk's own acceptance
    envelope, not roundoff (at this scene/seed the difference happens to
    be ~1e-13, but that is scene-dependent)."""
    st = disc_state(4096, jnp.float64)
    params = SimParams.create(g_soft=0.02, theta2=1.0, dtype=jnp.float64)
    a_on, _ = _forces(st, params, CFG)
    a_off, _ = _forces(st, params, CFG_OFF)

    B = CFG.group_size
    tree = build_octree(st.pos, st.effective_mass(),
                        params.bounds.centered(), CFG.max_level)
    order = np.asarray(tree.order)
    boundary = np.zeros(len(order), bool)
    boundary[order[:B]] = True
    boundary[order[-B:]] = True

    np.testing.assert_array_equal(a_on[~boundary], a_off[~boundary])
    scale = np.linalg.norm(a_off, axis=1) + 1e-12
    err = np.linalg.norm(a_on - a_off, axis=1) / scale
    assert np.quantile(err, 0.99) < 5e-2, np.quantile(err, 0.99)


def test_sliding_matches_dense_envelope():
    """The sliding path holds the usual accuracy envelope vs the dense
    O(N^2) oracle (same gate class as the clamped path's quad tests)."""
    st = disc_state(4096, jnp.float64)
    params = SimParams.create(g_soft=0.02, theta2=1.0, dtype=jnp.float64)
    a_on, stats = _forces(st, params, CFG)
    want = np.asarray(force_dense(st.pos, st.effective_mass(), params))
    alive = np.asarray(st.alive)
    scale = np.linalg.norm(want[alive], axis=1) + 1e-12
    err = np.linalg.norm((a_on - want)[alive], axis=1) / scale
    assert np.quantile(err, 0.99) < 5e-2, np.quantile(err, 0.99)
    assert int(stats["accept_dropped"]) == 0


def test_sliding_sharded_replicated_matches_single():
    """Opt-in sliding on the replicated sharded path exercises
    _window_rows' shard branch (dense leading-axis slice of the full
    window by gstart): 8-way traversal sharding must agree with the
    single-chip sliding run (same unclamped wstart formula on both
    sides, so routing is identical; collective order only)."""
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from nbody_tpu.api import Simulation
    from nbody_tpu.parallel.sharded import ShardedSimulation

    opts = dict(max_level=4, group_size=128, subgroups=8, window_pad=64,
                frontier_cap=2048, accept_cap=1024, near_cell_cap=512,
                near_particle_cap=512, start_level=1, chunk_groups=1,
                sliding_window=True)
    pos, vel, mass = self_gravitating_disc(500, seed=0)
    common = dict(dt=3e-2, g_soft=0.02, theta2=1.0, bounds_width=10.0,
                  dtype=jnp.float64, capacity=1024)
    sharded = ShardedSimulation(pos, vel, mass, engine="bh",
                                strategy="bh-replicated", n_devices=8,
                                engine_options=opts, **common)
    single = Simulation(pos, vel, mass, engine="bh", engine_options=opts,
                        **common)
    sharded.run(5)
    single.run(5)
    ps = sharded.get_points()[0]
    p1 = single.get_points()[0]
    np.testing.assert_allclose(ps, p1, rtol=1e-8, atol=1e-10)


def test_phi_sliding_enveloped():
    """bh_potential: the same routing argument — boundary-group cells that
    lose coverage may be θ-accepted, so U(on) vs U(off) is gated at the
    far-field envelope diluted by the ≤2-of-G affected groups (the
    observed difference at this scene is ~1e-13 relative; the gate leaves
    room for a seed/config where a lost cell accepts)."""
    st = disc_state(4096, jnp.float64)
    params = SimParams.create(g_soft=0.02, theta2=1.0, dtype=jnp.float64)
    u_on, _ = bh_potential(st.pos, st.effective_mass(), params.bounds,
                           params.theta2, params.g, params.g_soft, CFG)
    u_off, _ = bh_potential(st.pos, st.effective_mass(), params.bounds,
                            params.theta2, params.g, params.g_soft, CFG_OFF)
    assert abs(float(u_on) - float(u_off)) < 5e-3 * abs(float(u_off))
