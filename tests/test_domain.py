"""Memory-scalable multi-chip Barnes-Hut (parallel/domain.py) on the
8-virtual-device CPU mesh.

Round-2 deliverables (VERDICT.md #2, #9): per-chip array shapes must be
O(N/n_dev + halo) — asserted at trace time — and forces must match the
single-chip engine to collective-reduction-order tolerance, including at a
realistic N=131072 with the production auto_for config."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.ops.traversal import BHConfig, bh_accel
from nbody_tpu.parallel.domain import (
    _dist_gather,
    _ring_route,
    build_domain_tree,
    domain_accel,
)
from nbody_tpu.parallel.mesh import PARTICLE_AXIS, make_mesh
from nbody_tpu.scenes import self_gravitating_disc

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

AXIS = PARTICLE_AXIS
NDEV = 8


def _shard_call(fn, mesh, *arrays, out_specs=P(AXIS)):
    sm = jax.shard_map(
        fn, mesh=mesh, in_specs=tuple(P(AXIS) for _ in arrays),
        out_specs=out_specs, check_vma=False,
    )
    return jax.jit(sm)(*arrays)


def test_ring_route_is_a_permutation():
    """Rows delivered to arbitrary global slots across the mesh."""
    mesh = make_mesh(NDEV)
    n = 256
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.standard_normal((n, 4)), jnp.float32)
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))

    def body(r, d):
        return _ring_route(r, d, AXIS, NDEV)

    got = _shard_call(body, mesh, rows, perm)
    want = np.zeros_like(np.asarray(rows))
    want[np.asarray(perm)] = np.asarray(rows)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_dist_gather_matches_local_gather():
    mesh = make_mesh(NDEV)
    n, r = 256, 64
    rng = np.random.default_rng(1)
    rows = jnp.asarray(rng.standard_normal((n, 4)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n, (NDEV * r,)).astype(np.int32))

    def body(rw, ix):
        return _dist_gather(rw, ix, AXIS, NDEV)

    got = _shard_call(body, mesh, rows, idx)
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(rows)[np.asarray(idx)]
    )


def test_domain_tree_matches_single_chip_sort():
    """The distributed histogram sort must reproduce the single-chip stable
    sort permutation exactly; leaf stats up to psum order."""
    from nbody_tpu.ops.tree import build_octree

    pos, vel, mass = self_gravitating_disc(500, seed=2)
    state = ParticleState.create(pos, vel, mass, capacity=1024,
                                 dtype=jnp.float64)
    bounds = SimParams.create(bounds_width=10.0, dtype=jnp.float64).bounds
    m = state.effective_mass()
    level = 4
    mesh = make_mesh(NDEV)
    halo = 64

    ref = jax.jit(lambda p, mm: build_octree(p, mm, bounds, level))(
        state.pos, m)

    def body(p_loc, m_loc):
        t = build_domain_tree(p_loc, m_loc, bounds, level, AXIS, NDEV, halo)
        # trace-time scalability assertions: everything per-particle is
        # O(n_loc + halo)
        n_loc = p_loc.shape[0]
        assert t.rows_s.shape == (n_loc, 8)
        assert t.ext8.shape == (n_loc + 2 * halo, 8)
        return t.rows_s

    rows = _shard_call(body, mesh, state.pos, m)
    # my sorted slice rows: (x, y, z, m, orig, code)
    np.testing.assert_array_equal(
        np.asarray(rows[:, 4]).astype(np.int64), np.asarray(ref.order))
    np.testing.assert_array_equal(
        np.asarray(rows[:, 5]).astype(np.int64), np.asarray(ref.code_s))
    np.testing.assert_array_equal(np.asarray(rows[:, :3]),
                                  np.asarray(ref.pos_s))
    np.testing.assert_array_equal(np.asarray(rows[:, 3]),
                                  np.asarray(ref.mass_s))


def _domain_vs_single(n, capacity, cfg, dtype=jnp.float64, seed=0,
                      rtol=1e-9, atol=1e-12, check_no_fallback=False):
    pos, vel, mass = self_gravitating_disc(n, seed=seed)
    state = ParticleState.create(pos, vel, mass, capacity=capacity,
                                 dtype=dtype)
    params = SimParams.create(dt=3e-2, g_soft=0.02, theta2=1.0,
                              bounds_width=10.0, dtype=dtype)
    m = state.effective_mass()

    acc_ref, stats_ref = jax.jit(
        lambda p, mm: bh_accel(p, mm, params.bounds, params.theta2,
                               params.g, params.g_soft, cfg)
    )(state.pos, m)

    mesh = make_mesh(NDEV)
    n_loc = capacity // NDEV

    def body(p_loc, m_loc):
        assert p_loc.shape == (n_loc, 3)  # trace-time: true shard
        acc, stats = domain_accel(p_loc, m_loc, params.bounds, params.theta2,
                                  params.g, params.g_soft, cfg, AXIS, NDEV)
        assert acc.shape == (n_loc, 3)
        return acc, jax.lax.psum(
            stats["near_fallback"] + stats["fb_spill"], AXIS)

    sm = jax.shard_map(
        body, mesh=mesh, in_specs=(P(AXIS), P(AXIS)),
        out_specs=(P(AXIS), P()), check_vma=False,
    )
    acc, fallbacks = jax.jit(sm)(state.pos, m)
    if check_no_fallback:
        # overflow-free on both sides: the comparison below is then exact
        # walks + exact sums, not two different degradation choices
        assert int(stats_ref["near_fallback"]) == 0
        assert int(stats_ref["fb_spill"]) == 0
        assert int(fallbacks) == 0
    alive = np.asarray(m) > 0
    np.testing.assert_allclose(np.asarray(acc)[alive],
                               np.asarray(acc_ref)[alive],
                               rtol=rtol, atol=atol)


def test_domain_accel_matches_single_chip_small():
    # window (128 + 2*32) <= n_loc (256) so the window/near split is
    # identical on both sides -> agreement to reduction-order tolerance
    cfg = BHConfig(max_level=4, group_size=128, subgroups=8, window_pad=32,
                   accept_cap=1024, near_cell_cap=512, near_particle_cap=512,
                   far_particle_cap=256, far_cell_cap=128,
                   start_level=1, chunk_groups=1)
    _domain_vs_single(500, 2048, cfg)


def test_domain_accel_with_dead_particles():
    """Dead particles (zero mass, sentinel codes) sort to the global tail
    and must not perturb the distributed split."""
    import dataclasses

    pos, vel, mass = self_gravitating_disc(400, seed=3)
    state = ParticleState.create(pos, vel, mass, capacity=2048,
                                 dtype=jnp.float64)
    alive = state.alive.at[5:105].set(False)
    state = dataclasses.replace(state, alive=alive)
    params = SimParams.create(dt=3e-2, g_soft=0.02, theta2=1.0,
                              bounds_width=10.0, dtype=jnp.float64)
    m = state.effective_mass()
    cfg = BHConfig(max_level=4, group_size=128, subgroups=8, window_pad=32,
                   accept_cap=1024, near_cell_cap=512, near_particle_cap=512,
                   far_particle_cap=256, far_cell_cap=128,
                   start_level=1, chunk_groups=1)

    acc_ref, _ = jax.jit(
        lambda p, mm: bh_accel(p, mm, params.bounds, params.theta2,
                               params.g, params.g_soft, cfg)
    )(state.pos, m)
    mesh = make_mesh(NDEV)

    def body(p_loc, m_loc):
        acc, _ = domain_accel(p_loc, m_loc, params.bounds, params.theta2,
                              params.g, params.g_soft, cfg, AXIS, NDEV)
        return acc

    acc = _shard_call(body, mesh, state.pos, m)
    ok = np.asarray(m) > 0
    np.testing.assert_allclose(np.asarray(acc)[ok], np.asarray(acc_ref)[ok],
                               rtol=1e-9, atol=1e-12)


@pytest.mark.slow
def test_domain_accel_realistic_64k():
    """Production-scale config on the virtual mesh (VERDICT.md #9): the
    auto_for preset (group 4096, window 8192 == the 8k shard) exercises
    real chunk partitioning, capacity padding and the far-list collective.

    Budgets are sized so NEITHER side overflows (measured: max near total
    8174 at the default 8192 cap, 119 fallback cells) — overflow would
    compare two different graceful-degradation choices, not the algorithm.
    With zero fallbacks both paths are exact direct sums + identical
    theta walks, so f64 agreement is reduction-order tight."""
    n = 65536
    # block_dual pinned OFF on BOTH sides: the domain path supports dual
    # (parallel/domain.py wires _dual_slab_eval — test above), but its tile
    # boundaries come from per-chip slab assembly and differ from the
    # single-chip grid, so dual-on would compare two DIFFERENT tile-pair
    # acceptance sets (accuracy-level agreement only).  This test pins both
    # exact so f64 agreement stays reduction-order tight; keep the pin.
    cfg = BHConfig.auto_for(n, max_level=6,
                            near_particle_cap=16384, near_cell_cap=4096,
                            far_particle_cap=8192, far_cell_cap=2048,
                            block_dual=False)
    _domain_vs_single(n - 1, n, cfg, dtype=jnp.float64, seed=0,
                      rtol=1e-9, atol=1e-12, check_no_fallback=True)


def test_domain_accel_block_dual():
    """block_dual on the domain-decomposed path (shared _dual_slab_eval).

    Geometry matters for acceptance to fire at test scale: the slab a chip
    assembles is Morton-LOCAL, so a compact scene gives every source tile a
    box overlapping (or hugging) the target tile's box and nothing is ever
    accepted (gap 0 under the box-box rule).  A filament along x — offset
    from the octant planes so Morton order stays monotone in x — makes each
    shard a long thin segment: groups of 128 rows span ~1/4 of it, 128-row
    eval tiles likewise, and far-end (group, tile) pairs pass
    w^2 < margin * theta^2 * gap^2.  Forces must stay inside the BH error
    envelope vs the exact dense sum; psum'd dual_tiles must be > 0."""
    from nbody_tpu.engines.brute_force import force_tiled

    rng = np.random.default_rng(11)
    capacity = 16384
    pos = np.stack(
        [rng.uniform(-5.8, 5.8, capacity),
         2.9 + rng.normal(scale=0.03, size=capacity),
         2.9 + rng.normal(scale=0.03, size=capacity)], axis=1
    ).astype(np.float32)
    mass = rng.uniform(0.5, 1.5, capacity).astype(np.float32)
    state = ParticleState.create(pos, np.zeros_like(pos), mass,
                                 capacity=capacity, dtype=jnp.float32)
    params = SimParams.create(dt=1e-2, g_soft=0.05, theta2=1.0,
                              bounds_width=12.0, dtype=jnp.float32)
    m = state.effective_mass()
    ref = np.asarray(force_tiled(state.pos, m, params))

    # shard 16384/8 = 2048; window (128 + 2*960 = 2048) covers the whole
    # shard = a ~1.45-long filament segment, so the 16 window tiles
    # (~0.2-0.6 x-extent each) give far (group, tile) pairs real gaps
    cfg = BHConfig(group_size=128, subgroups=8, window_pad=960,
                   eval_tile=128, near_particle_cap=2048, near_cell_cap=512,
                   far_particle_cap=256, far_cell_cap=128,
                   frontier_cap=2048, accept_cap=2048, chunk_groups=1,
                   max_level=6, start_level=1, multipole="quad",
                   block_dual=True)
    mesh = make_mesh(NDEV)

    def body(p_loc, m_loc):
        acc, stats = domain_accel(p_loc, m_loc, params.bounds, params.theta2,
                                  params.g, params.g_soft, cfg, AXIS, NDEV)
        return acc, jax.lax.psum(stats["dual_tiles"], AXIS)

    acc, dual_tiles = _shard_call(body, mesh, state.pos, m,
                                  out_specs=(P(AXIS), P()))
    assert int(dual_tiles) > 0, "dual acceptance never fired on the mesh"
    a = np.asarray(acc)
    alive = np.asarray(m) > 0
    rn = np.linalg.norm(ref, axis=1)
    err = np.linalg.norm(a - ref, axis=1)[alive] / np.maximum(rn[alive],
                                                              1e-30)
    assert np.all(np.isfinite(err))
    assert np.median(err) < 2e-3, np.median(err)
    assert np.percentile(err, 99) < 1e-2, np.percentile(err, 99)


def test_sharded_simulation_bh_domain_end_to_end():
    """ShardedSimulation(engine='bh') now runs the domain-decomposed path;
    positions after several steps must track the single-chip engine."""
    from nbody_tpu.api import Simulation
    from nbody_tpu.parallel.sharded import ShardedSimulation

    opts = dict(max_level=4, group_size=128, subgroups=8, window_pad=32,
                accept_cap=1024, near_cell_cap=512, near_particle_cap=512,
                far_particle_cap=256, far_cell_cap=128,
                start_level=1, chunk_groups=1)
    pos, vel, mass = self_gravitating_disc(500, seed=0)
    common = dict(dt=3e-2, g_soft=0.02, theta2=1.0, bounds_width=10.0,
                  dtype=jnp.float64, capacity=2048)
    sharded = ShardedSimulation(pos, vel, mass, engine="bh", n_devices=8,
                                engine_options=opts, **common)
    single = Simulation(pos, vel, mass, engine="bh", engine_options=opts,
                        **common)
    sharded.run(5)
    single.run(5)
    ps, _, _, _ = sharded.get_points()
    p1, _, _, _ = single.get_points()
    assert sharded.n_alive == single.n_alive
    np.testing.assert_allclose(ps, p1, rtol=1e-8, atol=1e-10)


def test_wide_decode_roundtrip():
    """Wide hi/lo range encoding is exact for starts/ends up to 2^31."""
    from nbody_tpu.ops import tree as tree_mod

    counts = jnp.asarray(
        [0, 3, (1 << 24) + 5, 7, (1 << 26) - 1, 0, 2, 1], jnp.int32
    )
    leaf_mpos = jnp.zeros((8, 3), jnp.float32)
    # counts ride in as int32 (exactly how the domain build passes them —
    # an f32 cast here would corrupt the >2^24 values before the builder)
    _, _, tables, _ = tree_mod._pyramid_tables(
        counts.astype(jnp.float32), leaf_mpos,
        counts, 1, 8, jnp.float32, wide=True,
    )
    ends = np.cumsum(np.asarray(counts, np.int64))
    starts = ends - np.asarray(counts, np.int64)
    cs, ce = tree_mod.decode_ranges(tables[1], True)
    np.testing.assert_array_equal(np.asarray(cs, np.int64), starts)
    np.testing.assert_array_equal(np.asarray(ce, np.int64), ends)
    # narrow tables at the same small values agree with the wide decode
    _, _, tnarrow, _ = tree_mod._pyramid_tables(
        jnp.asarray([1, 2, 3, 4, 0, 0, 5, 6], jnp.float32),
        leaf_mpos, jnp.asarray([1, 2, 3, 4, 0, 0, 5, 6], jnp.float32),
        1, 8, jnp.float32, wide=False,
    )
    _, _, twide, _ = tree_mod._pyramid_tables(
        jnp.asarray([1, 2, 3, 4, 0, 0, 5, 6], jnp.float32),
        leaf_mpos, jnp.asarray([1, 2, 3, 4, 0, 0, 5, 6], jnp.float32),
        1, 8, jnp.float32, wide=True,
    )
    for lvl in range(2):
        ncs, nce = tree_mod.decode_ranges(tnarrow[lvl], False)
        wcs, wce = tree_mod.decode_ranges(twide[lvl], True)
        np.testing.assert_array_equal(np.asarray(ncs), np.asarray(wcs))
        np.testing.assert_array_equal(np.asarray(nce), np.asarray(wce))


def test_domain_accel_wide_matches_narrow(monkeypatch):
    """Forced-on wide row format (N >= 2^24 path) at small N: the hi/lo
    range encoding, Morton-prefix fb containment, retired idx columns and
    (chip, slot) return routing must reproduce the narrow f32 result.

    mxu_blocks is pinned off so both sides run the d-form XLA eval:
    the dropped index compare is then exactly free (self-pairs contribute
    0 through d = 0) and the comparison is ulp-tight.  (Wide mode forces
    the d-form regardless — see _slab_eval — because the norm-trick form's
    un-skipped self-term cancellation is unbounded for heavy particles.)"""
    from nbody_tpu.ops import tree as tree_mod

    n, capacity = 700, 2048
    cfg = BHConfig(max_level=4, group_size=128, subgroups=8, window_pad=32,
                   accept_cap=1024, near_cell_cap=512, near_particle_cap=512,
                   far_particle_cap=256, far_cell_cap=128,
                   start_level=1, chunk_groups=1, fb_cap=64,
                   mxu_blocks=False)
    pos, vel, mass = self_gravitating_disc(n, seed=1)
    state = ParticleState.create(pos, vel, mass, capacity=capacity,
                                 dtype=jnp.float32)
    params = SimParams.create(dt=3e-2, g_soft=0.02, theta2=1.0,
                              bounds_width=10.0, dtype=jnp.float32)
    m = state.effective_mass()
    mesh = make_mesh(NDEV)

    def run():
        def body(p_loc, m_loc):
            acc, stats = domain_accel(
                p_loc, m_loc, params.bounds, params.theta2,
                params.g, params.g_soft, cfg, AXIS, NDEV)
            return acc, jax.lax.psum(
                stats["near_fallback"] + stats["fb_spill"]
                + stats["frontier_fallback"], AXIS)
        sm = jax.shard_map(
            body, mesh=mesh, in_specs=(P(AXIS), P(AXIS)),
            out_specs=(P(AXIS), P()), check_vma=False,
        )
        return jax.jit(sm)(state.pos, m)

    acc_narrow, fb_narrow = run()
    assert not tree_mod.wide_ranges(capacity, jnp.float32)
    monkeypatch.setattr(tree_mod, "WIDE_N", 1)
    acc_wide, fb_wide = run()
    assert tree_mod.wide_ranges(capacity, jnp.float32)

    assert int(fb_narrow) == int(fb_wide)
    alive = np.asarray(m) > 0
    a_n, a_w = np.asarray(acc_narrow)[alive], np.asarray(acc_wide)[alive]
    scale = np.abs(a_n).max()
    np.testing.assert_allclose(a_w, a_n, rtol=1e-6, atol=1e-6 * scale)


def test_domain_accel_wide_with_fallback_pressure(monkeypatch):
    """Wide mode under budget overflow: the Morton-prefix containment must
    self-exclude exactly where the narrow index-range compare did, so the
    fallback (fb slab) forces agree too.  Tiny caps force fb traffic."""
    from nbody_tpu.ops import tree as tree_mod

    n, capacity = 700, 2048
    cfg = BHConfig(max_level=4, group_size=128, subgroups=8, window_pad=32,
                   accept_cap=64, near_cell_cap=16, near_particle_cap=64,
                   far_particle_cap=64, far_cell_cap=16,
                   start_level=1, chunk_groups=1, fb_cap=256,
                   mxu_blocks=False)
    pos, vel, mass = self_gravitating_disc(n, seed=2)
    state = ParticleState.create(pos, vel, mass, capacity=capacity,
                                 dtype=jnp.float32)
    params = SimParams.create(dt=3e-2, g_soft=0.02, theta2=1.0,
                              bounds_width=10.0, dtype=jnp.float32)
    m = state.effective_mass()
    mesh = make_mesh(NDEV)

    def run():
        def body(p_loc, m_loc):
            acc, stats = domain_accel(
                p_loc, m_loc, params.bounds, params.theta2,
                params.g, params.g_soft, cfg, AXIS, NDEV)
            return acc, jax.lax.psum(stats["near_fallback"], AXIS)
        sm = jax.shard_map(
            body, mesh=mesh, in_specs=(P(AXIS), P(AXIS)),
            out_specs=(P(AXIS), P()), check_vma=False,
        )
        return jax.jit(sm)(state.pos, m)

    acc_narrow, nf_narrow = run()
    assert int(nf_narrow) > 0  # the tiny caps actually bite
    monkeypatch.setattr(tree_mod, "WIDE_N", 1)
    acc_wide, nf_wide = run()

    assert int(nf_narrow) == int(nf_wide)
    alive = np.asarray(m) > 0
    a_n, a_w = np.asarray(acc_narrow)[alive], np.asarray(acc_wide)[alive]
    scale = np.abs(a_n).max()
    np.testing.assert_allclose(a_w, a_n, rtol=1e-6, atol=1e-6 * scale)


@pytest.mark.slow
def test_domain_accel_preset_accuracy_gate():
    """Accuracy gate for the SHIPPED preset family on the domain path.

    The round-3 cut presets (block-dual + near-cap + window-pad) were
    accuracy-gated on the single-chip path (VALIDATION.md §8/§9); the
    domain path shares the traversal/eval code but assembles slabs from
    per-chip Morton ranges, so its tile boundaries — and therefore its
    acceptance sets — differ.  This gates the domain path's force error
    against exact dense truth at the mid-tier preset (group 4096, dual,
    cap 2048, pad 1024 — what ShardedSimulation resolves above 32k per
    chip), requiring p99 within 2x the single-chip error at the SAME
    preset and inside an absolute envelope consistent with the CPU gates
    (accuracy_wp_cpu.jsonl: mid-config p99 4.4e-3 at 65k)."""
    from nbody_tpu.engines.brute_force import force_tiled

    n = 65536
    cfg = BHConfig.auto_for(262144)  # the >32k..262k tier preset
    assert cfg.block_dual and cfg.near_particle_cap == 2048
    pos, vel, mass = self_gravitating_disc(n - 1, seed=0)
    state = ParticleState.create(pos, vel, mass, capacity=n,
                                 dtype=jnp.float32)
    params = SimParams.create(dt=3e-2, g_soft=0.02, theta2=1.0,
                              bounds_width=10.0, dtype=jnp.float32)
    m = state.effective_mass()

    acc_true = np.asarray(force_tiled(state.pos, m, params))

    acc_single = np.asarray(jax.jit(
        lambda p, mm: bh_accel(p, mm, params.bounds, params.theta2,
                               params.g, params.g_soft, cfg)[0]
    )(state.pos, m))

    mesh = make_mesh(NDEV)
    n_loc = n // NDEV

    def body(p_loc, m_loc):
        assert p_loc.shape == (n_loc, 3)
        acc, _stats = domain_accel(p_loc, m_loc, params.bounds,
                                   params.theta2, params.g, params.g_soft,
                                   cfg, AXIS, NDEV)
        return acc

    sm = jax.shard_map(body, mesh=mesh, in_specs=(P(AXIS), P(AXIS)),
                       out_specs=P(AXIS), check_vma=False)
    acc_domain = np.asarray(jax.jit(sm)(state.pos, m))

    alive = np.asarray(m) > 0
    scale = np.linalg.norm(acc_true[alive], axis=1)
    floor = np.percentile(scale, 1)

    def p99(acc):
        err = np.linalg.norm(acc[alive] - acc_true[alive], axis=1)
        return np.percentile(err / np.maximum(scale, floor), 99)

    e_single, e_domain = p99(acc_single), p99(acc_domain)
    print(f"p99 rel err: single {e_single:.3e}, domain {e_domain:.3e}")
    assert e_domain < 2e-2  # absolute envelope (CPU gates: ~4.4e-3 @65k)
    assert e_domain <= 2.0 * max(e_single, 1e-4)


def test_domain_adaptive_straddling_cell_degrades_gracefully():
    """A flagged cell whose sorted range crosses a chip boundary cannot be
    refined on the domain path (its deep order is only piecewise sorted);
    it must keep the unrefined near/fallback path — counted in
    refine_stats[1] — with forces still inside the walk's envelope."""
    mesh = make_mesh(NDEV)
    n = 1024  # n_loc = 128
    rng = np.random.default_rng(7)
    # 600-particle point cluster: one leaf cell at max_level=3 whose range
    # (600 rows) necessarily spans several 128-row shards -> guaranteed straddle
    cluster = (0.05 * rng.standard_normal((600, 3)) + 1.0)
    rest = rng.uniform(-4.0, 4.0, (n - 600, 3))
    pos = jnp.asarray(np.concatenate([cluster, rest]), jnp.float64)
    mass = jnp.asarray(rng.uniform(0.5, 1.5, (n,)), jnp.float64)
    params = SimParams.create(g_soft=0.05, theta2=1.0, bounds_width=10.0,
                              dtype=jnp.float64)
    cfg = BHConfig(max_level=3, group_size=128, subgroups=8, window_pad=32,
                   frontier_cap=512, accept_cap=512, near_cell_cap=256,
                   near_particle_cap=512, far_cell_cap=64,
                   far_particle_cap=256, start_level=1, chunk_groups=1,
                   refine_levels=2, refine_cap=64, refine_threshold=64,
                   refine_frontier=128, refine_near_cell_cap=128,
                   refine_near_particle_cap=512, refine_far_cell_cap=64,
                   refine_far_particle_cap=256)

    def make_body(c):
        def body(p_loc, m_loc):
            acc, stats = domain_accel(p_loc, m_loc, params.bounds,
                                      params.theta2, params.g,
                                      params.g_soft, c, AXIS, NDEV)
            return acc, stats.get("refine_build_dropped",
                                  jnp.zeros((), jnp.int32))
        return body

    def run(c):
        sm = jax.shard_map(make_body(c), mesh=mesh,
                           in_specs=(P(AXIS), P(AXIS)),
                           out_specs=(P(AXIS), P()), check_vma=False)
        acc, dropped = jax.jit(sm)(pos, mass)
        return np.asarray(acc), int(dropped)

    acc, dropped = run(cfg)
    assert dropped >= 1  # the cluster cell was flagged and skipped
    assert np.all(np.isfinite(acc))

    # graceful degradation contract: the straddled cell keeps the
    # UNREFINED path, so the adaptive run must be no worse than the
    # refine_levels=0 run on the same scene/config.  (An absolute
    # envelope would be wrong here: the cluster's own members see their
    # whole neighborhood as one self-excluded multipole in BOTH runs —
    # exactly the §18 steep-core mechanism adaptive exists to fix, which
    # a straddled cell legitimately cannot.)
    acc0, dropped0 = run(dataclasses.replace(
        cfg, refine_levels=0, refine_threshold=0))
    p = np.asarray(pos)
    m = np.asarray(mass)
    d = p[None, :, :] - p[:, None, :]
    r2 = (d * d).sum(-1) + float(params.g_soft) ** 2
    inv = r2 ** -1.5
    np.fill_diagonal(inv, 0.0)
    ref = (d * (m[None, :, None] * inv[:, :, None])).sum(1)
    scale = np.linalg.norm(ref, axis=1)
    typ = np.median(scale)

    def p99(a):
        return np.percentile(
            np.linalg.norm(a - ref, axis=1) / np.maximum(scale, typ), 99)

    e_ada, e_unref = p99(acc), p99(acc0)
    # adaptive (with the straddled cell degraded) still refines every
    # non-straddling flagged cell, so it must not be WORSE than unrefined
    assert e_ada <= 1.05 * e_unref, (e_ada, e_unref)
