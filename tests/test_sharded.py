"""Multi-chip particle sharding on the 8-device virtual CPU mesh:
collectives-based force strategies must agree with single-device engines."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.api import Simulation
from nbody_tpu.parallel.sharded import ShardedSimulation
from nbody_tpu.scenes import self_gravitating_disc

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

BH_OPTS = dict(max_level=4, group_size=128, subgroups=8, window_pad=64,
               frontier_cap=2048, accept_cap=1024, near_cell_cap=512,
               near_particle_cap=512, start_level=1, chunk_groups=1)


def run_pair(engine, strategy=None, steps=10, n=500, capacity=1024,
             **engine_options):
    pos, vel, mass = self_gravitating_disc(n, seed=0)
    # identical capacity on both sides: BH group partitioning depends on the
    # padded size, and approximation differences amplify chaotically
    common = dict(dt=3e-2, g_soft=0.02, theta2=1.0, bounds_width=10.0,
                  dtype=jnp.float64, capacity=capacity)
    kw = dict(engine=engine, n_devices=8, **common)
    if strategy:
        kw["strategy"] = strategy
    if engine_options:
        kw["engine_options"] = engine_options
    sharded = ShardedSimulation(pos, vel, mass, **kw)
    single = Simulation(pos, vel, mass, engine=engine,
                        engine_options=engine_options or None, **common)
    sharded.run(steps)
    single.run(steps)
    ps, _, _, _ = sharded.get_points()
    p1, _, _, _ = single.get_points()
    return ps, p1, sharded, single


def test_allgather_matches_single():
    ps, p1, sh, si = run_pair("brute", "allgather")
    assert sh.n_alive == si.n_alive
    np.testing.assert_allclose(ps, p1, rtol=1e-9, atol=1e-11)


def test_ring_matches_single():
    ps, p1, sh, si = run_pair("brute", "ring")
    assert sh.n_alive == si.n_alive
    np.testing.assert_allclose(ps, p1, rtol=1e-9, atol=1e-11)


def test_sharded_bh_matches_single():
    # capacity 2048 -> 256-particle shards: the 128+2*64 window fits each
    # shard, so the domain-decomposed split is identical to single-chip
    ps, p1, sh, si = run_pair("bh", steps=5, capacity=2048, **BH_OPTS)
    assert sh.n_alive == si.n_alive
    # same tree, same traversal parameters -> identical up to collective
    # reduction order
    np.testing.assert_allclose(ps, p1, rtol=1e-8, atol=1e-10)


def test_sharded_bh_replicated_strategy_matches_single():
    """The round-1 all-gather path stays available as 'bh-replicated'."""
    ps, p1, sh, si = run_pair("bh", "bh-replicated", steps=5, **BH_OPTS)
    assert sh.n_alive == si.n_alive
    np.testing.assert_allclose(ps, p1, rtol=1e-8, atol=1e-10)


def test_sharded_tree_build_matches_single():
    """build_octree_sharded (inside shard_map) must reproduce build_octree:
    identical sort permutation / ranges, leaf stats equal up to psum order."""
    from jax.sharding import PartitionSpec as P

    from nbody_tpu.core.state import ParticleState, SimParams
    from nbody_tpu.ops.tree import build_octree, build_octree_sharded
    from nbody_tpu.parallel.mesh import PARTICLE_AXIS, make_mesh

    pos, vel, mass = self_gravitating_disc(500, seed=2)
    state = ParticleState.create(pos, vel, mass, capacity=1024,
                                 dtype=jnp.float64)
    bounds = SimParams.create(bounds_width=10.0, dtype=jnp.float64).bounds
    mass_eff = state.effective_mass()
    level = 4

    ref = jax.jit(
        lambda p, m: build_octree(p, m, bounds, level)
    )(state.pos, mass_eff)

    mesh = make_mesh(8)
    axis = PARTICLE_AXIS

    def local_build(pos_loc, mass_loc):
        pos_all = jax.lax.all_gather(pos_loc, axis, tiled=True)
        mass_all = jax.lax.all_gather(mass_loc, axis, tiled=True)
        return build_octree_sharded(
            pos_loc, mass_loc, pos_all, mass_all, bounds, level, axis
        )

    got = jax.jit(
        jax.shard_map(
            local_build, mesh=mesh, in_specs=(P(axis), P(axis)),
            out_specs=P(), check_vma=False,
        )
    )(state.pos, mass_eff)

    np.testing.assert_array_equal(np.asarray(got.order), np.asarray(ref.order))
    np.testing.assert_array_equal(np.asarray(got.code_s), np.asarray(ref.code_s))
    np.testing.assert_array_equal(
        np.asarray(got.leaf_starts), np.asarray(ref.leaf_starts)
    )
    np.testing.assert_allclose(
        np.asarray(got.pos_s), np.asarray(ref.pos_s), rtol=0, atol=0
    )
    for l in range(level + 1):
        np.testing.assert_allclose(
            np.asarray(got.level_table[l]), np.asarray(ref.level_table[l]),
            rtol=1e-12, atol=1e-14,
        )


def test_sharded_settings_and_reset():
    pos, vel, mass = self_gravitating_disc(300, seed=1)
    sim = ShardedSimulation(pos, vel, mass, engine="brute", n_devices=8,
                            dt=3e-2, g_soft=0.02, dtype=jnp.float64)
    sim.run(3)
    assert sim.elapsed > 0
    sim.set_settings(dt=1e-3)
    sim.step()
    sim.reset()
    assert sim.elapsed == 0.0
    assert sim.n_alive == 301


def test_sharded_energy_matches_replicated():
    """Ring pair-potential on the mesh == single-device total_energy."""
    from nbody_tpu.core.energy import total_energy

    pos, vel, mass = self_gravitating_disc(400, seed=4)
    sim = ShardedSimulation(pos, vel, mass, engine="brute", n_devices=8,
                            dt=3e-2, g_soft=0.02, dtype=jnp.float64)
    single = Simulation(pos, vel, mass, engine="brute", dt=3e-2, g_soft=0.02,
                        dtype=jnp.float64)
    np.testing.assert_allclose(sim.energy(), single.energy(),
                               rtol=1e-12, atol=1e-12)
    sim.run(3)
    single.run(3)
    np.testing.assert_allclose(sim.energy(), single.energy(),
                               rtol=1e-10, atol=1e-12)


def test_sharded_add_remove_point():
    pos, vel, mass = self_gravitating_disc(100, seed=5)
    sim = ShardedSimulation(pos, vel, mass, engine="brute", n_devices=8,
                            dt=3e-2, g_soft=0.02, dtype=jnp.float64,
                            capacity=256)
    n0 = sim.n_alive
    sim.add_point([0.5, 0.5, 0.0], [0.0, 0.0, 0.0], 1e-3)
    assert sim.n_alive == n0 + 1
    sim.remove_point(0)
    assert sim.n_alive == n0
    # still steps fine afterwards, arrays still sharded
    sim.run(2)
    assert sim.elapsed > 0
    assert not sim.state.pos.sharding.is_fully_replicated


def test_sharded_save_load_roundtrip(tmp_path):
    pos, vel, mass = self_gravitating_disc(200, seed=6)
    sim = ShardedSimulation(pos, vel, mass, engine="brute", n_devices=8,
                            dt=3e-2, g_soft=0.02, dtype=jnp.float64)
    sim.run(3)

    for fmt, path in (("orbax", tmp_path / "ck_orbax"),
                      ("pickle", tmp_path / "ck.pkl")):
        want_pos, _, _, _ = sim.get_points()
        want_t = sim.elapsed
        sim.save(str(path), format=fmt)
        sim.run(4)  # diverge
        sim.load(str(path), format=fmt)
        got_pos, _, _, _ = sim.get_points()
        np.testing.assert_array_equal(got_pos, want_pos)
        assert sim.elapsed == want_t
        # restored arrays keep the particle-axis sharding
        assert not sim.state.pos.sharding.is_fully_replicated
        sim.run(1)  # still steppable


def test_sharded_aux_tree_boxes():
    opts = dict(max_level=4, group_size=128, subgroups=8, window_pad=32,
                near_particle_cap=512, near_cell_cap=256, start_level=1)
    pos, vel, mass = self_gravitating_disc(300, seed=7)
    sim = ShardedSimulation(pos, vel, mass, engine="bh", n_devices=8,
                            engine_options=opts, dt=3e-2, g_soft=0.02,
                            theta2=1.0, dtype=jnp.float64, capacity=1024)
    aux = sim.aux()
    assert "tree_boxes" in aux
    mins, maxs, count = aux["tree_boxes"][0]
    assert count >= 1
    assert aux["accept_dropped"] == 0


def test_sharded_bh_auto_preset():
    """With no group keys in engine_options, ShardedSimulation resolves the
    capacity-adaptive preset from the PER-CHIP shard (raw field defaults
    used to silently drop block-dual + the tuned cuts on multi-chip runs);
    profile='accurate' restores the round-2 window pad."""
    from nbody_tpu.ops.traversal import BHConfig
    from nbody_tpu.parallel.sharded import ShardedSimulation

    pos, vel, mass = self_gravitating_disc(2000, seed=3)
    sim = ShardedSimulation(pos, vel, mass, engine="bh", n_devices=8,
                            dt=3e-2, g_soft=0.02, theta2=1.0,
                            dtype=jnp.float32)
    per_chip = -(-len(mass) // 8)
    expect = BHConfig.auto_for(per_chip)
    assert sim._bh_config.group_size == expect.group_size
    assert sim._bh_config.block_dual == expect.block_dual
    assert sim._bh_config.near_particle_cap == expect.near_particle_cap
    sim.run(2)
    p, _, _, _ = sim.get_points()
    assert np.all(np.isfinite(p))

    acc = ShardedSimulation(pos, vel, mass, engine="bh", n_devices=8,
                            engine_options=dict(profile="accurate"),
                            dt=3e-2, g_soft=0.02, theta2=1.0,
                            dtype=jnp.float32)
    assert acc._bh_config.window_pad == 2048


def test_sharded_dense_profile_and_strategy_validation():
    """profile='dense' reaches the sharded BHConfig in both the auto-preset
    and explicit-group spellings (same DENSE_OVERRIDES constant as the
    single-chip engine); a bh strategy with a brute engine is rejected
    instead of silently dispatching domain_accel with a raw BHConfig."""
    from nbody_tpu.ops.traversal import DENSE_OVERRIDES
    from nbody_tpu.parallel.sharded import ShardedSimulation

    pos, vel, mass = self_gravitating_disc(2000, seed=3)
    common = dict(dt=3e-2, g_soft=0.02, theta2=1.0, dtype=jnp.float32)
    auto = ShardedSimulation(pos, vel, mass, engine="bh", n_devices=8,
                             engine_options=dict(profile="dense"), **common)
    manual = ShardedSimulation(
        pos, vel, mass, engine="bh", n_devices=8,
        engine_options=dict(profile="dense", group_size=128, subgroups=8,
                            chunk_groups=1, window_pad=64, start_level=1),
        **common)
    for k, v in DENSE_OVERRIDES.items():
        assert getattr(auto._bh_config, k) == v, k
        assert getattr(manual._bh_config, k) == v, k

    with pytest.raises(ValueError, match="requires engine"):
        ShardedSimulation(pos, vel, mass, engine="brute", strategy="bh",
                          n_devices=8, **common)
    # density-adaptive refinement rides the bh strategies only; a strategy
    # with no refined-table route must fail loudly instead of silently
    # dropping the accuracy the profile exists for
    with pytest.raises(ValueError, match="adaptive"):
        ShardedSimulation(pos, vel, mass, engine="bh", strategy="ring",
                          n_devices=8,
                          engine_options=dict(profile="adaptive"), **common)


# ---- density-adaptive refinement on the mesh (round 4) ---------------------

# small refined stack that actually fires on the 500-particle disc: leaf
# cells at max_level=4 hold tens of particles, threshold 16 flags the disc
# core without any flagged range straddling a 512-row chip boundary
# (asserted via refine_build_dropped == 0 where the test's premise needs it)
ADA_OPTS = dict(refine_levels=2, refine_cap=64, refine_threshold=16,
                refine_frontier=256, refine_near_cell_cap=512,
                refine_near_particle_cap=1024, refine_far_cell_cap=128,
                refine_far_particle_cap=512, **BH_OPTS)


def test_sharded_tree_build_refined_matches_single():
    """build_octree_sharded with refine_levels > 0: the replicated refined
    build must match build_octree BIT-IDENTICALLY (same deep sort, same
    prefix sums on identical replicated inputs) — ADVICE r3 #2."""
    from jax.sharding import PartitionSpec as P

    from nbody_tpu.core.state import ParticleState, SimParams
    from nbody_tpu.ops.tree import build_octree, build_octree_sharded
    from nbody_tpu.parallel.mesh import PARTICLE_AXIS, make_mesh

    pos, vel, mass = self_gravitating_disc(500, seed=2)
    state = ParticleState.create(pos, vel, mass, capacity=1024,
                                 dtype=jnp.float64)
    bounds = SimParams.create(bounds_width=10.0, dtype=jnp.float64).bounds
    mass_eff = state.effective_mass()
    level = 4
    rkw = dict(refine_levels=2, refine_cap=64, refine_threshold=16)

    ref = jax.jit(
        lambda p, m: build_octree(p, m, bounds, level, **rkw)
    )(state.pos, mass_eff)
    assert int(ref.refine_stats[0]) > 0  # the premise: refinement fired

    mesh = make_mesh(8)
    axis = PARTICLE_AXIS

    def local_build(pos_loc, mass_loc):
        pos_all = jax.lax.all_gather(pos_loc, axis, tiled=True)
        mass_all = jax.lax.all_gather(mass_loc, axis, tiled=True)
        return build_octree_sharded(
            pos_loc, mass_loc, pos_all, mass_all, bounds, level, axis, **rkw
        )

    got = jax.jit(
        jax.shard_map(
            local_build, mesh=mesh, in_specs=(P(axis), P(axis)),
            out_specs=P(), check_vma=False,
        )
    )(state.pos, mass_eff)

    np.testing.assert_array_equal(np.asarray(got.order), np.asarray(ref.order))
    np.testing.assert_array_equal(
        np.asarray(got.refine_slot_leaf), np.asarray(ref.refine_slot_leaf))
    np.testing.assert_array_equal(
        np.asarray(got.refine_stats), np.asarray(ref.refine_stats))
    for r in range(2):
        np.testing.assert_array_equal(
            np.asarray(got.refine_tables[r]), np.asarray(ref.refine_tables[r]))
    np.testing.assert_array_equal(
        np.asarray(got.refine_child_slot[0]),
        np.asarray(ref.refine_child_slot[0]))


def test_sharded_adaptive_replicated_matches_single():
    """profile-free adaptive spelling (explicit refine options) on the
    REPLICATED strategy: same refined build, same walk -> parity with the
    single-chip adaptive engine."""
    ps, p1, sh, si = run_pair("bh", "bh-replicated", steps=5, capacity=2048,
                              **ADA_OPTS)
    assert sh.n_alive == si.n_alive
    np.testing.assert_allclose(ps, p1, rtol=1e-8, atol=1e-10)


def test_sharded_adaptive_domain_matches_single():
    """Adaptive refinement on the DOMAIN path (round 4): per-owner-chip
    refined build + refined local/far slab routes.  The deep re-sort is
    stable on both sides, so refined ranges are identical and forces agree
    up to collective summation order — PROVIDED no flagged cell straddles
    a chip boundary (straddlers legitimately keep the unrefined path,
    which differs by theta-level approximation, so the premise is
    asserted explicitly below)."""
    from nbody_tpu.core.state import ParticleState, SimParams
    from nbody_tpu.ops.tree import build_octree

    pos, vel, mass = self_gravitating_disc(500, seed=0)
    st = ParticleState.create(pos, vel, mass, capacity=2048,
                              dtype=jnp.float64)
    bounds = SimParams.create(bounds_width=10.0, dtype=jnp.float64).bounds
    tree = build_octree(st.pos - bounds.center, st.effective_mass(),
                        bounds.centered(), ADA_OPTS["max_level"])
    starts = np.asarray(tree.leaf_starts)
    s, e = starts[:-1], starts[1:]
    flagged = (e - s) > ADA_OPTS["refine_threshold"]
    n_loc = 2048 // 8
    assert flagged.any()  # refinement fires on this scene
    assert np.all((s[flagged] // n_loc) == ((e[flagged] - 1) // n_loc)), (
        "test premise broken: a flagged cell straddles a chip boundary — "
        "pick a different seed/threshold")

    ps, p1, sh, si = run_pair("bh", "bh", steps=5, capacity=2048, **ADA_OPTS)
    assert sh.n_alive == si.n_alive
    np.testing.assert_allclose(ps, p1, rtol=1e-8, atol=1e-10)


def test_sharded_adaptive_profile_resolves():
    """profile='adaptive' resolves a refined stack on the sharded path
    (per-chip preset + per-scene deep/tight choice), mirroring the
    single-chip engine spelling."""
    from nbody_tpu.ops.traversal import resolve_adaptive_overrides

    pos, vel, mass = self_gravitating_disc(2000, seed=3)
    ov = resolve_adaptive_overrides(pos, (0.0, 0.0, 0.0), 10.0)
    sim = ShardedSimulation(pos, vel, mass, engine="bh", n_devices=8,
                            engine_options=dict(profile="adaptive"),
                            dt=3e-2, g_soft=0.02, theta2=1.0,
                            dtype=jnp.float32)
    assert sim._bh_config.refine_levels == ov["refine_levels"]
    assert sim._bh_config.refine_threshold == ov["refine_threshold"]
    assert sim._bh_config.max_level == ov["max_level"]
