"""White-box units for the traversal building blocks."""

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.ops.traversal import _compact


def test_compact_order_preserving():
    ids = jnp.arange(100, dtype=jnp.int32) * 3
    keep = (jnp.arange(100) % 7) == 0  # 15 kept
    out, valid, dropped = _compact(ids, keep, 32)
    got = np.asarray(out)[np.asarray(valid)]
    want = np.asarray(ids)[np.asarray(keep)]
    np.testing.assert_array_equal(got, want)
    assert int(dropped) == 0


def test_compact_overflow_counts():
    ids = jnp.arange(64, dtype=jnp.int32)
    keep = jnp.ones(64, bool)
    out, valid, dropped = _compact(ids, keep, 16)
    assert int(dropped) == 48
    np.testing.assert_array_equal(np.asarray(out), np.arange(16))
    assert bool(np.asarray(valid).all())


def test_compact_empty():
    ids = jnp.arange(8, dtype=jnp.int32)
    keep = jnp.zeros(8, bool)
    out, valid, dropped = _compact(ids, keep, 4)
    assert int(dropped) == 0
    assert not np.asarray(valid).any()


def test_mxu_pair_block_matches_vpu():
    """The MXU norm-trick pair block must match the elementwise form to
    f32 roundoff (recentring keeps the cancellation benign)."""
    from nbody_tpu.ops.traversal import _pair_block, _pair_block_mxu

    rng = np.random.default_rng(0)
    B, P = 256, 512
    base = np.array([2.0, -1.0, 0.5])
    gpos = jnp.asarray(base + 0.3 * rng.standard_normal((B, 3)), jnp.float32)
    ppos = jnp.asarray(base + 0.3 * rng.standard_normal((P, 3)), jnp.float32)
    ppos = ppos.at[:B].set(gpos)  # overlap: exercises the self-pair mask
    pm = jnp.asarray(rng.uniform(0.5, 1.5, P), jnp.float32)
    gidx = jnp.arange(B, dtype=jnp.int32)
    pidx = jnp.arange(P, dtype=jnp.int32)
    pvalid = jnp.arange(P) < 500
    center = jnp.asarray(base, jnp.float32)

    ref = _pair_block(gpos, gidx, ppos, jnp.where(pvalid, pm, 0.0), pidx,
                      pvalid, 1.0, 0.02)
    got = _pair_block_mxu(gpos, gidx, ppos, jnp.where(pvalid, pm, 0.0), pidx,
                          pvalid, 1.0, 0.02, center)
    scale = float(jnp.mean(jnp.linalg.norm(ref, axis=1)))
    err = float(jnp.max(jnp.linalg.norm(got - ref, axis=1))) / scale
    # f32 norm-trick roundoff; well below the BH method error (~1e-2 at
    # theta^2=1) and the softening-scale force error
    assert err < 3e-4, err


def test_mxu_traversal_matches_vpu_traversal():
    """Full bh_accel with mxu_blocks on/off agrees on the disc scene."""
    import dataclasses

    from nbody_tpu.core.state import ParticleState, SimParams
    from nbody_tpu.ops.traversal import BHConfig, bh_accel
    from nbody_tpu.scenes import self_gravitating_disc

    pos, vel, mass = self_gravitating_disc(3000, seed=3)
    state = ParticleState.create(pos, vel, mass, capacity=4096,
                                 dtype=jnp.float32)
    params = SimParams.create(dt=3e-2, g_soft=0.02, theta2=1.0,
                              bounds_width=10.0, dtype=jnp.float32)
    cfg = BHConfig(max_level=4, group_size=512, subgroups=16, window_pad=256,
                   frontier_cap=2048, accept_cap=1024, near_cell_cap=512,
                   near_particle_cap=1024, start_level=1, chunk_groups=1,
                   mxu_blocks=True)
    m = state.effective_mass()
    acc_mxu, _ = bh_accel(state.pos, m, params.bounds, params.theta2,
                          params.g, params.g_soft, cfg)
    acc_vpu, _ = bh_accel(state.pos, m, params.bounds, params.theta2,
                          params.g, params.g_soft,
                          dataclasses.replace(cfg, mxu_blocks=False))
    scale = float(jnp.mean(jnp.linalg.norm(acc_vpu, axis=1)))
    err = float(jnp.max(jnp.linalg.norm(acc_mxu - acc_vpu, axis=1))) / scale
    assert err < 2e-3, err


def test_auto_group_presets():
    """Capacity-adaptive presets (v5e sweep) and explicit-option override."""
    from nbody_tpu.ops.traversal import BHConfig

    assert BHConfig.auto_for(32768).group_size == 2048
    assert BHConfig.auto_for(131072).group_size == 4096
    assert BHConfig.auto_for(1 << 20).group_size == 8192
    assert BHConfig.auto_for(1 << 20).subgroups == 128
    assert BHConfig.auto_for(1 << 20, group_size=1024).group_size == 1024
    # window-pad tiers: wp512 gated through 1M (p99 1.11x) but FAILED at
    # 2M (2.25x); the wp1024 middle ground gated at 2M (1.14x) but FAILED
    # at 4M (2.28x) — accuracy_large.jsonl.  So 512 / 1024 / 2048 by tier.
    assert BHConfig.auto_for(1 << 20).window_pad == 512
    assert BHConfig.auto_for(1 << 21).window_pad == 1024
    assert BHConfig.auto_for(1 << 22).window_pad == 2048
    assert BHConfig.auto_for(1 << 22).near_particle_cap == 512
    # padded block size must stay group-aligned for the traversal reshape
    for n in (32768, 131072, 1 << 20):
        c = BHConfig.auto_for(n)
        assert n % (c.group_size * c.chunk_groups) == 0


def test_fit_chunks_divisibility():
    from nbody_tpu.ops.traversal import fit_chunks

    # plain divisibility
    assert fit_chunks(8, 128) == 8
    assert fit_chunks(8, 12) == 6
    assert fit_chunks(8, 7) == 7  # 7 divides 7
    assert fit_chunks(8, 1) == 1
    # sharded constraint: chunk count (n_groups // cg) divisible by n_shards
    assert fit_chunks(8, 128, multiple=8) == 8      # 16 chunks / 8 ok
    assert fit_chunks(8, 32, multiple=8) == 4       # 8 chunks / 8 ok
    assert fit_chunks(8, 8, multiple=8) == 1        # 8 chunks of 1
    # cg never exceeds the group count
    assert fit_chunks(64, 4) == 4


def test_auto_preset_shape_invariants():
    """Every preset tier must produce internally consistent shapes — the
    invariants that actually break when defaults are flipped (round-3
    lesson: the window/cap/dual knobs moved three times).  Checked across
    tiers and a spread of capacities, with and without block_dual."""
    from nbody_tpu.ops.traversal import BHConfig, _fit_eval_tile

    for n in (1 << 15, 1 << 17, 1 << 18, 1 << 20, 1 << 21, 1 << 22,
              1 << 24):
        c = BHConfig.auto_for(n)
        B = c.group_size
        # group/chunk alignment (traversal reshapes)
        assert n % (B * c.chunk_groups) == 0, (n, B, c.chunk_groups)
        # window must cover the group plus the pad on each side
        assert c.window == B + 2 * c.window_pad
        # subgroup partition of the group
        assert B % c.subgroups == 0
        # dual acceptance needs the qrows pad target to fit one 128-wide
        # quad tile: st = ceil(slab / tile) <= 128 for the worst slab
        # (window + near cap)
        slab = c.window + c.near_particle_cap
        tile = _fit_eval_tile(c.eval_tile, slab)
        st = -(-slab // tile)
        assert st <= 128, (n, slab, tile, st)
        # caps positive and the near path non-degenerate
        assert c.near_particle_cap > 0 and c.near_cell_cap > 0
        # theta-walk budgets exist for every level below start_level
        assert c.max_level > c.start_level


def test_accuracy_profile_presets():
    """profile='accurate' restores only the round-2 window pad — the
    measured drift carrier (VALIDATION.md §10 attribution) — keeping
    block_dual and the near-cap cut (both drift-cheap) and all shape
    invariants; the engine-level spelling must agree."""
    import pytest

    from nbody_tpu.engines import get_engine
    from nbody_tpu.ops.traversal import BHConfig

    for n in (1 << 17, 1 << 20, 1 << 22):
        fast = BHConfig.auto_for(n)
        acc = BHConfig.auto_for(n, profile="accurate")
        assert acc.near_particle_cap == fast.near_particle_cap
        assert acc.window_pad == 2048
        # 'accurate' always runs block_dual: accuracy-free at every probed
        # margin, and it EARNS at wp2048 windows (+5.9% @2M) even in the
        # 262k-1M tier whose 'fast' preset dropped it with the wp512 slab
        # (dual_r3.jsonl dv_* pairs)
        assert acc.block_dual
        assert acc.group_size == fast.group_size
        # same alignment invariants as the fast presets
        assert n % (acc.group_size * acc.chunk_groups) == 0
        assert acc.window == acc.group_size + 2 * acc.window_pad
    # small tier: the cuts never applied there — profile is a no-op
    small = BHConfig.auto_for(1 << 14, profile="accurate")
    assert small == BHConfig.auto_for(1 << 14)
    with pytest.raises(ValueError):
        BHConfig.auto_for(1 << 20, profile="turbo")
    # engine spelling: profile pops before BHConfig(**options)
    eng = get_engine("bh", profile="accurate")
    assert eng is not None


def test_cli_accurate_flag_smoke():
    """--accurate drives end-to-end on the CPU backend and rejects non-bh
    engines."""
    import pytest

    from nbody_tpu.cli import main

    r = main(["-n", "512", "--steps", "2", "--engine", "bh", "--accurate",
              "--json", "--cpu"])
    assert r["n_alive"] >= 512
    with pytest.raises(SystemExit):
        main(["-n", "256", "--steps", "1", "--engine", "brute",
              "--accurate", "--cpu"])


def test_dense_profile_presets():
    """profile='dense' applies the measured steep-core stack (VALIDATION.md
    §18: depth 8 + doubled walk budgets + mid-N near cap) on top of the
    size tier, leaving the tier's window/group/dual choices alone; explicit
    caller fields beat the profile; engine spelling validates names."""
    import pytest

    from nbody_tpu.engines import get_engine
    from nbody_tpu.ops.traversal import BHConfig, DENSE_OVERRIDES

    fast = BHConfig.auto_for(1 << 20)
    dense = BHConfig.auto_for(1 << 20, profile="dense")
    for k, v in DENSE_OVERRIDES.items():
        assert getattr(dense, k) == v
    # fields the probe did not move stay at the tier preset
    assert dense.window_pad == fast.window_pad
    assert dense.group_size == fast.group_size
    assert dense.block_dual == fast.block_dual
    assert dense.multipole == fast.multipole
    # alignment invariant survives the profile
    assert (1 << 20) % (dense.group_size * dense.chunk_groups) == 0
    # explicit override beats the profile (how cheap CPU tests shrink it)
    over = BHConfig.auto_for(1 << 20, profile="dense", max_level=5)
    assert over.max_level == 5
    assert over.accept_cap == DENSE_OVERRIDES["accept_cap"]
    with pytest.raises(ValueError):
        get_engine("bh", profile="turbo")


def test_dense_profile_functional():
    """The dense profile drives the engine end-to-end (max_level shrunk to
    keep the CPU pyramid small) and stays inside the small-N accuracy
    envelope on the scene family it exists for."""
    import dataclasses

    from nbody_tpu.core.state import ParticleState, SimParams
    from nbody_tpu.engines import get_engine
    from nbody_tpu.engines.brute_force import force_tiled
    from nbody_tpu.scenes import plummer_sphere

    n = 2048
    pos, vel, mass = plummer_sphere(n, scale=1.0, seed=3)
    state = ParticleState.create(pos, vel, mass, capacity=n,
                                 dtype=jnp.float32)
    params = SimParams.create(dt=1e-3, g_soft=0.02, theta2=1.0,
                              bounds_width=20.0, dtype=jnp.float32)
    # Plummer tail: open-boundary semantics, as in scripts/probe_plummer.py
    alive = np.asarray(state.alive) & np.asarray(
        params.bounds.contains(state.pos))
    state = dataclasses.replace(state, alive=jnp.asarray(alive))

    eng = get_engine("bh", profile="dense", max_level=5)
    m = state.effective_mass()
    acc = np.asarray(eng.force(state.pos, m, params))
    ref = np.asarray(force_tiled(state.pos, m, params))
    a, r = acc[alive], ref[alive]
    # typ-normalized error (plain relative divides by near-zero net
    # central forces in spherical scenes — same metric as the 1M probe)
    typ = np.mean(np.linalg.norm(r, axis=1))
    err = np.linalg.norm(a - r, axis=1) / typ
    assert np.median(err) < 2e-3, np.median(err)
    assert np.percentile(err, 99) < 5e-2, np.percentile(err, 99)


def test_cli_dense_flag_rejects_non_bh():
    import pytest

    from nbody_tpu.cli import main

    with pytest.raises(SystemExit):
        main(["-n", "256", "--steps", "1", "--engine", "brute",
              "--dense", "--cpu"])


def test_adaptive_profile_presets():
    """profile='adaptive' applies the measured density-adaptive steep-core
    stack (VALIDATION.md §19: depth-7 grid + 3 refined levels at threshold
    128 + the re-tuned budget caps) on top of the size tier; explicit
    caller fields beat the profile; both auto_for and the engine spelling
    resolve the same constant."""
    import pytest

    from nbody_tpu.engines import get_engine
    from nbody_tpu.ops.traversal import ADAPTIVE_OVERRIDES, BHConfig

    fast = BHConfig.auto_for(1 << 20)
    ad = BHConfig.auto_for(1 << 20, profile="adaptive")
    for k, v in ADAPTIVE_OVERRIDES.items():
        assert getattr(ad, k) == v, k
    # fields the probe did not move stay at the tier preset
    assert ad.window_pad == fast.window_pad
    assert ad.group_size == fast.group_size
    assert ad.multipole == fast.multipole
    assert (1 << 20) % (ad.group_size * ad.chunk_groups) == 0
    # depth budget sits exactly at the 3D Morton limit
    assert ad.max_level + ad.refine_levels == 10
    # explicit override beats the profile (how cheap CPU tests shrink it)
    over = BHConfig.auto_for(1 << 20, profile="adaptive", max_level=4,
                             refine_levels=2)
    assert over.max_level == 4 and over.refine_levels == 2
    assert over.fb_cap == ADAPTIVE_OVERRIDES["fb_cap"]
    # engine spelling accepts the profile (field resolution is covered
    # end-to-end by test_adaptive_profile_functional) and rejects typos
    get_engine("bh", profile="adaptive", max_level=4, refine_levels=2)
    with pytest.raises(ValueError):
        get_engine("bh", profile="hyperadaptive")
    with pytest.raises(ValueError):
        BHConfig.auto_for(1 << 20, profile="hyperadaptive")


def test_adaptive_profile_functional():
    """The adaptive profile drives the engine end-to-end on the scene
    family it exists for (grid + refined depth shrunk for CPU) and beats
    the equivalent static config on the typ-normalized tail — refinement
    must actually fire (threshold forced low enough for the small N)."""
    import dataclasses

    from nbody_tpu.core.state import ParticleState, SimParams
    from nbody_tpu.engines import get_engine
    from nbody_tpu.engines.brute_force import force_tiled
    from nbody_tpu.scenes import plummer_sphere

    n = 2048
    pos, vel, mass = plummer_sphere(n, scale=1.0, seed=3)
    state = ParticleState.create(pos, vel, mass, capacity=n,
                                 dtype=jnp.float32)
    params = SimParams.create(dt=1e-3, g_soft=0.02, theta2=1.0,
                              bounds_width=20.0, dtype=jnp.float32)
    alive = np.asarray(state.alive) & np.asarray(
        params.bounds.contains(state.pos))
    state = dataclasses.replace(state, alive=jnp.asarray(alive))

    eng = get_engine("bh", profile="adaptive", max_level=4,
                     refine_levels=2, refine_threshold=32)
    m = state.effective_mass()
    acc = np.asarray(eng.force(state.pos, m, params))
    ref = np.asarray(force_tiled(state.pos, m, params))
    a, r = acc[alive], ref[alive]
    typ = np.mean(np.linalg.norm(r, axis=1))
    err = np.linalg.norm(a - r, axis=1) / typ
    assert np.all(np.isfinite(err))
    assert np.median(err) < 2e-3, np.median(err)
    assert np.percentile(err, 99) < 5e-2, np.percentile(err, 99)


def test_cli_adaptive_flag_guards():
    import pytest

    from nbody_tpu.cli import main

    with pytest.raises(SystemExit):
        main(["-n", "256", "--steps", "1", "--engine", "brute",
              "--adaptive", "--cpu"])
    with pytest.raises(SystemExit):
        main(["-n", "256", "--steps", "1", "--engine", "bh",
              "--adaptive", "--dense", "--cpu"])
    with pytest.raises(SystemExit):
        main(["-n", "256", "--steps", "1", "--engine", "bh",
              "--adaptive", "--walk-every", "2", "--cpu"])


def test_delta_onepass_bitwise_identical():
    """cfg.delta_onepass consolidates the walk's per-level window-coverage
    scatter-adds into one final scatter pair (VERDICT r4 #2 scheduling
    A/B).  Integer scatter-add is associative, so the forces must be
    BITWISE identical — any difference is a wiring bug, not tolerance."""
    import dataclasses

    import numpy as np

    from nbody_tpu.core.state import ParticleState, SimParams
    from nbody_tpu.ops.traversal import BHConfig, bh_accel
    from nbody_tpu.scenes import plummer_sphere

    n = 1 << 13
    pos, vel, mass = plummer_sphere(n, scale=1.0, seed=0)
    keep = np.all(np.abs(pos) <= 20, axis=1)
    st = ParticleState.create(pos[keep], vel[keep], mass[keep],
                              capacity=n, dtype=jnp.float32)
    pr = SimParams.create(g_soft=0.02, theta2=1.0, bounds_width=40.0,
                          dtype=jnp.float32)
    m = st.effective_mass()
    for ov in ({}, dict(max_level=6, refine_levels=2, refine_threshold=64)):
        cfg0 = BHConfig.auto_for(n, **ov)
        cfg1 = dataclasses.replace(cfg0, delta_onepass=True)
        a0 = jax.jit(lambda p, mm: bh_accel(
            p, mm, pr.bounds, pr.theta2, pr.g, pr.g_soft, cfg0)[0])(
                st.pos, m)
        a1 = jax.jit(lambda p, mm: bh_accel(
            p, mm, pr.bounds, pr.theta2, pr.g, pr.g_soft, cfg1)[0])(
                st.pos, m)
        assert float(jnp.abs(a0 - a1).max()) == 0.0
