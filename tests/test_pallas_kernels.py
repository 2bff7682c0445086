"""Interpret-mode (CPU) regression coverage for every Pallas kernel.

Round-1 gap (VERDICT.md #4): the TPU kernels had zero automated coverage —
their masking semantics (self-pairs, dead particles, coincident points) were
only ever checked by hand on hardware.  Interpret mode runs the exact kernel
program on CPU, so these tests guard the kernel logic without a TPU."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.engines.brute_force import force_dense
from nbody_tpu.ops.pairwise import pairwise_acc_pallas, pairwise_acc_pallas_mxu
from nbody_tpu.scenes import self_gravitating_disc


def _disc_state(n, capacity, kill=0):
    pos, vel, mass = self_gravitating_disc(n, seed=7)
    state = ParticleState.create(pos, vel, mass, capacity=capacity,
                                 dtype=jnp.float32)
    if kill:
        # dead particles park at the origin with zero effective mass
        alive = state.alive.at[1:1 + kill].set(False)
        state = dataclasses.replace(state, alive=alive)
    params = SimParams.create(dt=3e-2, g_soft=0.02, theta2=1.0,
                              bounds_width=10.0, dtype=jnp.float32)
    return state, params


def _rel_err(got, ref):
    scale = float(jnp.mean(jnp.linalg.norm(ref, axis=1)))
    return float(jnp.max(jnp.linalg.norm(got - ref, axis=1))) / scale


@pytest.mark.parametrize("kill", [0, 37])
def test_pairwise_pallas_interpret_matches_dense(kill):
    """Direct VPU kernel == force_dense, incl. dead/padding masking and the
    coincident-pair guard (dead particles all sit at the origin)."""
    state, params = _disc_state(500, capacity=512, kill=kill)
    m = state.effective_mass().astype(jnp.float32)
    pos = state.pos.astype(jnp.float32)
    ref = force_dense(pos, m, params)
    got = pairwise_acc_pallas(pos, m, params.g, params.g_soft,
                              tile_i=128, tile_j=128, interpret=True)
    # tile-accumulated vs dense-einsum summation order: f32 roundoff
    assert _rel_err(got, ref) < 1e-4


@pytest.mark.parametrize("kill", [0, 37])
@pytest.mark.parametrize("tiles", [(128, 128), (128, 256)])
def test_pairwise_pallas_sym_matches_dense(kill, tiles):
    """Newton-3 symmetric kernel == force_dense across both tile classes
    (equal tiles: ratio 1; rectangular: ratio 2 exercises the diagonal-band
    classification), incl. dead/padding masking.  capacity 1024 with 128-row
    tiles gives 8x8 (or 8x4) tile grids, so dual, band, and skipped tiles
    all occur."""
    from nbody_tpu.ops.pairwise import pairwise_acc_pallas_sym
    ti, tj = tiles
    state, params = _disc_state(1000, capacity=1024, kill=kill)
    m = state.effective_mass().astype(jnp.float32)
    pos = state.pos.astype(jnp.float32)
    ref = force_dense(pos, m, params)
    got = pairwise_acc_pallas_sym(pos, m, params.g, params.g_soft,
                                  tile_i=ti, tile_j=tj, interpret=True)
    assert _rel_err(got, ref) < 1e-4


def test_pairwise_pallas_sym_unsoftened_guard():
    """g_soft = 0 takes the guarded kernel: coincident pairs (dead particles
    parked at the origin) contribute exactly zero through the d = 0 path in
    BOTH the row and the mirrored column accumulation."""
    from nbody_tpu.ops.pairwise import pairwise_acc_pallas_sym
    state, params = _disc_state(1000, capacity=1024, kill=64)
    params = dataclasses.replace(params, g_soft=jnp.float32(0.0))
    m = state.effective_mass().astype(jnp.float32)
    pos = state.pos.astype(jnp.float32)
    ref = force_dense(pos, m, params)
    got = pairwise_acc_pallas_sym(pos, m, params.g, params.g_soft,
                                  tile_i=128, tile_j=256, interpret=True)
    assert np.all(np.isfinite(np.asarray(got)))
    # unsoftened near-coincident pairs make force magnitudes span decades,
    # so gate PER-ROW relative error (a global max-diff/mean-scale metric is
    # dominated by f32 rounding on the singular rows)
    g_np, r_np = np.asarray(got), np.asarray(ref)
    rel = np.linalg.norm(g_np - r_np, axis=1) / np.maximum(
        np.linalg.norm(r_np, axis=1), 1e-30)
    alive = np.asarray(state.alive)
    # the PLAIN kernel shows 1.0e-4 on this same scene vs dense (rows whose
    # force nearly cancels between huge unsoftened contributions amplify
    # f32 summation-order noise) — 1e-3 bounds the sym kernel's different
    # accumulation order without masking a real sign/coverage bug
    assert float(rel[alive].max()) < 1e-3
    # dead particles are mutually coincident at the origin: their pair
    # contributions vanish via d = 0 (no NaN/Inf), but alive sources still
    # pull them, matching dense semantics (the stepper freezes them later)
    dead = ~alive
    assert np.allclose(g_np[dead], r_np[dead], rtol=1e-3, atol=1e-7)


def test_pairwise_pallas_sym_momentum_conservation():
    """Newton-3 pairs are antisymmetric by construction, so total momentum
    flux sums to ~0 even in f32 (the dual tiles contribute EXACTLY
    antisymmetric updates; only band tiles round independently)."""
    from nbody_tpu.ops.pairwise import pairwise_acc_pallas_sym
    state, params = _disc_state(1000, capacity=1024)
    m = state.effective_mass().astype(jnp.float32)
    pos = state.pos.astype(jnp.float32)
    got = pairwise_acc_pallas_sym(pos, m, params.g, params.g_soft,
                                  tile_i=128, tile_j=256, interpret=True)
    net = np.asarray(jnp.sum(got * m[:, None], axis=0))
    scale = float(jnp.sum(jnp.abs(got) * m[:, None]))
    assert np.all(np.abs(net) < 1e-5 * scale)


def test_pairwise_pallas_targets_matches_full_rows():
    """Sampled-target oracle == the corresponding rows of the full kernel
    (bitwise: same kernel, same j-tile accumulation order), including
    targets that coincide with sources (self-pair contributes +0.0) and a
    target count that is not a multiple of the default tile."""
    state, params = _disc_state(500, capacity=512)
    m = state.effective_mass().astype(jnp.float32)
    pos = state.pos.astype(jnp.float32)
    full = pairwise_acc_pallas(pos, m, params.g, params.g_soft,
                               tile_i=128, tile_j=128, interpret=True)
    idx = jnp.asarray(np.random.default_rng(3).choice(512, 256,
                                                      replace=False))
    from nbody_tpu.ops.pairwise import pairwise_acc_pallas_targets
    got = pairwise_acc_pallas_targets(pos[idx], pos, m, params.g,
                                      params.g_soft, tile_i=128,
                                      tile_j=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(full)[idx])


def test_pairwise_pallas_mxu_interpret_matches_dense():
    """The MXU kernel contract requires Morton-sorted input (its recentred
    norm-trick anchors assume spatially compact tiles — the brute-pallas-mxu
    engine sorts before calling, ops/pairwise.py _force_mxu)."""
    from nbody_tpu.ops import morton
    from nbody_tpu.ops.tree import grid_bounds

    state, params = _disc_state(500, capacity=512)
    m = state.effective_mass().astype(jnp.float32)
    pos = state.pos.astype(jnp.float32)
    gb = grid_bounds(params.bounds, 10)
    codes = morton.cell_codes(pos, gb, 10)
    order = jnp.argsort(jnp.where(m > 0, codes, jnp.int32(1 << 30)))
    pos, m = pos[order], m[order]
    ref = force_dense(pos, m, params)
    got = pairwise_acc_pallas_mxu(pos, m, params.g, params.g_soft,
                                  tile_i=128, tile_j=128, interpret=True)
    # At this tiny N each 128-wide tile spans a large fraction of the disc,
    # so the recentred norm-trick cancellation is much worse than the
    # production regime (1.7e-4 at N=2048/tile 512 on TPU, VALIDATION.md §1).
    # The bound here guards the kernel's *masking semantics* (self-pairs,
    # padding, coincident points), not the formulation's best accuracy.
    assert _rel_err(got, ref) < 5e-2


def test_pairwise_pallas_rejects_2d():
    pos = jnp.zeros((256, 2), jnp.float32)
    m = jnp.ones((256,), jnp.float32)
    with pytest.raises(ValueError, match="3D"):
        pairwise_acc_pallas(pos, m, 1.0, 0.02, interpret=True)
    with pytest.raises(ValueError, match="3D"):
        pairwise_acc_pallas_mxu(pos, m, 1.0, 0.02, interpret=True)


def test_group_force_kernel_interpret_matches_xla_eval():
    """The fused group-force kernel reproduces the XLA slab contraction on a
    hand-built slab with every row species: window rows (with self-pairs),
    gathered near rows, monopole rows (idx=-1), and zero-mass padding."""
    from nbody_tpu.ops.group_force import group_force_pallas
    from nbody_tpu.ops.traversal import _pair_block

    rng = np.random.default_rng(11)
    G, B, S, tile = 3, 128, 512, 128
    g, g_soft = 1.0, 0.02

    tgt = rng.standard_normal((G, B, 3)).astype(np.float32)
    tgt8 = np.zeros((G, B, 8), np.float32)
    tgt8[:, :, :3] = tgt
    tgt8[:, :, 3] = rng.uniform(0.5, 1.5, (G, B))
    tgt8[:, :, 4] = (np.arange(G * B)).reshape(G, B)  # global sorted idx

    slab = np.zeros((G, S, 8), np.float32)
    slab[:, :, :3] = rng.standard_normal((G, S, 3))
    slab[:, :, 3] = rng.uniform(0.5, 1.5, (G, S))
    # non-target indices: in production, index equality implies position
    # equality (window/near rows are genuine particle rows), and the kernel
    # relies on that — self-pairs vanish via d = 0, not an index test
    slab[:, :, 4] = rng.integers(G * B, 2 * G * B, (G, S))
    # species: first B rows = the group's own particles (self-pairs!)
    slab[:, :B] = tgt8
    # monopole rows: idx = -1
    slab[:, -64:, 4] = -1.0
    # padding rows: zero mass (and a coincident-position trap at the origin)
    slab[:, 300:340] = 0.0

    acc_pl = group_force_pallas(
        jnp.asarray(tgt8), jnp.swapaxes(jnp.asarray(slab), 1, 2),
        g, g_soft, tile=tile, interpret=True,
    )

    def ref_one(t8, sl):
        return _pair_block(
            t8[:, :3], t8[:, 4].astype(jnp.int32), sl[:, :3], sl[:, 3],
            sl[:, 4].astype(jnp.int32), sl[:, 3] != 0.0, g, g_soft, None,
        )

    acc_ref = jax.vmap(ref_one)(jnp.asarray(tgt8), jnp.asarray(slab))
    err = _rel_err(acc_pl.reshape(-1, 3), acc_ref.reshape(-1, 3))
    assert err < 1e-5, err


def test_group_force_padding_tiles_are_inert():
    """Appending zero-mass padding tiles (the in-kernel any-mass skip path)
    must not change the result at all."""
    from nbody_tpu.ops.group_force import group_force_pallas

    rng = np.random.default_rng(5)
    G, B, tile = 2, 128, 128
    tgt8 = np.zeros((G, B, 8), np.float32)
    tgt8[:, :, :3] = rng.standard_normal((G, B, 3))
    tgt8[:, :, 4] = np.arange(G * B).reshape(G, B)
    slab = np.zeros((G, tile, 8), np.float32)
    slab[:, :, :3] = rng.standard_normal((G, tile, 3))
    slab[:, :, 3] = 1.0
    slab[:, :, 4] = -1.0
    padded = np.concatenate([slab, np.zeros((G, 2 * tile, 8), np.float32)],
                            axis=1)

    a = group_force_pallas(jnp.asarray(tgt8),
                           jnp.swapaxes(jnp.asarray(slab), 1, 2),
                           1.0, 0.02, tile=tile, interpret=True)
    b = group_force_pallas(jnp.asarray(tgt8),
                           jnp.swapaxes(jnp.asarray(padded), 1, 2),
                           1.0, 0.02, tile=tile, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert bool(jnp.any(a != 0.0))


def test_traversal_pallas_mode_matches_xla_mode():
    """Full bh_accel with eval_mode='pallas' (interpret fallback off-TPU is
    exercised via an explicit interpret monkey-wire) equals eval_mode='xla'."""
    from nbody_tpu.ops import group_force
    from nbody_tpu.ops.traversal import BHConfig, bh_accel

    state, params = _disc_state(3000, capacity=4096)
    m = state.effective_mass().astype(jnp.float32)
    pos = state.pos.astype(jnp.float32)
    base = dict(max_level=4, group_size=512, subgroups=16, window_pad=256,
                frontier_cap=2048, accept_cap=1024, near_cell_cap=512,
                near_particle_cap=1024, start_level=1, chunk_groups=1,
                eval_tile=256, mxu_blocks=False)
    acc_xla, stats = bh_accel(pos, m, params.bounds, params.theta2,
                              params.g, params.g_soft,
                              BHConfig(eval_mode="xla", **base))

    orig = group_force.group_force_pallas
    orig_q = group_force.quad_force_pallas

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    def interp_q(*a, **kw):
        kw["interpret"] = True
        return orig_q(*a, **kw)

    group_force.group_force_pallas = interp
    group_force.quad_force_pallas = interp_q
    try:
        acc_pl, _ = bh_accel(pos, m, params.bounds, params.theta2,
                             params.g, params.g_soft,
                             BHConfig(eval_mode="pallas", **base))
    finally:
        group_force.group_force_pallas = orig
        group_force.quad_force_pallas = orig_q
    assert _rel_err(acc_pl, acc_xla) < 5e-4
    assert int(stats["accept_dropped"]) == 0


def test_quad_kernel_small_scale_scene_matches_xla():
    """Scale-safety regression: an absolute r^2 floor in the quad kernel
    (an earlier 1e-4) silently clamped REAL accepted-node forces once the
    scene's bounds shrank — theta acceptance admits nodes at r ~
    cell_width/theta, which has no lower bound across scene scales.  Run
    the kernel on a slab whose distances sit well below 1e-2 and demand
    agreement with the XLA backend."""
    from nbody_tpu.ops.group_force import quad_force_pallas
    from nbody_tpu.ops.traversal import _quad_block

    rng = np.random.default_rng(3)
    G, B, A, tile = 2, 128, 256, 128
    scale = 1e-3  # typical |e| ~ 1e-3, r^2 ~ 1e-6 — inside the old floor
    tgt8 = np.zeros((G, B, 8), np.float32)
    tgt8[:, :, :3] = rng.standard_normal((G, B, 3)) * scale
    qrows = np.zeros((G, A, 16), np.float32)
    qrows[:, :, :3] = rng.standard_normal((G, A, 3)) * scale
    qrows[:, :, 3] = rng.uniform(0.5, 1.5, (G, A))
    # traceless-ish random quadrupoles at the matching scale (m * x^2)
    q6 = rng.standard_normal((G, A, 6)) * scale * scale
    qrows[:, :, 4:10] = q6
    qrows[:, 100:120] = 0.0  # padding rows: m = 0, Q = 0

    g, g_soft = 1.0, 0.0
    acc_pl = quad_force_pallas(
        jnp.asarray(tgt8), jnp.swapaxes(jnp.asarray(qrows), 1, 2),
        g, g_soft, tile=tile, interpret=True,
    )
    acc_ref = jax.vmap(
        lambda t8, qr: _quad_block(t8[:, :3], qr, g, g_soft)
    )(jnp.asarray(tgt8), jnp.asarray(qrows))
    err = _rel_err(acc_pl.reshape(-1, 3), acc_ref.reshape(-1, 3))
    assert err < 5e-5, err  # tile-accumulation vs XLA sum order



def test_unsoftened_coincident_pairs_contribute_zero():
    """eps = 0 exercises the guarded kernel branch (with softening the
    scalar pl.when skips the r2 == 0 select entirely): exactly coincident
    pairs must contribute zero force, not NaN/inf."""
    from nbody_tpu.ops.group_force import group_force_pallas

    B = 128
    tgt8 = np.zeros((1, B, 8), np.float32)
    tgt8[0, :, :3] = np.linspace(0.1, 1.0, B)[:, None] * [[1.0, 0.5, -0.3]]
    tgt8[0, :, 3] = 1.0
    tgt8[0, :, 4] = np.arange(B)
    # slab = the group's own particles (every target has a coincident source)
    slab = tgt8.copy()

    acc = group_force_pallas(
        jnp.asarray(tgt8), jnp.swapaxes(jnp.asarray(slab), 1, 2),
        1.0, 0.0, tile=128, interpret=True,
    )
    assert np.all(np.isfinite(np.asarray(acc)))
    # exact self-pairs contributed zero; remaining pairs are colinear
    # attractions — compare against the dense reference
    pos = jnp.asarray(tgt8[0, :, :3])
    m = jnp.ones((B,), jnp.float32)
    d = pos[None] - pos[:, None]
    r2 = jnp.sum(d * d, axis=-1)
    ok = r2 > 0
    w = jnp.where(ok, r2 ** -1.5, 0.0)
    ref = jnp.einsum("ij,ijk->ik", w * m[None], d)
    np.testing.assert_allclose(np.asarray(acc[0]), np.asarray(ref),
                               rtol=5e-3, atol=1e-5)  # rsqrt^3 vs **-1.5
