"""Block-dual far field (BHConfig.block_dual, round 3).

The assembled window/near slab is mostly exact pair work Barnes-Hut would
approximate; block_dual adds a per-(target-tile, source-tile) acceptance
test over the eval grid and evaluates accepted pairs as the source tile's
central quadrupole (ops/traversal.py:_dual_prepare, masked Pallas kernel
ops/group_force.py:_kernel_masked).  These tests pin:
  * end-to-end accuracy with tiles actually accepted (separated clusters),
  * self-safety at ABSURD theta (box-box distance forbids accepting any
    tile overlapping the target tile, so no self-force at any theta),
  * the masked Pallas kernel against the XLA backend (interpret mode),
  * stats plumbing (dual_tiles == 0 when disabled).
"""

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.engines.brute_force import force_tiled
from nbody_tpu.ops.traversal import BHConfig, bh_accel


def _clusters(n_each, seed=0, centers=((-4, 0, 0), (4, 0, 0))):
    rng = np.random.default_rng(seed)
    parts = []
    for c in centers:
        p = rng.normal(scale=0.35, size=(n_each, 3)) + np.asarray(c, float)
        parts.append(p)
    pos = np.concatenate(parts).astype(np.float32)
    mass = rng.uniform(0.5, 1.5, len(pos)).astype(np.float32)
    return pos, mass


def _setup(pos, mass, capacity, theta2=1.0, width=12.0):
    state = ParticleState.create(pos, np.zeros_like(pos), mass,
                                 capacity=capacity, dtype=jnp.float32)
    params = SimParams.create(dt=1e-2, g_soft=0.05, theta2=theta2,
                              bounds_width=width, dtype=jnp.float32)
    m = state.effective_mass()
    ref = np.asarray(force_tiled(state.pos, m, params))
    return state, params, m, ref


# small groups/tiles so the dual acceptance actually fires at test sizes
# (at 1M-scale a 2048-row tile is spatially tiny; at 4k it spans the scene)
DUAL_CFG = dict(group_size=512, subgroups=8, window_pad=512, eval_tile=256,
                near_particle_cap=2048, near_cell_cap=512, frontier_cap=2048,
                accept_cap=2048, chunk_groups=1, max_level=6)


def _errors(state, params, m, ref, cfg):
    acc, stats = bh_accel(state.pos, m, params.bounds, params.theta2,
                          params.g, params.g_soft, cfg)
    a = np.asarray(acc)
    alive = np.asarray(m) > 0
    rn = np.linalg.norm(ref, axis=1)
    err = np.linalg.norm(a - ref, axis=1)[alive] / np.maximum(
        rn[alive], 1e-30
    )
    return err, stats


def test_dual_accepts_and_stays_accurate():
    """Two separated clusters: cross-cluster tile pairs must be accepted
    (dual_tiles > 0) and the accuracy must stay within a small factor of
    the exact-slab path — the tile quadrupole at w/d ~ 0.1 contributes
    ~(w/d)^3 ~ 1e-3 relative error at most."""
    pos, mass = _clusters(2048)
    state, params, m, ref = _setup(pos, mass, capacity=4096)
    err0, st0 = _errors(state, params, m, ref,
                        BHConfig(multipole="mono", **DUAL_CFG))
    err1, st1 = _errors(state, params, m, ref,
                        BHConfig(multipole="mono", block_dual=True,
                                 **DUAL_CFG))
    assert int(st0["dual_tiles"]) == 0
    assert int(st1["dual_tiles"]) > 0, "dual acceptance never fired"
    assert np.all(np.isfinite(err1))
    # dual approximates previously-exact work under the same theta rule:
    # stays within the BH error envelope
    assert np.median(err1) < max(3.0 * np.median(err0), 2e-3), (
        np.median(err0), np.median(err1)
    )
    assert np.percentile(err1, 99) < max(
        3.0 * np.percentile(err0, 99), 1e-2
    )


def test_dual_quad_mode_combines():
    """block_dual composes with multipole="quad" (tree-node quadrupoles on
    the accept slab AND tile quadrupoles on the eval grid)."""
    pos, mass = _clusters(2048, seed=3)
    state, params, m, ref = _setup(pos, mass, capacity=4096)
    err, st = _errors(state, params, m, ref,
                      BHConfig(multipole="quad", block_dual=True,
                               **DUAL_CFG))
    assert int(st["dual_tiles"]) > 0
    assert np.all(np.isfinite(err))
    assert np.median(err) < 2e-3, np.median(err)


def test_dual_self_safe_at_huge_theta():
    """theta^2 = 16: a COM-distance acceptance would admit tiles CONTAINING
    the target (self-force through the multipole).  Box-box distance makes
    that impossible: any tile overlapping the target tile's bbox has d = 0.
    The result must stay finite and within the (bad, but bounded) BH error
    of the same theta with dual off."""
    pos, mass = _clusters(1024, seed=5, centers=((0, 0, 0),))
    state, params, m, ref = _setup(pos, mass, capacity=2048, theta2=16.0)
    err0, _ = _errors(state, params, m, ref,
                      BHConfig(multipole="mono", **DUAL_CFG))
    err1, st = _errors(state, params, m, ref,
                       BHConfig(multipole="mono", block_dual=True,
                                **DUAL_CFG))
    assert np.all(np.isfinite(err1))
    # a self-force through an accepted tile would blow the max error up by
    # orders of magnitude (the self term dominates at r ~ softening)
    assert err1.max() < 10 * max(err0.max(), 0.1), (err0.max(), err1.max())


def test_masked_kernel_interpret_matches_xla():
    """group_force_pallas with a mask (interpret mode) == the same slab
    with masked tiles' masses zeroed per target tile."""
    from nbody_tpu.ops.group_force import group_force_pallas

    rng = np.random.default_rng(7)
    G, B, S, tile = 2, 256, 512, 128
    bt = B // 128 if B % 128 == 0 else 1
    # fit_target_tile(256, 128, 512, 1<<20) -> ti = 256 -> bt = 1; force a
    # finer grid via target_tile override
    tgt8 = np.zeros((G, B, 8), np.float32)
    tgt8[..., :3] = rng.uniform(-3, 3, (G, B, 3))
    tgt8[..., 3] = 1.0
    tgt8[..., 4] = np.arange(G * B).reshape(G, B)
    slab = np.zeros((G, S, 8), np.float32)
    slab[..., :3] = rng.uniform(-3, 3, (G, S, 3))
    slab[..., 3] = rng.uniform(0.0, 2.0, (G, S)) * (
        rng.uniform(size=(G, S)) > 0.2
    )
    slab[..., 4] = -1.0
    ti = 128
    btg = B // ti
    st = S // tile
    mask = rng.uniform(size=(G, btg, st)) > 0.5
    out = np.asarray(
        group_force_pallas(
            jnp.asarray(tgt8), jnp.swapaxes(jnp.asarray(slab), 1, 2),
            1.0, 0.03, tile=tile, target_tile=ti, interpret=True,
            mask=jnp.asarray(mask),
        )
    )
    # reference: per target tile, zero masked source tiles and brute-sum
    eps2 = 0.03 * 0.03
    refs = np.zeros((G, B, 3), np.float32)
    for g in range(G):
        for bi in range(btg):
            keep = np.repeat(~mask[g, bi], tile)
            sm = slab[g, :, 3] * keep
            t = tgt8[g, bi * ti:(bi + 1) * ti, :3]
            d = slab[g, None, :, :3] - t[:, None, :]
            r2 = (d ** 2).sum(-1) + eps2
            s = sm[None, :] / r2 ** 1.5
            refs[g, bi * ti:(bi + 1) * ti] = (s[..., None] * d).sum(1)
    np.testing.assert_allclose(out, refs, rtol=2e-4, atol=2e-3)


def test_dual_disabled_by_default():
    cfg = BHConfig()
    assert cfg.block_dual is False
    pos, mass = _clusters(512, seed=9)
    state, params, m, ref = _setup(pos, mass, capacity=1024)
    _, st = _errors(state, params, m, ref, BHConfig.auto_for(1024))
    assert int(st["dual_tiles"]) == 0


def test_dual_slab_smaller_than_eval_tile():
    """Regression (review r3): when the assembled slab is SMALLER than
    eval_tile, _dual_slab_eval fits a reduced tile and pads the slab up to
    it — _slab_eval must reuse that tile, not re-derive a 2x larger one
    from the padded length (mask-grid desync: trace-time shape error on
    the XLA path, mask-shape assert on the Pallas path)."""
    from nbody_tpu.scenes import self_gravitating_disc

    pos, vel, mass = self_gravitating_disc(1023, seed=0)
    state = ParticleState.create(pos, vel, mass, capacity=1024,
                                 dtype=jnp.float32)
    params = SimParams.create(dt=3e-2, g_soft=0.02, theta2=1.0,
                              bounds_width=10.0, dtype=jnp.float32)
    m = state.effective_mass()
    ref = np.asarray(force_tiled(state.pos, m, params))
    # slab = group 128 + 2*64 window + 512 near = 768 < eval_tile 2048
    cfg = BHConfig(max_level=4, group_size=128, subgroups=8, window_pad=64,
                   near_particle_cap=512, near_cell_cap=128,
                   accept_cap=1024, frontier_cap=2048, start_level=1,
                   chunk_groups=1, block_dual=True)
    err, _ = _errors(state, params, m, ref, cfg)  # must not crash
    assert np.percentile(err, 99) < 2e-2
