"""Quadrupole multipole path (BHConfig.multipole="quad", round 2).

The reference is monopole-only (src/manual/barnes_hut.rs:192-199); the quad
path is a TPU-native accuracy upgrade: traceless quadrupole moments ride the
dense slab eval (ops/group_force.py quad kernel) for one extra order of
(w/d) accuracy at the same theta.  These tests pin:
  * the force law itself against direct summation (sign + coefficients),
  * the expected error-order improvement over monopole,
  * the Pallas kernel against the XLA backend (interpret mode, no TPU),
  * end-to-end bh_accel accuracy: quad strictly better than mono,
  * the self-excluded quadrupole fallback under forced budget overflow.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.engines.brute_force import force_dense
from nbody_tpu.ops.traversal import BHConfig, _quad_block, bh_accel
from nbody_tpu.scenes import self_gravitating_disc


def _exact(src, m, tgt, eps):
    d = src[None] - tgt[:, None]
    r2 = (d**2).sum(-1) + eps * eps
    s = m[None] / r2**1.5
    return (s[..., None] * d).sum(1)


def _moments(src, m):
    M = m.sum()
    com = (m[:, None] * src).sum(0) / M
    S2 = np.einsum("n,ni,nj->ij", m, src, src)
    P = S2 - M * np.outer(com, com)
    Q = 3 * P - np.trace(P) * np.eye(3)
    return M, com, Q


def _qrows(M, com, Q):
    row = np.zeros((1, 16), np.float64)
    row[0, :3] = com
    row[0, 3] = M
    row[0, 4:10] = [Q[0, 0], Q[1, 1], Q[2, 2], Q[0, 1], Q[0, 2], Q[1, 2]]
    return row


def test_quad_force_law_beats_monopole():
    """A far cluster: quadrupole truncation error must be ~(w/d) smaller
    than monopole — this pins the sign and the 5/2 coefficient (a wrong
    sign would make quad WORSE than mono)."""
    rng = np.random.default_rng(0)
    src = rng.uniform(-0.5, 0.5, (64, 3))
    m = rng.uniform(0.5, 1.5, 64)
    tgt = rng.normal(size=(32, 3))
    tgt = tgt / np.linalg.norm(tgt, axis=1, keepdims=True) * 6.0
    M, com, Q = _moments(src, m)

    ref = _exact(src, m, tgt, 0.0)
    mono = np.asarray(
        _quad_block(jnp.asarray(tgt), jnp.asarray(_qrows(M, com, 0 * Q)),
                    1.0, 0.0)
    )
    quad = np.asarray(
        _quad_block(jnp.asarray(tgt), jnp.asarray(_qrows(M, com, Q)),
                    1.0, 0.0)
    )
    err_mono = np.abs(mono - ref).max() / np.abs(ref).max()
    err_quad = np.abs(quad - ref).max() / np.abs(ref).max()
    assert err_quad < 0.25 * err_mono, (err_mono, err_quad)


def test_quad_error_order_scaling():
    """Halving the cluster extent must shrink the quad truncation error
    ~8x (octupole residual, (w/d)^3) vs ~4x for monopole."""
    rng = np.random.default_rng(1)
    base = rng.uniform(-0.5, 0.5, (128, 3))
    m = rng.uniform(0.5, 1.5, 128)
    tgt = np.array([[5.0, 1.0, -2.0], [-4.0, 3.0, 1.0]])
    errs = []
    for scale in (1.0, 0.5):
        src = base * scale
        M, com, Q = _moments(src, m)
        ref = _exact(src, m, tgt, 0.0)
        quad = np.asarray(
            _quad_block(jnp.asarray(tgt), jnp.asarray(_qrows(M, com, Q)),
                        1.0, 0.0)
        )
        errs.append(np.abs(quad - ref).max())
    ratio = errs[0] / errs[1]
    assert ratio > 5.0, errs  # cubic scaling gives 8; monopole would give 4


def test_quad_kernel_interpret_matches_xla():
    """Pallas quad kernel (interpret mode, runs on CPU) == _quad_block,
    including empty rows and the per-tile mass skip."""
    from nbody_tpu.ops.group_force import quad_force_pallas

    rng = np.random.default_rng(2)
    G, B, A = 2, 256, 256
    tgt8 = np.zeros((G, B, 8), np.float32)
    tgt8[..., :3] = rng.uniform(-3, 3, (G, B, 3))
    tgt8[..., 4] = np.arange(G * B).reshape(G, B)
    q = np.zeros((G, A, 16), np.float32)
    q[..., :3] = rng.uniform(-3, 3, (G, A, 3))
    mass = rng.uniform(0.0, 2, (G, A)) * (rng.uniform(size=(G, A)) > 0.3)
    q[..., 3] = mass
    # invariant from _quad_slab: Q == 0 wherever mass == 0
    q[..., 4:10] = rng.uniform(-0.1, 0.1, (G, A, 6)) * (mass > 0)[..., None]
    # one fully-empty trailing tile to exercise the whole-tile skip
    q[:, A - 128:, 3:10] = 0.0

    out = np.asarray(
        quad_force_pallas(
            jnp.asarray(tgt8), jnp.swapaxes(jnp.asarray(q), 1, 2),
            1.0, 0.02, tile=128, interpret=True,
        )
    )
    ref = np.stack(
        [
            np.asarray(
                _quad_block(jnp.asarray(tgt8[g, :, :3]), jnp.asarray(q[g]),
                            1.0, 0.02)
            )
            for g in range(G)
        ]
    )
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-3)


@pytest.fixture(scope="module")
def disc_8k():
    n = 8192
    pos, vel, mass = self_gravitating_disc(n - 1, seed=0)
    state = ParticleState.create(pos, vel, mass, capacity=n,
                                 dtype=jnp.float32)
    params = SimParams.create(dt=3e-2, g_soft=0.02, theta2=1.0,
                              bounds_width=10.0, dtype=jnp.float32)
    m = state.effective_mass()
    ref = np.asarray(force_dense(state.pos, m, params))
    return state, params, m, ref


def _bh_errors(state, params, m, ref, cfg):
    acc, stats = bh_accel(state.pos, m, params.bounds, params.theta2,
                          params.g, params.g_soft, cfg)
    a = np.asarray(acc)
    alive = np.asarray(m) > 0
    rn = np.linalg.norm(ref, axis=1)
    err = np.linalg.norm(a - ref, axis=1)[alive] / np.maximum(
        rn[alive], 1e-30
    )
    return err, stats


def test_bh_quad_beats_mono_end_to_end(disc_8k):
    state, params, m, ref = disc_8k
    err_m, _ = _bh_errors(state, params, m, ref,
                          BHConfig.auto_for(8192, multipole="mono"))
    err_q, _ = _bh_errors(state, params, m, ref,
                          BHConfig.auto_for(8192, multipole="quad"))
    assert np.median(err_q) < 0.35 * np.median(err_m), (
        np.median(err_m), np.median(err_q)
    )
    assert np.percentile(err_q, 99) < np.percentile(err_m, 99)
    assert err_q.max() < err_m.max()


def test_quad_fallback_self_excluded_under_overflow(disc_8k):
    """Starve the budgets so cells degrade to the fb slab: the quad
    fallback (self-excluded quadrupole) must stay finite and strictly
    beat the mono fallback on the same starved config."""
    state, params, m, ref = disc_8k
    starved = dict(group_size=512, subgroups=16, window_pad=128,
                   near_particle_cap=256, near_cell_cap=64, fb_cap=256,
                   frontier_cap=512, accept_cap=2048)
    err_m, st_m = _bh_errors(state, params, m, ref,
                             BHConfig.auto_for(8192, multipole="mono",
                                               **starved))
    err_q, st_q = _bh_errors(state, params, m, ref,
                             BHConfig.auto_for(8192, multipole="quad",
                                               fb_quad=True, quad_leaf=True,
                                               **starved))
    n_fb = int(st_q["near_fallback"]) + int(st_q["frontier_fallback"])
    assert n_fb > 0  # overflow actually happened
    assert np.all(np.isfinite(err_q))
    assert np.median(err_q) < np.median(err_m)
    assert np.percentile(err_q, 99) < np.percentile(err_m, 99)


def test_bh_quad_translated_scene(disc_8k):
    """Quad accuracy must survive a scene whose bounds sit FAR from the
    coordinate origin (|center| >> cell width).  The accel entry points
    recenter all positions on bounds.center before the tree build, so the
    raw second moments are accumulated in the GRID frame and the
    centralization P = S2 - M c cᵀ stays well-conditioned; accumulating
    about the world origin cancels catastrophically here — relative error
    on P ~ (|c|/w)² 2^-24 ≈ 4e5 at this offset (ADVICE r2 #1)."""
    state, params, m, ref = disc_8k
    shift = np.array([4096.0, -8192.0, 2048.0], np.float32)
    pos_t = state.pos + jnp.asarray(shift)
    params_t = params.replace(bounds_center=tuple(shift))
    cfg = BHConfig.auto_for(8192, multipole="quad")
    acc_t, _ = bh_accel(pos_t, m, params_t.bounds, params_t.theta2,
                        params_t.g, params_t.g_soft, cfg)
    # dense reference from the SAME quantized translated positions — f32
    # coordinate rounding at |c| ~ 2^13 affects both sides identically, so
    # the comparison isolates the BH approximation error
    ref_t = np.asarray(force_dense(pos_t, m, params_t))
    err0, _ = _bh_errors(state, params, m, ref, cfg)
    a = np.asarray(acc_t)
    alive = np.asarray(m) > 0
    rn = np.linalg.norm(ref_t, axis=1)
    err_t = np.linalg.norm(a - ref_t, axis=1)[alive] / np.maximum(
        rn[alive], 1e-30
    )
    assert np.all(np.isfinite(err_t))
    # must NOT cost the quadrupole win (origin-accumulated moments give a
    # relative error on P of O((|c|/w)^2 2^-24) ~ 1e2 here — garbage Q)
    assert np.median(err_t) < 3.0 * max(np.median(err0), 1e-6), (
        np.median(err0), np.median(err_t)
    )
    assert np.percentile(err_t, 99) < 3.0 * max(
        np.percentile(err0, 99), 1e-5
    )


def test_bh_quad_2d_quadtree():
    """Quad mode on a 2D state (quadtree): z-moments are identically zero
    and the result must still beat mono."""
    n = 4096
    rng = np.random.default_rng(3)
    pos = rng.uniform(-3, 3, (n - 5, 2)).astype(np.float32)
    vel = np.zeros_like(pos)
    mass = rng.uniform(0.5, 1.5, n - 5).astype(np.float32)
    state = ParticleState.create(pos, vel, mass, capacity=n,
                                 dtype=jnp.float32)
    params = SimParams.create(dt=1e-2, g_soft=0.05, theta2=1.0,
                              bounds_center=(0.0, 0.0),
                              bounds_width=10.0, dtype=jnp.float32)
    m = state.effective_mass()
    ref = np.asarray(force_dense(state.pos, m, params))
    # small groups + narrow window so the theta-walk actually accepts nodes
    # (auto_for(4096)'s window would cover the whole array -> exact pass and
    # mono == quad trivially)
    base = dict(dim=2, max_level=6, group_size=128, subgroups=8,
                window_pad=128, frontier_cap=2048, accept_cap=1024,
                near_cell_cap=1024, near_particle_cap=2048, start_level=1,
                chunk_groups=1)
    err_m, _ = _bh_errors(state, params, m, ref,
                          BHConfig(multipole="mono", **base))
    err_q, _ = _bh_errors(state, params, m, ref,
                          BHConfig(multipole="quad", **base))
    assert np.median(err_q) < 0.5 * np.median(err_m), (
        np.median(err_m), np.median(err_q)
    )
    assert np.all(np.isfinite(err_q))
