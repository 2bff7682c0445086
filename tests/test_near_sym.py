"""cfg.near_sym: Newton-3 symmetric evaluation of each group's self square.

The split-window assembly must reproduce the asymmetric window pass's force
set EXACTLY (same coverage mask, same near/fb routing — only summation order
differs), including groups at the array edges where the window clamp moves
the group's offset inside the window (off = gstart - wstart spans its whole
[0, 2*pad] range across these scenes)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.ops.traversal import BHConfig, bh_accel
from nbody_tpu.scenes import self_gravitating_disc

# small groups so an 8k scene has 16 groups (edge + interior windows) and
# the near/fb budgets actually engage
SYM_CFG = dict(group_size=512, subgroups=8, window_pad=128, eval_tile=256,
               near_particle_cap=1024, near_cell_cap=512, frontier_cap=2048,
               accept_cap=2048, chunk_groups=2, max_level=6)


def _disc(n=8000, capacity=8192, kill=0, dtype=jnp.float32):
    pos, vel, mass = self_gravitating_disc(n, seed=11)
    state = ParticleState.create(pos, vel, mass, capacity=capacity,
                                 dtype=dtype)
    if kill:
        alive = state.alive.at[2:2 + kill].set(False)
        state = dataclasses.replace(state, alive=alive)
    params = SimParams.create(dt=3e-2, g_soft=0.02, theta2=1.0,
                              bounds_width=10.0, dtype=dtype)
    return state, params, state.effective_mass()


def _rel(a, b, m):
    a, b = np.asarray(a), np.asarray(b)
    alive = np.asarray(m) > 0
    bn = np.linalg.norm(b, axis=1)
    return (np.linalg.norm(a - b, axis=1)[alive]
            / np.maximum(bn[alive], 1e-30))


@pytest.mark.parametrize("multipole", ["mono", "quad"])
@pytest.mark.parametrize("kill", [0, 33])
def test_near_sym_matches_asym(multipole, kill):
    state, params, m = _disc(kill=kill)
    base = BHConfig(multipole=multipole, **SYM_CFG)
    sym = dataclasses.replace(base, near_sym=True)
    a0, s0 = bh_accel(state.pos, m, params.bounds, params.theta2,
                      params.g, params.g_soft, base)
    a1, s1 = bh_accel(state.pos, m, params.bounds, params.theta2,
                      params.g, params.g_soft, sym)
    # identical force SET -> identical routing stats
    for k in ("near_fallback", "frontier_fallback", "fb_spill",
              "accept_dropped"):
        assert int(s0[k]) == int(s1[k]), k
    rel = _rel(a1, a0, m)
    # same pairs, different f32 summation order (tail rows are near-
    # cancelling force sums; the f64 test below pins the set identity)
    assert float(np.median(rel)) < 1e-5
    assert float(rel.max()) < 5e-3


def test_near_sym_force_set_identical_f64():
    """In f64 the summation-order noise shrinks to ~1e-12, so any coverage
    bug (a missing, duplicated, or rerouted pair) would stand out by ~10
    orders of magnitude.  Measured at introduction: median 4.1e-15, max
    3.3e-12."""
    state, params, m = _disc(dtype=jnp.float64)
    base = BHConfig(multipole="mono", **SYM_CFG)
    sym = dataclasses.replace(base, near_sym=True)
    a0, _ = bh_accel(state.pos, m, params.bounds, params.theta2,
                     params.g, params.g_soft, base)
    a1, _ = bh_accel(state.pos, m, params.bounds, params.theta2,
                     params.g, params.g_soft, sym)
    rel = _rel(a1, a0, m)
    assert float(rel.max()) < 1e-10


def test_near_sym_with_block_dual():
    """With block_dual the slab tiling itself changes (rim+near instead of
    window+near), so the accepted tile SETS legitimately differ — compare
    both configs to a dense reference instead of to each other."""
    from nbody_tpu.engines.brute_force import force_tiled

    state, params, m = _disc()
    ref = np.asarray(force_tiled(state.pos, m, params))
    base = BHConfig(multipole="quad", block_dual=True, dual_margin=1.2,
                    **SYM_CFG)
    sym = dataclasses.replace(base, near_sym=True)
    a0, s0 = bh_accel(state.pos, m, params.bounds, params.theta2,
                      params.g, params.g_soft, base)
    a1, s1 = bh_accel(state.pos, m, params.bounds, params.theta2,
                      params.g, params.g_soft, sym)
    assert np.all(np.isfinite(np.asarray(a1)))
    e0 = _rel(a0, ref, m)
    e1 = _rel(a1, ref, m)
    # same accuracy envelope as the asymmetric path
    assert float(np.percentile(e1, 99)) <= max(
        1.3 * float(np.percentile(e0, 99)), float(np.percentile(e0, 99)) + 1e-3)
    assert float(np.median(e1)) <= max(3 * float(np.median(e0)), 1e-4)


def test_near_sym_unsoftened():
    """g_soft = 0 exercises the guarded symmetric kernel path end to end."""
    state, params, m = _disc()
    params = dataclasses.replace(params, g_soft=jnp.float32(0.0))
    base = BHConfig(multipole="quad", **SYM_CFG)
    sym = dataclasses.replace(base, near_sym=True)
    a0, _ = bh_accel(state.pos, m, params.bounds, params.theta2,
                     params.g, params.g_soft, base)
    a1, _ = bh_accel(state.pos, m, params.bounds, params.theta2,
                     params.g, params.g_soft, sym)
    assert np.all(np.isfinite(np.asarray(a1)))
    rel = _rel(a1, a0, m)
    assert float(np.median(rel)) < 1e-5


def test_near_sym_single_group_degenerate():
    """n_tot == group_size: the window covers everything, the rim is
    W - B < 2*pad, off spans the clamped range."""
    state, params, m = _disc(n=500, capacity=512)
    base = BHConfig(multipole="quad", group_size=512, subgroups=8,
                    window_pad=128, eval_tile=256, near_particle_cap=512,
                    near_cell_cap=256, frontier_cap=1024, accept_cap=1024,
                    chunk_groups=1, max_level=5)
    sym = dataclasses.replace(base, near_sym=True)
    a0, _ = bh_accel(state.pos, m, params.bounds, params.theta2,
                     params.g, params.g_soft, base)
    a1, _ = bh_accel(state.pos, m, params.bounds, params.theta2,
                     params.g, params.g_soft, sym)
    rel = _rel(a1, a0, m)
    assert float(rel.max()) < 5e-3


def test_near_sym_2d():
    """2D rides the 3D row layout (z = 0); the symmetric square must too."""
    rng = np.random.default_rng(5)
    pos = rng.normal(scale=2.0, size=(2000, 2)).astype(np.float32)
    mass = rng.uniform(0.5, 1.5, 2000).astype(np.float32)
    state = ParticleState.create(pos, np.zeros_like(pos), mass,
                                 capacity=2048, dtype=jnp.float32)
    params = SimParams.create(dt=1e-2, g_soft=0.05, theta2=1.0,
                              bounds_center=(0.0, 0.0),
                              bounds_width=12.0, dtype=jnp.float32)
    m = state.effective_mass()
    base = BHConfig(dim=2, multipole="mono", group_size=256, subgroups=8,
                    window_pad=64, eval_tile=128, near_particle_cap=512,
                    near_cell_cap=256, frontier_cap=1024, accept_cap=1024,
                    chunk_groups=1, max_level=6)
    sym = dataclasses.replace(base, near_sym=True)
    a0, _ = bh_accel(state.pos, m, params.bounds, params.theta2,
                     params.g, params.g_soft, base)
    a1, _ = bh_accel(state.pos, m, params.bounds, params.theta2,
                     params.g, params.g_soft, sym)
    rel = _rel(a1, a0, m)
    # the symmetric gaussian cloud has rows whose net force nearly cancels,
    # amplifying f32 order noise (f64 max is 1.4e-11: identical force set,
    # same routing stats) — gate median/p99, not the cancelling max row
    assert float(np.median(rel)) < 1e-4
    assert float(np.percentile(rel, 99)) < 1e-2


def test_self_square_kernel_interpret_matches_xla():
    """group_self_force_pallas (interpret mode) == the XLA fallback on
    random groups with partially masked source masses."""
    from nbody_tpu.ops.group_force import group_self_force_pallas
    from nbody_tpu.ops.traversal import _self_square_eval

    rng = np.random.default_rng(9)
    G, B = 3, 512
    tgt8 = np.zeros((G, B, 8), np.float32)
    tgt8[..., :3] = rng.normal(scale=3.0, size=(G, B, 3))
    tgt8[..., 3] = rng.uniform(0.5, 1.5, (G, B))
    msrc = tgt8[..., 3] * (rng.uniform(size=(G, B)) > 0.3)
    cfg = BHConfig(eval_mode="xla", chunk_groups=1, mxu_blocks=False)
    ref = _self_square_eval(jnp.asarray(tgt8), jnp.asarray(msrc),
                            jnp.float32(1.0), jnp.float32(0.02), cfg)
    got = group_self_force_pallas(jnp.asarray(tgt8), jnp.asarray(msrc),
                                  jnp.float32(1.0), jnp.float32(0.02),
                                  tile_i=128, tile_j=256, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=1e-6)
