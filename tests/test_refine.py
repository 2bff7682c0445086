"""Density-adaptive refinement (BHConfig.refine_levels): per-octant levels
below the dense pyramid's leaf grid for cells denser than any static budget
(VALIDATION.md §18 quantified the need: a 1e5:1 density-contrast core is
leaf-resolution-limited under every static config).  The reference's
pointer trees subdivide adaptively by construction
(src/manual/barnes_hut.rs:143-183); here refinement is a compacted,
statically-shaped extension of the linear octree."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.core.state import Bounds
from nbody_tpu.ops.traversal import BHConfig, bh_accel, bh_potential
from nbody_tpu.ops.tree import build_octree


def clustered_scene(n=4096, seed=0, sigma=0.03):
    """Half the particles in a tight core, half uniform background —
    the density contrast that defeats static depth/budget configs."""
    rng = np.random.default_rng(seed)
    pos = np.concatenate(
        [rng.normal(0, sigma, (n // 2, 3)), rng.uniform(-4, 4, (n // 2, 3))]
    ).astype(np.float32)
    mass = np.full(n, 1.0 / n, np.float32)
    return jnp.asarray(pos), jnp.asarray(mass), Bounds.cube((0.0, 0.0, 0.0), 10.0)


def brute_ref(P, M, eps):
    d = P[None, :, :] - P[:, None, :]
    r2 = (d * d).sum(-1) + eps * eps
    inv = jnp.where(jnp.eye(len(M), dtype=bool), 0.0, r2 ** -1.5)
    return (d * (M[None, :, None] * inv[:, :, None])).sum(1)


# deliberately starved budgets: the unrefined walk MUST overflow on the
# core so the test measures what refinement fixes
STARVED = dict(max_level=4, group_size=512, subgroups=16, window_pad=128,
               near_particle_cap=256, near_cell_cap=256, frontier_cap=2048,
               accept_cap=2048, fb_cap=256, chunk_groups=1, start_level=2)


def test_refined_build_partitions_parents():
    """Refined children tile their parent's sorted range exactly and carry
    the right mass/moments; the coarse pyramid is untouched by the deep
    sort (leaf codes are deep-code prefixes)."""
    P, M, b = clustered_scene()
    t = build_octree(P, M, b, max_level=3, refine_levels=2, refine_cap=64,
                     refine_threshold=64)
    t0 = build_octree(P, M, b, max_level=3)
    for l in range(4):
        np.testing.assert_allclose(np.asarray(t.level_mass[l]),
                                   np.asarray(t0.level_mass[l]),
                                   rtol=1e-6, atol=1e-7)
    assert np.array_equal(np.asarray(t.code_s), np.asarray(t0.code_s))

    sl = np.asarray(t.refine_slot_leaf)
    ls = np.asarray(t.leaf_starts)
    tab0 = np.asarray(t.refine_tables[0])
    ms = np.asarray(t.mass_s)
    ps = np.asarray(t.pos_s)
    flagged = np.nonzero(sl >= 0)[0]
    assert len(flagged) >= 1
    for c in flagged:
        rows = tab0[sl[c] * 8:(sl[c] + 1) * 8]
        cs, ce = rows[:, 4].astype(int), rows[:, 5].astype(int)
        assert cs[0] == ls[c] and ce[-1] == ls[c + 1]
        assert np.all(cs[1:] == ce[:-1])
        for k in range(8):
            np.testing.assert_allclose(
                rows[k, 0], ms[cs[k]:ce[k]].sum(), rtol=1e-6, atol=1e-9)
            np.testing.assert_allclose(
                rows[k, 1:4], (ps[cs[k]:ce[k]] * ms[cs[k]:ce[k], None]).sum(0),
                rtol=2e-5, atol=1e-6)
    # second level tiles the first
    cm = np.asarray(t.refine_child_slot[0])
    tab1 = np.asarray(t.refine_tables[1])
    deeper = np.nonzero(cm >= 0)[0]
    assert len(deeper) >= 1
    for j in deeper:
        rows = tab1[cm[j] * 8:(cm[j] + 1) * 8]
        cs, ce = rows[:, 4].astype(int), rows[:, 5].astype(int)
        assert cs[0] == int(tab0[j, 4]) and ce[-1] == int(tab0[j, 5])
        np.testing.assert_allclose(rows[:, 0].sum(), tab0[j, 0], rtol=1e-6)


def test_refinement_fixes_dense_core_error():
    """On a starved config the unrefined walk's core error is catastrophic
    (fallback multipoles for cells the targets sit inside); two refined
    levels must bring p99 relative force error under 1e-2."""
    P, M, b = clustered_scene(n=4096)
    eps = 1e-2
    ref = np.asarray(brute_ref(P, M, eps))
    nref = np.linalg.norm(ref, axis=1)
    floor = 0.05 * np.median(nref)

    def err_p99(cfg):
        acc, stats = bh_accel(P, M, b, jnp.float32(1.0), jnp.float32(1.0),
                              jnp.float32(eps), cfg)
        e = np.linalg.norm(np.asarray(acc) - ref, axis=1)
        return np.percentile(e / np.maximum(nref, floor), 99), stats

    p0, s0 = err_p99(BHConfig(**STARVED))
    p2, s2 = err_p99(BHConfig(**STARVED, refine_levels=2, refine_cap=512,
                              refine_frontier=512))
    assert p0 > 0.5, p0  # the starved config really is broken here
    assert p2 < 1e-2, p2
    assert int(np.sum(s2["refine_near_totals"])) > 0
    assert int(s2["refine_build_dropped"]) == 0
    assert int(s2["accept_dropped"]) == 0


def test_refined_matches_unrefined_on_uniform_scene():
    """A scene with no cell above the threshold builds empty refined
    tables; forces match the unrefined walk to f32 roundoff (the deep sort
    reorders only within leaf cells, which perturbs summation order)."""
    rng = np.random.default_rng(3)
    P = jnp.asarray(rng.uniform(-4, 4, (2048, 3)).astype(np.float32))
    M = jnp.full((2048,), 1.0 / 2048, jnp.float32)
    b = Bounds.cube((0.0, 0.0, 0.0), 10.0)
    base = BHConfig(**STARVED)
    fine = BHConfig(**STARVED, refine_levels=2, refine_cap=256,
                    refine_frontier=512, refine_threshold=4096)
    a0, _ = bh_accel(P, M, b, jnp.float32(1.0), jnp.float32(1.0),
                     jnp.float32(1e-2), base)
    a1, _ = bh_accel(P, M, b, jnp.float32(1.0), jnp.float32(1.0),
                     jnp.float32(1e-2), fine)
    scale = np.median(np.linalg.norm(np.asarray(a0), axis=1))
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0),
                               atol=1e-4 * scale, rtol=1e-3)


def test_refined_potential_runs():
    """bh_potential shares the refined walk; U must land near the exact
    pair PE on the clustered scene."""
    P, M, b = clustered_scene(n=2048)
    eps = 1e-1  # softening large enough that the core PE is resolvable
    cfg = BHConfig(**STARVED, refine_levels=2, refine_cap=512,
                   refine_frontier=512)
    U, _ = bh_potential(P, M, b, jnp.float32(1.0), jnp.float32(1.0),
                        jnp.float32(eps), cfg)
    d = P[None, :, :] - P[:, None, :]
    r2 = (d * d).sum(-1) + eps * eps
    inv = jnp.where(jnp.eye(len(M), dtype=bool), 0.0, r2 ** -0.5)
    U_ref = -0.5 * jnp.sum(M[:, None] * M[None, :] * inv)
    assert abs(float(U) - float(U_ref)) < 2e-3 * abs(float(U_ref))


def test_refine_2d_quadtree():
    """dim=2 refinement: branch-4 tables, forces finite and close to the
    2D brute reference."""
    rng = np.random.default_rng(5)
    n = 1024
    pos = np.concatenate(
        [rng.normal(0, 0.03, (n // 2, 2)), rng.uniform(-4, 4, (n // 2, 2))]
    ).astype(np.float32)
    P = jnp.asarray(pos)
    M = jnp.full((n,), 1.0 / n, jnp.float32)
    b = Bounds.cube((0.0, 0.0), 10.0)
    cfg = BHConfig(dim=2, max_level=4, group_size=256, subgroups=16,
                   window_pad=64, near_particle_cap=128, near_cell_cap=128,
                   frontier_cap=1024, accept_cap=1024, fb_cap=128,
                   chunk_groups=1, start_level=2, refine_levels=2,
                   refine_cap=256, refine_frontier=256, multipole="mono")
    acc, _ = bh_accel(P, M, b, jnp.float32(1.0), jnp.float32(1.0),
                      jnp.float32(1e-2), cfg)
    d = P[None, :, :] - P[:, None, :]
    r2 = (d * d).sum(-1) + 1e-4
    inv = jnp.where(jnp.eye(n, dtype=bool), 0.0, r2 ** -1.5)
    ref = np.asarray((d * (M[None, :, None] * inv[:, :, None])).sum(1))
    a = np.asarray(acc)
    assert np.all(np.isfinite(a))
    nref = np.linalg.norm(ref, axis=1)
    e = np.linalg.norm(a - ref, axis=1) / np.maximum(
        nref, 0.05 * np.median(nref))
    assert np.percentile(e, 99) < 5e-2, np.percentile(e, 99)


def test_refine_config_validation():
    with pytest.raises(ValueError, match="Morton depth"):
        BHConfig(max_level=8, refine_levels=3)
    with pytest.raises(ValueError, match="wide row format"):
        BHConfig(max_level=4, refine_levels=2, wide=True)
    with pytest.raises(ValueError, match="fb_quad"):
        BHConfig(max_level=4, refine_levels=2, fb_quad=True, quad_leaf=True)
    with pytest.raises(ValueError, match="refine_frontier"):
        BHConfig(max_level=4, refine_levels=2, refine_frontier=100)
    # threshold auto-resolution
    assert BHConfig(near_particle_cap=777).refine_threshold_resolved == 777
    assert BHConfig(refine_threshold=9).refine_threshold_resolved == 9


def test_refine_gates():
    """Trees built without refinement are rejected; topology caching
    (walk reuse / bh-lazy) and the domain path refuse refined configs."""
    from nbody_tpu.ops.traversal import traverse_tree

    P, M, b = clustered_scene(n=1024)
    cfg = BHConfig(**STARVED, refine_levels=2, refine_cap=256,
                   refine_frontier=512)
    plain = build_octree(P, M, b.centered(), cfg.max_level)
    with pytest.raises(ValueError, match="without"):
        traverse_tree(plain, b.centered(), 1.0, 1.0, 1e-2, cfg, P.shape[0])
    t = build_octree(P, M, b.centered(), cfg.max_level,
                     refine_levels=cfg.refine_levels,
                     refine_cap=cfg.refine_cap,
                     refine_threshold=cfg.refine_threshold_resolved)
    with pytest.raises(ValueError, match="caching"):
        traverse_tree(t, b.centered(), 1.0, 1.0, 1e-2, cfg, P.shape[0],
                      return_topo=True)
