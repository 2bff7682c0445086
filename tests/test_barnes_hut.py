"""Barnes-Hut tree build + traversal correctness.

The reference has no tests; its implicit validation is cross-implementation
benchmark parity (SURVEY.md §4).  Here the oracle is our own brute-force
engine (itself oracle-tested against numpy in test_brute_force.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.core.state import Bounds, ParticleState, SimParams
from nbody_tpu.engines.brute_force import force_dense
from nbody_tpu.ops.tree import build_octree, leaf_ranges
from nbody_tpu.ops.traversal import BHConfig, bh_accel
from nbody_tpu.scenes import self_gravitating_disc


def disc_state(n, dtype=jnp.float64, seed=0):
    pos, vel, mass = self_gravitating_disc(n, seed=seed)
    st = ParticleState.create(pos, vel, mass, dtype=dtype)
    return st


def test_tree_mass_conservation():
    st = disc_state(500)
    b = Bounds.cube([0.0, 0.0, 0.0], 10.0, dtype=jnp.float64)
    tree = build_octree(st.pos, st.effective_mass(), b, max_level=5)
    total = float(jnp.sum(st.effective_mass()))
    for l, m in enumerate(tree.level_mass):
        np.testing.assert_allclose(float(jnp.sum(m)), total, rtol=1e-12,
                                   err_msg=f"level {l}")
    # root COM == global COM
    com_root = np.asarray(tree.level_mpos[0][0] / tree.level_mass[0][0])
    com_true = np.asarray(
        jnp.sum(st.pos * st.effective_mass()[:, None], axis=0) / total
    )
    np.testing.assert_allclose(com_root, com_true, rtol=1e-12)


def test_leaf_ranges_partition():
    """Every alive particle appears in exactly one leaf range; dead particles
    (sentinel code) appear in none."""
    st = disc_state(300)
    st = st.remove_point(5)  # make one dead
    b = Bounds.cube([0.0, 0.0, 0.0], 10.0, dtype=jnp.float64)
    L = 4
    tree = build_octree(st.pos, st.effective_mass(), b, max_level=L)
    n_leaf = 1 << (3 * L)
    ids = jnp.arange(n_leaf, dtype=jnp.int32)
    start, end = leaf_ranges(tree, ids)
    counts = np.asarray(end - start)
    assert counts.sum() == 300  # 301 created, 1 dead, capacity padding dead
    # ranges are disjoint and sorted
    s, e = np.asarray(start), np.asarray(end)
    occ = counts > 0
    assert np.all(s[occ][1:] >= e[occ][:-1])


CFG_EXACT = BHConfig(
    max_level=4,
    group_size=64,
    window_pad=64,
    frontier_cap=4096,
    near_cell_cap=2048,
    near_particle_cap=512,
    start_level=1,
    chunk_groups=2,
)


def test_theta_zero_is_exact():
    """theta2=0 never accepts a node -> the traversal degenerates to exact
    summation (window pass + residual near field) and must equal the dense
    O(N^2) engine."""
    st = disc_state(300)
    params = SimParams.create(g_soft=0.02, theta2=0.0, dtype=jnp.float64)
    mass = st.effective_mass()
    acc, stats = bh_accel(
        st.pos, mass, params.bounds, params.theta2, params.g, params.g_soft,
        CFG_EXACT,
    )
    assert int(stats["frontier_fallback"]) == 0
    assert int(stats["near_fallback"]) == 0
    ref = force_dense(st.pos, mass, params)
    alive = np.asarray(st.alive)
    np.testing.assert_allclose(
        np.asarray(acc)[alive], np.asarray(ref)[alive], rtol=1e-10, atol=1e-12
    )


CFG_BH = BHConfig(
    max_level=6,
    group_size=64,
    window_pad=256,
    frontier_cap=8192,
    near_cell_cap=2048,
    near_particle_cap=2048,
    start_level=1,
    chunk_groups=4,
)


def _bh_err(n, theta2, cfg=CFG_BH, seed=1):
    st = disc_state(n, seed=seed)
    params = SimParams.create(g_soft=0.02, theta2=theta2, dtype=jnp.float64)
    mass = st.effective_mass()
    acc, stats = bh_accel(
        st.pos, mass, params.bounds, params.theta2, params.g, params.g_soft, cfg
    )
    assert int(stats["accept_dropped"]) == 0, "accept overflow"
    assert int(stats["frontier_fallback"]) == 0, "frontier fallback"
    assert int(stats["near_fallback"]) == 0, "near-field fallback"
    ref = force_dense(st.pos, mass, params)
    alive = np.asarray(st.alive)
    a, r = np.asarray(acc)[alive], np.asarray(ref)[alive]
    denom = np.linalg.norm(r, axis=1)
    return np.linalg.norm(a - r, axis=1) / np.maximum(denom, 1e-12)


def test_bh_accuracy_theta_half():
    """Relative force error at theta^2=0.5 (reference default,
    src/shared.rs:76) should be at the percent level or better."""
    err = _bh_err(1500, 0.5)
    assert np.median(err) < 2e-3, np.median(err)
    # the relative-error tail is dominated by near-cancellation particles
    # (net force ~ 0); the C++ oracle BH shows the same profile
    assert np.percentile(err, 99) < 5e-2, np.percentile(err, 99)


def test_bh_accuracy_improves_with_theta():
    e_tight = _bh_err(1000, 0.1)
    e_loose = _bh_err(1000, 1.5)
    assert np.median(e_tight) < np.median(e_loose)
    assert np.median(e_tight) < 1e-3


def test_bh_engine_in_step_loop():
    """The registered engine integrates: run 20 steps of the benchmark config
    and compare positions against the brute engine."""
    from nbody_tpu.api import Simulation

    pos, vel, mass = self_gravitating_disc(400, seed=2)
    common = dict(
        bounds_width=10.0, dtype=jnp.float64,
        dt=3e-2, g_soft=0.02, theta2=0.5,
    )
    sim_bh = Simulation(
        pos, vel, mass, engine="bh",
        engine_options=dict(
            max_level=6, group_size=64, window_pad=256, frontier_cap=8192,
            near_cell_cap=2048, near_particle_cap=2048, start_level=1,
            chunk_groups=4,
        ),
        **common,
    )
    sim_ref = Simulation(pos, vel, mass, engine="brute", **common)
    sim_bh.run(20)
    sim_ref.run(20)
    p_bh, _, _, _ = sim_bh.get_points()
    p_ref, _, _, _ = sim_ref.get_points()
    assert sim_bh.n_alive == sim_ref.n_alive
    # trajectories diverge slowly; after 20 steps they should still agree
    err = np.linalg.norm(p_bh - p_ref, axis=1)
    assert np.median(err) < 1e-3, np.median(err)
