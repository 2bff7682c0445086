"""Scene auto-detection + adaptive regime resolution (round 4, VERDICT r3
#3/#4): the build-time leaf-occupancy histogram routes steep-core scenes to
the density-adaptive profile (the reference never silently returns
22x-wrong forces on its own scene — src/main.rs picks engines explicitly,
so misconfiguration is visible there; here 'auto' must see the scene), and
picks the measured deep (ml7+R3+t128) vs tight-box (ml6+R4+t512) adaptive
stack per scene.

Measured discriminators (results/plummer_1m.jsonl + the round-4 occupancy
table): occupied-cell contrast at level 6 — disc 13-15, Plummer 54-8435;
fraction of particles in over-128 level-7 cells — Plummer w40 0.72 (deep
refinement has purchase), w10 3e-4 (it fires on nothing -> tight stack)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.api import Simulation
from nbody_tpu.ops.traversal import (
    ADAPTIVE_OVERRIDES,
    ADAPTIVE_TIGHT_OVERRIDES,
    detect_scene_profile,
    resolve_adaptive_overrides,
    scene_occupancy,
)
from nbody_tpu.scenes import plummer_sphere, self_gravitating_disc

CENTER = (0.0, 0.0, 0.0)


def test_contrast_separates_disc_from_plummer():
    disc = self_gravitating_disc(20000, seed=0)[0]
    plum = plummer_sphere(20000, scale=1.0, seed=0)[0]
    occ_d = scene_occupancy(disc, CENTER, 10.0)
    occ_p = scene_occupancy(plum, CENTER, 40.0)
    assert occ_d["contrast"] < 40 < occ_p["contrast"]
    assert detect_scene_profile(disc, CENTER, 10.0) == "fast"
    assert detect_scene_profile(plum, CENTER, 40.0) == "adaptive"


def test_adaptive_regime_choice_matches_measured_rule():
    """At or above ADAPTIVE_CUT_MIN_N the 1M regime split applies: deep
    stack only where the over-threshold level-7 cells hold most of the
    mass (frac >= DEEP_FRAC = 0.5), tight otherwise.  BELOW the cut the
    regime split does not transfer (round 5, VERDICT r4 #3: tight+big
    bottomed at p99 0.055-0.070 and deep at 0.686 at 131k w40) — every
    mid-N steep core gets the measured ADAPTIVE_MIDN_OVERRIDES stack
    (p99 0.0065 @ w40 / 0.0440 @ w10, midn_adaptive_r5.jsonl)."""
    from nbody_tpu.ops.traversal import (ADAPTIVE_CUT_MIN_N,
                                         ADAPTIVE_MIDN_OVERRIDES)

    plum = plummer_sphere(70000, scale=1.0, seed=0)[0]

    def stack_of(ov):
        return {k: ov[k] for k in ("max_level", "refine_levels",
                                   "refine_threshold")}

    # 70k < ADAPTIVE_CUT_MIN_N: the mid-N stack at EVERY width —
    # including w160 where the old frac rule picked the (mid-N-broken)
    # deep stack
    for width in (160.0, 40.0, 10.0):
        ov = resolve_adaptive_overrides(plum, CENTER, width)
        assert stack_of(ov) == stack_of(ADAPTIVE_MIDN_OVERRIDES), width
        assert ov["frontier_cap"] == 16384  # the mid-N floor fix
    # above the cut the 1M regime split still applies: same scene scaled
    # up by repetition is overkill here — pin via the occupancy override
    occ_deep = dict(n_in=ADAPTIVE_CUT_MIN_N + 1, frac_over128_l7=0.72,
                    contrast=500.0)
    occ_tight = dict(occ_deep, frac_over128_l7=0.01)
    assert stack_of(resolve_adaptive_overrides(
        plum, CENTER, 40.0, occupancy=occ_deep)) == stack_of(
            ADAPTIVE_OVERRIDES)
    assert stack_of(resolve_adaptive_overrides(
        plum, CENTER, 40.0, occupancy=occ_tight)) == stack_of(
            ADAPTIVE_TIGHT_OVERRIDES)


def test_occupancy_handles_empty_and_offcenter():
    # everything out of bounds -> benign defaults, no crash
    far = np.full((100, 3), 99.0)
    occ = scene_occupancy(far, CENTER, 10.0)
    assert occ["n_in"] == 0 and occ["contrast"] == 1.0
    # translated scene: detection must happen in the box frame
    plum = np.asarray(plummer_sphere(20000, scale=1.0, seed=0)[0]) + 50.0
    assert detect_scene_profile(plum, (50.0, 50.0, 50.0), 40.0) == "adaptive"


def test_auto_engine_detects_steep_core():
    """engine='auto' above the brute crossover routes a steep-core scene to
    profile='adaptive' with the per-scene stack, and leaves the disc scene
    on the fast defaults.  Construction only — no force compile."""
    plum = plummer_sphere(70000, scale=1.0, seed=0)
    sim = Simulation(*plum, engine="auto", bounds_width=40.0,
                     dtype=jnp.float32, g_soft=0.02, theta2=1.0)
    assert sim.engine.name.startswith("bh")
    assert sim.engine_options.get("profile") == "adaptive"
    assert sim.engine_options.get("max_level") == (
        ADAPTIVE_TIGHT_OVERRIDES["max_level"])

    disc = self_gravitating_disc(70000, seed=0)
    simd = Simulation(*disc, engine="auto", bounds_width=10.0,
                      dtype=jnp.float32, g_soft=0.02, theta2=1.0)
    assert simd.engine_options.get("profile") is None

    # explicit profile wins over detection
    simo = Simulation(*plum, engine="auto", bounds_width=40.0,
                      engine_options=dict(profile="fast"),
                      dtype=jnp.float32, g_soft=0.02, theta2=1.0)
    assert simo.engine_options.get("profile") == "fast"
    assert "refine_levels" not in simo.engine_options


def test_profile_adaptive_resolves_regime_in_api():
    """The plain profile='adaptive' spelling (no explicit depth fields)
    resolves the per-scene stack at Simulation init."""
    plum = plummer_sphere(20000, scale=1.0, seed=0)
    sim = Simulation(*plum, engine="bh", bounds_width=10.0,
                     engine_options=dict(profile="adaptive"),
                     dtype=jnp.float32, g_soft=0.02, theta2=1.0)
    assert sim.engine_options["max_level"] == (
        ADAPTIVE_TIGHT_OVERRIDES["max_level"])
    assert sim.engine_options["refine_levels"] == (
        ADAPTIVE_TIGHT_OVERRIDES["refine_levels"])
    # explicit depth fields suppress the resolution
    sim2 = Simulation(*plum, engine="bh", bounds_width=10.0,
                      engine_options=dict(profile="adaptive", max_level=5),
                      dtype=jnp.float32, g_soft=0.02, theta2=1.0)
    assert sim2.engine_options["max_level"] == 5
    assert "refine_levels" not in sim2.engine_options


@pytest.mark.slow
def test_auto_adaptive_step_runs():
    """The detected adaptive config actually steps (small N, CPU)."""
    pos, vel, mass = plummer_sphere(70000, scale=1.0, seed=0)
    sim = Simulation(pos, vel, mass, engine="auto", bounds_width=40.0,
                     dtype=jnp.float32, dt=1e-3, g_soft=0.02, theta2=1.0)
    sim.step()
    p, _, _, _ = sim.get_points()
    assert np.all(np.isfinite(p))


def test_contrast_cut_robust_across_families():
    """VERDICT r4 #8: the STEEP_CONTRAST = 40 cut measured across 8 scene
    families x 3 N (results/scene_contrast.jsonl, 2026-08-20): flat
    families (disc 13.5-14.1, cube 2.2-5.0) never approach the cut from
    below, and every cusped/composite family (Plummer, Hernquist,
    disc+bulge at two bulge weights, each at its natural widths) clears
    96+ — a 6.8x gap around the cut, so no hysteresis is needed.  This
    test pins the nearest measured points on each side at test-affordable
    N (above the ~60k brute crossover, where detection actually routes —
    below it 'auto' picks the exact direct sum and the cut is moot; a 30k
    disc_bulge composite reads 28 for exactly that reason)."""
    from nbody_tpu.scenes import disc_bulge, hernquist_sphere, uniform_cube

    n = 70000
    # flat side: well under the cut
    for pos, width in [(self_gravitating_disc(n, seed=0)[0], 10.0),
                       (uniform_cube(n, width=8.0, seed=0)[0], 10.0)]:
        occ = scene_occupancy(pos, CENTER, width)
        assert occ["contrast"] < 25, occ
        assert detect_scene_profile(pos, CENTER, width,
                                    occupancy=occ) == "fast"
    # cusped side: the two families nearest the cut in the table
    # (plummer w10 ~96 at 131k, hernquist w10 ~103) plus the composite
    for pos, width in [(plummer_sphere(n, scale=1.0, seed=0)[0], 10.0),
                       (hernquist_sphere(n, scale=1.0, seed=0)[0], 10.0),
                       (disc_bulge(n, seed=0)[0], 10.0)]:
        occ = scene_occupancy(pos, CENTER, width)
        assert occ["contrast"] > 40, occ
        assert detect_scene_profile(pos, CENTER, width,
                                    occupancy=occ) == "adaptive"


def test_occupancy_stride_scaling():
    """Above sample_cap the per-cell counts are scaled by the subsample
    stride before the >128 refine threshold (advisor r4): the subsampled
    statistic must track the full-count one, not collapse toward zero."""
    plum = np.asarray(plummer_sphere(300000, scale=1.0, seed=0)[0])
    full = scene_occupancy(plum, CENTER, 40.0)              # exact counts
    sub = scene_occupancy(plum, CENTER, 40.0, sample_cap=50000)
    assert abs(sub["frac_over128_l7"] - full["frac_over128_l7"]) < 0.12, (
        sub, full)
    # contrast under subsampling is biased LOW when the median occupied
    # cell holds fewer than ~stride particles (the median clamps at 1
    # while the tail scales) — measured 1014 vs 4107 at stride 7 here.
    # Routing is unaffected: steep scenes sit orders of magnitude above
    # the cut.  Pin that the routing survives and the bias stays bounded
    # by the stride.
    stride = 300000 // 50000 + 1
    assert sub["contrast"] > 40 and (
        full["contrast"] / stride <= sub["contrast"] <= full["contrast"])
    assert detect_scene_profile(plum, CENTER, 40.0) == "adaptive"
