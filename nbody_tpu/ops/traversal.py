"""Vectorized Barnes-Hut traversal: group-based breadth-first theta-walk over
the dense level pyramid, with masked gathers instead of pointer chasing.

Replaces the reference's per-particle recursive walk
(src/manual/barnes_hut.rs:185-203) and the LLM engines' per-particle explicit
stack walks (src/llm/barnes_hut.rs:774-877, fixed [usize;64] stack).

Design (the group-traversal shape of GPU treecodes, cf. PAPERS.md "tree method
with SIMD" / Bonsai, re-cast for the TPU's dense-tile execution model):

  * Particles are Morton-sorted (ops/tree.py), so consecutive blocks of
    ``group_size`` particles are spatially compact.  A whole *group* shares
    one traversal, turning divergent pointer chasing into dense regular
    [group, slots] arithmetic.
  * Acceptance is the reference criterion ``width^2 < theta2 * r^2``
    (src/manual/barnes_hut.rs:192) made *conservative for the group*: r is
    the exact distance from the node's center of mass to the group's
    bounding box.  Every accepted node is acceptable for every member;
    opened nodes only add accuracy.
  * **Morton-window near field**: each group directly sums a contiguous
    window of sorted neighbors (a static-size ``lax.dynamic_slice`` — dense
    VPU work, zero gathers).  During the walk, any cell whose particle range
    lies wholly inside the window is *removed* (it is summed exactly by the
    window pass); coverage is tracked with a scatter-add diff array so the
    window pass counts exactly the removed cells' particles.  This keeps
    the expensive gather path for the rare boundary cells only and is exact
    (direct sum) where Barnes-Hut would have been approximate.
  * The walk only *collects* (round-2 restructure): accepted nodes compact
    into a per-group monopole slab, boundary leaf cells into a gathered
    near-particle index list.  All O(B*S) interaction arithmetic then runs
    in ONE pass over the assembled source slab — on TPU via the fused
    Pallas kernel (ops/group_force.py) with per-tile skip of cap padding;
    elsewhere via the same math as XLA contractions.
  * Budget overflow (frontier slots, near-field caps) degrades cells to
    *self-excluded* monopoles evaluated in a small side slab — never a
    dropped force, and (new in round 2) never a softened self-interaction:
    a cell whose sorted range contains the target has the target's own
    mass/position subtracted from its aggregates exactly.  Counted in stats
    (the analog of the reference's stack-overflow warn-and-continue,
    src/llm/barnes_hut.rs:859-869).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from nbody_tpu.ops.tree import (
    LinearOctree,
    _compact,
    build_octree,
    decode_ranges,
    level_offset,
    wide_ranges,
)


# profile='dense' field stack (auto_for / make_bh_engine / --dense): the
# measured steep-core configuration from the 1M Plummer probe — depth 8 +
# doubled walk budgets + the mid-N near cap (VALIDATION.md §18).  A single
# shared constant so the engine/CLI/sharded spellings cannot drift.
DENSE_OVERRIDES = dict(max_level=8, near_particle_cap=2048,
                       frontier_cap=4096, accept_cap=4096,
                       near_cell_cap=4096, fb_cap=512)

# profile='adaptive' field stack (auto_for / make_bh_engine / --adaptive):
# the measured density-ADAPTIVE steep-core configuration from the 1M
# Plummer deep-refine probe (VALIDATION.md §19, deep_l7r3_t128 rows):
# three per-octant refined levels below a depth-7 grid for every cell
# over 128 particles, with the budget headroom the coarser grid frees
# spent on the fb/accept caps round 1 measured as the residual error
# carriers (accept drops 3.1k -> 0, fb spills 27k -> 3.6k).  p99_typ
# 1.7e-2 at width 40 — 3x INSIDE the disc accuracy envelope that every
# static stack missed (best 0.147) — at ~1.55 steps/s @1M (0.25x the
# disc-scene rate).  Tight boxes whose leaf cells already hold < 128
# particles should drop to max_level=6 / refine_levels=4 (measured
# 4.3e-2 at width 10 vs 5.2e-2 for this stack).  Single-chip only:
# refine_levels is gated off the sharded walks.
#
# Round-4 throughput re-tune (results/ada_tune_r4.jsonl, v5e
# 2026-08-20): the original §19 stack measured 663 ms/force @1M w40
# (1.51 calls/s) and the op profile (scripts/profile_adaptive.py)
# showed it budget-dominated, not hardware-floored: collect walk 271 ms
# (4x frontier/accept), pair kernel 150 ms (16k refined-near slab rows),
# XLA fb eval ~100 ms (fb_cap 2048 dense per group).  Probes with
# sampled-exact gates: fb 2048->512 is FREE (p99 identical to 7 digits
# — fb rows barely matter, consistent with the fb_quad findings),
# frontier 8192->2048 + accept 8192->4096 and refined-near 16384->8192
# each cost ~0.004 p99.  Shipped: 433 ms (2.31 calls/s, +53%) at p99
# 0.0248 vs 0.0165 before — both 2-3x inside the 5e-2 envelope; zero
# accept drops.  The conservative pre-cut stack remains one override
# away (fb_cap=2048, frontier_cap=8192, accept_cap=8192,
# refine_near_particle_cap=16384).
ADAPTIVE_OVERRIDES = dict(
    max_level=7, refine_levels=3, refine_threshold=128,
    near_particle_cap=2048, frontier_cap=2048, accept_cap=4096,
    near_cell_cap=4096, fb_cap=512, refine_frontier=1024,
    refine_near_cell_cap=2048, refine_near_particle_cap=4096)
# round-5 rnp 8192->4096 / rnc 4096->2048 (ada_tune_r4.jsonl rnp4k_rnc2k):
# -21% pair-kernel slab width for p99 0.0248 -> 0.0268 (envelope 5e-2),
# 2.57 -> 2.67 force calls/s on top of the sort-method searchsorted win

# the TIGHT-BOX adaptive stack (measured deep_l6r4 rows, VALIDATION.md §19):
# when the domain box is narrow relative to the core, the depth-7 grid's
# cells already hold fewer than 128 particles and the deep stack's
# refinement fires on nothing (the threshold compares per-CELL occupancy —
# rn=0 is the mechanism working, not a bug).  A depth-6 grid re-concentrates
# cells over the threshold and four refined levels recover the resolution:
# p99_typ 4.3e-2 at width 10 (deep stack: 5.2e-2, FAILS the 5e-2 envelope)
# and 3.3e-2 at width 40 (passes, but 2x the deep stack's 1.7e-2 — which is
# why the choice is resolved per scene, resolve_adaptive_overrides).
#
# Round-4 re-tune for THIS stack (tight_w10_* rows, ada_tune_r4.jsonl):
# w10 is the marginal regime, so it keeps more budget than the deep
# stack — the full deep cut measured p99 0.0489 (2% from the envelope,
# max 3.9) and accept_cap 4096 produced 703 TRUE drops; fb 2048->512 +
# frontier 8192->4096 with accept kept at 8192 ships 482 ms (2.08
# calls/s, +27% over 613 ms) at p99 0.0401 vs 0.0381 before, zero
# drops.
ADAPTIVE_TIGHT_OVERRIDES = dict(
    max_level=6, refine_levels=4, refine_threshold=512,
    near_particle_cap=2048, frontier_cap=4096, accept_cap=8192,
    near_cell_cap=4096, fb_cap=512, refine_frontier=1024,
    refine_near_cell_cap=2048, refine_near_particle_cap=8192)
# round-5 rnp 16384->8192 / rnc 4096->2048 (tight_w10_rnp8k_rnc2k row):
# +4% calls/s at 1M w10 with p99 FLAT to 4 digits (0.0401 -> 0.0402)

#: the round-4 budget cuts were measured at 1M and DO NOT transfer
#: down-N: at 131k w40 the cut tight stack read sampled p99_typ 0.59 vs
#: 0.078 with the §19 budgets (smoke_tpu, 2026-08-20) — at 32 groups the
#: per-group budget pressure concentrates differently.  At or below this
#: N the resolvers restore the §19 budgets (speed matters less there:
#: 131k adaptive already runs ~6 steps/s).
ADAPTIVE_CUT_MIN_N = 262145
_ADAPTIVE_BIG_BUDGETS = dict(frontier_cap=8192, accept_cap=8192,
                             fb_cap=2048, refine_near_particle_cap=16384)

#: the MID-N adaptive stack (round 5, VERDICT r4 #3; measured at 131k,
#: results/midn_adaptive_r5.jsonl): below ADAPTIVE_CUT_MIN_N neither 1M
#: regime stack reaches the envelope — tight+big-budgets bottomed at
#: p99 0.0548-0.0702 with frontier_fallback pinned at 1365 (mid-walk
#: parent-cap overflow is the floor there, NOT leaf resolution), and
#: deep read 0.686 flat (sparse-ml7 structural deficit).  The fix is
#: budget-shaped, not depth-shaped: the tight ml6+R4 grid with the
#: refine threshold dropped to 128 and the walk caps opened (frontier/
#: accept 16384, refined 2048/8192/32768) lands p99 0.0065 @ w40 and
#: 0.0440 @ w10 with ZERO drops, at ~0.85x the (out-of-envelope)
#: baseline rate — 4.02-4.17 force calls/s at 131k.  Replaces the old
#: mid-N big-budget fallback for BOTH regimes (the frac rule picked
#: 'deep' for wide boxes, but mid-N deep was measured broken).
ADAPTIVE_MIDN_OVERRIDES = dict(
    max_level=6, refine_levels=4, refine_threshold=128,
    near_particle_cap=2048, frontier_cap=16384, accept_cap=16384,
    near_cell_cap=4096, fb_cap=2048, refine_frontier=2048,
    refine_near_cell_cap=8192, refine_near_particle_cap=32768)


def scene_occupancy(pos, bounds_center, bounds_width, sample_cap=1 << 21):
    """Host-side (numpy) leaf-occupancy statistics of a scene — the cheap
    build-time histogram behind scene auto-detection and the adaptive
    regime choice (VERDICT r3 #3/#4).  Uses plain per-axis grid indices
    (no Morton interleave: occupancy is interleave-invariant) on the
    half-leaf-shifted grid convention of ops/tree.py:grid_bounds.

    Returns a dict:
      * ``contrast``  — p99.9 occupied-cell count / median occupied-cell
        count at level 6.  Measured (1M): benchmark disc 14, Plummer
        sphere 283 (w10) / 8435 (w40) — an order-of-magnitude gap at
        every probed level, robust to box width.  The statistic captures
        density CONTRAST, which is what overflows the per-group walk
        budgets; absolute occupancy does not (the 1M disc puts 23% of
        particles in over-512 cells at level 7 yet meets the accuracy
        envelope at the fast defaults).
      * ``frac_over128_l7`` — fraction of in-bounds particles in level-7
        cells holding > 128 (the deep stack's refine threshold).
        Measured: 0.72 at Plummer w40 (deep refinement has purchase),
        0.0003 at w10 (it fires on nothing — use the tight stack).
      * ``n_in`` — in-bounds particle count."""
    import numpy as np

    p = np.asarray(pos, dtype=np.float64)
    c = np.asarray(bounds_center, dtype=np.float64)
    half = float(bounds_width) / 2.0
    stride = 1
    if p.shape[0] > sample_cap:  # deterministic stride subsample
        stride = p.shape[0] // sample_cap + 1
        p = p[::stride]
    q = p - c[: p.shape[1]]
    alive = np.all(np.abs(q) <= half, axis=1)
    q = q[alive]
    out = {"n_in": int(q.shape[0])}
    if q.shape[0] == 0:
        out.update(contrast=1.0, frac_over128_l7=0.0)
        return out
    dim = q.shape[1]
    for level, key in ((6, "contrast"), (7, "frac_over128_l7")):
        cell = float(bounds_width) / (1 << level)
        g = np.clip(((q + half - 0.5 * cell) / cell).astype(np.int64),
                    0, (1 << level) - 1)
        cid = g[:, 0]
        for d in range(1, dim):
            cid = (cid << level) | g[:, d]
        counts = np.sort(np.unique(cid, return_counts=True)[1])
        if key == "contrast":
            hi = counts[max(0, int(len(counts) * 0.999) - 1)]
            out[key] = float(hi) / float(max(np.median(counts), 1.0))
        else:
            # the 128 cutoff is a TRUE per-cell count (the deep stack's
            # refine_threshold); subsampled counts underestimate it by
            # ~stride, so scale them back up before thresholding
            # (advisor r4: 5M measured 0.77 unscaled vs 0.85 true).
            # Contrast (the ratio above) is stride-invariant and needs no
            # correction.  Calibrated at N <= 2^21 = exact counts.
            out[key] = float(counts[counts * stride > 128].sum()) \
                / q.shape[0]
    return out


#: contrast above this = steep-core scene (auto-detection threshold; the
#: measured gap is 14 vs 92+ so the cut sits well clear of both sides)
STEEP_CONTRAST = 40.0
#: deep-stack purchase threshold on frac_over128_l7.  Measured on TPU
#: (2026-08-20): deep wins only when the over-threshold level-7 cells
#: hold MOST of the scene's mass — 1M Plummer w40 frac 0.72 -> deep
#: p99_typ 0.017 (tight 0.033); 131k w40 frac 0.27 -> deep 0.686 vs
#: tight 0.055-0.070 (the core-shoulder cells sit under the fixed count
#: threshold at the smaller N, and lowering the threshold measured
#: EXACTLY ZERO change — deep_t128/t64/t32/t16 all 0.6858 — so the
#: deficit is structural to the sparse ml7 grid, not the flagging);
#: 1M w10 frac 3e-4 -> deep fails its envelope, tight passes.  The
#: boundary between 0.35 (deep bad) and 0.72 (deep good) is unprobed;
#: 0.5 splits it.
DEEP_FRAC = 0.5


def resolve_adaptive_overrides(pos, bounds_center, bounds_width,
                               occupancy=None):
    """Pick the measured adaptive stack for THIS scene (VERDICT r3 #3):
    the deep grid (ADAPTIVE_OVERRIDES, ml7+R3+t128) where its refinement
    actually fires, the tight-box stack (ADAPTIVE_TIGHT_OVERRIDES,
    ml6+R4+t512) otherwise.  Both pass the 5e-2 envelope in their regime
    (plummer_1m.jsonl deep_* gate rows)."""
    occ = occupancy or scene_occupancy(pos, bounds_center, bounds_width)
    if occ["n_in"] < ADAPTIVE_CUT_MIN_N:
        # mid-N: ONE measured stack for both regimes (see
        # ADAPTIVE_MIDN_OVERRIDES — the 1M regime split does not
        # transfer down-N)
        return dict(ADAPTIVE_MIDN_OVERRIDES)
    deep = occ["frac_over128_l7"] >= DEEP_FRAC
    return dict(ADAPTIVE_OVERRIDES if deep else ADAPTIVE_TIGHT_OVERRIDES)


def detect_scene_profile(pos, bounds_center, bounds_width, occupancy=None):
    """'fast' or 'adaptive' from the density-contrast statistic (scene
    auto-detection, VERDICT r3 #4: plain defaults on a 1M Plummer core
    are 22x over the accuracy envelope — silently, unless detected)."""
    occ = occupancy or scene_occupancy(pos, bounds_center, bounds_width)
    return "adaptive" if occ["contrast"] > STEEP_CONTRAST else "fast"


@dataclass(frozen=True)
class BHConfig:
    """Static traversal configuration (hashable; part of the jit key)."""

    # Defaults tuned on TPU v5e (2026-08): large groups shift work from
    # irregular gathers/scatters (slow on TPU) into dense MXU/VPU evals.
    # Sweep (scripts/tune_bh_1m.py): group 4096 beats 2048 by ~11% at N=1M
    # (795ms vs 882ms) and ~6% at N=131k; 8192 regresses (VMEM pressure).
    max_level: int = 7  # leaf grid is 2^max_level per axis
    dim: int = 3  # 3 = octree, 2 = quadtree (the reference is generic over
    # D the same way, src/shared.rs:46-59)
    group_size: int = 4096  # particles sharing one traversal
    window_pad: int = 2048  # sorted-neighbor window extends this far each way
    frontier_cap: int = 2048  # frontier slots per level (children included)
    accept_cap: int = 2048  # accepted-monopole slab slots (ALL levels)
    near_cell_cap: int = 2048  # residual near-field cells per group
    near_particle_cap: int = 8192  # residual near-field particles per group
    fb_cap: int = 128  # overflow-fallback node slots (self-excluded
    # monopoles); overflow beyond this spills to the plain monopole slab
    far_particle_cap: int = 2048  # domain-decomposed runs only: residual
    # near-field particles whose cells lie OUTSIDE this chip's halo slab
    # (Morton-seam cells) — fetched by request/reply collective, so the cap
    # bounds the per-chip request buffer (parallel/domain.py)
    far_cell_cap: int = 512  # cell slots for the far list
    # NOTE on sizing: scenes that straddle an octant plane (the benchmark
    # disc sits exactly on z=0) put half of each group's spatial neighbors
    # at Morton-far indices, so the residual gather path stays material even
    # with a wide window.  Overflow is reported in stats — treat nonzero
    # drops as a mis-sized config.
    start_level: int = 3  # dense start: all 8^start_level cells (sweep:
    # 3 beats 2 by ~4% at 1M and ~3% at 131k — the dense 512-cell start
    # absorbs a whole frontier round; 4 regresses)
    chunk_groups: int = 1  # groups processed per lax.map iteration
    subgroups: int = 64  # bbox granularity: acceptance tests against the
    # union of this many per-subgroup boxes, so groups that straddle Morton
    # seams (two far-apart clusters) don't open the whole tree
    mxu_blocks: bool = True  # XLA eval mode: evaluate the slab as matmuls
    # (recentred norm-trick r² + matmul accumulation — no [B,S,3]
    # intermediate, contraction on the MXU).  False = elementwise VPU form.
    eval_mode: str = "auto"  # "pallas" = fused group-force kernel
    # (ops/group_force.py), "xla" = slab contraction, "auto" = pallas on
    # TPU f32, xla otherwise (CPU tests, f64)
    eval_tile: int = 2048  # pallas kernel source-tile width
    delta_onepass: bool = False  # collect the window-coverage diff
    # updates across ALL walk levels and apply them as ONE scatter-add
    # pair (instead of 2 scatters x ~10 levels).  Exact same integers —
    # scatter-add is associative — so this is a pure scheduling A/B
    # (VERDICT r4 #2: the walk's delta/compaction machinery is ~44% of
    # the adaptive force call); opt-in until measured on TPU.
    xla_p_block: int = -1  # XLA eval backend only: roll the pair block
    # over source-row blocks of this width (lax.scan accumulation) so the
    # [B, S] / [B, S, 3] intermediates never materialize beyond
    # [B, xla_p_block].  -1 = auto: 2048 off-TPU, unbounded on TPU (the
    # Pallas path never sees this; TPU-f64 XLA runs keep the fused form).
    # 0 = unbounded.  THIS is what made production-budget virtual-mesh
    # programs executable: at group 8192 / cg 8 / slab ~34816 the fused
    # XLA eval plans ~11.4 GB of temps PER PARTITION (91 GB for an
    # 8-device CPU mesh — the round-4 "compile blocker", actually an
    # execute-phase blowup; results/compile_blowup_bisect.jsonl).
    multipole: str = "quad"  # "mono" = classic Barnes-Hut monopoles;
    # "quad" = traceless quadrupole moments on the accepted-node slab —
    # one order of (w/d) more accurate at the same theta (p99 relative
    # force error at theta^2=1, N=1M: 7.2e-2 mono vs 3.0e-2 at the
    # quad defaults, median 4.4e-3 vs 8.3e-4, max 3.95 vs 0.73 —
    # results/accuracy_1m.jsonl quad3/quad2 rows).  The reference is
    # monopole-only (src/manual/barnes_hut.rs:192); quad is where the TPU
    # design spends its surplus FLOPs: ~31 extra flops/pair riding a dense
    # VPU kernel (ops/group_force.py) for a measured 4% step cost at 1M
    # (2.69 vs 2.80 force-only steps/s, tune_bh_r2.jsonl quad3_g8).
    quad_tile: int = 512  # quad-kernel source tile: SMALL on purpose — the
    # accept slab is prefix-compacted and mostly padding, and the kernel
    # skips whole empty tiles, so a 512-wide tile prunes ~2-4x of the
    # accept_cap eval that a 2048 tile would pay in full
    quad_leaf: bool = False  # True additionally builds/evaluates
    # quadrupoles for LEAF cells: measured pure cost (1M: 2.40 vs 2.69
    # steps/s) for identical p99/median accuracy (accuracy_1m.jsonl quad2
    # vs quad3 rows) — accepted leaves are individually tiny force
    # contributors, and the leaf level is the quad build's largest
    # segment-sum + reduction stage (8^L cells)
    fb_quad: bool = False  # quadrupole (self-excluded) on the fb overflow
    # slab too.  Default OFF: measured ~27 ms/step at N=1M for an
    # accuracy effect of exactly zero on the p99 tail (accuracy_1m.jsonl:
    # quad_auto vs quad_fb512 p99 identical to 7 digits) — the tail is
    # theta-truncation of accepted nodes, not fallback error, and inside
    # an overflowed cell the multipole expansion is marginal anyway.
    accept_margin: float = 0.8  # multiplies theta^2 in the acceptance test
    # (margin < 1 opens more nodes).  The runtime theta stays the exact
    # reference semantic; this static knob is the engine's documented
    # safety factor.  Default 0.8: measured FREE at 1M/2M (2.402 vs
    # 2.400 steps/s, 1.091 vs 1.091 — the near caps absorb the extra
    # opens) while cutting the quad p99 tail 1.9x (5.6e-2 -> 3.0e-2,
    # accuracy_1m.jsonl quad2_auto vs quad2_m08).  Set 1.0 for the
    # literal reference acceptance rule.
    block_dual: bool = False  # dual-tree far field on the SOURCE SLAB
    # (round 3): the assembled window/near slab is mostly exact pair work
    # that Barnes-Hut would approximate — at the 1M defaults each target
    # pays the full W = 12288-row window densely (~117 ms/step, the VPU ALU
    # floor).  With block_dual, every (target-tile, source-tile) pair of
    # the eval grid gets its own acceptance test: source-tile bbox width²
    # < dual_margin * theta² * dist²(tile boxes).  Accepted pairs skip the
    # pair kernel (per-tile-pair mask rows, ops/group_force.py
    # _kernel_masked) and are evaluated as the source tile's CENTRAL
    # QUADRUPOLE (computed two-pass from the masked slab rows themselves,
    # so the multipole represents exactly the rows the pair pass was
    # responsible for — partially-covered window tiles included, no
    # bookkeeping).  Box-box distance (not COM distance) makes
    # self-overlapping acceptance impossible at any theta: a tile
    # containing one of the targets overlaps the target tile's box, so
    # d = 0 and the test fails.  Active in traverse_tree (single-chip and
    # the sharded bh-replicated path) AND the domain-decomposed path
    # (parallel/domain.py) — both share _dual_slab_eval; tile boundaries
    # differ between the two slab layouts, so they agree to accuracy, not
    # bitwise.
    dual_margin: float = 0.8  # multiplies theta² in the block-dual
    # acceptance (same convention as accept_margin; < 1 = stricter).
    # Separate knob because dual approximates work that was previously
    # EXACT — tightening it buys back accuracy without touching the
    # tree walk's acceptance.
    near_sym: bool = False  # Newton-3 symmetric evaluation of each group's
    # SELF-interaction square (round 3, session 3).  The window slab's
    # central B columns are the group's own particles, so every intra-group
    # pair was evaluated twice (F_ij and F_ji) by the one-directional pair
    # kernel — at the 1M defaults that square is ~89% of all near-field
    # lane evals.  With near_sym, assembly splits the window into the
    # central square + the two rim pads: the square runs through a
    # dedicated symmetric kernel (ops/group_force.py group_self_force_
    # pallas — one r²/rsqrt per unordered pair, dual accumulation),
    # and the slab shrinks to [rim | near (| mono)].  Window-coverage
    # semantics are UNCHANGED (same wmask, same near/fb routing): the
    # masked masses weight both directions of the symmetric eval, so the
    # force set is identical to the asymmetric path and results differ
    # only by f32 summation order (tests/test_near_sym.py pins this in
    # f64 to ~1e-12).  Not wired on the domain-decomposed path
    # (parallel/domain.py assembles its own halo slab).
    #
    # MEASURED VERDICT (v5e, results/dual_r3.jsonl ns_* rows): LOSES at
    # every N — 30.3 vs 33.3 @131k, 9.9 vs 11.2 @524k, 5.36 vs 6.13 @1M,
    # 2.39 vs 2.95 @2M, 1.22 vs 1.46 @4M — and loses even with
    # block_dual=False (5.41 vs 6.22 @1M), so the deficit is intrinsic,
    # not just block-dual's intra-square tile skips (groups straddling
    # Morton seams put ~half the square at accepted distance; the sym
    # square pays those pairs exactly).  Mechanism: the dual-accumulation
    # kernel's lane throughput is only ~0.64x the plain kernel's (extra
    # mirror ops + smaller (512, 1024) tiles — same constant measured on
    # the brute sym kernel, where it still wins because brute is 100%
    # square with no dual/window interactions), so halving the lanes nets
    # only ~0.78x on the square, and the split-kernel + rim-assembly
    # overhead eats the remainder.  Kept (default OFF) as tested,
    # documented machinery; don't re-enable without new data.
    sliding_window: bool = False  # gather-free window assembly (round 3,
    # session 8) — MEASURED A WASH, opt-in only.  Premise: wstart =
    # g*B - window_pad is a STATIC function of the group index except at
    # the array edges, where the clamp keeps the vmapped dynamic_slice in
    # bounds; dropping the clamp (virtual window, zero rows beyond the
    # edges) lets assembly build the [G, W, 8] window as three dense
    # shifted reshapes (_window_rows) — no per-group slice at all.
    # VERDICT (dual_r3.jsonl sw_* rows, back-to-back TPU pairs
    # 2026-08-19): 32.2 vs 33.3 @131k (-3%), 11.28/11.28 @524k,
    # 6.21/6.22 @1M (two repeats), i.e. XLA was already lowering the
    # clamped per-group dynamic_slice as cheap dense copies — the window
    # assembly was never the gather this targeted (consistent with
    # VALIDATION §15: slab assembly is small next to the delta/compaction
    # scatters).  Kept as tested machinery.  Semantics when enabled:
    # boundary groups (first/last of G) lose window coverage of the
    # clamp-only cells, which re-enter the standard walk — θ-accepted as
    # multipoles, opened, taken near, or fallback (graceful, counted in
    # stats); their error stays inside the walk's own acceptance
    # envelope but is NOT roundoff-exact in general (an uncovered cell
    # past a Morton octant seam can be spatially far enough to accept).
    # Interior groups are bit-identical (tests/test_sliding_window.py).
    # Applies
    # only when the window is unclipped (W == B + 2*pad) and pad <= B;
    # near_sym keeps the clamped path (its rim gather would index
    # negative wstart), and the domain path never slides (its
    # halo-coverage proof REQUIRES the clamp, parallel/domain.py:300-310
    # — its _group_collect call never passes sliding=True).
    wide: bool = False  # N >= 2^24 row format (domain path only): node
    # tables use the hi/lo range encoding (ops/tree.py decode_ranges),
    # fallback-cell containment switches from particle-index compare to the
    # exact (level, cell-id) Morton-prefix test against target leaf codes,
    # and the XLA pair path drops its f32 index self-exclusion compare
    # (matching the production Pallas kernel, which is maskless: self-pairs
    # contribute zero force through d = 0, and the r² <= 0 guard covers the
    # unsoftened coincident case).  Set by parallel/domain.py via
    # tree.wide_ranges(n_total, dtype); not a user knob.
    frontier_schedule: tuple = None  # per-level frontier slot counts for
    # levels start_level+1..max_level; None = auto (grows toward
    # frontier_cap at the leaf).  Opening is heavily bottom-weighted
    # (census at N=131k, theta^2=1: p99 expanding parents per level
    # 10/14/27/66/190 for levels 2-6), so small coarse-level frontiers cut
    # the gather volume ~2x; overflow degrades to monopole and is counted.
    refine_levels: int = 0  # density-adaptive depth (round 3, session 10):
    # extra tree levels BELOW max_level for leaf cells holding more than
    # refine_threshold particles (ops/tree.py _build_refined).  The walk
    # descends flagged cells instead of dumping them on the near/fallback
    # path, so a 1e5:1 density-contrast core gets leaf resolution no static
    # max_level can afford globally (VALIDATION.md §18: 8x global cells
    # lose 40%+ at 2M/4M; the refined tables cost O(refine_cap) per level).
    # Descended cells' children can be window-covered (exact), θ-accepted
    # (evaluated as monopoles via the spill-row mechanism — small cells at
    # accepted distance are past the quad's win anyway), taken near as
    # explicit sorted ranges, descended further, or degraded to
    # self-excluded multipole fallback — never dropped.  0 = off (the
    # tuned default path, bit-identical).  Works single-chip, on the
    # replicated sharded strategy (replicated refined build,
    # ops/tree.py build_octree_sharded) and on the domain-decomposed
    # path below 2^24 particles (per-owner-chip refined build + psum
    # merge, parallel/domain.py — round 4).  Incompatible with the wide
    # row format (N >= 2^24), the cached-topology paths (walk_every > 1,
    # bh-lazy) and fb_quad — all rejected loudly.
    refine_cap: int = 8192  # refined parent cells per extra level (global,
    # build-time); flagged cells beyond it keep the unrefined path
    # (counted in tree.refine_stats[1])
    refine_threshold: int = 0  # particles above which a cell is refined;
    # 0 = auto (near_particle_cap — a cell that cannot fit the near budget
    # is exactly one whose multipole fallback carries the leaf-resolution
    # error)
    refine_frontier: int = 512  # walk frontier slots per refined level per
    # group (multiple of branch); overflow degrades to near/fallback
    refine_near_cell_cap: int = 2048  # refined-near ranges per group
    refine_near_particle_cap: int = 8192  # refined-near particles per
    # group (a separate budget from near_particle_cap: refined ranges are
    # exactly the core neighborhoods the coarse budget could not hold)
    refine_far_cell_cap: int = 512  # domain-decomposed runs only (round 4):
    # refined-near ranges whose particles lie OUTSIDE this chip's halo slab
    # (a steep core straddles the octant seams, so its refined cells are
    # Morton-far from most core targets) — served by the same request/reply
    # collective as the leaf far list, under separate caps that bound the
    # per-chip request buffer
    refine_far_particle_cap: int = 4096  # particles across the refined-far
    # ranges per group

    def __post_init__(self):
        if self.refine_levels:
            branch = 1 << self.dim
            limit = 10 if self.dim == 3 else 15
            if self.max_level + self.refine_levels > limit:
                raise ValueError(
                    f"max_level + refine_levels = "
                    f"{self.max_level + self.refine_levels} exceeds the "
                    f"{self.dim}D Morton depth limit ({limit})"
                )
            if self.wide:
                raise ValueError(
                    "refine_levels does not support the wide row format "
                    "(N >= 2^24): refined tables are narrow-only and the "
                    "refined fallback rows rely on narrow range "
                    "containment for self-exclusion"
                )
            if self.fb_quad:
                raise ValueError(
                    "refine_levels does not support fb_quad (refined "
                    "fallback rows have no quadrupole table entry)"
                )
            if self.refine_frontier <= 0 or self.refine_frontier % branch:
                raise ValueError(
                    f"refine_frontier must be a positive multiple of "
                    f"{branch}, got {self.refine_frontier}"
                )
        # fb rows can be leaf cells; their quadrupole gather needs the leaf
        # level present in the table.  A ValueError, not an assert: under
        # ``python -O`` an assert is stripped and the fb gather would index
        # past the quad table — XLA clamps the OOB gather, silently wrong
        # forces (ADVICE r2 #2).
        if self.fb_quad and not self.quad_leaf:
            raise ValueError("fb_quad=True requires quad_leaf=True")

    def schedule(self) -> tuple:
        if self.frontier_schedule is not None:
            sched = self.frontier_schedule
            assert len(sched) == self.max_level - self.start_level
        else:
            branch = 1 << self.dim
            sched = tuple(
                min(
                    branch ** l,
                    self.frontier_cap,
                    max(512, self.frontier_cap >> (self.max_level - l)),
                )
                for l in range(self.start_level + 1, self.max_level + 1)
            )
        # slots must stay multiples of the branch factor (parent compaction)
        assert all(s % (1 << self.dim) == 0 for s in sched), sched
        return sched

    @property
    def window(self) -> int:
        return self.group_size + 2 * self.window_pad

    @property
    def refine_threshold_resolved(self) -> int:
        """0 = auto: a cell that cannot fit the near-field particle budget
        is exactly one whose fallback multipole carries leaf-resolution
        error — the cells refinement exists for."""
        return self.refine_threshold or self.near_particle_cap

    def cell_w2s(self, width):
        """Squared cell widths for every walk level, refined levels
        included (index l = tree level l)."""
        top = self.max_level + self.refine_levels
        return tuple(
            (width / (1 << l)) * (width / (1 << l)) for l in range(top + 1)
        )

    @staticmethod
    def auto_for(n: int, profile: str = "fast", **overrides) -> "BHConfig":
        """Size-adaptive preset (v5e sweep, scripts/tune_bh_1m.py): dense
        group evals get relatively cheaper as N grows, so the optimal group
        size scales up — 8192 wins at N=1M (1.41 steps/s vs 1.13 for the
        old 2048 default) but over-pads small problems.

        chunk_groups: the collect walk is lax.map-serialized per chunk;
        wider chunks vmap it (62 -> ~28 ms at 1M, tune_bh_r2.jsonl
        quad4_* rows; saturates at 8).  Pick the widest of 8/4/2/1 that
        divides the group count so block padding never exceeds one
        group's worth of particles.

        NOTE: the near-cap / window-pad cuts are tuned at the benchmark
        theta^2 = 1.  Overflow-fallback cells get exact self-excluded
        quadrupoles whose residual is independent of theta, so runs
        chasing much tighter force errors (theta^2 << 1) should use
        ``profile='accurate'``, which keeps block_dual and the near-cap
        cut (both measured drift-cheap) and restores only the round-2
        window pad (2048) — the wp cut is the drift carrier.  Measured
        @1M benchmark dt (VALIDATION §10 attribution table): 'fast' =
        6.13-6.21 steps/s at 1.34e-3 energy drift/200 steps, 'accurate'
        = 5.66 at 3.73e-4; full round-2 budgets (raise
        near_particle_cap manually) = 4.28 at 2.78e-4."""
        if profile not in ("fast", "accurate", "dense", "adaptive"):
            raise ValueError(f"profile must be 'fast', 'accurate', "
                             f"'dense' or 'adaptive', got {profile!r}")
        if n <= 32768:
            base = dict(group_size=2048, subgroups=64)
        elif n <= 262144:
            # block_dual measured accuracy-FREE (accuracy_1m.jsonl round-3
            # rows: dual_* p99 == no-dual p99 to 3 digits at every probed
            # config); near cap 8192 -> 2048 is the MID-N optimum
            # (dual_r3.jsonl 131k: 28.9 dual-only, 31.9 c2048, 31.8 c1024,
            # 31.3 c512 — deeper cuts lose here, unlike >262k) and moves
            # p99 force error at 131k only 9.97e-3 -> 1.00e-2
            # (accuracy_midn.jsonl mid_dual_c2048 vs mid_base).
            # window_pad 2048 -> 1024: +4% (33.27 vs 31.9 @131k, r3h rows)
            # with IDENTICAL near_fallback count (2843) — the evicted
            # window rows all fit the near gather, so the force sum is
            # unchanged in structure; wp512 ties perf but adds fallback
            # pressure (3092), so 1024 ships.
            base = dict(group_size=4096, subgroups=64, block_dual=True,
                        dual_margin=1.2, near_particle_cap=2048,
                        window_pad=1024)
        elif n <= 1048576:
            # round-3 sweep (dual_r3.jsonl): block-dual + near cap
            # 8192 -> 512 = 4.006 -> 5.61 steps/s @1M (+40%), 9.98 -> 10.31
            # @524k, 2.77 -> 2.95 @2M, with p99 force error 3.061e-2 vs
            # 3.01e-2 baseline (accuracy_1m.jsonl dual_n512) — the extra
            # near-fallback cells (8550 @1M) get exact self-excluded
            # multipoles, which is why cap cuts are nearly free
            # (VALIDATION.md §7/§8).  Caps 256/128 buy only ~1-1.5% more
            # (5.67/5.70 @1M, inside tunnel noise); 256 also passed its
            # gate (dual_n256 p99 3.059e-2) but the gain is noise-level,
            # so the conservative 512 ships.
            # window_pad 2048 -> 512 (round-3h): 5.61 -> 6.128 @1M (+9%),
            # 10.31 -> 11.22 @524k; wp256 saturates (6.161).  The SAME
            # cut LOST in round 2 (pl_g8_pad1024, tune_bh_r2.jsonl)
            # because evicted near cells then bloated the 8192-row near
            # gather; with cap 512 they land in exact-multipole fallbacks
            # instead (near_fallback 8550 -> 10258, the priced §7
            # mechanism).  Gated on CPU at the tier config
            # (accuracy_wp_cpu.jsonl) AND on TPU @1M: wp512 p99 1.11x the
            # pre-wp row, inside the <=2x criterion (accuracy_1m.jsonl
            # dual_wp512 row — VALIDATION.md §9).
            # block_dual OFF in this tier (round-3 session-3 re-check,
            # dual_r3.jsonl dv_* back-to-back pairs): with the wp512/cap512
            # cuts the slab is ~1 tile of rims+near beyond the group square,
            # so dual's skippable surface is gone — nodual measures 6.21 vs
            # 6.13 @1M (two consistent repeats) and 11.28 vs 11.23 @524k,
            # and the accepted tiles' quadrupole approximation reverts to
            # exact pair work (accuracy strictly improves).  Dual still
            # EARNS where the window is large: +3.3% @131k (wp1024 tier)
            # and +5.9% @2M (wp2048 tier) — kept there, and restored below
            # when 'accurate' re-widens this tier's window to 2048.
            base = dict(group_size=8192, subgroups=128, block_dual=False,
                        dual_margin=1.2, near_particle_cap=512,
                        window_pad=512)
        elif n <= (1 << 21):
            # 1M-2M: the FULL window-pad cut (512) fails its accuracy gate
            # at 2M (accuracy_large.jsonl defaults_2m: p99 6.997e-2 = 2.25x
            # the wp2048 control's 3.108e-2) but the wp1024 middle ground
            # PASSES (wp1024_2m_sampled p99 3.550e-2 = 1.14x, same sampled
            # protocol) and earns +5.9%: 3.118 vs 2.945 steps/s @2M
            # (dual_r3.jsonl wp_2m_wp1024 vs dv_2m_dual, session-3).  Cap
            # raises don't help — c2048 loses perf (2.772) for a noise-level
            # p99 move.  block_dual stays ON: the wp1024 slab still has a
            # skippable rim surface (unlike the wp512 tier above) and dual
            # measured +5.9% @2M at wp2048 / rode along at wp1024.
            base = dict(group_size=8192, subgroups=128, block_dual=True,
                        dual_margin=1.2, near_particle_cap=512,
                        window_pad=1024)
        else:
            # >2M: every probed pad cut FAILS the sampled accuracy gate at
            # 4M — wp512 2.67x, wp1024 2.28x (accuracy_large.jsonl
            # wp512_4m/wp1024_4m vs defaults_4m p99 4.828e-2) — fallback
            # pressure grows with N (near_fallback 14k @2M -> 21k @4M) and
            # the correlated whole-cell multipole error it feeds leaves the
            # 2x criterion.  The round-2 pad ships: 1.46 steps/s @4M
            # (dual_r3.jsonl pre-wp rows; the retracted cuts measured
            # 1.60/1.55).  The near-cap cut stays: it gated flat at every
            # probed N.
            base = dict(group_size=8192, subgroups=128, block_dual=True,
                        dual_margin=1.2, near_particle_cap=512,
                        window_pad=2048)
        if profile == "dense":
            # Steep-core (high density-contrast) preset, measured at a 1M
            # Plummer sphere (VALIDATION.md §18, results/plummer_1m.jsonl
            # *_dense rows): depth 8 resolves the core 8x finer and the
            # doubled walk budgets absorb the resulting frontier growth
            # (accept drops 44k -> 3.2k at width 40).  7.6x better p99_typ
            # than the disc-tuned defaults on that scene (1.11 -> 0.147)
            # and 5.8x better median, at 0.47x the disc-scene step rate
            # (2.79 vs 5.92 steps/s @1M).  Known limit: still ~3x over the
            # disc accuracy envelope — core leaf cells denser than any
            # static cap take self-excluded multipoles for their own
            # neighborhood, which only density-ADAPTIVE depth removes.
            base.update(DENSE_OVERRIDES)
        if profile == "adaptive":
            # Density-adaptive steep-core preset (VALIDATION.md §19/§20):
            # the per-octant refined build resolves the 1e5:1 Plummer core
            # the static 'dense' stack could not (p99_typ 0.147 -> 0.017
            # at width 40).  Scene-aware callers resolve the deep vs
            # tight-box stack via resolve_adaptive_overrides; this
            # positions-free spelling defaults to the deep stack.  The
            # round-4 budget cuts apply only at the N they were measured
            # (see ADAPTIVE_CUT_MIN_N).
            base.update(ADAPTIVE_OVERRIDES if n >= ADAPTIVE_CUT_MIN_N
                        else ADAPTIVE_MIDN_OVERRIDES)
        if profile == "accurate" and n > 32768:
            # restore ONLY the window pad: the drift-attribution split
            # (comp_drift_1m.jsonl caponly/wponly rows) shows the wp cut
            # carries ~1.2e-3 of the 1.34e-3 drift while the cap cut adds
            # <1e-4 — (5.66 steps/s, 3.7e-4) dominates the full round-2
            # restoration (4.28, 2.8e-4) on the measured Pareto frontier.
            # block_dual rides along: at wp2048 windows it earns its keep
            # (+5.9% @2M) and it was measured accuracy-free at every
            # probed margin, so 'accurate' keeps it even in the tier whose
            # 'fast' preset dropped it with the wp512 slab.
            base.update(window_pad=2048, block_dual=True)
        # overrides apply BEFORE chunk_groups is fitted: a caller overriding
        # group_size must get a chunk count fitted to the FINAL group size,
        # not the preset's (ADVICE r2 #3 — the old order could pad a whole
        # extra chunk of dead work or trip the sharded chunk-split assert)
        base.update(overrides)
        if "chunk_groups" not in overrides:
            n_groups = max(1, -(-n // base["group_size"]))
            for cg in (8, 4, 2, 1):
                if n_groups % cg == 0:
                    base["chunk_groups"] = cg
                    break
        return BHConfig(**base)


def fit_chunks(cg: int, n_groups: int, multiple: int = 1) -> int:
    """Largest cg' <= cg that divides ``n_groups`` with a chunk count
    (n_groups // cg') divisible by ``multiple`` — the sharded paths slice
    whole chunks per device, so their chunk counts must split evenly."""
    cg = max(1, min(cg, n_groups))
    while cg > 1 and (n_groups % cg or (n_groups // cg) % multiple):
        cg -= 1
    return cg


def _resolve_eval_mode(cfg: BHConfig, dtype) -> str:
    if cfg.eval_mode != "auto":
        return cfg.eval_mode
    if jax.default_backend() == "tpu" and dtype == jnp.float32:
        return "pallas"
    return "xla"


def _resolve_p_block(cfg: BHConfig) -> int:
    """Source-block width for the XLA pair eval (0 = unbounded).  Auto:
    2048 off-TPU — the CPU/virtual-mesh backend otherwise materializes
    [chunk_groups, B, S] temps that reach ~11.4 GB per partition at
    production budgets (the round-4 execute-phase blowup,
    results/compile_blowup_bisect.jsonl); unbounded on TPU, where f32
    rides Pallas and the f64 XLA slabs are modest."""
    if cfg.xla_p_block == -1:
        return 0 if jax.default_backend() == "tpu" else 2048
    return cfg.xla_p_block


def _pair_block(gpos, gidx, ppos, pm, pidx, pvalid, g, g_soft, center=None,
                p_block=0):
    """Direct pairwise acceleration of group targets vs a source slab.
    Self-pairs masked by global sorted index; coincident pairs skipped
    (the reference LLM engine's r^2 guard, src/llm/barnes_hut.rs:819).
    This is the XLA eval backend; the Pallas backend (ops/group_force.py)
    computes the identical sum without the [B, P] HBM intermediates.

    ``p_block`` > 0 rolls the evaluation over source blocks of that width
    (lax.scan accumulation), bounding every [B, P]-shaped intermediate to
    [B, p_block] — see _resolve_p_block."""
    P = ppos.shape[0]
    if p_block and P > p_block:
        pad = (-P) % p_block
        if pad:
            ppos = jnp.concatenate(
                [ppos, jnp.zeros((pad, ppos.shape[1]), ppos.dtype)])
            pm = jnp.concatenate([pm, jnp.zeros((pad,), pm.dtype)])
            pvalid = jnp.concatenate(
                [pvalid, jnp.zeros((pad,), pvalid.dtype)])
            if pidx is not None:
                pidx = jnp.concatenate(
                    [pidx, jnp.full((pad, ), -1, pidx.dtype)])
        nb = (P + pad) // p_block

        def body(acc, blk):
            pp, pmb, pib, pvb = blk
            return acc + _pair_block(gpos, gidx, pp, pmb, pib, pvb,
                                     g, g_soft, center), None

        xs = (ppos.reshape(nb, p_block, -1), pm.reshape(nb, p_block),
              None if pidx is None else pidx.reshape(nb, p_block),
              pvalid.reshape(nb, p_block))
        acc, _ = jax.lax.scan(
            body, jnp.zeros((gpos.shape[0], gpos.shape[1]), gpos.dtype), xs)
        return acc
    if center is not None:
        return _pair_block_mxu(
            gpos, gidx, ppos, pm, pidx, pvalid, g, g_soft, center
        )
    dd = ppos[None, :, :] - gpos[:, None, :]  # [B, P, 3]
    r2 = jnp.sum(dd * dd, axis=-1) + g_soft * g_soft
    skip = (r2 <= 0.0) | ~pvalid[None, :]
    if gidx is not None:
        skip = skip | (pidx[None, :] == gidx[:, None])
    inv_r = jax.lax.rsqrt(jnp.where(skip, 1.0, r2))
    s = jnp.where(skip, 0.0, inv_r * inv_r * inv_r * pm[None, :])
    return g * jnp.einsum(
        "bp,bpd->bd", s, dd, precision=jax.lax.Precision.HIGHEST
    )


def _pair_block_mxu(gpos, gidx, ppos, pm, pidx, pvalid, g, g_soft, center):
    """MXU formulation of the pair block: both the pair distances and the
    accumulation become true matmuls, eliminating the [B, P, 3] broadcast
    intermediate (HBM-bound on TPU):

        r²_ip = |g_i - c|² + |p_p - c|² - 2 (g_i - c)·(p_p - c) + ε²
        a_i   = Σ_p s_ip (p_p - g_i) = s @ (p - c)  -  (g_i - c) Σ_p s_ip

    ``center`` recenters both sides into the group's local frame so the
    norm-trick cancellation stays benign for close (strong-force) pairs —
    the same trick as the brute-pallas-mxu kernel (ops/pairwise.py).
    HIGHEST precision throughout: physics contractions must not run bf16.

    ``gidx``/``pidx`` of None skips the self-pair test (monopole sources
    are nodes, never the target particle itself)."""
    hi = jax.lax.Precision.HIGHEST
    gp = gpos - center[None, :]  # [B, 3]
    pp = ppos - center[None, :]  # [P, 3]
    n2g = jnp.sum(gp * gp, axis=1)[:, None]  # [B, 1]
    n2p = jnp.sum(pp * pp, axis=1)[None, :]  # [1, P]
    cross = jnp.dot(gp, pp.T, precision=hi)  # [B, P]
    r2 = n2g + n2p - 2.0 * cross + g_soft * g_soft
    skip = (r2 <= 0.0) | ~pvalid[None, :]
    if gidx is not None:
        skip = skip | (pidx[None, :] == gidx[:, None])
    inv_r = jax.lax.rsqrt(jnp.where(skip, 1.0, r2))
    s = jnp.where(skip, 0.0, inv_r * inv_r * inv_r * pm[None, :])
    acc = jnp.dot(s, pp, precision=hi) - gp * jnp.sum(s, axis=1)[:, None]
    return g * acc


def _fb_eval(gpos, gidx, gmass, fb, g, g_soft, all_quad=None, goffs=None,
             tcell=None, dim=3, max_level=0):
    """Self-excluded acceleration from the overflow-fallback slab.

    ``fb`` rows are raw packed node rows (mass M, mass-weighted sums S,
    range_start, range_end — ops/tree.py level_table layout — plus the
    node's level and cell id in slots 6/7 for the quadrupole gather).  A
    cell owns a contiguous sorted range, so "cell contains target i" is
    exactly ``cs <= sorted_idx(i) < ce``; for those pairs the target's own
    contribution is removed in closed form:

        M' = M - m_i,   S' = S - m_i p_i,   com' = S' / M'

    eliminating the softened self-force the round-1 fallback admitted
    (ADVICE.md #1).  With ``all_quad`` (multipole="quad"), the raw second
    moments get the same exact subtraction (S2' = S2 - m_i p_i p_iᵀ) and the
    cell contributes its full self-excluded quadrupole — budget overflow
    then costs one multipole ORDER (hexadecapole), not two.  Empty slots
    (M = 0) and self-only cells (M' = 0) contribute nothing.

    ``tcell`` (wide mode, BHConfig.wide): target leaf-cell Morton codes
    [B].  Containment then uses the exact equivalent Morton-prefix test
    (target's leaf code right-shifted to the fb row's level equals its cell
    id) instead of cs <= ti < ce — the wide row format stores ranges hi/lo
    split, and raw f32 range compares would be inexact past 2^24 anyway."""
    M = fb[:, 0]  # [F]
    S = fb[:, 1:4]  # [F, 3]
    inside = _fb_inside(fb, gidx, gpos.dtype, tcell, dim, max_level)
    mi = jnp.where(inside, gmass[:, None], 0.0)  # [B, F]
    m_eff = M[None, :] - mi
    valid = m_eff > 0.0
    tiny = jnp.asarray(jnp.finfo(gpos.dtype).tiny, gpos.dtype)
    num = S[None, :, :] - mi[:, :, None] * gpos[:, None, :]  # [B,F,3] = S'
    com = num / jnp.maximum(m_eff, tiny)[:, :, None]  # [B, F, 3]
    d = com - gpos[:, None, :]
    r2 = jnp.sum(d * d, axis=-1) + g_soft * g_soft
    ok = valid & (r2 > 0.0)
    inv_r = jax.lax.rsqrt(jnp.where(ok, r2, 1.0))
    ir2 = inv_r * inv_r
    ir3 = ir2 * inv_r
    s = jnp.where(ok, ir3 * m_eff, 0.0)
    acc = jnp.einsum("bf,bfd->bd", s, d, precision=jax.lax.Precision.HIGHEST)

    if all_quad is not None:
        # self-excluded quadrupole: raw moments minus the target's own
        # m_i p p ᵀ, centralized about the EXCLUDED com'.  All positions
        # here are grid-frame relative (the accel entry points recenter
        # on bounds.center — ADVICE r2 #1), so the subtractions stay
        # well-conditioned regardless of where the scene sits.
        lvl = fb[:, 6].astype(jnp.int32)
        cid = fb[:, 7].astype(jnp.int32)
        # empty fb slots decode to node 0 (root) — masked by ok (M = 0)
        S2 = all_quad[goffs[lvl] + cid][:, :6]  # [F, 6]
        # S2' components [B, F]
        px, py, pz = gpos[:, None, 0], gpos[:, None, 1], gpos[:, None, 2]
        sxx = S2[None, :, 0] - mi * px * px
        syy = S2[None, :, 1] - mi * py * py
        szz = S2[None, :, 2] - mi * pz * pz
        sxy = S2[None, :, 3] - mi * px * py
        sxz = S2[None, :, 4] - mi * px * pz
        syz = S2[None, :, 5] - mi * py * pz
        cx, cy, cz = com[..., 0], com[..., 1], com[..., 2]
        # central second moments P' = S2' - M' com' com'ᵀ
        pxx = sxx - m_eff * cx * cx
        pyy = syy - m_eff * cy * cy
        pzz = szz - m_eff * cz * cz
        pxy = sxy - m_eff * cx * cy
        pxz = sxz - m_eff * cx * cz
        pyz = syz - m_eff * cy * cz
        tr = pxx + pyy + pzz
        qxx, qyy, qzz = 3 * pxx - tr, 3 * pyy - tr, 3 * pzz - tr
        qxy, qxz, qyz = 3 * pxy, 3 * pxz, 3 * pyz
        ex, ey, ez = d[..., 0], d[..., 1], d[..., 2]
        ux = qxx * ex + qxy * ey + qxz * ez
        uy = qxy * ex + qyy * ey + qyz * ez
        uz = qxz * ex + qyz * ey + qzz * ez
        qe = ex * ux + ey * uy + ez * uz
        ir5 = ir3 * ir2
        ir7 = ir5 * ir2
        w = jnp.where(ok, 2.5 * qe * ir7, 0.0)
        ir5 = jnp.where(ok, ir5, 0.0)
        acc = acc + jnp.stack(
            [
                jnp.sum(w * ex - ir5 * ux, axis=1),
                jnp.sum(w * ey - ir5 * uy, axis=1),
                jnp.sum(w * ez - ir5 * uz, axis=1),
            ],
            axis=1,
        )
    return g * acc


def _fb_inside(fb, gidx, dtype, tcell=None, dim=3, max_level=0):
    """[B, F] "fb cell contains target" mask.  Narrow: the contiguous
    sorted-range compare cs <= sorted_idx < ce (cols 4/5; exact f32 ints by
    the tree guard).  Wide (tcell given): the equivalent Morton-prefix test
    on (level, cell id) from cols 6/7 — exact at any N.  Empty fb slots
    decode to (level 0, cell 0) = the root, which contains everything;
    their M = 0 row is masked by the caller's m_eff/valid guard either
    way."""
    if tcell is None:
        ti = gidx.astype(dtype)[:, None]  # exact ints (< 2^24, tree guard)
        return (fb[None, :, 4] <= ti) & (ti < fb[None, :, 5])
    lvl = fb[:, 6].astype(jnp.int32)
    cid = fb[:, 7].astype(jnp.int32)
    shift = dim * jnp.maximum(max_level - lvl, 0)  # fb-spill lvl=-1 safe
    return (tcell[:, None] >> shift[None, :]) == cid[None, :]


def _fb_phi(gpos, gidx, gmass, fb, g, g_soft, tcell=None, dim=3,
            max_level=0):
    """Self-excluded POTENTIAL from the overflow-fallback slab — the φ
    analog of _fb_eval's monopole branch: φ_i += -G M' / sqrt(|com'-p|²+ε²)
    with the target's own mass removed in closed form (M' = M - m_i,
    com' = (S - m_i p_i)/M')."""
    M = fb[:, 0]
    S = fb[:, 1:4]
    inside = _fb_inside(fb, gidx, gpos.dtype, tcell, dim, max_level)
    mi = jnp.where(inside, gmass[:, None], 0.0)
    m_eff = M[None, :] - mi
    valid = m_eff > 0.0
    tiny = jnp.asarray(jnp.finfo(gpos.dtype).tiny, gpos.dtype)
    num = S[None, :, :] - mi[:, :, None] * gpos[:, None, :]
    com = num / jnp.maximum(m_eff, tiny)[:, :, None]
    d = com - gpos[:, None, :]
    r2 = jnp.sum(d * d, axis=-1) + g_soft * g_soft
    ok = valid & (r2 > 0.0)
    inv_r = jax.lax.rsqrt(jnp.where(ok, r2, 1.0))
    return -g * jnp.sum(jnp.where(ok, m_eff * inv_r, 0.0), axis=1)


def _phi_slab_eval(slab, tgt8, g, g_soft, cfg: BHConfig):
    """Per-target potential from the assembled slab (window + near exact
    rows, idx-matched self-exclusion; multipole rows idx = -1 never match).
    XLA contraction, chunked like _slab_eval's non-Pallas path — the
    potential is a diagnostic, not a step cost."""
    G, B, _ = tgt8.shape
    S = slab.shape[1]
    CG = cfg.chunk_groups
    n_chunks = G // CG
    eps2 = g_soft * g_soft

    def one(sl, t8):
        d = sl[None, :, :3] - t8[:, None, :3]  # [B, S, 3]
        r2 = jnp.sum(d * d, axis=-1) + eps2
        skip = (
            (sl[None, :, 4] == t8[:, None, 4])
            | (r2 <= 0.0)
            | (sl[None, :, 3] == 0.0)
        )
        inv_r = jax.lax.rsqrt(jnp.where(skip, 1.0, r2))
        return -g * jnp.sum(
            jnp.where(skip, 0.0, sl[None, :, 3] * inv_r), axis=1
        )

    def body(args):
        sl_c, t8_c = args
        return jax.vmap(one)(sl_c, t8_c)

    return jax.lax.map(
        body,
        (slab.reshape(n_chunks, CG, S, 8), tgt8.reshape(n_chunks, CG, B, 8)),
    ).reshape(G, B)


def traverse_tree_phi(tree, bounds, theta2, g, g_soft, cfg: BHConfig, n: int):
    """Tree-approximated total POTENTIAL ENERGY over an already-built tree:
    the same chunked collect walk and slab assembly as traverse_tree, with a
    φ accumulator instead of forces (VERDICT r2 #8 — an O(N²) energy pass
    at 4M+ costs more than the step it diagnoses).

    U = ½ Σ_i m_i φ_i; window/near pairs are exact (idx self-exclusion),
    accepted nodes and fb rows contribute self-excluded monopoles, fb-SPILL
    rows plain monopoles (counted in stats, rare under a generous fb_cap).
    Accuracy is the monopole envelope — measured ~1e-4 relative vs the
    exact pair PE at 8k/θ²=1 (tests/test_energy.py).  Returns (U, stats)."""
    B = cfg.group_size
    CG = cfg.chunk_groups
    block = B * CG
    pad = (-n) % block
    dtype = tree.pos_s.dtype
    n_tot = n + pad
    idxf = jnp.arange(n_tot, dtype=dtype)
    pm4 = jnp.concatenate([tree.pos_s, tree.mass_s[:, None]], axis=1)
    if pad:
        pm4 = jnp.concatenate([pm4, jnp.zeros((pad, 4), dtype)])
    pmass8 = jnp.concatenate(
        [pm4, idxf[:, None], jnp.zeros((n_tot, 3), dtype)], axis=1
    )
    window = min(cfg.window, n_tot)
    gidx = jnp.arange(n_tot, dtype=jnp.int32)
    cell_w2 = cfg.cell_w2s(bounds.width)
    if cfg.refine_levels and tree.refine_tables is None:
        raise ValueError(
            "cfg.refine_levels > 0 but the tree was built without "
            "refinement"
        )
    collect = partial(
        _group_collect, tree, n_tot, cell_w2, theta2, g, g_soft, cfg, window,
        phi=True, sliding=_sliding_ok(cfg, window),
    )
    vm_collect = jax.vmap(collect)
    n_groups = n_tot // B
    cgp8 = pmass8.reshape(n_groups // CG, CG, B, 8)
    cgi = gidx.reshape(n_groups // CG, CG, B)

    def chunk_body(args):
        cp8, ci = args
        return vm_collect(cp8[..., :3], cp8[..., 3], ci)

    (mono, near_ids, near_valid, _pf, _pfv, wmask, wstart, center, phi_fb,
     _fbs, rnear, rnear_valid, _rf, _rfv, stats_t) = jax.lax.map(
         chunk_body, (cgp8, cgi))
    G = n_groups
    W = window
    mono = mono.reshape(G, cfg.accept_cap, 8)
    wmask = wmask.reshape(G, W)
    wstart = wstart.reshape(G)
    phi_fb = phi_fb.reshape(G, B)
    adrop, fdrop, ndrop, fbspill, _rntot, _rftot = (
        s.reshape(-1) for s in stats_t)

    pidx, pvalid, _ntot = _expand_ranges(
        tree.level_table[cfg.max_level],
        near_ids.reshape(G, cfg.near_cell_cap),
        near_valid.reshape(G, cfg.near_cell_cap),
        cfg.near_particle_cap,
    )
    if cfg.refine_levels:
        RC = cfg.refine_near_cell_cap
        rnear = rnear.reshape(G, RC, 2)
        pidx_r, pvalid_r, _ = _expand_from_ranges(
            rnear[..., 0], rnear[..., 1], rnear_valid.reshape(G, RC),
            cfg.refine_near_particle_cap,
        )
        pidx = jnp.concatenate([pidx, pidx_r], axis=1)
        pvalid = jnp.concatenate([pvalid, pvalid_r], axis=1)
    wrows = _window_rows(pmass8, wstart, wmask, W, cfg,
                         _sliding_ok(cfg, W))
    nrows = pmass8[pidx]
    nrows = nrows.at[:, :, 3].set(jnp.where(pvalid, nrows[:, :, 3], 0.0))
    # multipole rows always ride the pair pass as monopoles here (idx -1
    # never matches a target): φ needs no quadrupole machinery
    slab = jnp.concatenate([wrows, nrows, mono], axis=1)
    tgt8 = cgp8.reshape(G, B, 8)

    phi = _phi_slab_eval(slab, tgt8, g, g_soft, cfg) + phi_fb
    m_t = tgt8[..., 3]
    U = 0.5 * jnp.sum(m_t * phi)
    stats = {
        "accept_dropped": jnp.sum(adrop),
        "frontier_fallback": jnp.sum(fdrop),
        "near_fallback": jnp.sum(ndrop),
        "fb_spill": jnp.sum(fbspill),
    }
    return U, stats


@partial(jax.jit, static_argnames=("cfg",))
def bh_potential(pos, mass, bounds, theta2, g, g_soft,
                 cfg: BHConfig = None):
    """Tree-approximated total potential energy (build + φ traversal).
    pos [N,3], mass [N] (zero for dead) -> (U scalar, stats dict)."""
    if cfg is None:
        cfg = BHConfig()
    pos_c = pos - bounds.center
    b0 = bounds.centered()
    tree = build_octree(pos_c, mass, b0, cfg.max_level, dim=cfg.dim,
                        quad=False, quad_leaf=False,
                        refine_levels=cfg.refine_levels,
                        refine_cap=cfg.refine_cap,
                        refine_threshold=cfg.refine_threshold_resolved)
    return traverse_tree_phi(tree, b0, theta2, g, g_soft, cfg, pos.shape[0])


def _push_rows(slab, offset, rows, mask, cap):
    """Append ``rows[mask]`` to a prefix-dense slab with a trash row at
    index ``cap`` (slab shape [cap+1, 8]).  Returns
    (slab, new_offset, dropped_mask) — rows past the cap are NOT written."""
    slot = offset + jnp.cumsum(mask) - 1
    keep = mask & (slot < cap)
    write = jnp.where(keep, slot, cap)
    slab = slab.at[write].set(rows)
    new_off = jnp.minimum(offset + jnp.sum(mask), cap)
    return slab, new_off.astype(offset.dtype), mask & ~keep


def _group_collect(
    tree: LinearOctree,
    n_total: int,
    cell_w2: tuple,
    theta2,
    g,
    g_soft,
    cfg: BHConfig,
    window: int,
    gpos,
    gmass,
    gidx,
    gcode=None,
    local_bounds=None,
    phi: bool = False,
    sliding: bool = False,
):
    """Traversal (collection only) for ONE group (vmapped over groups).

    gpos [B,3], gmass [B], gidx [B] (global sorted indices).  Returns
    (mono slab [accept_cap, 8], near cell ids [near_cell_cap] + valid,
     far cell ids [far_cell_cap] + valid, wmask [W], wstart, center [3],
     acc_fb [B,3], stats...); the caller expands cell ids to particle
     lists post-walk (_expand_ranges).

    ``local_bounds`` (domain decomposition, parallel/domain.py): the global
    sorted range [lo, hi) this chip can gather locally (its halo-extended
    slab).  Leaf cells outside it go to a separate, tightly-capped *far*
    list fetched by a request/reply collective; with ``local_bounds=None``
    (single chip) everything is local and the far list is empty."""
    B = cfg.group_size
    L = cfg.max_level
    W = window
    branch = 1 << cfg.dim

    # per-subgroup bounding boxes over alive members (union covering: tight
    # even when the group straddles a Morton seam into far-apart clusters)
    S = cfg.subgroups
    sub = B // S
    has = (gmass > 0).reshape(S, sub)
    spos = gpos.reshape(S, sub, 3)
    big = jnp.asarray(jnp.finfo(gpos.dtype).max, gpos.dtype)
    lo = jnp.min(jnp.where(has[..., None], spos, big), axis=1)  # [S, 3]
    hi = jnp.max(jnp.where(has[..., None], spos, -big), axis=1)
    any_alive = jnp.any(has, axis=1)[:, None]
    # empty subgroups get a point box parked far outside the domain so they
    # never force an opening
    far = jnp.asarray(1e30, gpos.dtype)
    lo = jnp.where(any_alive, lo, far)
    hi = jnp.where(any_alive, hi, far)
    gc = 0.5 * (lo + hi)  # [S, 3]
    gh = 0.5 * (hi - lo)

    # group-frame center for the MXU slab formulation: midpoint of the
    # alive members' bounding box
    glo = jnp.min(jnp.where(has[..., None], spos, big), axis=(0, 1))
    ghi = jnp.max(jnp.where(has[..., None], spos, -big), axis=(0, 1))
    center = jnp.where(jnp.any(has), 0.5 * (glo + ghi), 0.0)

    # sorted-index window around the group.  sliding: unclamped (virtual
    # window, zero rows beyond the edges — must match _window_rows'
    # dense construction); otherwise clamped into range for the
    # dynamic_slice assembly (and the domain path's halo proof).
    if sliding:
        wstart = gidx[0] - cfg.window_pad
    else:
        wstart = jnp.clip(gidx[0] - cfg.window_pad, 0, max(n_total - W, 0))
    wend = wstart + W

    # initial frontier: all cells of the start level
    n0 = branch ** cfg.start_level
    # per-level frontier sizes (bottom-weighted; see BHConfig.schedule)
    sched = cfg.schedule()
    ids = jnp.arange(n0, dtype=jnp.int32)
    valid = jnp.ones(n0, bool)

    ftype = gpos.dtype
    mono = jnp.zeros((cfg.accept_cap + 1, 8), ftype)
    mono_off = jnp.int32(0)
    fb = jnp.zeros((cfg.fb_cap + 1, 8), ftype)
    fb_off = jnp.int32(0)
    a_dropped = jnp.int32(0)
    f_fallback = jnp.int32(0)
    n_fallback = jnp.int32(0)
    fb_spill = jnp.int32(0)
    near_ids = jnp.zeros((cfg.near_cell_cap,), jnp.int32)
    near_valid = jnp.zeros((cfg.near_cell_cap,), bool)
    # window-coverage diff array (+1 at covered range start, -1 past its end)
    delta = jnp.zeros((W + 1,), jnp.int32)
    d_idx, d_val = [], []  # cfg.delta_onepass accumulators (static sizes)

    # density-adaptive descent below the leaf level (cfg.refine_levels > 0):
    # refined-near entries are explicit sorted RANGES (the refined tables
    # are slot-indexed, not a dense grid, so there is no cell-id table for
    # the post-walk expansion to gather from), budgeted separately
    R = cfg.refine_levels
    RC = cfg.refine_near_cell_cap if R else 0
    # domain runs additionally split refined ranges by gather locality
    # (halo slab vs request/reply) — see the refined loop below
    RFC = cfg.refine_far_cell_cap if (R and local_bounds is not None) else 0
    if R:
        rf_parent_cap = cfg.refine_frontier // branch
    rnear_cs = jnp.zeros((RC + 1,), jnp.int32)
    rnear_ce = jnp.zeros((RC + 1,), jnp.int32)
    rn_off = jnp.int32(0)
    rn_pcnt = jnp.int32(0)
    rfar_cs = jnp.zeros((RFC + 1,), jnp.int32)
    rfar_ce = jnp.zeros((RFC + 1,), jnp.int32)
    rf_off = jnp.int32(0)
    rf_pcnt = jnp.int32(0)

    for l in range(cfg.start_level, L + 1):
        # ONE packed-row gather per slot: (m, mx, my, mz, start, end, _, _)
        row = tree.level_table[l][ids]  # [F, 8]
        m = jnp.where(valid, row[:, 0], 0.0)
        row = row.at[:, 0].set(m)  # masked rows carry zero mass downstream
        occupied = m > 0
        com = row[:, 1:4] / jnp.where(occupied, m, 1.0)[:, None]
        cs, ce = decode_ranges(row, cfg.wide)

        # cells wholly inside the window: handled exactly by the window pass
        covered = occupied & (cs >= wstart) & (ce <= wend)
        inc = covered.astype(jnp.int32)
        if cfg.delta_onepass:
            d_idx += [jnp.where(covered, cs - wstart, W),
                      jnp.where(covered, ce - wstart, W)]
            d_val += [inc, -inc]
        else:
            delta = delta.at[jnp.where(covered, cs - wstart, W)].add(inc)
            delta = delta.at[jnp.where(covered, ce - wstart, W)].add(-inc)

        # exact distance from node COM to the union of subgroup boxes
        d = jnp.maximum(
            jnp.abs(com[:, None, :] - gc[None, :, :]) - gh[None, :, :], 0.0
        )  # [F, S, 3]
        rmin2 = jnp.min(jnp.sum(d * d, axis=-1), axis=-1)  # [F]
        accept = occupied & ~covered & (
            cell_w2[l] < (cfg.accept_margin * theta2) * rmin2
        )
        expand = occupied & ~covered & ~accept

        if l < L:
            # cells that would expand past the parent cap degrade to
            # self-excluded monopole (graceful fallback, never a dropped
            # or self-polluted force)
            parent_cap = sched[l - cfg.start_level] // branch
            overflowed = expand & (jnp.cumsum(expand) > parent_cap)
            f_fallback = f_fallback + jnp.sum(overflowed).astype(jnp.int32)
            expand = expand & ~overflowed
        else:
            # leaf level: take unexpandable cells into the exact near field
            # while they fit the particle and cell budgets (order-preserving
            # prefix); everything beyond degrades to self-excluded monopole.
            # Domain runs split by gather locality: cells inside the chip's
            # halo slab use the (large) local budget, Morton-far seam cells
            # the (small) far budget that bounds the collective.
            if R:
                # flagged-and-materialized cells descend into the refined
                # tables instead of fighting for the near/fallback budgets;
                # frontier overflow falls back to the unrefined path
                rbase = tree.refine_slot_leaf[ids]
                descend = expand & (rbase >= 0)
                over_r = descend & (jnp.cumsum(descend) > rf_parent_cap)
                descend = descend & ~over_r
                expand = expand & ~descend
            if local_bounds is not None:
                is_local = (cs >= local_bounds[0]) & (ce <= local_bounds[1])
            else:
                is_local = jnp.ones_like(expand)
            exp_l = expand & is_local
            exp_f = expand & ~is_local
            cnt_l = jnp.where(exp_l, ce - cs, 0)
            inc_l = (
                exp_l
                & (jnp.cumsum(cnt_l) <= cfg.near_particle_cap)
                & (jnp.cumsum(exp_l) <= cfg.near_cell_cap)
            )
            if local_bounds is not None:
                cnt_f = jnp.where(exp_f, ce - cs, 0)
                inc_f = (
                    exp_f
                    & (jnp.cumsum(cnt_f) <= cfg.far_particle_cap)
                    & (jnp.cumsum(exp_f) <= cfg.far_cell_cap)
                )
            else:
                inc_f = jnp.zeros_like(exp_f)
            overflowed = expand & ~inc_l & ~inc_f
            n_fallback = jnp.sum(overflowed).astype(jnp.int32)
            expand = inc_l
            expand_far = inc_f

        # overflow cells -> fallback slab (self-excluded multipole eval);
        # rows are the raw packed node rows (M, S, cs, ce) _fb_eval expects,
        # plus (level, cell id) in slots 6/7 for the quadrupole gather
        idf = ids.astype(ftype)  # cell ids < 2^(dim*L) <= 2^24: exact
        lvlf = jnp.full((ids.shape[0],), float(l), ftype)
        fbrow = row.at[:, 6].set(lvlf).at[:, 7].set(idf)
        fb, fb_off, fb_drop = _push_rows(fb, fb_off, fbrow, overflowed,
                                         cfg.fb_cap)
        fb_spill = fb_spill + jnp.sum(fb_drop).astype(jnp.int32)

        # accepted nodes (+ fb spill, which loses only the self-exclusion)
        # -> multipole slab rows (com, mass, idx=-1, level, cell id); spill
        # rows carry level=-1 so assembly zeroes their quadrupole (a cell
        # that may CONTAIN the target must not get the quad term — the
        # round-1 plain-monopole degradation, counted in stats)
        mono_mask = accept | fb_drop
        neg = jnp.full((ids.shape[0],), -1.0, ftype)
        # slot 7 carries the TRUE level even for spill rows (slot 5 = -1):
        # the cached-topology path (traverse_tree_cached) re-gathers fresh
        # node values by (level, cell id); no kernel reads slab slot 7
        mrows = jnp.stack(
            [com[:, 0], com[:, 1], com[:, 2], m, neg,
             jnp.where(fb_drop, -1.0, lvlf), idf, lvlf],
            axis=1,
        )
        mono, mono_off, mono_drop = _push_rows(mono, mono_off, mrows,
                                               mono_mask, cfg.accept_cap)
        a_dropped = a_dropped + jnp.sum(mono_drop).astype(jnp.int32)

        if l < L:
            parents, pvalid_, _ = _compact(ids, expand, parent_cap)
            ids = (
                parents[:, None] * branch
                + jnp.arange(branch, dtype=jnp.int32)
            ).reshape(parent_cap * branch)
            valid = jnp.repeat(pvalid_, branch)
        else:
            near_ids, near_valid, _ = _compact(ids, expand, cfg.near_cell_cap)
            if local_bounds is not None:
                far_ids, far_valid, _ = _compact(
                    ids, expand_far, cfg.far_cell_cap
                )
            if R:
                rb, rbv, _ = _compact(rbase, descend, rf_parent_cap)
                rids = (
                    rb[:, None] * branch + jnp.arange(branch, dtype=jnp.int32)
                ).reshape(rf_parent_cap * branch)
                rvalid = jnp.repeat(rbv, branch)

    # refined levels: same machinery over the slot-indexed refined tables.
    # ``rids`` are ROW indices into refine_tables[r-1]; children of a
    # further-refined row j live at rows child_slot[j]*branch + k (build-
    # time compaction).  Cells here are below leaf size, so every outcome
    # is at worst the unrefined path's quality: window-covered children are
    # EXACT, accepted ones are small monopoles (level -1 rides the existing
    # spill-row mechanism: quadrupole zeroed, cached-topology re-gather
    # rejected by the traverse_tree gate), near ranges are exact pair work,
    # and overflow keeps the self-excluded multipole fallback.
    for r in range(1, R + 1):
        row = tree.refine_tables[r - 1][rids]  # [F, 8]
        m = jnp.where(rvalid, row[:, 0], 0.0)
        row = row.at[:, 0].set(m)
        occupied = m > 0
        com = row[:, 1:4] / jnp.where(occupied, m, 1.0)[:, None]
        cs, ce = decode_ranges(row, False)  # refined tables are narrow-only

        covered = occupied & (cs >= wstart) & (ce <= wend)
        inc = covered.astype(jnp.int32)
        if cfg.delta_onepass:
            d_idx += [jnp.where(covered, cs - wstart, W),
                      jnp.where(covered, ce - wstart, W)]
            d_val += [inc, -inc]
        else:
            delta = delta.at[jnp.where(covered, cs - wstart, W)].add(inc)
            delta = delta.at[jnp.where(covered, ce - wstart, W)].add(-inc)

        d = jnp.maximum(
            jnp.abs(com[:, None, :] - gc[None, :, :]) - gh[None, :, :], 0.0
        )
        rmin2 = jnp.min(jnp.sum(d * d, axis=-1), axis=-1)
        accept = occupied & ~covered & (
            cell_w2[L + r] < (cfg.accept_margin * theta2) * rmin2
        )
        expand = occupied & ~covered & ~accept

        if r < R:
            rbase = jnp.where(rvalid, tree.refine_child_slot[r - 1][rids], -1)
            descend = expand & (rbase >= 0)
            over_r = descend & (jnp.cumsum(descend) > rf_parent_cap)
            descend = descend & ~over_r
            expand = expand & ~descend

        # refined-near: explicit ranges under their own cumulative budgets.
        # Domain runs split by gather locality exactly like the leaf
        # level: ranges inside the halo slab join the local list, Morton-
        # far (seam-core) ranges the tightly-capped refined-far list
        # served by the request/reply collective — overflow on either
        # degrades to self-excluded multipole fallback, never dropped.
        if local_bounds is not None:
            is_local_r = (cs >= local_bounds[0]) & (ce <= local_bounds[1])
        else:
            is_local_r = jnp.ones_like(expand)
        exp_l = expand & is_local_r
        exp_f = expand & ~is_local_r
        cnt = jnp.where(exp_l, ce - cs, 0)
        inc_n = (
            exp_l
            & (rn_pcnt + jnp.cumsum(cnt) <= cfg.refine_near_particle_cap)
            & (rn_off + jnp.cumsum(exp_l) <= RC)
        )
        if RFC:
            cnt_f = jnp.where(exp_f, ce - cs, 0)
            inc_f = (
                exp_f
                & (rf_pcnt + jnp.cumsum(cnt_f)
                   <= cfg.refine_far_particle_cap)
                & (rf_off + jnp.cumsum(exp_f) <= RFC)
            )
        else:
            inc_f = jnp.zeros_like(exp_f)
        overflowed = expand & ~inc_n & ~inc_f
        n_fallback = n_fallback + jnp.sum(overflowed).astype(jnp.int32)
        slot = rn_off + jnp.cumsum(inc_n) - 1
        keep = inc_n & (slot < RC)
        write = jnp.where(keep, slot, RC)
        rnear_cs = rnear_cs.at[write].set(cs)
        rnear_ce = rnear_ce.at[write].set(ce)
        rn_off = jnp.minimum(rn_off + jnp.sum(inc_n), RC).astype(jnp.int32)
        rn_pcnt = rn_pcnt + jnp.sum(jnp.where(inc_n, cnt, 0)).astype(jnp.int32)
        if RFC:
            slot_f = rf_off + jnp.cumsum(inc_f) - 1
            keep_f = inc_f & (slot_f < RFC)
            write_f = jnp.where(keep_f, slot_f, RFC)
            rfar_cs = rfar_cs.at[write_f].set(cs)
            rfar_ce = rfar_ce.at[write_f].set(ce)
            rf_off = jnp.minimum(
                rf_off + jnp.sum(inc_f), RFC).astype(jnp.int32)
            rf_pcnt = rf_pcnt + jnp.sum(
                jnp.where(inc_f, cnt_f, 0)).astype(jnp.int32)

        # fallback rows: _fb_eval's self-exclusion is the cs/ce particle-
        # range containment (narrow mode); slots 6/7 carry -1/0 — refined
        # rows have no (level, cell id) address (fb_quad/wide are gated)
        neg = jnp.full((rids.shape[0],), -1.0, ftype)
        zero = jnp.zeros((rids.shape[0],), ftype)
        fbrow = row.at[:, 6].set(neg).at[:, 7].set(zero)
        fb, fb_off, fb_drop = _push_rows(fb, fb_off, fbrow, overflowed,
                                         cfg.fb_cap)
        fb_spill = fb_spill + jnp.sum(fb_drop).astype(jnp.int32)

        # accepted refined cells (+ fb spill) ride the multipole slab as
        # level -1 rows: monopole exact, quadrupole zeroed (_quad_slab okq)
        mono_mask = accept | fb_drop
        mrows = jnp.stack(
            [com[:, 0], com[:, 1], com[:, 2], m, neg, neg, zero, neg],
            axis=1,
        )
        mono, mono_off, mono_drop = _push_rows(mono, mono_off, mrows,
                                               mono_mask, cfg.accept_cap)
        a_dropped = a_dropped + jnp.sum(mono_drop).astype(jnp.int32)

        if r < R:
            rb, rbv, _ = _compact(rbase, descend, rf_parent_cap)
            rids = (
                rb[:, None] * branch + jnp.arange(branch, dtype=jnp.int32)
            ).reshape(rf_parent_cap * branch)
            rvalid = jnp.repeat(rbv, branch)

    rnear = jnp.stack([rnear_cs[:RC], rnear_ce[:RC]], axis=1)  # [RC, 2]
    rnear_valid = jnp.arange(RC, dtype=jnp.int32) < rn_off
    rfar = jnp.stack([rfar_cs[:RFC], rfar_ce[:RFC]], axis=1)  # [RFC, 2]
    rfar_valid = jnp.arange(RFC, dtype=jnp.int32) < rf_off

    # residual near field stays as CELL ids here; the caller expands them
    # to particle-id lists AFTER the chunked walk with flat index
    # arithmetic (_expand_ranges) — doing it here under vmap lowered the
    # per-group offs/nstart lookups to batched gathers, measured ~8 ms
    # per step each at 1M (profile_1m fusion.473/474)
    if local_bounds is None:
        far_ids = jnp.zeros((0,), jnp.int32)
        far_valid = jnp.zeros((0,), bool)

    if cfg.delta_onepass:
        delta = delta.at[jnp.concatenate(d_idx)].add(jnp.concatenate(d_val))
    wmask = jnp.cumsum(delta)[:W] > 0

    # overflow-fallback contribution (cold path, tiny [B, fb_cap] eval).
    # Wide mode containment needs the targets' leaf codes (gcode).
    if cfg.wide and gcode is None:
        raise ValueError("BHConfig.wide requires target leaf codes (gcode)")
    fbk = dict(tcell=gcode if cfg.wide else None, dim=cfg.dim, max_level=L)
    if phi:
        acc_fb = _fb_phi(gpos, gidx, gmass, fb[: cfg.fb_cap], g, g_soft,
                         **fbk)
    elif cfg.multipole == "quad" and cfg.fb_quad:
        goffs = jnp.array(
            [level_offset(lv, branch) for lv in range(L + 1)], jnp.int32
        )
        acc_fb = _fb_eval(gpos, gidx, gmass, fb[: cfg.fb_cap], g, g_soft,
                          tree.all_quad, goffs, **fbk)
    else:
        acc_fb = _fb_eval(gpos, gidx, gmass, fb[: cfg.fb_cap], g, g_soft,
                          **fbk)

    stats = (a_dropped, f_fallback, n_fallback, fb_spill, rn_pcnt, rf_pcnt)
    # the fb slab rides along so callers can cache it as walk topology
    # (traverse_tree(return_topo=True) -> traverse_tree_cached)
    return (mono[: cfg.accept_cap], near_ids, near_valid, far_ids, far_valid,
            wmask, wstart, center, acc_fb, fb[: cfg.fb_cap], rnear,
            rnear_valid, rfar, rfar_valid, stats)


def _expand_ranges(leaf_table, cell_ids, cell_valid, cap, wide=False):
    """Expand leaf-cell particle ranges into padded flat index lists for
    ALL groups at once (called after the chunked walk).  Slot k belongs to
    the c-th cell, c = #offs <= k — one scatter + row cumsum instead of a
    cap-wide binary search.  Everything uses FLAT index arithmetic: the
    vmapped per-group version lowered the offs/nstart lookups to batched
    gathers, ~8 ms per step each at 1M (profile_1m fusion.473/474).

    cell_ids [G, C], cell_valid [G, C] ->
    (pidx [G, cap], pvalid [G, cap], total [G])."""
    nrow = leaf_table[cell_ids]  # shared-table row gather (fast path)
    nstart, nend = decode_ranges(nrow, wide)
    return _expand_from_ranges(nstart, nend, cell_valid, cap)


def _expand_from_ranges(nstart, nend, cell_valid, cap):
    """_expand_ranges' core on explicit per-cell sorted ranges — the
    refined-near list carries (start, end) directly (slot-indexed refined
    tables have no dense cell-id table to gather from)."""
    G, C = nstart.shape
    counts = jnp.where(cell_valid, nend - nstart, 0).astype(jnp.int32)
    offs = jnp.cumsum(counts, axis=1)
    total = offs[:, -1]

    g_row = jnp.arange(G, dtype=jnp.int32)[:, None]
    stride = cap + 1
    marks = jnp.zeros((G * stride,), jnp.int32).at[
        g_row * stride + jnp.minimum(offs, cap)
    ].add(jnp.where(cell_valid, 1, 0))
    cell_of_k = jnp.cumsum(marks.reshape(G, stride), axis=1)[:, :cap]
    cell_of_k = jnp.minimum(cell_of_k, C - 1)
    k = jnp.arange(cap, dtype=jnp.int32)[None, :]
    # ONE flat scalar gather of (start - prior_offs): merging the two v5
    # gathers (base + nstart) halves the slow per-element lookups; packing
    # them as 8-wide rows instead was measured WORSE (4.33 -> 4.13 steps/s
    # @1M mono) — the [G*C, 8] pack + 32 MB gather output costs more than
    # the scalar gather it replaces
    rebase = nstart - jnp.concatenate(
        [jnp.zeros((G, 1), jnp.int32), offs[:, :-1]], axis=1
    )
    pidx = rebase.reshape(G * C)[g_row * C + cell_of_k] + k
    pvalid = k < jnp.minimum(total, cap)[:, None]
    pidx = jnp.where(pvalid, pidx, 0)
    return pidx, pvalid, total


def _quad_slab(mono, all_quad, goffs, excl_level: int = -1):
    """Expand the collected node-id slab into 16-wide quadrupole source rows.

    mono [G, A, 8] rows: (com_x, com_y, com_z, M, -1, level, cell_id, 0);
    level == -1 marks fb-spill rows whose quadrupole must be ZERO (the cell
    may contain the target — plain-monopole degradation, counted in stats).
    Raw grid-frame second moments from ``all_quad`` are centralized about
    the node COM here (P = S2 - M c cᵀ; traceless Q = 3P - tr(P) I) — only
    for the few thousand rows per group the walk actually accepted, never
    for the full tree.  The accel entry points recenter all positions on
    bounds.center, so the subtraction is well-conditioned for scenes far
    from the origin (ADVICE r2 #1).  Returns [G, A, 16] rows:
    (x, y, z, M, Qxx, Qyy, Qzz, Qxy, Qxz, Qyz, 0...)."""
    dtype = mono.dtype
    lvl = mono[..., 5].astype(jnp.int32)
    cid = mono[..., 6].astype(jnp.int32)
    m = mono[..., 3]
    com = mono[..., :3]
    okq = (lvl >= 0) & (m > 0)
    if excl_level >= 0:  # quad_leaf=False: leaf rows eval as monopoles
        okq = okq & (lvl != excl_level)
    gid = jnp.where(okq, goffs[jnp.maximum(lvl, 0)] + cid, 0)
    S2 = all_quad[gid]  # [G, A, 8] (last 2 cols zero padding)
    cx, cy, cz = com[..., 0], com[..., 1], com[..., 2]
    pxx = S2[..., 0] - m * cx * cx
    pyy = S2[..., 1] - m * cy * cy
    pzz = S2[..., 2] - m * cz * cz
    pxy = S2[..., 3] - m * cx * cy
    pxz = S2[..., 4] - m * cx * cz
    pyz = S2[..., 5] - m * cy * cz
    tr = pxx + pyy + pzz
    z = jnp.zeros_like(m)
    q = jnp.stack(
        [3 * pxx - tr, 3 * pyy - tr, 3 * pzz - tr,
         3 * pxy, 3 * pxz, 3 * pyz],
        axis=-1,
    )
    q = jnp.where(okq[..., None], q, 0.0).astype(dtype)
    zeros6 = jnp.stack([z, z, z, z, z, z], axis=-1)
    return jnp.concatenate([com, m[..., None], q, zeros6], axis=-1)


def _quad_block(gpos, qrows, g, g_soft, p_block=0):
    """XLA backend for the quadrupole slab eval (CPU tests, f64): one group's
    targets [B, 3] vs quad source rows [A, 16] -> acc [B, 3].

    Force law (e = com - p pointing target -> source, r² = |e|² + ε²,
    traceless Q): a = G [ M e / r³ - (Q e) / r⁵ + (5/2)(eᵀ Q e) e / r⁷ ] —
    the gradient of Φ = -G [ M/r + (dᵀ Q d)/(2 r⁵) ] (standard multipole
    expansion about the COM; dipole vanishes identically).

    NOTE: this force law lives in three places with shape-incompatible
    surroundings — here (XLA, shared rows), ops/group_force._quad_kernel
    (Pallas), and _fb_eval's quad branch (per-target self-excluded
    moments).  Keep their guards in sync: all three mask exactly r² <= 0,
    never an absolute floor (scene scale is unbounded below).

    ``p_block`` > 0 rolls over source-row blocks exactly like _pair_block
    (bounds the [B, A]-shaped intermediates — the accept slab at
    production budgets is as wide as the near slab)."""
    if p_block and qrows.shape[0] > p_block:
        A = qrows.shape[0]
        pad = (-A) % p_block
        if pad:  # zero mass -> ok False -> contributes nothing
            qrows = jnp.concatenate(
                [qrows, jnp.zeros((pad, qrows.shape[1]), qrows.dtype)])
        nb = (A + pad) // p_block

        def body(acc, qblk):
            return acc + _quad_block(gpos, qblk, g, g_soft), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros_like(gpos),
            qrows.reshape(nb, p_block, qrows.shape[1]))
        return acc
    com = qrows[:, :3]
    m = qrows[:, 3]
    e = com[None, :, :] - gpos[:, None, :]  # [B, A, 3]
    r2 = jnp.sum(e * e, axis=-1) + g_soft * g_soft
    ok = (m[None, :] > 0) & (r2 > 0.0)
    inv_r = jax.lax.rsqrt(jnp.where(ok, r2, 1.0))
    ir2 = inv_r * inv_r
    ir3 = ir2 * inv_r
    ir5 = ir3 * ir2
    ir7 = ir5 * ir2
    s = jnp.where(ok, ir3 * m[None, :], 0.0)
    ex, ey, ez = e[..., 0], e[..., 1], e[..., 2]
    qxx, qyy, qzz = qrows[:, 4], qrows[:, 5], qrows[:, 6]
    qxy, qxz, qyz = qrows[:, 7], qrows[:, 8], qrows[:, 9]
    ux = qxx[None, :] * ex + qxy[None, :] * ey + qxz[None, :] * ez
    uy = qxy[None, :] * ex + qyy[None, :] * ey + qyz[None, :] * ez
    uz = qxz[None, :] * ex + qyz[None, :] * ey + qzz[None, :] * ez
    qe = ex * ux + ey * uy + ez * uz
    w = s + jnp.where(ok, 2.5 * qe * ir7, 0.0)
    ir5 = jnp.where(ok, ir5, 0.0)
    return g * jnp.stack(
        [
            jnp.sum(w * ex - ir5 * ux, axis=1),
            jnp.sum(w * ey - ir5 * uy, axis=1),
            jnp.sum(w * ez - ir5 * uz, axis=1),
        ],
        axis=1,
    )


def _quad_eval(qslab, tgt8, g, g_soft, cfg: BHConfig):
    """Dispatch the quadrupole slab eval: Pallas kernel on TPU f32, chunked
    XLA contraction elsewhere.  qslab [G, A, 16], tgt8 [G, B, 8]."""
    G, B, _ = tgt8.shape
    A = qslab.shape[1]
    dtype = tgt8.dtype
    tile = cfg.quad_tile
    while tile > 128 and (tile > A or A % tile):
        tile //= 2
    a_pad = (-A) % tile
    if a_pad:
        qslab = jnp.concatenate(
            [qslab, jnp.zeros((G, a_pad, 16), dtype)], axis=1
        )
        A += a_pad

    if _resolve_eval_mode(cfg, dtype) == "pallas":
        from nbody_tpu.ops.group_force import quad_force_pallas

        return quad_force_pallas(
            tgt8, jnp.swapaxes(qslab, 1, 2), g, g_soft, tile=tile
        )

    CG = cfg.chunk_groups
    n_chunks = G // CG
    pb = _resolve_p_block(cfg)

    def eval_body(args):
        q_c, t8_c = args
        return jax.vmap(
            lambda q, t8: _quad_block(t8[:, :3], q, g, g_soft, p_block=pb)
        )(q_c, t8_c)

    return jax.lax.map(
        eval_body,
        (qslab.reshape(n_chunks, CG, A, 16),
         tgt8.reshape(n_chunks, CG, B, 8)),
    ).reshape(G, B, 3)


def _fit_eval_tile(tile: int, S: int) -> int:
    """The source-tile width _slab_eval will use for a slab of S rows."""
    while tile > 128 and tile > S:
        tile //= 2
    return tile


def _dual_prepare(slab, tgt8, theta2, cfg: BHConfig, tile: int):
    """Block-dual acceptance over the eval grid (see BHConfig.block_dual).

    slab [G, S, 8] (masses already masked; S % tile == 0), tgt8 [G, B, 8] ->
    (mask [G, bt, st] bool, qrows [G*bt, 128, 16] per-target-tile quadrupole
    source rows, n_accepted scalar).

    Source-tile stats come from the MASKED slab rows, so each tile's
    multipole represents exactly the rows the pair pass would have summed —
    window rows excluded by the coverage mask, near-cap padding, and eval
    padding all carry zero mass and drop out.  Central moments are computed
    two-pass about the tile COM (no large-coordinate cancellation; positions
    are grid-frame already).  Acceptance uses BOX-BOX distance: a source
    tile overlapping the target tile's bbox gets d = 0 and is never
    accepted, which rules out self-interaction at any theta."""
    from nbody_tpu.ops.group_force import fit_target_tile

    G, S, _ = slab.shape
    B = tgt8.shape[1]
    ti = fit_target_tile(B, tile, 512, 1 << 20)
    bt = B // ti
    st = S // tile
    assert st <= 128, (S, tile)  # qrows pad target: one 128-wide quad tile
    dtype = slab.dtype
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)

    # ---- source tile stats ----
    rows = slab.reshape(G, st, tile, 8)
    sm = rows[..., 3]  # [G, st, T]
    sv = sm > 0
    sp = rows[..., :3]
    M = jnp.sum(sm, axis=-1)  # [G, st]
    S1 = jnp.sum(sm[..., None] * sp, axis=-2)  # [G, st, 3]
    com = S1 / jnp.maximum(M, tiny)[..., None]
    slo = jnp.min(jnp.where(sv[..., None], sp, big), axis=-2)
    shi = jnp.max(jnp.where(sv[..., None], sp, -big), axis=-2)
    eligible = M > 0
    w = jnp.where(eligible[..., None], shi - slo, 0.0)
    wmax = jnp.max(w, axis=-1)
    w2 = wmax * wmax  # [G, st] (max side², the cell-width convention)
    d = sp - com[:, :, None, :]
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    pxx = jnp.sum(sm * dx * dx, axis=-1)
    pyy = jnp.sum(sm * dy * dy, axis=-1)
    pzz = jnp.sum(sm * dz * dz, axis=-1)
    pxy = jnp.sum(sm * dx * dy, axis=-1)
    pxz = jnp.sum(sm * dx * dz, axis=-1)
    pyz = jnp.sum(sm * dy * dz, axis=-1)
    tr = pxx + pyy + pzz
    z = jnp.zeros_like(M)
    qrow16 = jnp.stack(
        [com[..., 0], com[..., 1], com[..., 2], M,
         3 * pxx - tr, 3 * pyy - tr, 3 * pzz - tr,
         3 * pxy, 3 * pxz, 3 * pyz, z, z, z, z, z, z],
        axis=-1,
    )  # [G, st, 16]

    # ---- target tile boxes (alive members only) ----
    t = tgt8.reshape(G, bt, ti, 8)
    tv = t[..., 3] > 0
    tp = t[..., :3]
    tlo = jnp.min(jnp.where(tv[..., None], tp, big), axis=-2)  # [G, bt, 3]
    thi = jnp.max(jnp.where(tv[..., None], tp, -big), axis=-2)
    any_t = jnp.any(tv, axis=-1)  # [G, bt]

    # ---- box-box acceptance ----
    gap = jnp.maximum(
        jnp.maximum(slo[:, None, :, :] - thi[:, :, None, :],
                    tlo[:, :, None, :] - shi[:, None, :, :]),
        0.0,
    )  # [G, bt, st, 3]
    db2 = jnp.sum(gap * gap, axis=-1)
    margin = jnp.asarray(cfg.dual_margin, dtype)
    accept = (
        eligible[:, None, :]
        & any_t[..., None]
        & (w2[:, None, :] < margin * theta2 * db2)
        & (db2 > 0)
    )  # [G, bt, st]

    q = jnp.where(accept[..., None], qrow16[:, None, :, :], 0.0)
    if st < 128:
        q = jnp.concatenate(
            [q, jnp.zeros((G, bt, 128 - st, 16), dtype)], axis=2
        )
    return accept, q.reshape(G * bt, 128, 16), jnp.sum(accept)


def _dual_slab_eval(slab, tgt8, center, theta2, g, g_soft, cfg: BHConfig):
    """``_slab_eval`` with the block-dual far field folded in: pad the slab
    to the eval tile, compute per-(target-tile, source-tile) acceptance
    (_dual_prepare), run the masked pair kernel, and add the accepted
    tiles' central-quadrupole contributions.  The shared entry for the
    single-chip walk (traverse_tree) and the domain-decomposed path
    (parallel/domain.py).  Returns (acc [G, B, 3], n_dual scalar)."""
    G, B, _ = tgt8.shape
    dtype = slab.dtype
    if not cfg.block_dual:
        return _slab_eval(slab, tgt8, center, g, g_soft, cfg), jnp.int32(0)
    tile = _fit_eval_tile(cfg.eval_tile, slab.shape[1])
    s_pad = (-slab.shape[1]) % tile
    if s_pad:
        slab = jnp.concatenate(
            [slab, jnp.zeros((G, s_pad, 8), dtype)], axis=1
        )
    dmask, dqrows, n_dual = _dual_prepare(slab, tgt8, theta2, cfg, tile)
    # pass the tile the mask grid was built on: _slab_eval would otherwise
    # re-derive it from the PADDED slab length and can pick a 2x larger
    # tile when the un-padded slab was smaller than eval_tile (mask-grid
    # desync — reproduced at group_size=128, window_pad=64, review r3)
    acc = _slab_eval(slab, tgt8, center, g, g_soft, cfg, mask=dmask,
                     tile=tile)
    bt = dmask.shape[1]
    acc = acc + _quad_eval(
        dqrows, tgt8.reshape(G * bt, B // bt, 8), g, g_soft, cfg
    ).reshape(G, B, 3)
    return acc, n_dual


def _self_square_eval(tgt8, mcen, g, g_soft, cfg: BHConfig):
    """Each group vs itself with window-masked source masses ``mcen``
    [G, B] (cfg.near_sym).  Pallas backend: the Newton-3 symmetric kernel;
    XLA backend (CPU tests, f64): a plain maskless pair block — self-pairs
    contribute zero via d = 0 exactly like the Pallas kernels, masked
    sources via m = 0."""
    if _resolve_eval_mode(cfg, tgt8.dtype) == "pallas":
        from nbody_tpu.ops.group_force import group_self_force_pallas

        return group_self_force_pallas(tgt8, mcen, g, g_soft)
    G, B, _ = tgt8.shape
    CG = cfg.chunk_groups
    pb = _resolve_p_block(cfg)

    def body(args):
        t8_c, m_c = args
        return jax.vmap(
            lambda t8, mc: _pair_block(
                t8[:, :3], None, t8[:, :3], mc, None, mc != 0.0, g, g_soft,
                None, p_block=pb,
            )
        )(t8_c, m_c)

    return jax.lax.map(
        body, (tgt8.reshape(-1, CG, B, 8), mcen.reshape(-1, CG, B))
    ).reshape(G, B, 3)


def _slab_eval(slab, tgt8, center, g, g_soft, cfg: BHConfig, mask=None,
               tile=None):
    """One fused interaction pass: every group's targets vs its assembled
    source slab.  Backend by ``cfg.eval_mode``: the Pallas group-force
    kernel on TPU f32 (ops/group_force.py), an XLA contraction (chunked
    ``lax.map`` over groups to bound the [B, S] intermediates) elsewhere.

    slab [G, S, 8], tgt8 [G, B, 8] (row layout: x, y, z, m, idx, 0, 0, 0),
    center [G, 3] -> acc [G, B, 3].

    ``mask`` (block-dual): [G, bt, S//tile] bool — accepted (target-tile,
    source-tile) pairs are SKIPPED here (the caller evaluates them as the
    source tile's quadrupole).  The caller must have pre-padded the slab to
    the eval tile (mask tile indices must match)."""
    G, B, _ = tgt8.shape
    dtype = tgt8.dtype
    S = slab.shape[1]
    if tile is None:
        tile = _fit_eval_tile(cfg.eval_tile, S)
    else:
        assert S % tile == 0, (S, tile)  # caller pre-padded to its tile
    s_pad = (-S) % tile
    if s_pad:
        assert mask is None, "block-dual callers must pre-pad the slab"
        slab = jnp.concatenate([slab, jnp.zeros((G, s_pad, 8), dtype)],
                               axis=1)
        S += s_pad

    if _resolve_eval_mode(cfg, dtype) == "pallas":
        from nbody_tpu.ops.group_force import group_force_pallas

        return group_force_pallas(
            tgt8, jnp.swapaxes(slab, 1, 2), g, g_soft, tile=tile, mask=mask
        )

    CG = cfg.chunk_groups
    n_chunks = G // CG
    pb = _resolve_p_block(cfg)

    def eval_body(args):
        sl_c, t8_c, ct_c, mk_c = args

        def one(sl, t8, ct, mk):
            # wide mode: f32 idx columns are inexact past 2^24 — drop the
            # index compare like the (maskless) Pallas kernel: self-pairs
            # contribute zero force via d = 0, r² <= 0 guards the
            # unsoftened coincident case.  That exact-zero property needs
            # the d-form evaluation (s·d with d = 0): under the norm-trick
            # MXU form the un-skipped self-term m_i/ε³ rides two large
            # cancelling partial sums, which for a heavy particle (e.g. a
            # central body) leaves rounding residue ~1e-2 — so wide also
            # forces center=None below.
            tgi = None if cfg.wide else t8[:, 4].astype(jnp.int32)
            sli = None if cfg.wide else sl[:, 4].astype(jnp.int32)
            ct = None if cfg.wide else ct
            if mk is None:
                return _pair_block(
                    t8[:, :3], tgi, sl[:, :3],
                    sl[:, 3], sli, sl[:, 3] != 0.0,
                    g, g_soft, ct if cfg.mxu_blocks else None,
                    p_block=pb,
                )
            # masked tile pairs: zero the source masses per TARGET TILE
            # (CPU/f64 reference path for the masked Pallas kernel)
            bt = mk.shape[0]
            ti = B // bt
            keep = jnp.repeat(~mk, tile, axis=1).astype(dtype)  # [bt, S]

            def tile_eval(t8_t, keep_t):
                m_t = sl[:, 3] * keep_t
                return _pair_block(
                    t8_t[:, :3],
                    None if cfg.wide else t8_t[:, 4].astype(jnp.int32),
                    sl[:, :3], m_t, sli, m_t != 0.0,
                    g, g_soft, ct if cfg.mxu_blocks else None,
                    p_block=pb,
                )

            return jax.vmap(tile_eval)(
                t8.reshape(bt, ti, 8), keep
            ).reshape(B, 3)

        if mk_c is None:
            return jax.vmap(lambda sl, t8, ct: one(sl, t8, ct, None))(
                sl_c, t8_c, ct_c
            )
        return jax.vmap(one)(sl_c, t8_c, ct_c, mk_c)

    mk_all = (None if mask is None
              else mask.reshape(n_chunks, CG, *mask.shape[1:]))
    return jax.lax.map(
        eval_body,
        (slab.reshape(n_chunks, CG, S, 8), tgt8.reshape(n_chunks, CG, B, 8),
         center.reshape(n_chunks, CG, 3), mk_all),
    ).reshape(G, B, 3)


class WalkTopo(NamedTuple):
    """Cached walk topology — the collect walk's DECISIONS, none of its
    values: which nodes each group accepted (mono rows keep their
    (level, cell id); COM/mass are re-gathered fresh), which cells
    overflowed to the fallback slab, the expanded near-field index lists,
    and the window coverage.  With frozen binning (ops/tree.py
    refresh_octree) every index here stays meaningful across steps, so a
    step can skip the walk entirely (traverse_tree_cached) and still
    evaluate all forces at CURRENT positions — only the accept/near
    routing is stale.  The temporal analog of the reference midterm
    engine's incremental tree (src/llm/barnes_hut_midterm.rs:628-672),
    applied to the traversal instead of the build."""

    mono: jax.Array  # [G, accept_cap, 8] accepted-node rows
    fb: jax.Array  # [G, fb_cap, 8] overflow-fallback node rows
    pidx: jax.Array  # [G, near_particle_cap] int32 near source indices
    pvalid: jax.Array  # [G, near_particle_cap] bool
    ntot: jax.Array  # [G] int32 near totals (stats)
    wmask: jax.Array  # [G, W] bool window coverage
    wstart: jax.Array  # [G] int32 window starts


def empty_topo(n: int, cfg: BHConfig, dtype) -> WalkTopo:
    """Zero-filled WalkTopo with the exact shapes traverse_tree(
    return_topo=True) produces for ``n`` — the initial carry before the
    first full walk (every mono/fb row has zero mass, so it is inert even
    if evaluated)."""
    block = cfg.group_size * cfg.chunk_groups
    n_tot = n + (-n) % block
    G = n_tot // cfg.group_size
    W = min(cfg.window, n_tot)
    P = cfg.near_particle_cap
    return WalkTopo(
        mono=jnp.zeros((G, cfg.accept_cap, 8), dtype),
        fb=jnp.zeros((G, cfg.fb_cap, 8), dtype),
        pidx=jnp.zeros((G, P), jnp.int32),
        pvalid=jnp.zeros((G, P), bool),
        ntot=jnp.zeros((G,), jnp.int32),
        wmask=jnp.zeros((G, W), bool),
        wstart=jnp.zeros((G,), jnp.int32),
    )


def _sliding_ok(cfg: BHConfig, W: int) -> bool:
    """Static predicate: the gather-free sliding-window assembly applies
    (see BHConfig.sliding_window).  Must be computed identically by the
    walk (wstart formula) and every assembly site — it is a pure function
    of (cfg, W), so consistency is structural."""
    return (cfg.sliding_window
            and W == cfg.group_size + 2 * cfg.window_pad
            and cfg.window_pad <= cfg.group_size
            and not cfg.near_sym
            and not cfg.wide)


def _window_rows(pmass8, wstart, wmask, W: int, cfg: BHConfig,
                 sliding: bool, gstart=None):
    """Assemble the [G, W, 8] sorted-neighbor window rows, mass-masked to
    the covered cells.  sliding=True: dense shifted-reshape construction
    (zero rows beyond the array edges — matches the walk's unclamped
    wstart).  sliding=False: one dynamic_slice per group at the walk's
    clamped wstart (the general path)."""
    if sliding:
        p, B = cfg.window_pad, cfg.group_size
        n_tot = pmass8.shape[0]
        G = n_tot // B
        G_my = wstart.shape[0]
        if G_my != G:
            # sharded path: slice this shard's slab (its G_my contiguous
            # groups plus both rims) out of the zero-padded source FIRST,
            # so per-chip work is O(n_loc), then run the same dense
            # construction on the local slab.  padded[i] = pmass8 row
            # i - p, so group g's window starts at padded index g*B and
            # the shard slab is padded[gfirst*B : gfirst*B + G_my*B + 2p].
            zp = jnp.zeros((p, 8), pmass8.dtype)
            padded = jnp.concatenate([zp, pmass8, zp]) if p else pmass8
            z = jnp.int32(0)
            loc = jax.lax.dynamic_slice(
                padded, (gstart[0], z), (G_my * B + 2 * p, 8))
            if p:
                # local-slab sliding windows: group i's window is
                # loc[i*B : i*B + W]; the right-rim reshape needs G_my*B
                # rows, so top up with discarded-by-[:, :p] zeros
                left = loc[: G_my * B].reshape(G_my, B, 8)[:, :p]
                ctr = loc[p: p + G_my * B].reshape(G_my, B, 8)
                zfill = jnp.zeros((B, 8), pmass8.dtype)
                right = jnp.concatenate([loc[B + p:], zfill])[
                    : G_my * B].reshape(G_my, B, 8)[:, :p]
                wrows = jnp.concatenate([left, ctr, right], axis=1)
            else:
                wrows = loc.reshape(G_my, B, 8)
        else:
            ctr = pmass8.reshape(G, B, 8)
            if p:
                zp = jnp.zeros((p, 8), pmass8.dtype)
                zb = jnp.zeros((B, 8), pmass8.dtype)
                # left rim of group g = rows [g*B - p, g*B): the first p
                # rows of each B-block of pmass8 shifted DOWN by p (zeros
                # for g=0)
                left = jnp.concatenate([zp, pmass8[:-p]]).reshape(
                    G, B, 8)[:, :p]
                # right rim = rows [(g+1)*B, (g+1)*B + p): first p rows of
                # each block of pmass8 shifted UP by B (zeros past the end)
                right = jnp.concatenate([pmass8[B:], zb]).reshape(
                    G, B, 8)[:, :p]
                wrows = jnp.concatenate([left, ctr, right], axis=1)
            else:
                wrows = ctr
    else:
        wrows = jax.vmap(
            lambda ws: jax.lax.dynamic_slice(pmass8, (ws, jnp.int32(0)),
                                             (W, 8))
        )(wstart)
    return wrows.at[:, :, 3].set(jnp.where(wmask, wrows[:, :, 3], 0.0))


def _assemble_eval(pmass8, tgt8, gstart, tree, mono, pidx, pvalid, wmask,
                   wstart, center, acc_fb, theta2, g, g_soft,
                   cfg: BHConfig, W: int):
    """Slab assembly + fused force eval, shared by the full walk
    (traverse_tree) and the cached-topology path (traverse_tree_cached):
    window slice + near gather + multipole slab -> one fused eval pass
    (+ block-dual, + quadrupole kernel, + fallback term).  Returns
    (acc [G, B, 3] in sorted-group order, n_dual, slab_fill)."""
    dtype = tgt8.dtype
    nrows = pmass8[pidx]  # [G, P, 8]
    nrows = nrows.at[:, :, 3].set(jnp.where(pvalid, nrows[:, :, 3], 0.0))
    B = tgt8.shape[1]
    if cfg.near_sym:
        # split the window into the group's own central square + the two
        # rim pads (coverage/wmask semantics unchanged — see BHConfig).
        # The central columns [off, off+B) of the window ARE the group:
        # off = gstart - wstart, always in [0, W - B] by the wstart clip.
        off = (gstart - wstart).astype(jnp.int32)  # [G]
        R = W - B  # static rim width (2*window_pad away from array edges)
        k = jnp.arange(R, dtype=jnp.int32)
        rimrel = k[None, :] + B * (k[None, :] >= off[:, None])  # [G, R]
        rrows = pmass8[wstart[:, None] + rimrel]  # [G, R, 8]
        rmask = jnp.take_along_axis(wmask, rimrel, axis=1)
        rrows = rrows.at[:, :, 3].set(jnp.where(rmask, rrows[:, :, 3], 0.0))
        # central source weights: the group's own masses under the window
        # coverage mask (uncovered members ride near/fb as sources instead)
        cen = off[:, None] + jnp.arange(B, dtype=jnp.int32)[None, :]
        mcen = jnp.where(jnp.take_along_axis(wmask, cen, axis=1),
                         tgt8[:, :, 3], 0.0)
        wrows = rrows
    else:
        wrows = _window_rows(pmass8, wstart, wmask, W, cfg,
                             _sliding_ok(cfg, W), gstart)  # [G, W, 8]
    if cfg.multipole == "quad":
        # particle sources (exact) through the pair kernel; accepted nodes
        # through the separate quadrupole kernel (16-wide rows)
        slab = jnp.concatenate([wrows, nrows], axis=1)
    else:
        slab = jnp.concatenate([wrows, nrows, mono], axis=1)  # [G, S, 8]

    # dual-tree far field over the eval grid (when cfg.block_dual): accepted
    # (target-tile, source-tile) pairs skip the pair kernel and ride the
    # source tile's central quadrupole (_dual_prepare / _dual_slab_eval)
    acc_main, n_dual = _dual_slab_eval(
        slab, tgt8, center, theta2, g, g_soft, cfg
    )
    if cfg.near_sym:
        acc_main = acc_main + _self_square_eval(tgt8, mcen, g, g_soft, cfg)

    if cfg.multipole == "quad":
        goffs = jnp.array(
            [level_offset(lv, 1 << cfg.dim)
             for lv in range(cfg.max_level + 1)],
            jnp.int32,
        )
        qslab = _quad_slab(mono, tree.all_quad, goffs,
                           -1 if cfg.quad_leaf else cfg.max_level)
        acc_main = acc_main + _quad_eval(qslab, tgt8, g, g_soft, cfg)

    slab_fill = jnp.mean((slab[..., 3] != 0.0).astype(dtype))
    return acc_main + acc_fb, n_dual, slab_fill


def traverse_tree(tree, bounds, theta2, g, g_soft, cfg: BHConfig, n: int,
                  chunk_range=None, n_shards: int = 1,
                  return_topo: bool = False):
    """Group traversal + force over an already-built tree.

    Structure (round 2): chunked *collect* walk -> dense slab assembly
    (window slice + near gather + monopole slab) -> one fused eval pass
    (Pallas kernel on TPU, XLA contraction elsewhere) -> scatter back.

    Default: process every group, scatter back, return
    (acc in original particle order, stats).

    Multi-chip mode: ``chunk_range=(first_chunk, )`` with ``n_shards > 1``
    processes only this shard's contiguous range of chunk groups (1/n_shards
    of the total) and returns (acc slice in SORTED order, stats) — the
    caller all-gathers slices across the mesh and scatters once."""
    B = cfg.group_size
    CG = cfg.chunk_groups
    block = B * CG
    pad = (-n) % block
    dtype = tree.pos_s.dtype
    n_tot = n + pad
    # packed source rows (x, y, z, m, sorted_idx, 0, 0, 0): the slab/target
    # row layout of the group-force kernel; idx is exact in f32 below 2^24
    # (guarded in ops/tree.py)
    idxf = jnp.arange(n_tot, dtype=dtype)
    pm4 = jnp.concatenate([tree.pos_s, tree.mass_s[:, None]], axis=1)
    if pad:
        pm4 = jnp.concatenate([pm4, jnp.zeros((pad, 4), dtype)])
    pmass8 = jnp.concatenate(
        [pm4, idxf[:, None], jnp.zeros((n_tot, 3), dtype)], axis=1
    )
    # a window larger than the whole array degenerates to an all-pairs pass
    window = min(cfg.window, n_tot)
    gidx = jnp.arange(n_tot, dtype=jnp.int32)

    cell_w2 = cfg.cell_w2s(bounds.width)
    if cfg.refine_levels and tree.refine_tables is None:
        raise ValueError(
            "cfg.refine_levels > 0 but the tree was built without "
            "refinement (pass refine_levels/refine_cap/refine_threshold "
            "to build_octree)"
        )
    if cfg.refine_levels and return_topo:
        raise ValueError(
            "walk-topology caching (walk_every > 1 / bh-lazy) does not "
            "support refine_levels: refined slab rows have no "
            "(level, cell id) address to re-gather by"
        )

    collect = partial(
        _group_collect, tree, n_tot, cell_w2, theta2, g, g_soft, cfg, window,
        sliding=_sliding_ok(cfg, window),
    )
    vm_collect = jax.vmap(collect)

    n_groups = n_tot // B
    gp8 = pmass8.reshape(n_groups, B, 8)
    gi = gidx.reshape(n_groups, B)

    n_chunks = n_groups // CG
    cgp8 = gp8.reshape(n_chunks, CG, B, 8)
    cgi = gi.reshape(n_chunks, CG, B)

    if n_shards > 1:
        assert n_chunks % n_shards == 0, (n_chunks, n_shards)
        my_chunks = n_chunks // n_shards
        first = chunk_range[0]
        z = jnp.int32(0)
        cgp8 = jax.lax.dynamic_slice(cgp8, (first, z, z, z),
                                     (my_chunks, CG, B, 8))
        cgi = jax.lax.dynamic_slice(cgi, (first, z, z), (my_chunks, CG, B))
    else:
        my_chunks = n_chunks

    def chunk_body(args):
        cp8, ci = args
        return vm_collect(cp8[..., :3], cp8[..., 3], ci)

    (mono, near_ids, near_valid, _pf, _pfv, wmask, wstart, center, acc_fb,
     fbs, rnear, rnear_valid, _rf, _rfv, stats_t) = jax.lax.map(
         chunk_body, (cgp8, cgi))
    G_my = my_chunks * CG
    W = window
    P = cfg.near_particle_cap
    mono = mono.reshape(G_my, cfg.accept_cap, 8)
    wmask = wmask.reshape(G_my, W)
    wstart = wstart.reshape(G_my)
    center = center.reshape(G_my, 3)
    acc_fb = acc_fb.reshape(G_my, B, 3)
    adrop, fdrop, ndrop, fbspill, rntot, _rftot = (
        s.reshape(-1) for s in stats_t)

    # near cells -> flat particle lists, all groups at once (flat gathers)
    pidx, pvalid, ntot = _expand_ranges(
        tree.level_table[cfg.max_level],
        near_ids.reshape(G_my, cfg.near_cell_cap),
        near_valid.reshape(G_my, cfg.near_cell_cap),
        P,
    )
    if cfg.refine_levels:
        # refined-near ranges join the same exact pair slab
        RC = cfg.refine_near_cell_cap
        rnear = rnear.reshape(G_my, RC, 2)
        pidx_r, pvalid_r, _rtot = _expand_from_ranges(
            rnear[..., 0], rnear[..., 1], rnear_valid.reshape(G_my, RC),
            cfg.refine_near_particle_cap,
        )
        pidx = jnp.concatenate([pidx, pidx_r], axis=1)
        pvalid = jnp.concatenate([pvalid, pvalid_r], axis=1)

    tgt8 = cgp8.reshape(G_my, B, 8)
    gstart = cgi.reshape(G_my, B)[:, 0]
    acc_c, n_dual, slab_fill = _assemble_eval(
        pmass8, tgt8, gstart, tree, mono, pidx, pvalid, wmask, wstart,
        center, acc_fb, theta2, g, g_soft, cfg, W,
    )

    if n_shards > 1:
        acc = acc_c.reshape(-1, 3)  # SORTED-order slice; caller assembles
    else:
        acc_s = acc_c.reshape(n_tot, 3)[:n, : cfg.dim]
        # un-permute to original particle order by SORTING on the stored
        # permutation (order is a bijection on 0..n, so sorting (order,
        # acc) puts row j of the result at acc[order^-1(j)] — exactly the
        # scatter zeros.at[order].set(acc_s), bit-identical).  XLA's TPU
        # sort runs this in ~3 ms at N=1M where the row scatter took 83 ms
        # (3-wide rows waste 125/128 lanes per scatter row — profiled,
        # scripts/profile_1m.py).
        acc = jnp.stack(
            jax.lax.sort(
                (tree.order, *(acc_s[:, d] for d in range(cfg.dim))),
                num_keys=1,
            )[1:],
            axis=1,
        )
    stats = {
        # true drops (should always be 0; raise accept_cap if not)
        "accept_dropped": jnp.sum(adrop),
        # graceful self-excluded-monopole fallbacks: cells that would have
        # been opened / summed exactly but exceeded a budget (accuracy, not
        # correctness)
        "frontier_fallback": jnp.sum(fdrop),
        "near_fallback": jnp.sum(ndrop),
        # fb-slab overflow: degraded further to a PLAIN monopole (may
        # include a softened self-interaction).  The 1M defaults run with
        # ~1.7k spills/step BY DESIGN: absorbing them (fb_cap=1024) costs
        # 18% of the step (tune_bh_r2.jsonl quad7_fb1024) and the
        # measured accuracy envelope (p99 3.0e-2, VALIDATION.md §7)
        # already includes the spill.  Raise fb_cap only if accuracy
        # regresses on YOUR scene, not to zero the counter.
        "fb_spill": jnp.sum(fbspill),
        "near_totals": ntot.reshape(-1),  # residual near size per group
        # block-dual: (target-tile, source-tile) pairs evaluated as a tile
        # quadrupole instead of dense pair work (0 when block_dual=False)
        "dual_tiles": n_dual,
        # slab occupancy diagnostics: fraction of window rows whose cell is
        # covered (rest ride the dense eval with zero mass), and the mean
        # nonzero fraction of the whole assembled slab — the pair kernel's
        # ALU utilization ceiling (zero-mass rows pay full VPU cost)
        "window_cov": jnp.mean(wmask.astype(dtype)),
        "slab_fill": slab_fill,
    }
    if cfg.refine_levels:
        # refined-near particles actually routed to the exact pair slab,
        # and flagged cells the BUILD could not materialize (refine_cap
        # full — those kept the unrefined near/fallback path)
        stats["refine_near_totals"] = rntot.reshape(-1)
        stats["refine_build_dropped"] = tree.refine_stats[1]
    if return_topo:
        if n_shards > 1:
            raise ValueError("return_topo is a single-chip feature")
        topo = WalkTopo(
            mono=mono,
            fb=fbs.reshape(G_my, cfg.fb_cap, 8),
            pidx=pidx,
            pvalid=pvalid,
            ntot=ntot,
            wmask=wmask,
            wstart=wstart,
        )
        return acc, stats, topo
    return acc, stats


@partial(jax.jit, static_argnames=("cfg",))
def bh_accel(pos, mass, bounds, theta2, g, g_soft, cfg: BHConfig = BHConfig()):
    """Full Barnes-Hut acceleration: build + traverse + scatter back.

    pos [N,3], mass [N] (zero for dead) -> (acc [N,3], stats dict).
    N must be a multiple of 128 (guaranteed by ParticleState.create).

    The whole pipeline runs in the GRID FRAME (pos - bounds.center):
    acceleration is translation-invariant, and recentring bounds every f32
    accumulation (leaf mass-position sums, level pyramids, quadrupole
    centralizations, norm-trick r²) by the domain half-width instead of
    |center| — a scene at |center| ~ 2^13 otherwise loses ~1e-2 relative
    force accuracy to COM rounding alone (ADVICE r2 #1, measured)."""
    pos_c = pos - bounds.center
    b0 = bounds.centered()
    tree = build_octree(pos_c, mass, b0, cfg.max_level, dim=cfg.dim,
                        quad=cfg.multipole == "quad",
                        quad_leaf=cfg.quad_leaf,
                        refine_levels=cfg.refine_levels,
                        refine_cap=cfg.refine_cap,
                        refine_threshold=cfg.refine_threshold_resolved)
    return traverse_tree(tree, b0, theta2, g, g_soft, cfg, pos.shape[0])


def traverse_tree_cached(tree, topo, theta2, g, g_soft, cfg: BHConfig,
                         n: int):
    """Force evaluation over a FROZEN walk topology (see WalkTopo): skip
    the collect walk — the single biggest non-kernel step cost, ~35 ms of
    the 166 ms step at N=1M (VALIDATION.md §15) — and re-evaluate every
    interaction at CURRENT positions:

      * accepted/fallback node rows re-gather fresh mass/COM (and, via the
        refreshed ``all_quad``, fresh quadrupoles) by their stored
        (level, cell id) from the refreshed level tables;
      * window/near/pair sources read the refreshed ``pos_s``/``mass_s``
        directly (frozen order, current values);
      * the fallback slab is evaluated here (it normally rides inside the
        walk) with the same chunked layout.

    ``tree`` must share the topology's frozen binning (refresh_octree).
    Staleness is confined to the ROUTING: which cells are accepted vs
    opened vs near.  Positions drift ~v*dt per step, so a small reuse
    cadence keeps decisions within the acceptance margin; the engine
    guards with the same moved-fraction trigger as bh-lazy.  Single-chip
    only (the sharded paths re-walk every step)."""
    if cfg.wide or cfg.near_sym:
        raise ValueError("walk reuse supports neither wide mode nor "
                         "near_sym")
    B = cfg.group_size
    CG = cfg.chunk_groups
    block = B * CG
    pad = (-n) % block
    dtype = tree.pos_s.dtype
    n_tot = n + pad
    idxf = jnp.arange(n_tot, dtype=dtype)
    pm4 = jnp.concatenate([tree.pos_s, tree.mass_s[:, None]], axis=1)
    if pad:
        pm4 = jnp.concatenate([pm4, jnp.zeros((pad, 4), dtype)])
    pmass8 = jnp.concatenate(
        [pm4, idxf[:, None], jnp.zeros((n_tot, 3), dtype)], axis=1
    )
    W = min(cfg.window, n_tot)
    G = n_tot // B
    tgt8 = pmass8.reshape(G, B, 8)
    branch = 1 << cfg.dim

    # fresh node values for the frozen rows: ONE flat all-level table
    # (concat is a linear HBM copy), then 8-wide row gathers by
    # (level, cell id) — the fast gather shape (CLAUDE.md rates)
    goffs = jnp.array(
        [level_offset(lv, branch) for lv in range(cfg.max_level + 1)],
        jnp.int32,
    )
    flat = jnp.concatenate(tree.level_table, axis=0)

    # mono rows: (com, M, -1, level|-1, cid, TRUE level); refresh com/M,
    # keep slots 4..7.  Padding rows (cached M == 0) must stay inert —
    # their (0, 0) ids would otherwise re-gather the root.
    mono = topo.mono
    mvalid = mono[..., 3] > 0
    mlvl = mono[..., 7].astype(jnp.int32)
    mcid = mono[..., 6].astype(jnp.int32)
    mrows = flat[jnp.where(mvalid, goffs[mlvl] + mcid, 0)]  # [G, A, 8]
    mm = jnp.where(mvalid, mrows[..., 0], 0.0)
    mcom = mrows[..., 1:4] / jnp.where(mm > 0, mm, 1.0)[..., None]
    mono = jnp.concatenate([mcom, mm[..., None], mono[..., 4:]], axis=-1)

    # fb rows: raw node rows + (level, cid) in slots 6/7; ranges are frozen
    # so the re-gathered row's cs/ce equal the cached ones
    fb = topo.fb
    fvalid = fb[..., 0] > 0
    flvl = fb[..., 6]
    fcid = fb[..., 7]
    frows = flat[
        jnp.where(
            fvalid,
            goffs[flvl.astype(jnp.int32)] + fcid.astype(jnp.int32),
            0,
        )
    ]
    fb = jnp.where(fvalid[..., None], frows, 0.0)
    fb = fb.at[..., 6].set(flvl).at[..., 7].set(fcid)

    # fallback eval at fresh positions, chunked like the walk (the
    # [B, fb_cap, 3] intermediates are per-group)
    gidx = jnp.arange(n_tot, dtype=jnp.int32).reshape(G, B)
    fbk = dict(dim=cfg.dim, max_level=cfg.max_level)
    use_fb_quad = cfg.multipole == "quad" and cfg.fb_quad

    def fb_body(args):
        t8c, gic, fbc = args

        def one(t8g, gig, fbg):
            if use_fb_quad:
                return _fb_eval(t8g[:, :3], gig, t8g[:, 3], fbg, g, g_soft,
                                tree.all_quad, goffs, **fbk)
            return _fb_eval(t8g[:, :3], gig, t8g[:, 3], fbg, g, g_soft,
                            **fbk)

        return jax.vmap(one)(t8c, gic, fbc)

    acc_fb = jax.lax.map(
        fb_body,
        (tgt8.reshape(G // CG, CG, B, 8),
         gidx.reshape(G // CG, CG, B),
         fb.reshape(G // CG, CG, cfg.fb_cap, 8)),
    ).reshape(G, B, 3)

    # group centers from fresh positions (the walk's formula)
    has = tgt8[..., 3] > 0
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    p3 = tgt8[..., :3]
    glo = jnp.min(jnp.where(has[..., None], p3, big), axis=1)
    ghi = jnp.max(jnp.where(has[..., None], p3, -big), axis=1)
    center = jnp.where(
        jnp.any(has, axis=1)[:, None], 0.5 * (glo + ghi), 0.0
    )

    gstart = jnp.arange(G, dtype=jnp.int32) * B
    acc_c, n_dual, slab_fill = _assemble_eval(
        pmass8, tgt8, gstart, tree, mono, topo.pidx, topo.pvalid,
        topo.wmask, topo.wstart, center, acc_fb, theta2, g, g_soft, cfg, W,
    )

    acc_s = acc_c.reshape(n_tot, 3)[:n, : cfg.dim]
    acc = jnp.stack(
        jax.lax.sort(
            (tree.order, *(acc_s[:, d] for d in range(cfg.dim))),
            num_keys=1,
        )[1:],
        axis=1,
    )
    # same reduction as the full path's jnp.sum(int32 counters) so the
    # lax.cond branches in bh_accel_reuse agree under x64 promotion
    z = jnp.sum(jnp.zeros((1,), jnp.int32))
    stats = {
        "accept_dropped": z,
        "frontier_fallback": z,
        "near_fallback": z,
        "fb_spill": z,
        "near_totals": topo.ntot.reshape(-1),
        "dual_tiles": n_dual,
        "window_cov": jnp.mean(topo.wmask.astype(dtype)),
        "slab_fill": slab_fill,
    }
    return acc, stats


@partial(
    jax.jit,
    static_argnames=("cfg", "walk_every", "rebuild_frac", "move_cells"),
)
def bh_accel_reuse(pos, mass, bounds, theta2, g, g_soft, tree, topo, age,
                   cfg: BHConfig = BHConfig(), walk_every: int = 2,
                   rebuild_frac: float = 0.5, move_cells: float = 1.0):
    """Barnes-Hut acceleration with temporal walk reuse: a full
    rebuild + collect walk every ``walk_every`` steps (and whenever more
    than ``rebuild_frac`` of the alive particles strayed more than
    ``move_cells`` leaf cells from their frozen cell — the bh-lazy guard);
    in between, frozen-binning refresh + cached-topology evaluation
    (traverse_tree_cached).  Returns (acc, stats, tree, topo, age_next);
    thread the last three as the step carry."""
    from nbody_tpu.ops import morton
    from nbody_tpu.ops.tree import grid_bounds, refresh_octree

    pos = pos - bounds.center
    bounds = bounds.centered()
    L = cfg.max_level
    n = pos.shape[0]

    gb = grid_bounds(bounds, L)
    pos_s = pos[tree.order][:, :cfg.dim]
    mass_s = mass[tree.order]
    alive_s = mass_s > 0
    n_leaf = (1 << cfg.dim) ** L
    centers = morton.cell_centers_from_codes(
        jnp.minimum(tree.code_s, n_leaf - 1), gb, L, dim=cfg.dim
    )
    cell_w = gb.width / (1 << L)
    moved = (
        jnp.max(jnp.abs(pos_s - centers), axis=-1)
        > (0.5 + move_cells) * cell_w
    )
    frac = jnp.sum(moved & alive_s) / jnp.maximum(jnp.sum(alive_s), 1)

    do_full = ((age % walk_every) == 0) | (frac > rebuild_frac)

    def full(_):
        t = build_octree(pos, mass, bounds, L, dim=cfg.dim,
                         quad=cfg.multipole == "quad",
                         quad_leaf=cfg.quad_leaf)
        acc, stats, tp = traverse_tree(t, bounds, theta2, g, g_soft, cfg, n,
                                       return_topo=True)
        return acc, stats, t, tp

    def cached(args):
        t0, tp = args
        t = refresh_octree(t0, pos, mass, quad=cfg.multipole == "quad",
                           quad_leaf=cfg.quad_leaf)
        acc, stats = traverse_tree_cached(t, tp, theta2, g, g_soft, cfg, n)
        return acc, stats, t, tp

    acc, stats, tree, topo = jax.lax.cond(do_full, full, cached,
                                          (tree, topo))
    stats = dict(stats)
    stats["full_walk"] = do_full.astype(jnp.int32)
    stats["moved_frac"] = frac
    age_next = jnp.where(do_full, jnp.int32(1), age + 1)
    return acc, stats, tree, topo, age_next


@partial(jax.jit, static_argnames=("cfg", "rebuild_frac", "move_cells"))
def bh_accel_lazy(
    pos, mass, bounds, theta2, g, g_soft, tree,
    cfg: BHConfig = BHConfig(), rebuild_frac: float = 0.3,
    move_cells: float = 1.0,
):
    """Incremental Barnes-Hut: reuse the carried tree's binning, refreshing
    node statistics from current positions; trigger a full rebuild (argsort)
    only when too many particles have left their cells.

    The TPU-native analog of the reference midterm engine
    (src/llm/barnes_hut_midterm.rs): its movement threshold (5% of the
    domain, rebuild when >30% moved, :636-653) maps to ``move_cells`` leaf
    cells and ``rebuild_frac``.

    Returns (acc, stats, new_tree).  ``tree`` may come from a previous step
    or ``build_octree``."""
    from nbody_tpu.ops import morton
    from nbody_tpu.ops.tree import grid_bounds, refresh_octree

    # grid frame, like bh_accel — the carried tree stores grid-frame pos_s
    # (engines/barnes_hut.py builds the initial carry the same way)
    pos = pos - bounds.center
    bounds = bounds.centered()
    L = cfg.max_level
    gb = grid_bounds(bounds, L)
    pos_s = pos[tree.order][:, :cfg.dim]
    mass_s = mass[tree.order]
    alive_s = mass_s > 0

    # how far has each particle strayed from its frozen cell center?
    n_leaf = (1 << cfg.dim) ** L
    centers = morton.cell_centers_from_codes(
        jnp.minimum(tree.code_s, n_leaf - 1), gb, L, dim=cfg.dim
    )
    cell_w = gb.width / (1 << L)
    moved = (
        jnp.max(jnp.abs(pos_s - centers), axis=-1) > (0.5 + move_cells) * cell_w
    )
    n_alive = jnp.maximum(jnp.sum(alive_s), 1)
    frac = jnp.sum(moved & alive_s) / n_alive

    def rebuild(_):
        return build_octree(pos, mass, bounds, L, dim=cfg.dim,
                            quad=cfg.multipole == "quad",
                            quad_leaf=cfg.quad_leaf)

    def refresh(t):
        return refresh_octree(t, pos, mass, quad=cfg.multipole == "quad",
                              quad_leaf=cfg.quad_leaf)

    new_tree = jax.lax.cond(frac > rebuild_frac, rebuild, refresh, tree)
    acc, stats = traverse_tree(new_tree, bounds, theta2, g, g_soft, cfg,
                               pos.shape[0])
    stats = dict(stats)
    stats["rebuilt"] = (frac > rebuild_frac).astype(jnp.int32)
    stats["moved_frac"] = frac
    return acc, stats, new_tree
