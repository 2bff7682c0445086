"""Linear octree build: Morton sort + dense level pyramid.

Replaces the reference's three pointer/arena tree builders:
  * manual recursive build, one node alloc per split
    (src/manual/barnes_hut.rs:143-183),
  * LLM arena build with parallel per-octant local arenas + merge
    (src/llm/barnes_hut.rs:555-704),
  * midterm incremental update (src/llm/barnes_hut_midterm.rs:628-672).

TPU-first design: there are NO pointers and NO insertion at all.  The octree
is a *dense pyramid* of per-level cell statistics over the 2^L x 2^L x 2^L
Morton grid:

    level l has 8^l cells; cell c's children are cells 8c..8c+7 of level l+1.

Build = (1) Morton-encode + argsort particles (the XLA sort is parallel by
construction — the analog of the reference's par_sort_unstable_by_key,
src/llm/barnes_hut.rs:570-584), (2) one sorted segment-sum into leaf cells,
(3) log L reshape-sums up the pyramid.  A full rebuild is cheap enough every
step that the midterm engine's incremental machinery is unnecessary — the
rebuild IS a sort (SURVEY.md §7.4).

Mass-weighted coordinate sums (not COMs) are stored so empty cells are exact
zeros and parent aggregation is a plain sum; traversal divides by mass where
mass > 0.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from nbody_tpu.ops import morton


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class LinearOctree:
    """Sorted particles + dense level pyramid.

    ``level_mass[l]`` has shape [8^l]; ``level_mpos[l]`` has shape [8^l, 3]
    (mass-weighted position sums).  ``code_s`` are leaf-level Morton cell ids
    of the sorted particles, with dead/padding particles given the
    out-of-range sentinel 8^L so they sort to the tail and match no cell.
    """

    pos_s: jax.Array  # [N, 3] positions in Morton order
    mass_s: jax.Array  # [N] effective masses in Morton order
    code_s: jax.Array  # [N] int32 leaf cell ids (sorted), sentinel 8^L for dead
    order: jax.Array  # [N] original index of sorted slot (pos_s = pos[order])
    leaf_starts: jax.Array  # [8^L + 1] int32 cumulative particle counts:
    # particles of leaf cell c occupy sorted slots [leaf_starts[c],
    # leaf_starts[c+1]); a level-l cell id covers leaf ids
    # [c << 3(L-l), (c+1) << 3(L-l)), so its range needs no binary search.
    level_mass: Tuple[jax.Array, ...]
    level_mpos: Tuple[jax.Array, ...]
    #: packed per-level node table [8^l, 8] float32-exact rows:
    #: (mass, mx, my, mz, range_start, range_end, 0, 0) — one row gather
    #: per frontier slot instead of six scalar gathers (counts < 2^24 are
    #: exact in f32)
    level_table: Tuple[jax.Array, ...]
    #: optional quadrupole table, ALL levels concatenated (level l's rows
    #: start at ``level_offset(l)``): raw mass-weighted second moments about
    #: the ORIGIN (Sxx, Syy, Szz, Sxy, Sxz, Syz, 0, 0) — raw moments
    #: aggregate up the pyramid as plain sums (no parallel-axis shifts) and
    #: the traversal centralizes them about the node COM only for the few
    #: thousand rows it actually accepts.  None when built with quad=False.
    all_quad: jax.Array | None
    #: density-adaptive refinement below the leaf level (built with
    #: refine_levels > 0, else all None).  refine_tables[r] holds the
    #: children of the level-(max_level+r) flagged cells as packed node rows
    #: [refine_cap * branch, 8] (mass, mx, my, mz, range_start, range_end,
    #: 0, 0) — the SAME row format as level_table, so the walk's acceptance/
    #: coverage/fallback machinery applies unchanged.  The parent of row
    #: j is slot j // branch; invalid slots carry zero mass and an empty
    #: range.  Particles are sorted by DEEP Morton codes (depth max_level +
    #: refine_levels, same grid origin — leaf codes are their prefixes), so
    #: every refined cell is a contiguous sorted range.
    refine_tables: Tuple[jax.Array, ...] | None = None
    #: [branch^max_level] int32: flagged leaf cell -> its parent slot in
    #: refine_tables[0] (children at rows slot*branch + k), -1 otherwise.
    refine_slot_leaf: jax.Array | None = None
    #: per refined level r < R: [refine_cap * branch] int32 mapping a
    #: refine_tables[r] row to its parent slot in refine_tables[r+1], -1 if
    #: that cell was not refined further.
    refine_child_slot: Tuple[jax.Array, ...] | None = None
    #: [2] int32 (total flagged cells across levels, flagged cells dropped
    #: because refine_cap was full — graceful: dropped cells keep the
    #: unrefined near/fallback path).
    refine_stats: jax.Array | None = None

    @property
    def max_level(self) -> int:
        return len(self.level_mass) - 1

    @property
    def branch(self) -> int:
        """children per cell: 8 for octrees (3D), 4 for quadtrees (2D)."""
        return self.level_mass[1].shape[0]

    @property
    def dim(self) -> int:
        return self.branch.bit_length() - 1


def level_offset(level: int, branch: int) -> int:
    """Row offset of ``level``'s cells in the concatenated all-level tables
    (``all_quad``): levels 0..level-1 contribute (branch^level - 1)/(branch - 1)
    rows."""
    return ((branch ** level) - 1) // (branch - 1)


def _quad_moments(pos_s, mass_s):
    """Raw second moments m * p pᵀ per particle, packed 6-wide
    (xx, yy, zz, xy, xz, yz)."""
    w = pos_s * mass_s[:, None]  # [N, 3] = m*x, m*y, m*z
    return jnp.stack(
        [
            w[:, 0] * pos_s[:, 0],
            w[:, 1] * pos_s[:, 1],
            w[:, 2] * pos_s[:, 2],
            w[:, 0] * pos_s[:, 1],
            w[:, 0] * pos_s[:, 2],
            w[:, 1] * pos_s[:, 2],
        ],
        axis=1,
    )


def _quad_pyramid(base_quad, top_level: int, branch: int, ftype):
    """Aggregate second moments from the ``top_level`` cells up the pyramid
    and concatenate levels 0..top_level into one [rows, 8] table (root
    first).  With top_level = max_level - 1 the leaf level is skipped
    entirely (BHConfig.quad_leaf=False): accepted leaf cells then eval as
    monopoles — their individual force share is tiny — and the build saves
    its largest segment-sum + reduction stage."""
    levels = [base_quad]
    for _ in range(top_level):
        levels.append(levels[-1].reshape(-1, branch, 6).sum(axis=1))
    levels.reverse()
    flat = jnp.concatenate([q.astype(ftype) for q in levels], axis=0)
    pad = jnp.zeros((flat.shape[0], 2), ftype)
    return jnp.concatenate([flat, pad], axis=1)


def grid_bounds(bounds, max_level: int):
    """Tree grid = domain box shifted by half a leaf cell in every axis.

    Without the shift, the domain center planes are cell boundaries at EVERY
    level; distributions that straddle them (the benchmark disc lies exactly
    on z=0, reference src/main.rs:74) get split at the top Morton bit, making
    spatial neighbors maximally Morton-far and exploding the traversal's
    near field.  A half-leaf-cell shift guarantees the center planes are
    never cell boundaries at any level.  Edge particles clip into the last
    cell (they are about to be culled anyway); the cull itself still uses
    the unshifted domain box."""
    import dataclasses

    cell = bounds.width / (1 << max_level)
    return dataclasses.replace(bounds, center=bounds.center + cell * 0.5)


def _build_quad(pos_s, mass_s, code_s, max_level: int, branch: int, ftype,
                quad_leaf: bool, leaf_starts=None):
    """Build the concatenated quadrupole table from sorted particles.
    quad_leaf=False segments directly into the level-(L-1) cells
    (code // branch), skipping the leaf level's 8^L-cell segment-sum and
    reduction — the build's largest quad stage.

    ``leaf_starts`` enables a prefix-scan variant — measured SLOWER than
    the segment-sum here (quad@1M 4.12 -> 3.74 steps/s): the [N, 6]
    scatter into 262k cache-resident cells is already cheap, while six
    df-scan columns cost ~8 ms.  Kept for the record; callers pass None."""
    if quad_leaf:
        top_level = max_level
        seg_ids = code_s
        stride = 1
    else:
        top_level = max_level - 1
        # dead-particle sentinel (branch^L) maps to branch^(L-1) == the
        # out-of-range segment -> dropped, same as the leaf build
        seg_ids = code_s // branch
        stride = branch
    if leaf_starts is not None:
        m6 = _quad_moments(pos_s, mass_s)
        starts = leaf_starts[::stride]
        q = jnp.concatenate(
            [_prefix_range_sums(m6[:, :3], starts),
             _prefix_range_sums(m6[:, 3:], starts)],
            axis=1,
        )
    else:
        # one [N, 6] scatter: measured FASTER than six 1-D segment-sums
        # (9.4 vs ~48 ms at N=1M) — the 262k-segment output stays
        # cache-resident while six passes re-stream the ids/values
        q = jax.ops.segment_sum(
            _quad_moments(pos_s, mass_s),
            segment_ids=seg_ids,
            num_segments=branch ** top_level,
            indices_are_sorted=True,
        )
    return q, top_level


def _prefix_range_sums(vals, starts):
    """Per-range sums of sorted per-particle values via compensated prefix
    sums + boundary row gathers, replacing K-column scatter-add
    segment-sums.  ``vals`` [N, K] (K <= 4 per 8-wide gather table),
    ``starts`` [C + 1] sorted range boundaries -> [C, K].

    Measured on v5e at N=1M (scripts/microbench_tpu.py): a 1-D sorted
    segment-sum into 2M cells costs ~10 ms *each* (scatter-add is
    per-element-serial regardless of output size), while a dense scan is
    0.2-1.4 ms and an 8-wide row gather of 2M rows ~1 ms.

    Precision: a plain f32 prefix-difference would put ~ulp(total)
    absolute error on every range — catastrophic for small far cells (a
    1-particle leaf's COM could shift by the whole domain).  The scan
    therefore runs in double-float (TwoSum-compensated hi+lo pairs,
    ~2^-46 relative), and the boundary difference (hi_e - hi_s) +
    (lo_e - lo_s) keeps that accuracy: the hi difference is exact by
    Sterbenz whenever it nearly cancels, and the lo difference carries
    the residual."""
    P = _build_prefix_table(vals)
    K = vals.shape[1]
    R = P[starts]  # [C + 1, 8]
    d = R[1:] - R[:-1]
    return d[:, :K] + d[:, K:2 * K]


def _build_prefix_table(vals):
    """Double-float prefix-sum table for _prefix_range_sums: [N, K<=4] ->
    [N+1, 8] (hi columns | lo columns | zero padding), one 8-wide row gather
    per range boundary."""
    N, K = vals.shape
    assert K <= 4, K

    def comb(a, b):
        (ah, al), (bh, bl) = a, b
        s = ah + bh
        z = s - ah
        e = (ah - (s - z)) + (bh - z)  # TwoSum rounding error of s
        return s, e + al + bl

    hi, lo = jax.lax.associative_scan(
        comb, (vals, jnp.zeros_like(vals)), axis=0
    )
    zero = jnp.zeros((1, K), vals.dtype)
    pad = jnp.zeros((N + 1, 8 - 2 * K), vals.dtype) if K < 4 else None
    parts = [jnp.concatenate([zero, hi]), jnp.concatenate([zero, lo])]
    if pad is not None:
        parts.append(pad)
    return jnp.concatenate(parts, axis=1)


def _range_sums_from_table(P, starts, ends, K):
    """Per-range sums from a _build_prefix_table table for ARBITRARY
    (start, end) pairs (the refined build's ranges are not consecutive
    boundaries).  Same double-float boundary-difference accuracy argument
    as _prefix_range_sums."""
    Rs = P[starts]
    Re = P[ends]
    d = Re - Rs
    return d[:, :K] + d[:, K:2 * K]


def _prefix_leaf_stats(pos_s, mass_s, leaf_starts):
    """Leaf-cell (mass, mass-weighted position) via _prefix_range_sums —
    three 8^L-cell segment-sums (~28 ms at 1M) become ~5 ms."""
    w4 = jnp.concatenate([mass_s[:, None], pos_s * mass_s[:, None]], axis=1)
    vals = _prefix_range_sums(w4, leaf_starts)
    return vals[:, 0], vals[:, 1:4]


def _compact(ids, keep, out_slots):
    """Order-preserving compaction of ``ids[keep]`` into ``out_slots`` slots
    via cumsum + scatter (O(F), no sort).
    Returns (ids [out_slots], valid [out_slots], n_dropped)."""
    slot = jnp.cumsum(keep) - 1
    # kept entries beyond the cap, and all non-kept entries, write to the
    # trash slot at index out_slots
    slot = jnp.where(keep & (slot < out_slots), slot, out_slots)
    out = jnp.zeros((out_slots + 1,), ids.dtype).at[slot].set(ids)[:out_slots]
    n_keep = jnp.sum(keep)
    valid = jnp.arange(out_slots) < jnp.minimum(n_keep, out_slots)
    dropped = jnp.maximum(n_keep - out_slots, 0)
    return out, valid, dropped


def _build_refined(pos_s, mass_s, deep_code_s, leaf_counts, max_level: int,
                   refine_levels: int, refine_cap: int, threshold: int,
                   branch: int, dim: int, ftype):
    """Density-adaptive refinement below the dense pyramid's leaf level
    (the per-octant-depth build motivated by VALIDATION.md §18: no static
    depth resolves a 1e5:1 density-contrast core at the disc envelope —
    the reference's pointer trees get this for free by construction,
    src/manual/barnes_hut.rs:143-183; here it is a compacted extension of
    the dense pyramid so shapes stay static under jit).

    Leaf cells with more than ``threshold`` particles are flagged and their
    children materialized as packed node rows; children still above the
    threshold recurse, up to ``refine_levels`` extra levels with at most
    ``refine_cap`` refined parents per level (overflow degrades gracefully
    to the unrefined path, counted).  Particles must be sorted by DEEP
    Morton codes (depth max_level + refine_levels, same grid origin) so
    every refined cell is one contiguous sorted range; ranges come from one
    vectorized ``searchsorted`` per level (cell-count-proportional — the
    particle-proportional alternatives are segment-sums the dense build
    already showed cost ~10 ms each at 1M), and mass/mpos from the same
    double-float prefix table as the leaf stats.

    Returns (refine_tables, refine_slot_leaf, refine_child_slot,
    refine_stats) — see the LinearOctree field docs."""
    n_leaf = branch ** max_level
    L_deep = max_level + refine_levels
    rows_per = refine_cap * branch

    # one prefix table serves every refined level's (mass, m*pos) sums
    w4 = jnp.concatenate([mass_s[:, None], pos_s * mass_s[:, None]], axis=1)
    P = _build_prefix_table(w4)

    flagged = leaf_counts.astype(jnp.int32) > threshold
    n_flagged = jnp.sum(flagged).astype(jnp.int32)
    cell_ids = jnp.arange(n_leaf, dtype=jnp.int32)
    p_codes, p_valid, dropped = _compact(cell_ids, flagged, refine_cap)
    total_flagged = n_flagged
    total_dropped = dropped.astype(jnp.int32)
    slot_leaf = (
        jnp.full((n_leaf + 1,), -1, jnp.int32)
        .at[jnp.where(p_valid, p_codes, n_leaf)]
        .set(jnp.arange(refine_cap, dtype=jnp.int32))[:n_leaf]
    )

    tables = []
    child_maps = []
    for r in range(1, refine_levels + 1):
        child_codes = (
            p_codes[:, None] * branch + jnp.arange(branch, dtype=jnp.int32)
        ).reshape(rows_per)
        child_valid = jnp.repeat(p_valid, branch)
        shift = dim * (L_deep - (max_level + r))
        lo = jnp.where(child_valid, child_codes << shift, 0)
        hi = jnp.where(child_valid, (child_codes + 1) << shift, 0)
        # ONE fused sort-method search for both bounds: the TPU default
        # ('scan', a 20-step vectorized binary search) measured 21.2 ms
        # per call at [1M keys, 64k queries] vs 8.4 ms for 'sort' (rides
        # lax.sort), and the fused lo||hi call amortizes the key sort —
        # this was ~120 ms of the 430 ms 1M adaptive force call
        # (round 5, /tmp/ss_bench.log; profile_adaptive whiles.134-139)
        r_ = jnp.searchsorted(deep_code_s, jnp.concatenate([lo, hi]),
                              side="left", method="sort").astype(jnp.int32)
        cs, ce = r_[:rows_per], r_[rows_per:]
        cs = jnp.where(child_valid, cs, 0)
        ce = jnp.where(child_valid, ce, 0)
        sums = _range_sums_from_table(P, cs, ce, 4)
        m = jnp.where(child_valid & (ce > cs), sums[:, 0], 0.0)
        zero = jnp.zeros((rows_per,), ftype)
        tables.append(
            jnp.stack(
                [
                    m.astype(ftype),
                    sums[:, 1].astype(ftype),
                    sums[:, 2].astype(ftype),
                    sums[:, 3].astype(ftype),
                    cs.astype(ftype),
                    ce.astype(ftype),
                    zero,
                    zero,
                ],
                axis=1,
            )
        )
        if r < refine_levels:
            counts = ce - cs
            flag_r = child_valid & (counts > threshold)
            rows_idx = jnp.arange(rows_per, dtype=jnp.int32)
            p_rows, p_valid, dropped = _compact(rows_idx, flag_r, refine_cap)
            total_flagged = total_flagged + jnp.sum(flag_r).astype(jnp.int32)
            total_dropped = total_dropped + dropped.astype(jnp.int32)
            child_maps.append(
                jnp.full((rows_per + 1,), -1, jnp.int32)
                .at[jnp.where(p_valid, p_rows, rows_per)]
                .set(jnp.arange(refine_cap, dtype=jnp.int32))[:rows_per]
            )
            p_codes = jnp.where(p_valid, child_codes[p_rows], 0)

    stats = jnp.stack([total_flagged, total_dropped])
    return tuple(tables), slot_leaf, tuple(child_maps), stats


#: Beyond this N, f32 node-table range columns lose integer exactness; the
#: domain-decomposed build switches to the WIDE row format (ranges split
#: hi/lo over two f32 columns each — exact to 2^31).  Module-level so tests
#: can lower it and exercise the wide path at small N.
WIDE_N = 1 << 24
_RANGE_SHIFT = 12  # wide split: v = hi * 2^12 + lo; hi < 2^19, lo < 2^12


def wide_ranges(n: int, ftype) -> bool:
    """Whether node tables for ``n`` total particles must use the WIDE
    range encoding.  Static (trace-time) — both the table builder and every
    range consumer must consult this same predicate.  f64 tables hold exact
    integers to 2^53, so only f32 ever goes wide."""
    return ftype == jnp.float32 and n >= WIDE_N


def decode_ranges(row, wide: bool):
    """(range_start, range_end) int32 from packed node-table rows
    [..., 8].  Narrow: cols 4/5 hold the values directly (exact ints by the
    _check_range_dtype guard).  Wide: cols 4-7 hold (start_hi, start_lo,
    end_hi, end_lo) with v = hi * 2^12 + lo — every component < 2^19 so the
    f32 row stays exact to N = 2^31."""
    if not wide:
        return row[..., 4].astype(jnp.int32), row[..., 5].astype(jnp.int32)
    cs = (row[..., 4].astype(jnp.int32) << _RANGE_SHIFT) | \
        row[..., 5].astype(jnp.int32)
    ce = (row[..., 6].astype(jnp.int32) << _RANGE_SHIFT) | \
        row[..., 7].astype(jnp.int32)
    return cs, ce


def _check_range_dtype(n: int, ftype, wide: bool = False) -> None:
    """Packed node rows store particle-range starts/ends in the position
    dtype; counts beyond the mantissa (2^24 in f32, 2^53 in f64) would
    silently corrupt traversal ranges — fail loudly instead.  The wide
    encoding (domain-decomposed builds, see wide_ranges) extends the f32
    ceiling to 2^31 (the int32 index arithmetic limit)."""
    limit = 1 << (53 if ftype == jnp.float64 else (31 if wide else 24))
    if n >= limit:  # ValueError, not assert: must survive python -O
        raise ValueError(
            f"N={n} exceeds the exact-integer range of "
            f"{jnp.dtype(ftype).name} node tables; use float64 "
            "(jax_enable_x64) for N >= 2^24"
        )


def _pyramid_tables(leaf_mass, leaf_mpos, leaf_counts, max_level: int,
                    branch: int, ftype, wide: bool = False):
    """Aggregate leaf-cell statistics up the dense pyramid and pack the
    per-level node tables (shared by the single-chip and sharded builds).
    ``wide`` selects the hi/lo range encoding (see decode_ranges) — the
    domain-decomposed build sets it for N >= WIDE_N.

    Returns (level_mass, level_mpos, level_table, leaf_starts)."""
    # cast BEFORE the cumsum: f32 partial sums lose integer exactness past
    # 2^24 (the whole point of the wide path)
    leaf_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(leaf_counts.astype(jnp.int32))]
    )

    level_mass = [leaf_mass]
    level_mpos = [leaf_mpos]
    for _ in range(max_level):
        level_mass.append(level_mass[-1].reshape(-1, branch).sum(axis=1))
        level_mpos.append(level_mpos[-1].reshape(-1, branch, 3).sum(axis=1))
    level_mass.reverse()
    level_mpos.reverse()

    # per-level particle ranges from the counts pyramid (reshape-sums + one
    # cumsum per level — no gathers)
    level_counts = [leaf_counts]
    for _ in range(max_level):
        level_counts.append(level_counts[-1].reshape(-1, branch).sum(axis=1))
    level_counts.reverse()

    level_table = []
    mask = (1 << _RANGE_SHIFT) - 1
    for l in range(max_level + 1):
        c = branch ** l
        cnt = level_counts[l]
        ends_i = jnp.cumsum(cnt.astype(jnp.int32))
        starts_i = ends_i - cnt.astype(jnp.int32)
        if wide:
            range_cols = [
                (starts_i >> _RANGE_SHIFT).astype(ftype),
                (starts_i & mask).astype(ftype),
                (ends_i >> _RANGE_SHIFT).astype(ftype),
                (ends_i & mask).astype(ftype),
            ]
        else:
            zero = jnp.zeros((c,), ftype)
            range_cols = [starts_i.astype(ftype), ends_i.astype(ftype),
                          zero, zero]
        level_table.append(
            jnp.stack(
                [
                    level_mass[l].astype(ftype),
                    level_mpos[l][:, 0].astype(ftype),
                    level_mpos[l][:, 1].astype(ftype),
                    level_mpos[l][:, 2].astype(ftype),
                    *range_cols,
                ],
                axis=1,
            )
        )
    return tuple(level_mass), tuple(level_mpos), tuple(level_table), leaf_starts


@partial(jax.jit, static_argnames=("max_level", "dim", "quad", "quad_leaf",
                                   "refine_levels", "refine_cap",
                                   "refine_threshold"))
def build_octree(pos, mass, bounds, max_level: int = 7,
                 dim: int = 3, quad: bool = False,
                 quad_leaf: bool = True, refine_levels: int = 0,
                 refine_cap: int = 8192,
                 refine_threshold: int = 512) -> LinearOctree:
    """pos [N,D], mass [N] (dead particles must already have mass 0).
    ``bounds`` is the domain box; the tree grid is the half-cell-shifted
    version (see grid_bounds).

    dim=2 builds a QUADTREE (2D Morton codes, 4 children per cell); the
    stored coordinate arrays stay 3-wide with z = 0 so the traversal is
    dimension-agnostic (the reference is generic over D the same way,
    src/shared.rs:46-59).

    refine_levels > 0 additionally materializes up to ``refine_levels``
    density-adaptive levels below the leaf grid for cells holding more than
    ``refine_threshold`` particles (_build_refined).  Particles are then
    sorted by DEEP Morton codes on the SAME grid origin, so ``code_s`` (the
    deep codes' leaf-level prefixes) and every coarse-pyramid consumer are
    unchanged; only the within-leaf-cell particle order differs."""
    n = pos.shape[0]
    _check_range_dtype(n, pos.dtype)
    branch = 1 << dim
    n_leaf = branch ** max_level
    gb = grid_bounds(bounds, max_level)

    L_deep = max_level + refine_levels
    # ValueError, not assert (stripped under -O): a too-deep L_deep
    # overflows the 30-bit int32 Morton codes -> silently wrong cell
    # assignments (ADVICE r3 #3; repo convention per ADVICE r2 #2)
    if L_deep > (morton.MAX_LEVEL_3D if dim == 3 else morton.MAX_LEVEL_2D):
        raise ValueError(
            f"max_level + refine_levels = {L_deep} exceeds the "
            f"{dim}D Morton code depth limit"
        )
    codes = morton.cell_codes(pos[:, :dim], gb, L_deep)
    # dead particles (mass 0) get the sentinel so they cluster at the sorted
    # tail and never match a cell range during near-field gathering
    codes = jnp.where(mass > 0, codes, jnp.int32(branch ** L_deep))

    if dim == 2:
        pos = jnp.concatenate([pos, jnp.zeros((n, 1), pos.dtype)], axis=1)

    # one payload-carrying sort instead of argsort + two big row gathers
    # (101 ms vs 124 ms at N=1M on v5e, results/tune_build_1m.jsonl); the
    # iota payload makes the permutation identical to a stable argsort
    iota = jnp.arange(n, dtype=jnp.int32)
    deep_code_s, order, xs, ys, zs, mass_s = jax.lax.sort(
        (codes, iota, pos[:, 0], pos[:, 1], pos[:, 2], mass), num_keys=1
    )
    pos_s = jnp.stack([xs, ys, zs], axis=1)
    # leaf-level codes are the deep codes' prefixes (sentinel included:
    # branch^L_deep >> dim*R == branch^L); with refine_levels == 0 this is
    # the identity, preserving the tuned path bit-for-bit
    code_s = deep_code_s >> (dim * refine_levels)

    # leaf level: ONE sorted segment-sum (counts — ranges need it), then
    # mass/mpos from compensated prefix sums + a boundary row gather
    # (_prefix_leaf_stats) — 3 segment-sums (~28 ms at 1M) become ~5 ms.
    # The boundary gather is CELL-count-proportional (8^L rows regardless
    # of N), so the prefix path only wins in the dense regime; sparse
    # occupancy keeps the N-proportional segment-sums (131k at L=7
    # regressed 25.7 -> 20.0 steps/s before this gate).
    leaf_counts = jax.ops.segment_sum(
        jnp.ones_like(code_s), code_s, num_segments=n_leaf,
        indices_are_sorted=True,
    )  # dead (sentinel) codes drop out
    if n * 4 >= n_leaf:
        leaf_starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(leaf_counts).astype(jnp.int32)]
        )
        leaf_mass, leaf_mpos = _prefix_leaf_stats(pos_s, mass_s, leaf_starts)
    else:
        seg = partial(
            jax.ops.segment_sum,
            segment_ids=code_s,
            num_segments=n_leaf,
            indices_are_sorted=True,
        )
        leaf_mass = seg(mass_s)
        w = pos_s * mass_s[:, None]
        leaf_mpos = jnp.stack([seg(w[:, d]) for d in range(3)], axis=1)

    # counts < 2^24 are exact in f32; f64 under x64
    level_mass, level_mpos, level_table, leaf_starts = _pyramid_tables(
        leaf_mass, leaf_mpos, leaf_counts, max_level, branch, pos.dtype
    )

    all_quad = None
    if quad:
        q, top = _build_quad(pos_s, mass_s, code_s, max_level, branch,
                             pos.dtype, quad_leaf)
        all_quad = _quad_pyramid(q, top, branch, pos.dtype)

    refine = {}
    if refine_levels > 0:
        tables, slot_leaf, child_maps, rstats = _build_refined(
            pos_s, mass_s, deep_code_s, leaf_counts, max_level,
            refine_levels, refine_cap, refine_threshold, branch, dim,
            pos.dtype,
        )
        refine = dict(refine_tables=tables, refine_slot_leaf=slot_leaf,
                      refine_child_slot=child_maps, refine_stats=rstats)

    return LinearOctree(
        pos_s=pos_s,
        mass_s=mass_s,
        code_s=code_s,
        order=order,
        leaf_starts=leaf_starts,
        level_mass=level_mass,
        level_mpos=level_mpos,
        level_table=level_table,
        all_quad=all_quad,
        **refine,
    )


def build_octree_sharded(pos_loc, mass_loc, pos_all, mass_all, bounds,
                         max_level: int, axis: str,
                         dim: int = 3, quad: bool = False,
                         quad_leaf: bool = True, refine_levels: int = 0,
                         refine_cap: int = 8192,
                         refine_threshold: int = 512) -> LinearOctree:
    """Distributed octree build for use INSIDE ``shard_map``: the heavy
    per-particle stages (Morton encoding, the sorted-order gather, the leaf
    segment-sums) run on each chip's 1/n_dev slice; collectives assemble the
    replicated result every chip's traversal needs.

    The reference's analog is the parallel per-octant local-arena build +
    merge (src/llm/barnes_hut.rs:617-677, rayon) — here the "merge" is one
    ``psum`` of partial leaf statistics plus ``all_gather`` of the sorted
    particle slices.

    ``pos_loc/mass_loc`` are this chip's shard; ``pos_all/mass_all`` the
    already-all-gathered full arrays (the traversal needs them anyway, so
    the build reuses them instead of gathering twice).  Dead particles must
    already have mass 0.  Produces the same stable sort and exact integer
    counts as ``build_octree(pos_all, mass_all, ...)``; leaf mass/mpos are
    bit-identical in the dense regime (replicated prefix scan) and differ
    only by partial-sum association order in the sparse regime (per-chip
    segment-sums + psum).

    ``refine_levels > 0`` additionally materializes the density-adaptive
    refined side tables (_build_refined) exactly as ``build_octree`` does:
    the shards are Morton-encoded at DEEP depth, so ``code_s`` (the deep
    codes' leaf-level prefixes) and every coarse consumer are unchanged,
    and the refined build itself runs replicated on the already-gathered
    sorted arrays — deterministic, hence bit-identical on every chip (the
    same cost class as the replicated leaf prefix scan below).  This is
    what lets the replicated sharded strategy carry profile='adaptive'
    (VALIDATION.md §19); the O(N/chips) domain path still has no
    refined-cell route (parallel/domain.py).
    """
    n_loc = pos_loc.shape[0]
    n_tot = pos_all.shape[0]
    _check_range_dtype(n_tot, pos_all.dtype)
    branch = 1 << dim
    n_leaf = branch ** max_level
    gb = grid_bounds(bounds, max_level)
    my = jax.lax.axis_index(axis)

    L_deep = max_level + refine_levels
    if L_deep > (morton.MAX_LEVEL_3D if dim == 3 else morton.MAX_LEVEL_2D):
        raise ValueError(
            f"max_level + refine_levels = {L_deep} exceeds the "
            f"{dim}D Morton code depth limit"
        )

    # 1. Morton-encode the LOCAL shard, then share the codes (int32 — the
    #    cheapest per-step collective in the build).  With refinement the
    #    codes are DEEP (leaf + refine_levels, same grid origin) so refined
    #    cells are contiguous sorted ranges; leaf codes are their prefixes.
    codes_loc = morton.cell_codes(pos_loc[:, :dim], gb, L_deep)
    codes_loc = jnp.where(mass_loc > 0, codes_loc,
                          jnp.int32(branch ** L_deep))
    codes = jax.lax.all_gather(codes_loc, axis, tiled=True)

    # 2. Global sort (replicated — XLA's sort is already parallel within a
    #    chip and N int32 keys are cheap; a distributed merge sort would be
    #    collective-bound here).  One stable lax.sort yields codes + order,
    #    identical to the single-chip ``jnp.argsort`` permutation.
    deep_code_s, order = jax.lax.sort(
        (codes, jnp.arange(n_tot, dtype=jnp.int32)), num_keys=1
    )
    # leaf-prefix codes; the identity when refine_levels == 0 (preserves
    # the tuned unrefined program bit-for-bit)
    code_s = (deep_code_s >> (dim * refine_levels) if refine_levels
              else deep_code_s)

    if dim == 2:
        pos_all = jnp.concatenate(
            [pos_all, jnp.zeros((n_tot, 1), pos_all.dtype)], axis=1
        )

    # 3. The sorted-order gather — the dominant irregular op of the build —
    #    sharded: each chip gathers only its slice of the permutation.
    order_my = jax.lax.dynamic_slice(order, (my * n_loc,), (n_loc,))
    pos_s_my = pos_all[order_my]
    mass_s_my = mass_all[order_my]
    pos_s = jax.lax.all_gather(pos_s_my, axis, tiled=True)
    mass_s = jax.lax.all_gather(mass_s_my, axis, tiled=True)

    # 4. Leaf statistics: per-chip COUNTS segment-sum over its contiguous
    #    sorted slice merged with one integer psum (exact, order-free —
    #    bit-identical to single-chip); mass/mpos from the same compensated
    #    prefix path as the single-chip build, run on the already-gathered
    #    sorted arrays — replicated work (a ~3 ms dense scan at 1M) that
    #    REMOVES three [8^L] float psums and stays bit-identical to
    #    build_octree.
    code_s_my = jax.lax.dynamic_slice(code_s, (my * n_loc,), (n_loc,))
    leaf_counts = jax.lax.psum(
        jax.ops.segment_sum(
            jnp.ones_like(code_s_my), code_s_my, num_segments=n_leaf,
            indices_are_sorted=True,
        ),
        axis,
    )
    if n_tot * 4 >= n_leaf:  # same dense-regime gate as build_octree
        leaf_starts0 = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(leaf_counts).astype(jnp.int32)]
        )
        leaf_mass, leaf_mpos = _prefix_leaf_stats(pos_s, mass_s, leaf_starts0)
    else:
        seg = partial(
            jax.ops.segment_sum,
            segment_ids=code_s_my,
            num_segments=n_leaf,
            indices_are_sorted=True,
        )
        leaf_mass = jax.lax.psum(seg(mass_s_my), axis)
        leaf_mpos = jax.lax.psum(seg(pos_s_my * mass_s_my[:, None]), axis)

    # 5. Pyramid + packed tables: dense reshape-sums over 8^L cells —
    #    bandwidth-trivial, replicated.
    level_mass, level_mpos, level_table, leaf_starts = _pyramid_tables(
        leaf_mass, leaf_mpos, leaf_counts, max_level, branch, pos_all.dtype
    )

    all_quad = None
    if quad:
        q, top = _build_quad(pos_s_my, mass_s_my, code_s_my, max_level,
                             branch, pos_all.dtype, quad_leaf)
        all_quad = _quad_pyramid(jax.lax.psum(q, axis), top, branch,
                                 pos_all.dtype)

    refine = {}
    if refine_levels > 0:
        # replicated work on replicated inputs (pos_s/mass_s/deep codes are
        # all-gathered above; leaf_counts is psum'd) — every chip builds
        # bit-identical tables, matching build_octree exactly
        tables, slot_leaf, child_maps, rstats = _build_refined(
            pos_s, mass_s, deep_code_s, leaf_counts.astype(jnp.int32),
            max_level, refine_levels, refine_cap, refine_threshold, branch,
            dim, pos_all.dtype,
        )
        refine = dict(refine_tables=tables, refine_slot_leaf=slot_leaf,
                      refine_child_slot=child_maps, refine_stats=rstats)

    return LinearOctree(
        pos_s=pos_s,
        mass_s=mass_s,
        code_s=code_s,
        order=order,
        leaf_starts=leaf_starts,
        level_mass=level_mass,
        level_mpos=level_mpos,
        level_table=level_table,
        all_quad=all_quad,
        **refine,
    )


def refresh_octree(tree: LinearOctree, pos, mass,
                   quad: bool = None, quad_leaf: bool = True) -> LinearOctree:
    """Refresh node statistics from CURRENT positions while keeping the
    FROZEN binning (sort order, cell assignment, ranges) — the TPU-native
    analog of the reference midterm engine's incremental tree update
    (src/llm/barnes_hut_midterm.rs:628-672): particles that moved stay in
    their old node until a rebuild is triggered.

    Skips the argsort (the expensive part of a rebuild); counts/ranges are
    reused (dead particles inside stale ranges have zero mass and are
    harmless)."""
    if pos.shape[1] < tree.pos_s.shape[1]:  # 2D state, 3-wide tree coords
        pos = jnp.concatenate(
            [pos, jnp.zeros((pos.shape[0], 1), pos.dtype)], axis=1
        )
    pos_s = pos[tree.order]
    mass_s = mass[tree.order]
    n_leaf = tree.level_mass[-1].shape[0]
    branch = tree.branch
    seg = partial(
        jax.ops.segment_sum,
        segment_ids=tree.code_s,
        num_segments=n_leaf,
        indices_are_sorted=True,
    )
    leaf_mass = seg(mass_s)
    leaf_mpos = seg(pos_s * mass_s[:, None])

    level_mass = [leaf_mass]
    level_mpos = [leaf_mpos]
    for _ in range(tree.max_level):
        level_mass.append(level_mass[-1].reshape(-1, branch).sum(axis=1))
        level_mpos.append(level_mpos[-1].reshape(-1, branch, 3).sum(axis=1))
    level_mass.reverse()
    level_mpos.reverse()

    level_table = []
    for l in range(tree.max_level + 1):
        old = tree.level_table[l]
        level_table.append(
            jnp.concatenate(
                [
                    level_mass[l][:, None].astype(old.dtype),
                    level_mpos[l].astype(old.dtype),
                    old[:, 4:],  # frozen ranges
                ],
                axis=1,
            )
        )

    # quad=None: keep whatever the carried tree has; an explicit flag lets
    # bh_accel_lazy force the refreshed tree to match its config even when
    # the initial carry was built the other way (lax.cond branches must
    # produce the same pytree structure)
    want_quad = tree.all_quad is not None if quad is None else quad
    all_quad = None
    if want_quad:
        q, top = _build_quad(pos_s, mass_s, tree.code_s, tree.max_level,
                             branch, pos_s.dtype, quad_leaf)
        all_quad = _quad_pyramid(q, top, branch, pos_s.dtype)

    import dataclasses

    return dataclasses.replace(
        tree,
        pos_s=pos_s,
        mass_s=mass_s,
        level_mass=tuple(level_mass),
        level_mpos=tuple(level_mpos),
        level_table=tuple(level_table),
        all_quad=all_quad,
    )


def cell_ranges(tree: LinearOctree, cell_ids, level: int):
    """Sorted-particle ranges [start, end) for level-``level`` cell ids —
    O(1) gathers from the cumulative leaf counts (no binary search)."""
    shift = tree.dim * (tree.max_level - level)
    start = tree.leaf_starts[cell_ids << shift]
    end = tree.leaf_starts[(cell_ids + 1) << shift]
    return start, end


def leaf_ranges(tree: LinearOctree, cell_ids):
    """Sorted-particle index ranges [start, end) for leaf cell ids (any
    shape).  Works because particles are sorted by leaf code."""
    start = jnp.searchsorted(tree.code_s, cell_ids, side="left")
    end = jnp.searchsorted(tree.code_s, cell_ids + 1, side="left")
    return start, end


def tree_boxes(tree: LinearOctree, bounds, max_nodes_per_level: int = 4096):
    """Occupied-node AABBs per level for inspection/visualization — the analog
    of the reference's BFS iterator feeding AABB instance buffers
    (src/manual/barnes_hut.rs:316-356), including its node-count clamp
    (src/llm/barnes_hut.rs:1261).  Returns a list over levels of
    (min [K,3], max [K,3], count) numpy arrays.

    Adaptive builds (refine_levels > 0) additionally append one entry per
    REFINED level, so the per-octant descent below the leaf grid renders
    like any other level — the reference draws every node and visual tree
    inspection is its main debugging story (VERDICT r3 weak #8).  Refined
    cell Morton codes are reconstructed host-side by inverting the slot
    maps (slot_leaf for the first refined level, child_slot below)."""
    import numpy as np

    gb = grid_bounds(bounds, tree.max_level)
    out = []
    for l, m in enumerate(tree.level_mass):
        occ = np.nonzero(np.asarray(m) > 0)[0]
        occ = occ[:max_nodes_per_level]
        ids = jnp.asarray(occ.astype(np.int32))
        centers = morton.cell_centers_from_codes(ids, gb, l, dim=tree.dim)
        half = float(gb.width) / (1 << l) / 2.0
        c = np.asarray(centers)
        out.append((c - half, c + half, len(occ)))

    if tree.refine_tables is not None:
        branch = tree.branch
        L = tree.max_level
        # parent slot -> parent cell code, rebuilt level by level
        slot_leaf = np.asarray(tree.refine_slot_leaf)
        cap = 0 if not tree.refine_tables else (
            tree.refine_tables[0].shape[0] // branch)
        parent_code = np.full((cap,), -1, np.int64)
        flagged = np.nonzero(slot_leaf >= 0)[0]
        parent_code[slot_leaf[flagged]] = flagged
        for r, table in enumerate(tree.refine_tables, start=1):
            rows_per = table.shape[0]
            j = np.arange(rows_per)
            codes = parent_code[j // branch] * branch + (j % branch)
            mass_r = np.asarray(table[:, 0])
            ok = (mass_r > 0) & (parent_code[j // branch] >= 0)
            occ = np.nonzero(ok)[0][:max_nodes_per_level]
            ids = jnp.asarray(codes[occ].astype(np.int32))
            centers = morton.cell_centers_from_codes(ids, gb, L + r,
                                                     dim=tree.dim)
            half = float(gb.width) / (1 << (L + r)) / 2.0
            c = np.asarray(centers)
            out.append((c - half, c + half, len(occ)))
            if r <= len(tree.refine_child_slot):
                child_slot = np.asarray(tree.refine_child_slot[r - 1])
                nxt = np.full((cap,), -1, np.int64)
                refined_rows = np.nonzero((child_slot >= 0) & (codes >= 0))[0]
                nxt[child_slot[refined_rows]] = codes[refined_rows]
                parent_code = nxt
    return out
