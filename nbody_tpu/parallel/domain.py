"""Memory-scalable multi-chip Barnes-Hut: Morton-range domain decomposition.

Round-1's sharded BH replicated the global sort and all-gathered full
positions/masses/forces (VERDICT.md #1): per-chip memory was O(N_total), so
chips bought compute but zero capacity.  This module keeps every per-particle
array at **O(N/n_dev + halo)** per chip; the only replicated structure is the
dense level pyramid, O(8^max_level) — constant in N.

The reference analog being replaced is the per-octant parallel build + merge
(src/llm/barnes_hut.rs:617-677, rayon); here the "octants" are equal-count
Morton ranges and the merge is a handful of ICI collectives:

1. **Distributed exact-split sort** (histogram sort).  Each chip locally
   stable-sorts its shard by leaf Morton code, builds a leaf-cell histogram,
   and all-gathers the histograms (O(8^L), N-independent).  A particle's
   global sorted position is then closed-form:

       p = cell_start[c] + count_on_lower_chips[c] + local_rank_in_cell

   Because chip k holds the k-th contiguous block of original indices, the
   (code, chip, local-stable-rank) order equals the (code, original-index)
   order — the permutation is IDENTICAL to the single-chip stable sort.
2. **Ring routing** (`_ring_route`): rows travel the ICI ring for n_dev
   hops; each chip peels off the rows whose sorted slot it owns.  O(n_loc)
   buffer, N*row_bytes total traffic — no O(N) staging array anywhere.
3. **Leaf stats**: per-chip segment-sums over its contiguous sorted slice,
   merged with one psum; pyramid reshape-sums replicated (tiny).
4. **Halo exchange**: one ppermute each way supplies the window pass —
   windows of my groups provably live inside [my_start - W, my_end + W).
5. **Request/reply near-field gather** (`_dist_gather`): boundary-cell
   particle indices can be Morton-far (octant seams), so each chip
   all-gathers the index requests (int32) and answers with a psum_scatter —
   every chip receives exactly its own gathered rows.
6. Forces come back to original owners through a second ring route (each
   sorted row carries its original index), so the force array is never
   all-gathered.

Traversal decision logic and the fused Pallas slab eval are shared with the
single-chip path (ops/traversal.py: _group_collect / _slab_eval).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from nbody_tpu.ops import morton
from nbody_tpu.ops.tree import (
    _check_range_dtype,
    _pyramid_tables,
    _quad_pyramid,
    grid_bounds,
    level_offset,
    wide_ranges,
)
from nbody_tpu.ops.traversal import (
    BHConfig,
    _dual_slab_eval,
    _expand_from_ranges,
    _expand_ranges,
    _group_collect,
    _quad_eval,
    _quad_slab,
    fit_chunks,
)


def _ring_perm(n_dev: int):
    return [(i, (i + 1) % n_dev) for i in range(n_dev)]


def _ring_route(rows, dest, axis: str, n_dev: int):
    """Deliver ``rows[i]`` to global slot ``dest[i]`` of an array sharded in
    contiguous [n_loc] blocks over ``axis``; returns this chip's block.

    ``dest`` must be a global permutation (each slot receives exactly one
    row across all chips).  n_dev hops around the ICI ring with an O(n_loc)
    buffer — the memory-scalable alternative to all_to_all's O(N) staging."""
    n_loc = rows.shape[0]
    my_start = jax.lax.axis_index(axis) * n_loc
    out = jnp.zeros((n_loc + 1, rows.shape[1]), rows.dtype)  # +1 trash row
    perm = _ring_perm(n_dev)
    buf_rows, buf_dest = rows, dest
    for hop in range(n_dev):
        rel = buf_dest - my_start
        mine = (rel >= 0) & (rel < n_loc)
        slot = jnp.where(mine, rel, n_loc)
        out = out.at[slot].set(buf_rows)
        if hop < n_dev - 1:
            buf_rows = jax.lax.ppermute(buf_rows, axis, perm)
            buf_dest = jax.lax.ppermute(buf_dest, axis, perm)
    return out[:n_loc]


def _dist_gather(rows_loc, idx, axis: str, n_dev: int):
    """Gather rows at global indices ``idx`` [R] from an array sharded in
    contiguous [n_loc] blocks: all-gather the (cheap, int32) requests, each
    chip answers for the indices it owns, one psum_scatter returns exactly
    this chip's [R] answers.  Comm: O(R * n_dev * 4B) up, O(R * width) down."""
    n_loc = rows_loc.shape[0]
    my_start = jax.lax.axis_index(axis) * n_loc
    req = jax.lax.all_gather(idx, axis, tiled=True)  # [n_dev * R]
    rel = req - my_start
    own = (rel >= 0) & (rel < n_loc)
    got = jnp.where(
        own[:, None], rows_loc[jnp.clip(rel, 0, n_loc - 1)], 0.0
    )  # [n_dev * R, width]
    return jax.lax.psum_scatter(got, axis, scatter_dimension=0, tiled=True)


def _build_refined_domain(rows_s, deep_s, leaf_starts, max_level: int,
                          refine_levels: int, refine_cap: int, threshold: int,
                          branch: int, dim: int, ftype, axis: str,
                          n_loc: int, my):
    """Density-adaptive refined side tables for the DOMAIN build — the
    distributed analog of ops/tree.py:_build_refined, producing the same
    replicated (refine_tables, slot_leaf, child_maps, stats) layout the
    refined walk consumes.

    Distribution strategy: the refined tables are O(refine_cap * branch)
    per level — N-independent, so they replicate like the dense pyramid.
    All *decisions* (which cells flag, slot compaction) run replicated on
    replicated inputs (leaf_starts, psum'd child ranges) and are therefore
    identical on every chip; the per-range *extraction* (searchsorted over
    deep codes, double-float prefix range sums) runs only on the chip that
    OWNS the cell's contiguous sorted range, and one psum per level merges
    the zero-padded contributions.

    Ownership: a leaf cell is refinable only when its whole sorted range
    lies inside one chip's [my_start, my_start + n_loc) slice — the
    post-route deep re-sort is chip-local, so a range straddling a chip
    boundary is only piecewise deep-sorted and its refined children would
    get wrong ranges.  Straddling over-threshold cells keep the unrefined
    near/fallback path (at most n_dev - 1 cells, counted in stats[1]
    alongside cap overflow).  Descendant cells inherit containment from
    their parent, so ownership is decided once at the leaf level."""
    from nbody_tpu.ops.tree import (_build_prefix_table, _compact,
                                    _range_sums_from_table)

    n_leaf = branch ** max_level
    L_deep = max_level + refine_levels
    rows_per = refine_cap * branch
    my_start = my * n_loc

    # local double-float prefix table over my slice's (mass, m*pos)
    w4 = jnp.concatenate(
        [rows_s[:, 3:4], rows_s[:, :3] * rows_s[:, 3:4]], axis=1
    )
    P = _build_prefix_table(w4)

    starts = leaf_starts[:-1].astype(jnp.int32)
    ends = leaf_starts[1:].astype(jnp.int32)
    counts = ends - starts
    owner = starts // n_loc
    # floor division keeps empty cells (ends - 1 < starts) out via the
    # over-threshold test, so the straddle test only matters when counts > 0
    intact = ((ends - 1) // n_loc) == owner
    over_thr = counts > threshold
    flagged = over_thr & intact
    n_straddle = jnp.sum(over_thr & ~intact).astype(jnp.int32)
    cell_ids = jnp.arange(n_leaf, dtype=jnp.int32)
    p_codes, p_valid, dropped = _compact(cell_ids, flagged, refine_cap)
    p_owner = jnp.where(p_valid, owner[p_codes], -1)
    total_flagged = jnp.sum(flagged).astype(jnp.int32)
    total_dropped = dropped.astype(jnp.int32) + n_straddle
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
        child_owner = jnp.repeat(p_owner, branch)
        mine = child_valid & (child_owner == my)
        shift = dim * (L_deep - (max_level + r))
        lo = jnp.where(child_valid, child_codes << shift, 0)
        hi = jnp.where(child_valid, (child_codes + 1) << shift, 0)
        # local searchsorted is valid exactly for the ranges I own (my
        # slice is fully deep-sorted after the post-route re-sort).
        # Fused lo||hi sort-method search: 2.5x the TPU default scan
        # (see ops/tree.py _build_refined)
        r_ = jnp.searchsorted(deep_s, jnp.concatenate([lo, hi]),
                              side="left", method="sort").astype(jnp.int32)
        ls, le = r_[:rows_per], r_[rows_per:]
        cs = jax.lax.psum(jnp.where(mine, ls + my_start, 0), axis)
        ce = jax.lax.psum(jnp.where(mine, le + my_start, 0), axis)
        sums_l = _range_sums_from_table(
            P, jnp.where(mine, ls, 0), jnp.where(mine, le, 0), 4
        )
        sums = jax.lax.psum(jnp.where(mine[:, None], sums_l, 0.0), axis)
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
            cnt = ce - cs  # replicated post-psum: identical flags everywhere
            flag_r = child_valid & (cnt > threshold)
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
            p_owner = jnp.where(p_valid, child_owner[p_rows], -1)

    stats = jnp.stack([total_flagged, total_dropped])
    return tuple(tables), slot_leaf, tuple(child_maps), stats


class DomainTree(NamedTuple):
    """Per-chip slice of the distributed octree (all fields O(n_loc) or
    O(8^L); the level_table pyramid is the replicated constant)."""

    rows_s: jax.Array  # [n_loc, 8] my sorted rows (x, y, z, m, orig, code,.)
    ext8: jax.Array  # [n_loc + 2*halo, 8] halo-extended slab, col 4 = global
    # sorted index (the source-row layout of ops/group_force.py)
    level_table: Tuple[jax.Array, ...]  # replicated dense pyramid
    halo: int
    all_quad: jax.Array = None  # replicated concatenated quadrupole table
    # (raw second moments, ops/tree.py layout); None when multipole="mono"
    # density-adaptive refined side tables (round 4) — REPLICATED like the
    # level pyramid (O(refine_cap * branch) per level, N-independent),
    # merged from per-owner-chip range extraction by one psum per level
    # (_build_refined_domain).  Same layout as LinearOctree's fields, so
    # ops/traversal.py's refined walk applies unchanged.
    refine_tables: Tuple[jax.Array, ...] = None
    refine_slot_leaf: jax.Array = None
    refine_child_slot: Tuple[jax.Array, ...] = None
    refine_stats: jax.Array = None


def build_domain_tree(pos_loc, mass_loc, bounds, max_level: int, axis: str,
                      n_dev: int, halo: int, dim: int = 3,
                      quad: bool = False, quad_leaf: bool = True,
                      refine_levels: int = 0, refine_cap: int = 8192,
                      refine_threshold: int = 512) -> DomainTree:
    """Distributed octree build over this chip's shard (call inside
    shard_map).  Produces the identical sorted permutation as the
    single-chip ``build_octree`` (see module docstring, step 1); leaf
    statistics differ only by psum association order.

    ``refine_levels > 0`` additionally materializes the density-adaptive
    refined side tables: each chip re-sorts its routed slice by DEEP
    Morton code (a within-leaf-cell permutation only — leaf codes are the
    deep codes' prefixes, so every leaf range and the whole routing above
    are unchanged) and the replicated tables are merged per level from
    per-owner-chip range extraction (_build_refined_domain).  The global
    within-cell order then matches the single-chip deep sort up to the
    stable tiebreak (original index vs routed order) — refined cell
    *ranges* and node statistics agree with build_octree to summation
    order; cells straddling a chip boundary keep the unrefined path."""
    n_loc = pos_loc.shape[0]
    n_tot = n_loc * n_dev
    wide = wide_ranges(n_tot, pos_loc.dtype)
    _check_range_dtype(n_tot, pos_loc.dtype, wide=wide)
    if wide and dim * max_level > 24:
        # leaf codes ride an f32 row column — must stay exact ints
        raise ValueError(
            f"wide mode leaf codes need dim*max_level <= 24, got "
            f"{dim}*{max_level}"
        )
    if wide and n_loc >= 1 << 24:
        # the (chip, slot) return route stores slot = orig % n_loc in an
        # f32 column; slots at/above 2^24 would round and silently scatter
        # forces to the wrong rows (review r3) — shard wider instead
        raise ValueError(
            f"wide mode needs per-chip shard < 2^24 rows for the exact f32 "
            f"(chip, slot) route, got {n_loc}; use more devices"
        )
    assert halo <= n_loc, (halo, n_loc)
    branch = 1 << dim
    n_leaf = branch ** max_level
    gb = grid_bounds(bounds, max_level)
    my = jax.lax.axis_index(axis)
    ftype = pos_loc.dtype

    codes = morton.cell_codes(pos_loc[:, :dim], gb, max_level)
    # dead particles: sentinel code -> global sorted tail, matching no cell
    codes = jnp.where(mass_loc > 0, codes, jnp.int32(n_leaf))
    if dim == 2:
        pos_loc = jnp.concatenate(
            [pos_loc, jnp.zeros((n_loc, 1), ftype)], axis=1
        )

    # 1. local stable sort; original global index rides as payload
    orig = my * n_loc + jnp.arange(n_loc, dtype=jnp.int32)
    code_s, orig_s, xs, ys, zs, ms = jax.lax.sort(
        (codes, orig, pos_loc[:, 0], pos_loc[:, 1], pos_loc[:, 2], mass_loc),
        num_keys=1,
    )

    # 2. exact global sorted position from the histogram (n_leaf + 1 cells:
    #    the sentinel cell collects the dead tail)
    seg_h = partial(
        jax.ops.segment_sum,
        segment_ids=code_s,
        num_segments=n_leaf + 1,
        indices_are_sorted=True,
    )
    h = seg_h(jnp.ones_like(code_s))
    hall = jax.lax.all_gather(h, axis)  # [n_dev, 8^L + 1] — N-independent
    total = hall.sum(axis=0)
    cell_start = jnp.concatenate(
        [jnp.zeros((1,), total.dtype), jnp.cumsum(total)[:-1]]
    )
    on_lower = jnp.where(
        (jnp.arange(n_dev) < my)[:, None], hall, 0
    ).sum(axis=0)
    local_start = jnp.concatenate(
        [jnp.zeros((1,), h.dtype), jnp.cumsum(h)[:-1]]
    )
    j = jnp.arange(n_loc, dtype=h.dtype)
    p = (cell_start[code_s] + on_lower[code_s]
         + (j - local_start[code_s])).astype(jnp.int32)

    # 3. route rows to their sorted owners (orig/code as exact f32 ints —
    #    guarded by _check_range_dtype; 8^8 == 2^24 is still exact).
    #    Wide mode (N >= 2^24): the original index goes (chip, slot)-split
    #    across cols 6/4 — each component < 2^24 per chip — and the idx
    #    column's self-exclusion job is retired (see BHConfig.wide).
    zero = jnp.zeros((n_loc,), ftype)
    if wide:
        idx_col = (orig_s % n_loc).astype(ftype)
        chip_col = (orig_s // n_loc).astype(ftype)
    else:
        idx_col = orig_s.astype(ftype)
        chip_col = zero
    rows = jnp.stack(
        [xs, ys, zs, ms, idx_col, code_s.astype(ftype),
         chip_col, zero], axis=1,
    )
    rows_s = _ring_route(rows, p, axis, n_dev)  # [n_loc, 8] my sorted slice

    # 3b. adaptive refinement: re-sort my slice by DEEP Morton code so
    #     refined cells are contiguous local ranges.  Deep codes carry the
    #     leaf code as prefix and the slice is already leaf-sorted, so the
    #     re-sort permutes particles only WITHIN leaf cells — every leaf
    #     range, the histogram routing, the halo windows and all coarse
    #     statistics are unchanged.  Dead rows (sentinel leaf code) keep a
    #     sentinel deep code: their parked-at-origin positions must not
    #     re-enter the grid.
    deep_s = None
    if refine_levels:
        L_deep = max_level + refine_levels
        if L_deep > (morton.MAX_LEVEL_3D if dim == 3
                     else morton.MAX_LEVEL_2D):
            raise ValueError(
                f"max_level + refine_levels = {L_deep} exceeds the "
                f"{dim}D Morton code depth limit"
            )
        if wide:
            raise ValueError(
                "refine_levels does not support the wide row format "
                "(N >= 2^24)"
            )
        code_pre = rows_s[:, 5].astype(jnp.int32)
        deep = morton.cell_codes(rows_s[:, :dim], gb, L_deep)
        deep = jnp.where(code_pre < n_leaf, deep,
                         jnp.int32(branch ** L_deep))
        sorted_cols = jax.lax.sort(
            (deep, *(rows_s[:, c] for c in range(8))), num_keys=1
        )
        deep_s = sorted_cols[0]
        rows_s = jnp.stack(sorted_cols[1:], axis=1)

    # 4. leaf stats: contiguous-slice segment-sums merged by one psum
    code_s_my = rows_s[:, 5].astype(jnp.int32)
    seg = partial(
        jax.ops.segment_sum,
        segment_ids=code_s_my,
        num_segments=n_leaf,  # sentinel rows fall out of range -> dropped
        indices_are_sorted=True,
    )
    leaf_mass = jax.lax.psum(seg(rows_s[:, 3]), axis)
    # lane-dense 1-D segment-sums (see ops/tree.py build_octree note)
    wm = rows_s[:, :3] * rows_s[:, 3:4]
    leaf_mpos = jax.lax.psum(
        jnp.stack([seg(wm[:, d]) for d in range(3)], axis=1), axis
    )
    leaf_counts = jax.lax.psum(seg(jnp.ones_like(code_s_my)), axis)

    _, _, level_table, leaf_starts = _pyramid_tables(
        leaf_mass, leaf_mpos, leaf_counts, max_level, branch, ftype,
        wide=wide,
    )

    all_quad = None
    if quad:
        from nbody_tpu.ops.tree import _build_quad

        q, top = _build_quad(rows_s[:, :3], rows_s[:, 3], code_s_my,
                             max_level, branch, ftype, quad_leaf)
        all_quad = _quad_pyramid(jax.lax.psum(q, axis), top, branch, ftype)

    # 5. halo exchange for the window pass; global edges are zero-padded
    #    (ring wraparound must not leak the far end of the sort)
    perm = _ring_perm(n_dev)
    from_left = jax.lax.ppermute(rows_s[n_loc - halo:], axis, perm)
    from_right = jax.lax.ppermute(
        rows_s[:halo], axis, [(d, s) for (s, d) in perm]
    )
    from_left = jnp.where(my == 0, 0.0, from_left)
    from_right = jnp.where(my == n_dev - 1, 0.0, from_right)
    ext = jnp.concatenate([from_left, rows_s, from_right], axis=0)
    if wide:
        # idx column retired (maskless exclusion; see BHConfig.wide) —
        # park a -1 sentinel that can never equal a target index
        ext8 = ext.at[:, 4].set(-1.0)
    else:
        ext_idx = (my * n_loc - halo
                   + jnp.arange(n_loc + 2 * halo, dtype=jnp.int32))
        ext8 = ext.at[:, 4].set(ext_idx.astype(ftype))

    refine = {}
    if refine_levels:
        tables, slot_leaf, child_maps, rstats = _build_refined_domain(
            rows_s, deep_s, leaf_starts, max_level, refine_levels,
            refine_cap, refine_threshold, branch, dim, ftype, axis,
            n_loc, my,
        )
        refine = dict(refine_tables=tables, refine_slot_leaf=slot_leaf,
                      refine_child_slot=child_maps, refine_stats=rstats)

    return DomainTree(rows_s=rows_s, ext8=ext8, level_table=level_table,
                      halo=halo, all_quad=all_quad, **refine)


def domain_accel(pos_loc, mass_loc, bounds, theta2, g, g_soft,
                 cfg: BHConfig, axis: str, n_dev: int):
    """Distributed Barnes-Hut acceleration for this chip's shard (call
    inside shard_map).  Returns (acc [n_loc, 3] in ORIGINAL particle order
    for this shard, stats dict) — no array in the pipeline exceeds
    O(n_loc + halo) except the O(8^L) pyramid."""
    # grid frame, like the single-chip bh_accel: every f32 accumulation is
    # bounded by the domain half-width, not |center| (ADVICE r2 #1)
    pos_loc = pos_loc - bounds.center
    bounds = bounds.centered()
    n_loc = pos_loc.shape[0]
    n_tot = n_loc * n_dev
    wide = wide_ranges(n_tot, pos_loc.dtype)
    if wide and not cfg.wide:
        cfg = dataclasses.replace(cfg, wide=True)
    if cfg.near_sym:
        # the domain path assembles its own halo slab below and does not
        # implement the split-window symmetric square; drop the flag so a
        # preset carrying it (auto_for) keeps the proven asymmetric eval
        cfg = dataclasses.replace(cfg, near_sym=False)
    B = cfg.group_size
    assert n_loc % B == 0, (n_loc, B)
    # clamp the walk/eval chunk width to the per-chip group count (auto
    # presets size chunk_groups for the single-chip group count)
    cg_fit = fit_chunks(cfg.chunk_groups, n_loc // B)
    if cg_fit != cfg.chunk_groups:
        cfg = dataclasses.replace(cfg, chunk_groups=cg_fit)
    CG = cfg.chunk_groups
    dtype = pos_loc.dtype
    my = jax.lax.axis_index(axis)
    my_start = my * n_loc

    # windows are capped to the shard size; halo = window guarantees every
    # clipped window [wstart, wstart + W) of my groups lies inside
    # [my_start - W, my_start + n_loc + W) — PROVIDED wstart cannot fall
    # below my_start - halo.  _group_collect computes wstart from
    # cfg.window_pad (not the clamped width), so window_pad > n_loc would
    # silently shift the slab region away from the covered-cell
    # bookkeeping (wrong forces, zero fallback stats) — fail loudly.
    if cfg.window_pad > n_loc:  # user-reachable config: not an assert
        raise ValueError(
            f"window_pad ({cfg.window_pad}) exceeds the per-chip shard "
            f"({n_loc}); lower window_pad/group_size or use fewer devices"
        )
    window = min(cfg.window, n_loc)
    halo = window

    tree = build_domain_tree(pos_loc, mass_loc, bounds, cfg.max_level,
                             axis, n_dev, halo, dim=cfg.dim,
                             quad=cfg.multipole == "quad",
                             quad_leaf=cfg.quad_leaf,
                             refine_levels=cfg.refine_levels,
                             refine_cap=cfg.refine_cap,
                             refine_threshold=cfg.refine_threshold_resolved)

    cell_w2 = cfg.cell_w2s(bounds.width)

    gidx_loc = my_start + jnp.arange(n_loc, dtype=jnp.int32)
    # wide: target idx column retired (-2: never equals the source rows'
    # -1 sentinel, so even a stray compare can't skip a real pair)
    tgt8 = tree.rows_s.at[:, 4].set(
        -2.0 if cfg.wide else gidx_loc.astype(dtype)
    )

    # leaf cells inside [local_lo, local_hi) gather from the halo slab;
    # the rest (Morton-seam cells) go through the capped far collective
    local_lo = my_start - halo
    local_hi = my_start + n_loc + halo
    collect = partial(
        _group_collect, tree, n_tot, cell_w2, theta2, g, g_soft, cfg, window,
        local_bounds=(local_lo, local_hi),
    )
    vm_collect = jax.vmap(
        lambda gp, gm, gi, gc: collect(gp, gm, gi, gcode=gc)
    )

    G_my = n_loc // B
    n_chunks = G_my // CG
    ct8 = tgt8.reshape(n_chunks, CG, B, 8)
    ci = gidx_loc.reshape(n_chunks, CG, B)
    # target leaf codes: wide-mode fb containment (Morton-prefix test);
    # ignored (tcell=None) in narrow mode
    cc = tree.rows_s[:, 5].astype(jnp.int32).reshape(n_chunks, CG, B)

    def chunk_body(args):
        cp8, cidx, ccode = args
        return vm_collect(cp8[..., :3], cp8[..., 3], cidx, ccode)

    (mono, near_ids, near_valid, far_ids, far_valid, wmask, wstart, center,
     acc_fb, _fbs, rnear, rnear_valid, rfar, rfar_valid, stats_t) = (
         jax.lax.map(chunk_body, (ct8, ci, cc)))
    P = cfg.near_particle_cap
    Pf = cfg.far_particle_cap
    mono = mono.reshape(G_my, cfg.accept_cap, 8)
    wmask = wmask.reshape(G_my, window)
    wstart = wstart.reshape(G_my)
    center = center.reshape(G_my, 3)
    acc_fb = acc_fb.reshape(G_my, B, 3)
    adrop, fdrop, ndrop, fbspill, rntot, rftot = (
        s.reshape(-1) for s in stats_t)

    # near/far cells -> flat particle lists post-walk (see _expand_ranges)
    leaf_table = tree.level_table[cfg.max_level]
    pidx, pvalid, ntot_near = _expand_ranges(
        leaf_table,
        near_ids.reshape(G_my, cfg.near_cell_cap),
        near_valid.reshape(G_my, cfg.near_cell_cap),
        P,
        wide=cfg.wide,
    )
    pidx_f, pfvalid, ntot_far = _expand_ranges(
        leaf_table,
        far_ids.reshape(G_my, cfg.far_cell_cap),
        far_valid.reshape(G_my, cfg.far_cell_cap),
        Pf,
        wide=cfg.wide,
    )
    ntot = ntot_near + ntot_far

    # ---- slab assembly ----
    # window rows from the halo-extended local slab (one dynamic_slice per
    # group; coverage proof in the halo comment above)
    wstart_ext = wstart - (my_start - halo)
    wrows = jax.vmap(
        lambda ws: jax.lax.dynamic_slice(
            tree.ext8, (ws, jnp.int32(0)), (window, 8))
    )(wstart_ext)
    wrows = wrows.at[:, :, 3].set(jnp.where(wmask, wrows[:, :, 3], 0.0))

    # local near rows: plain gather from the halo slab (collect guaranteed
    # their cells lie inside it)
    nrows = tree.ext8[jnp.clip(pidx - local_lo, 0, n_loc + 2 * halo - 1)]
    nrows = nrows.at[:, :, 3].set(jnp.where(pvalid, nrows[:, :, 3], 0.0))
    # the halo slab's idx column is already the global sorted index, but
    # clip-clamped invalid slots must not alias a real source row (wide:
    # column is retired, keep the -1 sentinel everywhere)
    nrows = nrows.at[:, :, 4].set(
        -1.0 if cfg.wide else jnp.where(pvalid, pidx.astype(dtype), -1.0)
    )

    # far near rows (Morton-seam cells): request/reply over the mesh —
    # the ONLY per-particle collective whose size is not O(n_loc), bounded
    # by far_particle_cap per group
    frows4 = _dist_gather(
        tree.rows_s[:, :4], pidx_f.reshape(-1), axis, n_dev
    ).reshape(G_my, Pf, 4)
    fidx_col = (jnp.full_like(pidx_f, -1.0, dtype=dtype) if cfg.wide
                else jnp.where(pfvalid, pidx_f.astype(dtype), -1.0))
    frows = jnp.concatenate(
        [frows4, fidx_col[..., None],
         jnp.zeros((G_my, Pf, 3), dtype)], axis=2,
    )
    frows = frows.at[:, :, 3].set(jnp.where(pfvalid, frows[:, :, 3], 0.0))

    # refined-near ranges (density-adaptive runs): the local list gathers
    # from the halo slab exactly like nrows (the walk admitted only ranges
    # inside [local_lo, local_hi)); the refined-far list (seam-core cells)
    # rides a second request/reply, bounded by refine_far_particle_cap
    rparts = []
    if cfg.refine_levels:
        RC = cfg.refine_near_cell_cap
        rnear = rnear.reshape(G_my, RC, 2)
        pidx_r, pvalid_r, _rtot_l = _expand_from_ranges(
            rnear[..., 0], rnear[..., 1],
            rnear_valid.reshape(G_my, RC), cfg.refine_near_particle_cap,
        )
        rrows = tree.ext8[jnp.clip(pidx_r - local_lo, 0,
                                   n_loc + 2 * halo - 1)]
        rrows = rrows.at[:, :, 3].set(
            jnp.where(pvalid_r, rrows[:, :, 3], 0.0))
        rrows = rrows.at[:, :, 4].set(
            -1.0 if cfg.wide
            else jnp.where(pvalid_r, pidx_r.astype(dtype), -1.0))
        RFC = cfg.refine_far_cell_cap
        Prf = cfg.refine_far_particle_cap
        rfar = rfar.reshape(G_my, RFC, 2)
        pidx_rf, pvalid_rf, _rtot_f = _expand_from_ranges(
            rfar[..., 0], rfar[..., 1],
            rfar_valid.reshape(G_my, RFC), Prf,
        )
        rfrows4 = _dist_gather(
            tree.rows_s[:, :4], pidx_rf.reshape(-1), axis, n_dev
        ).reshape(G_my, Prf, 4)
        rfidx_col = (jnp.full_like(pidx_rf, -1.0, dtype=dtype) if cfg.wide
                     else jnp.where(pvalid_rf, pidx_rf.astype(dtype), -1.0))
        rfrows = jnp.concatenate(
            [rfrows4, rfidx_col[..., None],
             jnp.zeros((G_my, Prf, 3), dtype)], axis=2,
        )
        rfrows = rfrows.at[:, :, 3].set(
            jnp.where(pvalid_rf, rfrows[:, :, 3], 0.0))
        rparts = [rrows, rfrows]

    t8 = tgt8.reshape(G_my, B, 8)
    if cfg.multipole == "quad":
        slab = jnp.concatenate([wrows, nrows, frows, *rparts], axis=1)
    else:
        slab = jnp.concatenate([wrows, nrows, frows, *rparts, mono], axis=1)
    # block-dual far field (round 3): same per-(target-tile, source-tile)
    # acceptance + masked pair kernel as the single-chip walk.  Tile
    # boundaries fall differently here (the slab carries the far rows), so
    # domain+dual is numerically close to — not bit-equal with — the
    # single-chip dual path; equivalence tests pin block_dual=False.
    acc_main, n_dual = _dual_slab_eval(
        slab, t8, center, theta2, g, g_soft, cfg
    )
    if cfg.multipole == "quad":
        goffs = jnp.array(
            [level_offset(lv, 1 << cfg.dim)
             for lv in range(cfg.max_level + 1)],
            jnp.int32,
        )
        qslab = _quad_slab(mono, tree.all_quad, goffs,
                           -1 if cfg.quad_leaf else cfg.max_level)
        acc_main = acc_main + _quad_eval(qslab, t8, g, g_soft, cfg)
    acc_sorted = (acc_main + acc_fb).reshape(n_loc, 3)

    # ---- route forces back to original owners (no force all-gather) ----
    if cfg.wide:  # (chip, slot) split: chip * n_loc + slot, exact to 2^31
        orig_dest = (tree.rows_s[:, 6].astype(jnp.int32) * n_loc
                     + tree.rows_s[:, 4].astype(jnp.int32))
    else:
        orig_dest = tree.rows_s[:, 4].astype(jnp.int32)
    acc4 = jnp.concatenate(
        [acc_sorted, jnp.zeros((n_loc, 1), dtype)], axis=1
    )
    acc = _ring_route(acc4, orig_dest, axis, n_dev)[:, :3]

    stats = {
        "accept_dropped": jnp.sum(adrop),
        "frontier_fallback": jnp.sum(fdrop),
        "near_fallback": jnp.sum(ndrop),
        "fb_spill": jnp.sum(fbspill),
        "near_totals": ntot.reshape(-1),
        "dual_tiles": n_dual,
    }
    if cfg.refine_levels:
        stats["refine_near_totals"] = rntot.reshape(-1)
        stats["refine_far_totals"] = rftot.reshape(-1)
        stats["refine_build_dropped"] = tree.refine_stats[1]
    return acc, stats
