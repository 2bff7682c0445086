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

import jax
import jax.numpy as jnp

from nbody_tpu.ops.tree import LinearOctree, build_octree


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
    frontier_schedule: tuple = None  # per-level frontier slot counts for
    # levels start_level+1..max_level; None = auto (grows toward
    # frontier_cap at the leaf).  Opening is heavily bottom-weighted
    # (census at N=131k, theta^2=1: p99 expanding parents per level
    # 10/14/27/66/190 for levels 2-6), so small coarse-level frontiers cut
    # the gather volume ~2x; overflow degrades to monopole and is counted.

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

    @staticmethod
    def auto_for(n: int, **overrides) -> "BHConfig":
        """Size-adaptive preset (v5e sweep, scripts/tune_bh_1m.py): dense
        group evals get relatively cheaper as N grows, so the optimal group
        size scales up — 8192 wins at N=1M (1.41 steps/s vs 1.13 for the
        old 2048 default) but over-pads small problems."""
        if n <= 32768:
            base = dict(group_size=2048, subgroups=64, chunk_groups=1)
        elif n <= 262144:
            base = dict(group_size=4096, subgroups=64, chunk_groups=1)
        else:
            base = dict(group_size=8192, subgroups=128, chunk_groups=1)
        base.update(overrides)
        return BHConfig(**base)


def _resolve_eval_mode(cfg: BHConfig, dtype) -> str:
    if cfg.eval_mode != "auto":
        return cfg.eval_mode
    if jax.default_backend() == "tpu" and dtype == jnp.float32:
        return "pallas"
    return "xla"


def _pair_block(gpos, gidx, ppos, pm, pidx, pvalid, g, g_soft, center=None):
    """Direct pairwise acceleration of group targets vs a source slab.
    Self-pairs masked by global sorted index; coincident pairs skipped
    (the reference LLM engine's r^2 guard, src/llm/barnes_hut.rs:819).
    This is the XLA eval backend; the Pallas backend (ops/group_force.py)
    computes the identical sum without the [B, P] HBM intermediates."""
    if center is not None:
        return _pair_block_mxu(
            gpos, gidx, ppos, pm, pidx, pvalid, g, g_soft, center
        )
    dd = ppos[None, :, :] - gpos[:, None, :]  # [B, P, 3]
    r2 = jnp.sum(dd * dd, axis=-1) + g_soft * g_soft
    skip = (pidx[None, :] == gidx[:, None]) | (r2 <= 0.0) | ~pvalid[None, :]
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


def _fb_eval(gpos, gidx, gmass, fb, g, g_soft):
    """Self-excluded monopole acceleration from the overflow-fallback slab.

    ``fb`` rows are raw packed node rows (mass M, mass-weighted sums S,
    range_start, range_end — ops/tree.py level_table layout).  A cell owns a
    contiguous sorted range, so "cell contains target i" is exactly
    ``cs <= sorted_idx(i) < ce``; for those pairs the target's own
    contribution is removed in closed form:

        M' = M - m_i,   com' - p_i = (S - M p_i) / M'

    eliminating the softened self-force the round-1 fallback admitted
    (ADVICE.md #1).  Empty slots (M = 0) and self-only cells (M' = 0)
    contribute nothing."""
    M = fb[:, 0]  # [F]
    S = fb[:, 1:4]  # [F, 3]
    cs = fb[:, 4]
    ce = fb[:, 5]
    ti = gidx.astype(gpos.dtype)[:, None]  # exact ints (< 2^24, tree guard)
    inside = (cs[None, :] <= ti) & (ti < ce[None, :])  # [B, F]
    m_eff = M[None, :] - jnp.where(inside, gmass[:, None], 0.0)  # [B, F]
    valid = m_eff > 0.0
    tiny = jnp.asarray(jnp.finfo(gpos.dtype).tiny, gpos.dtype)
    num = S[None, :, :] - jnp.where(inside, gmass[:, None], 0.0)[
        :, :, None
    ] * gpos[:, None, :]  # [B, F, 3] = S - m_i p_i (where inside)
    d = num / jnp.maximum(m_eff, tiny)[:, :, None] - gpos[:, None, :]
    r2 = jnp.sum(d * d, axis=-1) + g_soft * g_soft
    ok = valid & (r2 > 0.0)
    inv_r = jax.lax.rsqrt(jnp.where(ok, r2, 1.0))
    s = jnp.where(ok, inv_r * inv_r * inv_r * m_eff, 0.0)
    return g * jnp.einsum(
        "bf,bfd->bd", s, d, precision=jax.lax.Precision.HIGHEST
    )


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
    local_bounds=None,
):
    """Traversal (collection only) for ONE group (vmapped over groups).

    gpos [B,3], gmass [B], gidx [B] (global sorted indices).  Returns
    (mono slab [accept_cap, 8], near pidx [P], near pvalid [P],
     far pidx [Pf], far pvalid [Pf], wmask [W], wstart, center [3],
     acc_fb [B,3], stats...).

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

    # sorted-index window around the group
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

    for l in range(cfg.start_level, L + 1):
        # ONE packed-row gather per slot: (m, mx, my, mz, start, end, _, _)
        row = tree.level_table[l][ids]  # [F, 8]
        m = jnp.where(valid, row[:, 0], 0.0)
        row = row.at[:, 0].set(m)  # masked rows carry zero mass downstream
        occupied = m > 0
        com = row[:, 1:4] / jnp.where(occupied, m, 1.0)[:, None]
        cs = row[:, 4].astype(jnp.int32)
        ce = row[:, 5].astype(jnp.int32)

        # cells wholly inside the window: handled exactly by the window pass
        covered = occupied & (cs >= wstart) & (ce <= wend)
        inc = covered.astype(jnp.int32)
        delta = delta.at[jnp.where(covered, cs - wstart, W)].add(inc)
        delta = delta.at[jnp.where(covered, ce - wstart, W)].add(-inc)

        # exact distance from node COM to the union of subgroup boxes
        d = jnp.maximum(
            jnp.abs(com[:, None, :] - gc[None, :, :]) - gh[None, :, :], 0.0
        )  # [F, S, 3]
        rmin2 = jnp.min(jnp.sum(d * d, axis=-1), axis=-1)  # [F]
        accept = occupied & ~covered & (cell_w2[l] < theta2 * rmin2)
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

        # overflow cells -> fallback slab (self-excluded monopole eval);
        # rows are the raw packed node rows (M, S, cs, ce) _fb_eval expects
        fb, fb_off, fb_drop = _push_rows(fb, fb_off, row, overflowed,
                                         cfg.fb_cap)
        fb_spill = fb_spill + jnp.sum(fb_drop).astype(jnp.int32)

        # accepted nodes (+ fb spill, which loses only the self-exclusion)
        # -> monopole slab rows (com, mass, idx=-1)
        mono_mask = accept | fb_drop
        neg = jnp.full((ids.shape[0],), -1.0, ftype)
        zero = jnp.zeros((ids.shape[0],), ftype)
        mrows = jnp.stack(
            [com[:, 0], com[:, 1], com[:, 2], m, neg, zero, zero, zero],
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

    # ---- residual near field: boundary cells -> padded particle id list ----
    pidx, pvalid, total = _ranges_to_pidx(
        tree.level_table[L], near_ids, near_valid, cfg.near_particle_cap
    )
    if local_bounds is not None:
        pidx_far, pfvalid, total_far = _ranges_to_pidx(
            tree.level_table[L], far_ids, far_valid, cfg.far_particle_cap
        )
    else:
        pidx_far = jnp.zeros((0,), jnp.int32)
        pfvalid = jnp.zeros((0,), bool)
        total_far = jnp.int32(0)

    wmask = jnp.cumsum(delta)[:W] > 0

    # overflow-fallback contribution (cold path, tiny [B, fb_cap] eval)
    acc_fb = _fb_eval(gpos, gidx, gmass, fb[: cfg.fb_cap], g, g_soft)

    stats = (a_dropped, f_fallback, n_fallback, fb_spill, total + total_far)
    return (mono[: cfg.accept_cap], pidx, pvalid, pidx_far, pfvalid,
            wmask, wstart, center, acc_fb, stats)


def _ranges_to_pidx(leaf_table, cell_ids, cell_valid, cap):
    """Expand leaf-cell particle ranges into a padded flat index list.
    Slot k belongs to the c-th cell, c = #offs <= k — computed with one
    scatter + cumsum instead of a cap-wide binary search.
    Returns (pidx [cap], pvalid [cap], total)."""
    n_cells = cell_ids.shape[0]
    nrow = leaf_table[cell_ids]
    nstart = nrow[:, 4].astype(jnp.int32)
    nend = nrow[:, 5].astype(jnp.int32)
    counts = jnp.where(cell_valid, nend - nstart, 0).astype(jnp.int32)
    offs = jnp.cumsum(counts)
    total = offs[-1]

    marks = jnp.zeros((cap + 1,), jnp.int32).at[jnp.minimum(offs, cap)].add(
        jnp.where(cell_valid, 1, 0)
    )
    cell_of_k = jnp.cumsum(marks)[:cap]
    cell_of_k = jnp.minimum(cell_of_k, n_cells - 1)
    k = jnp.arange(cap, dtype=jnp.int32)
    base = jnp.where(cell_of_k > 0, offs[jnp.maximum(cell_of_k - 1, 0)], 0)
    pidx = nstart[cell_of_k] + (k - base)
    pvalid = k < jnp.minimum(total, cap)
    pidx = jnp.where(pvalid, pidx, 0)
    return pidx, pvalid, total


def _slab_eval(slab, tgt8, center, g, g_soft, cfg: BHConfig):
    """One fused interaction pass: every group's targets vs its assembled
    source slab.  Backend by ``cfg.eval_mode``: the Pallas group-force
    kernel on TPU f32 (ops/group_force.py), an XLA contraction (chunked
    ``lax.map`` over groups to bound the [B, S] intermediates) elsewhere.

    slab [G, S, 8], tgt8 [G, B, 8] (row layout: x, y, z, m, idx, 0, 0, 0),
    center [G, 3] -> acc [G, B, 3]."""
    G, B, _ = tgt8.shape
    dtype = tgt8.dtype
    S = slab.shape[1]
    tile = cfg.eval_tile
    while tile > 128 and tile > S:
        tile //= 2
    s_pad = (-S) % tile
    if s_pad:
        slab = jnp.concatenate([slab, jnp.zeros((G, s_pad, 8), dtype)],
                               axis=1)
        S += s_pad

    if _resolve_eval_mode(cfg, dtype) == "pallas":
        from nbody_tpu.ops.group_force import group_force_pallas

        return group_force_pallas(
            tgt8, jnp.swapaxes(slab, 1, 2), g, g_soft, tile=tile
        )

    CG = cfg.chunk_groups
    n_chunks = G // CG

    def eval_body(args):
        sl_c, t8_c, ct_c = args

        def one(sl, t8, ct):
            return _pair_block(
                t8[:, :3], t8[:, 4].astype(jnp.int32), sl[:, :3], sl[:, 3],
                sl[:, 4].astype(jnp.int32), sl[:, 3] != 0.0,
                g, g_soft, ct if cfg.mxu_blocks else None,
            )

        return jax.vmap(one)(sl_c, t8_c, ct_c)

    return jax.lax.map(
        eval_body,
        (slab.reshape(n_chunks, CG, S, 8), tgt8.reshape(n_chunks, CG, B, 8),
         center.reshape(n_chunks, CG, 3)),
    ).reshape(G, B, 3)


def traverse_tree(tree, bounds, theta2, g, g_soft, cfg: BHConfig, n: int,
                  chunk_range=None, n_shards: int = 1):
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

    w = bounds.width
    cell_w2 = tuple(
        (w / (1 << l)) * (w / (1 << l)) for l in range(cfg.max_level + 1)
    )

    collect = partial(
        _group_collect, tree, n_tot, cell_w2, theta2, g, g_soft, cfg, window,
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

    (mono, pidx, pvalid, _pf, _pfv, wmask, wstart, center, acc_fb,
     stats_t) = jax.lax.map(chunk_body, (cgp8, cgi))
    G_my = my_chunks * CG
    W = window
    P = cfg.near_particle_cap
    mono = mono.reshape(G_my, cfg.accept_cap, 8)
    pidx = pidx.reshape(G_my, P)
    pvalid = pvalid.reshape(G_my, P)
    wmask = wmask.reshape(G_my, W)
    wstart = wstart.reshape(G_my)
    center = center.reshape(G_my, 3)
    acc_fb = acc_fb.reshape(G_my, B, 3)
    adrop, fdrop, ndrop, fbspill, ntot = (s.reshape(-1) for s in stats_t)

    # ---- slab assembly: window slice + near gather + monopole slab ----
    wrows = jax.vmap(
        lambda ws: jax.lax.dynamic_slice(pmass8, (ws, jnp.int32(0)), (W, 8))
    )(wstart)  # [G, W, 8]
    wrows = wrows.at[:, :, 3].set(jnp.where(wmask, wrows[:, :, 3], 0.0))
    nrows = pmass8[pidx]  # [G, P, 8]
    nrows = nrows.at[:, :, 3].set(jnp.where(pvalid, nrows[:, :, 3], 0.0))
    slab = jnp.concatenate([wrows, nrows, mono], axis=1)  # [G, S, 8]
    tgt8 = cgp8.reshape(G_my, B, 8)
    acc_main = _slab_eval(slab, tgt8, center, g, g_soft, cfg)

    acc_c = acc_main + acc_fb

    if n_shards > 1:
        acc = acc_c.reshape(-1, 3)  # SORTED-order slice; caller assembles
    else:
        acc_s = acc_c.reshape(n_tot, 3)[:n, : cfg.dim]
        # scatter back to original particle order
        acc = jnp.zeros_like(acc_s).at[tree.order].set(acc_s)
    stats = {
        # true drops (should always be 0; raise accept_cap if not)
        "accept_dropped": jnp.sum(adrop),
        # graceful self-excluded-monopole fallbacks: cells that would have
        # been opened / summed exactly but exceeded a budget (accuracy, not
        # correctness)
        "frontier_fallback": jnp.sum(fdrop),
        "near_fallback": jnp.sum(ndrop),
        # fb-slab overflow: degraded further to a PLAIN monopole (may
        # include a softened self-interaction — raise fb_cap if nonzero)
        "fb_spill": jnp.sum(fbspill),
        "near_totals": ntot.reshape(-1),  # residual near size per group
    }
    return acc, stats


@partial(jax.jit, static_argnames=("cfg",))
def bh_accel(pos, mass, bounds, theta2, g, g_soft, cfg: BHConfig = BHConfig()):
    """Full Barnes-Hut acceleration: build + traverse + scatter back.

    pos [N,3], mass [N] (zero for dead) -> (acc [N,3], stats dict).
    N must be a multiple of 128 (guaranteed by ParticleState.create)."""
    tree = build_octree(pos, mass, bounds, cfg.max_level, dim=cfg.dim)
    return traverse_tree(tree, bounds, theta2, g, g_soft, cfg, pos.shape[0])


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
        return build_octree(pos, mass, bounds, L, dim=cfg.dim)

    def refresh(t):
        return refresh_octree(t, pos, mass)

    new_tree = jax.lax.cond(frac > rebuild_frac, rebuild, refresh, tree)
    acc, stats = traverse_tree(new_tree, bounds, theta2, g, g_soft, cfg,
                               pos.shape[0])
    stats = dict(stats)
    stats["rebuilt"] = (frac > rebuild_frac).astype(jnp.int32)
    stats["moved_frac"] = frac
    return acc, stats, new_tree
