"""Pallas group-force kernel: evaluate every Barnes-Hut group's force against
its assembled source slab (window neighbors + residual near-field particles +
accepted monopole nodes) in one fused VMEM-tiled pass.

This is the TPU answer to the reference's hot per-particle traversal loop
(src/llm/barnes_hut.rs:774-877): the traversal *decision* work (theta tests,
frontier expansion) stays in XLA (ops/traversal.py), but 100% of the O(B*S)
interaction arithmetic — which round-1 profiling showed dominated the step as
padded-slab XLA einsums (~70% of the 1M step) — runs here as dense VPU tiles.

Why it wins over the XLA slab eval:
  * No [B, S] / [B, S, 3] HBM intermediates — r^2 and the interaction weight
    live in registers/VMEM only.
  * Per-tile skip flags: compacted slabs are prefix-dense, so padding tiles
    (most of the accepted-node and near-field caps) cost one 4-byte flag
    fetch instead of a B x TILE eval.  XLA cannot skip them: the einsum
    shape is the cap, not the occupancy.
  * The (B,1) x (1,TILE) broadcast layout keeps everything in native VPU
    tiles — no transposes, no gathers inside the kernel (the slab was
    gathered once during assembly).

Source slab row layout (8-wide, assembled by ops/traversal.py):
    (x, y, z, mass, sorted_index, 0, 0, 0)
mass == 0 marks padding/invalid rows (zero weight); sorted_index == -1 marks
monopole rows (never matches a target, so no self-skip applies).  Target rows
use the same layout, with sorted_index the target's own global sorted slot —
self-pairs are masked by index equality exactly like the Pallas brute-force
kernel (ops/pairwise.py) and the reference's leaf self-skip
(src/llm/barnes_hut.rs:819).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pair_tile_body(scal_ref, tgt_ref, src_ref, out_ref, guard):
    # scalars ride in a (1, 128) VMEM row, not SMEM — gridded kernels
    # with SMEM inputs hang under the axon remote compile
    eps2 = scal_ref[0, 0]

    tx = tgt_ref[:, 0:1]  # (B, 1) target columns
    ty = tgt_ref[:, 1:2]
    tz = tgt_ref[:, 2:3]
    sx = src_ref[0:1, :]  # (1, TILE) source rows (slab arrives transposed)
    sy = src_ref[1:2, :]
    sz = src_ref[2:3, :]
    sm = src_ref[3:4, :]

    dx = sx - tx  # (B, TILE) clean VPU broadcasts
    dy = sy - ty
    dz = sz - tz
    r2 = dx * dx + dy * dy + dz * dz + eps2
    # No self-pair index test: a self (or exactly coincident) pair has
    # d = 0, so its contribution s*d is exactly +0.0 as long as s stays
    # finite — only the exact r2 == 0 case needs a guard (replacing the
    # old (si == ti) | (r2 <= 0) select chain, ~20% of the kernel's VPU
    # ops).  An absolute floor (max(r2, 1e-12)) is NOT scale-safe:
    # tiny-bounds scenes have legitimate pairs below any fixed
    # constant.  With softening, r2 >= eps2 > 0 makes even that guard
    # dead weight (~3% of the step at 1M), so ``guard`` is a STATIC
    # kernel parameter and the wrapper lax.cond's on the softening
    # scalar (an in-kernel pl.when branch pair blew the 16 MB scoped
    # VMEM: both branch bodies' temporaries are allocated).  Semantics
    # match the reference's r^2 guard (src/llm/barnes_hut.rs:819) at
    # every scene scale.
    if guard:
        r2 = jnp.where(r2 > 0.0, r2, 1.0)
    inv_r = jax.lax.rsqrt(r2)
    s = inv_r * inv_r * inv_r * sm

    out_ref[:, 0:1] += jnp.sum(s * dx, axis=1, keepdims=True)
    out_ref[:, 1:2] += jnp.sum(s * dy, axis=1, keepdims=True)
    out_ref[:, 2:3] += jnp.sum(s * dz, axis=1, keepdims=True)


def _kernel(scal_ref, tgt_ref, src_ref, out_ref, *, guard):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # whole-tile skip: slabs are prefix-compacted, so trailing cap padding
    # collapses to one (1, TILE) mass reduction (the pipeline still streams
    # the block, but an [8, TILE] DMA is ~free next to the B x TILE eval it
    # replaces).  Computed in-kernel: a separate flags operand would need
    # its own Mosaic-legal block shape for a 4-byte read.
    @pl.when(jnp.any(src_ref[3:4, :] != 0.0))
    def _():
        _pair_tile_body(scal_ref, tgt_ref, src_ref, out_ref, guard)


def _kernel_masked(scal_ref, mask_ref, tgt_ref, src_ref, out_ref, *, guard):
    """Block-dual variant: a (1, 128) mask row per (target-tile, source-tile)
    pair; nonzero means this tile pair was ACCEPTED by the dual acceptance
    test (ops/traversal.py _dual_prepare) and is evaluated as the source
    tile's quadrupole instead — skip the whole B x TILE pair eval here."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when((mask_ref[0, 0] == 0.0) & jnp.any(src_ref[3:4, :] != 0.0))
    def _():
        _pair_tile_body(scal_ref, tgt_ref, src_ref, out_ref, guard)


def _quad_kernel(scal_ref, tgt_ref, src_ref, out_ref, *, guard):
    """Quadrupole slab eval: same tiling/accumulation shape as ``_kernel``,
    16-wide source rows (x, y, z, M, Qxx, Qyy, Qzz, Qxy, Qxz, Qyz, 0...).

    Force law (e = source - target, r² = |e|² + ε², traceless Q):
        a = G [ M e / r³  -  (Q e) / r⁵  +  (5/2)(eᵀ Q e) e / r⁷ ]
    — the COM-centered multipole expansion through quadrupole order (the
    dipole vanishes identically; numerically verified against direct sums
    in tests/test_quadrupole.py).  Accepted nodes never contain a target
    (theta acceptance needs rmin > 0), so no self-skip index test is
    needed; fb-spill rows arrive with Q = 0 (plain monopole)."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(jnp.any(src_ref[3:4, :] != 0.0))
    def _():
        eps2 = scal_ref[0, 0]

        tx = tgt_ref[:, 0:1]
        ty = tgt_ref[:, 1:2]
        tz = tgt_ref[:, 2:3]
        ex = src_ref[0:1, :] - tx  # (B, TILE)
        ey = src_ref[1:2, :] - ty
        ez = src_ref[2:3, :] - tz
        m = src_ref[3:4, :]
        qxx = src_ref[4:5, :]
        qyy = src_ref[5:6, :]
        qzz = src_ref[6:7, :]
        qxy = src_ref[7:8, :]
        qxz = src_ref[8:9, :]
        qyz = src_ref[9:10, :]

        r2 = ex * ex + ey * ey + ez * ez + eps2
        # guard exactly r2 == 0 (coincident unsoftened): padding rows have
        # m = 0 AND Q = 0, so their terms vanish once ir stays finite.  An
        # absolute floor here (an earlier 1e-4) silently clamped REAL
        # accepted-node forces in small-bounds scenes — the theta test
        # admits nodes at r ~ cell_width/theta, which has no lower bound
        # across scene scales.  ``guard`` is static (softened runs have
        # r2 >= eps2 > 0 and take the select-free kernel via the wrapper's
        # lax.cond, same as _kernel); the guarded path matches the XLA
        # backend (_quad_block's ok mask) and the fb path (_fb_eval) —
        # keep all three in sync.
        if guard:
            ok = r2 > 0.0
            r2 = jnp.where(ok, r2, 1.0)
        inv_r = jax.lax.rsqrt(r2)
        ir2 = inv_r * inv_r
        ir3 = ir2 * inv_r
        ir5 = ir3 * ir2
        ir7 = ir5 * ir2
        ux = qxx * ex + qxy * ey + qxz * ez
        uy = qxy * ex + qyy * ey + qyz * ez
        uz = qxz * ex + qyz * ey + qzz * ez
        qe = ex * ux + ey * uy + ez * uz
        w = m * ir3 + 2.5 * qe * ir7
        if guard:
            w = jnp.where(ok, w, 0.0)
            ir5 = jnp.where(ok, ir5, 0.0)

        out_ref[:, 0:1] += jnp.sum(w * ex - ir5 * ux, axis=1, keepdims=True)
        out_ref[:, 1:2] += jnp.sum(w * ey - ir5 * uy, axis=1, keepdims=True)
        out_ref[:, 2:3] += jnp.sum(w * ez - ir5 * uz, axis=1, keepdims=True)


def _self_kernel_sym(scal_ref, t8_ref, mi_ref, xj, yj, zj, mj, out1, out2, *,
                     guard, ratio, tile_j):
    """Newton-3 symmetric eval of a group against ITSELF (cfg.near_sym).

    Same diagonal-band tile classification as the brute-force sym kernel
    (ops/pairwise.py _kernel_sym): tiles strictly below the band evaluate
    one r^2/rsqrt per unordered pair and accumulate BOTH directions — row
    sums into the per-(group, target-tile) output, mirrored column sums
    into a per-group (8, B) accumulator resident in VMEM while the group's
    tiles stream (the group grid dim is outermost, so the block is visited
    consecutively and written back once per group).

    ``mj``/``mi`` are the WINDOW-MASKED masses (mass zeroed for rows whose
    cell is not window-covered — those pairs ride the near/fb paths), NOT
    the raw target masses: using the masked mass as the weight in both
    directions reproduces the asymmetric window pass exactly (the force ON
    a masked particle from a covered one is the covered particle's column
    contribution, which carries the covered particle's mask — its own mask
    only gates its role as a SOURCE)."""
    bi = pl.program_id(1)
    bj = pl.program_id(2)

    @pl.when(bj == 0)
    def _():
        out1[:] = jnp.zeros_like(out1)

    @pl.when((bi == 0) & (bj == 0))
    def _():
        out2[:] = jnp.zeros_like(out2)

    band = bi // ratio

    def common():
        # the one shared r^2 -> 1/r^3 body (guard semantics included) lives
        # in pairwise.py so a fix there can't silently miss this kernel;
        # imported at trace time to stay out of the engines import cycle
        # (engines/__init__ loads barnes_hut -> ... -> group_force BEFORE
        # pairwise)
        from nbody_tpu.ops.pairwise import _sym_tile_common

        return _sym_tile_common(scal_ref, t8_ref[:, 0:1], t8_ref[:, 1:2],
                                t8_ref[:, 2:3], xj, yj, zj, guard)

    @pl.when(bj == band)
    def _():
        # diagonal band: one-directional (self-pairs vanish via d = 0)
        dx, dy, dz, ir3 = common()
        s = ir3 * mj[:]
        out1[:, 0:1] += jnp.sum(s * dx, axis=1, keepdims=True)
        out1[:, 1:2] += jnp.sum(s * dy, axis=1, keepdims=True)
        out1[:, 2:3] += jnp.sum(s * dz, axis=1, keepdims=True)

    @pl.when(bj < band)
    def _():
        dx, dy, dz, ir3 = common()
        s = ir3 * mj[:]
        out1[:, 0:1] += jnp.sum(s * dx, axis=1, keepdims=True)
        out1[:, 1:2] += jnp.sum(s * dy, axis=1, keepdims=True)
        out1[:, 2:3] += jnp.sum(s * dz, axis=1, keepdims=True)
        sc = ir3 * mi_ref[:]
        c = pl.ds(bj * tile_j, tile_j)
        out2[0:1, c] -= jnp.sum(sc * dx, axis=0, keepdims=True)
        out2[1:2, c] -= jnp.sum(sc * dy, axis=0, keepdims=True)
        out2[2:3, c] -= jnp.sum(sc * dz, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def group_self_force_pallas(tgt8, msrc, g, g_soft, *, tile_i: int = 512,
                            tile_j: int = 1024, interpret: bool = False):
    """tgt8 [G, B, 8] group rows, msrc [G, B] window-masked source masses ->
    acc [G, B, 3]: each group's Newton-3 symmetric self-interaction square
    (the central B columns of the old window slab, evaluated once per
    unordered pair instead of twice — cfg.near_sym)."""
    G, B, _ = tgt8.shape
    dtype = tgt8.dtype
    while tile_i > 128 and B % tile_i:
        tile_i //= 2
    while tile_j > 128 and B % tile_j:
        tile_j //= 2
    tile_i = min(tile_i, B)
    tile_j = min(tile_j, B)
    if tile_j % tile_i:
        tile_i = tile_j = min(tile_i, tile_j)
    ratio = tile_j // tile_i
    assert B % tile_i == 0 and B % tile_j == 0, (B, tile_i, tile_j)
    bt = B // tile_i
    st = B // tile_j
    scal = jnp.broadcast_to(g_soft * g_soft, (1, 128)).astype(dtype)

    # source-row views of the same particles, flattened to (1, G*B): Mosaic
    # requires the last two block dims divisible by (8, 128) OR equal to
    # the array dims — a (1, tile_j) block on a [G, B] array is rejected by
    # the real lowering (interpret mode accepts it), so the group dimension
    # rides the index map ((0, gi*st + j)) over a width-1 array instead
    xs = tgt8[..., 0].reshape(1, G * B)
    ys = tgt8[..., 1].reshape(1, G * B)
    zs = tgt8[..., 2].reshape(1, G * B)
    mrow = msrc.reshape(1, G * B)

    def call(guard):
        return pl.pallas_call(
            functools.partial(_self_kernel_sym, guard=guard, ratio=ratio,
                              tile_j=tile_j),
            grid=(G, bt, st),
            in_specs=[
                pl.BlockSpec((1, 128), lambda gi, bi, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_i, 8),
                             lambda gi, bi, j, bt=bt: (gi * bt + bi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_i, 1),
                             lambda gi, bi, j, bt=bt: (gi * bt + bi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_j),
                             lambda gi, bi, j, st=st: (0, gi * st + j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_j),
                             lambda gi, bi, j, st=st: (0, gi * st + j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_j),
                             lambda gi, bi, j, st=st: (0, gi * st + j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_j),
                             lambda gi, bi, j, st=st: (0, gi * st + j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tile_i, 8),
                             lambda gi, bi, j, bt=bt: (gi * bt + bi, 0),
                             memory_space=pltpu.VMEM),
                # per-group mirror accumulator: visited consecutively while
                # the group's (bi, j) tiles stream, written back per group
                pl.BlockSpec((8, B), lambda gi, bi, j: (gi, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((G * B, 8), dtype),
                jax.ShapeDtypeStruct((G * 8, B), dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=int(G) * int(B) * int(B) * 13,
                bytes_accessed=int(G) * int(B) * (64 + 16),
                transcendentals=int(G) * int(B) * int(B) // 2,
            ),
            interpret=interpret,
        )

    args = (scal, tgt8.reshape(G * B, 8), msrc.reshape(G * B, 1),
            xs, ys, zs, mrow)
    out1, out2 = jax.lax.cond(
        scal[0, 0] > 0.0,
        lambda a: call(False)(*a),
        lambda a: call(True)(*a),
        args,
    )
    acc = out1[:, :3].reshape(G, B, 3) + jnp.swapaxes(
        out2.reshape(G, 8, B)[:, :3, :], 1, 2
    )
    return acc * g


def fit_target_tile(B: int, tile: int, target_tile: int, cap: int) -> int:
    """The kernel's target-tile rows TI: divide B, and keep the (TI, tile)
    f32 temporaries inside the scoped-VMEM budget (``cap`` = max TI*tile).
    Exposed so callers building per-(target-tile, source-tile) masks
    (ops/traversal.py block-dual) compute the exact TI the kernel will use."""
    ti = target_tile
    while ti > 8 and B % ti:
        ti //= 2
    while ti > 8 and ti * tile > cap:
        ti //= 2
    return min(ti, B)


@functools.partial(jax.jit, static_argnames=("tile", "target_tile",
                                              "interpret"))
def quad_force_pallas(tgt8, qslabT, g, g_soft, *, tile: int = 2048,
                      target_tile: int = 512, interpret: bool = False):
    """tgt8 [G, B, 8] target rows, qslabT [G, 16, A] transposed quadrupole
    slab -> acc [G, B, 3].  Same grid/accumulation structure as
    ``group_force_pallas``; ~31 extra VPU flops/pair buy one multipole
    order of accuracy (monopole error ~(w/d)², quadrupole ~(w/d)³ at the
    same theta)."""
    G, B, _ = tgt8.shape
    A = qslabT.shape[2]
    assert A % tile == 0, (tgt8.shape, qslabT.shape, tile)
    # the quad kernel keeps ~6 (ti, tile) f32 temporaries live (e, u, qe, w)
    # vs the pair kernel's ~4 — 512 x 2048 blew the 16 MB scoped-VMEM budget
    # at 25.4 MB on v5e, so cap the block footprint one notch lower
    ti = fit_target_tile(B, tile, target_tile, 1 << 18)
    assert B % ti == 0, (B, ti)
    dtype = tgt8.dtype
    scal = jnp.broadcast_to(g_soft * g_soft, (1, 128)).astype(dtype)
    bt = B // ti

    def call(guard):
        return pl.pallas_call(
            functools.partial(_quad_kernel, guard=guard),
            grid=(G, bt, A // tile),
            in_specs=[
                pl.BlockSpec((1, 128), lambda gi, bi, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ti, 8),
                             lambda gi, bi, j, bt=bt: (gi * bt + bi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, tile), lambda gi, bi, j: (gi, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (ti, 8), lambda gi, bi, j, bt=bt: (gi * bt + bi, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((G * B, 8), dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=int(G) * int(B) * int(A) * 44,
                bytes_accessed=int(G) * (int(B) * 64 + int(A) * 64 * int(bt)),
                transcendentals=int(G) * int(B) * int(A),
            ),
            interpret=interpret,
        )

    args = (scal, tgt8.reshape(G * B, 8), qslabT.reshape(G * 16, A))
    # softened runs (r2 >= eps2 > 0) take the select-free kernel
    out = jax.lax.cond(
        scal[0, 0] > 0.0,
        lambda a: call(False)(*a),
        lambda a: call(True)(*a),
        args,
    )
    return (out[:, :3] * g).reshape(G, B, 3)


@functools.partial(jax.jit, static_argnames=("tile", "target_tile",
                                              "interpret"))
def group_force_pallas(tgt8, slabT, g, g_soft, *, tile: int = 2048,
                       target_tile: int = 512, interpret: bool = False,
                       mask=None):
    """tgt8 [G, B, 8] target rows, slabT [G, 8, S] transposed source slab
    -> acc [G, B, 3].

    Grid (G, B//TI, S//tile): target/output blocks stay VMEM-resident
    across the inner source sweep; the j dimension is the sequential
    accumulation axis (standard Pallas reduction pattern, same as
    ops/pairwise.py).  The target dimension is tiled to TI=512 rows —
    each elementwise temporary in the kernel is (TI, tile) f32, and Mosaic
    keeps several live at once, so TI x tile must stay a few MB to fit the
    ~16 MB scoped-VMEM budget (B=4096 blocks OOM'd at compile: 3 x 33 MB
    for dx/dy/dz alone).

    ``mask`` (block-dual, ops/traversal.py): [G, B//TI, S//tile] — nonzero
    skips that whole (target-tile, source-tile) pair (it is evaluated as
    the source tile's quadrupole elsewhere).  Rides as (1, 128) VMEM rows
    selected by the grid index map (a scalar SMEM operand would hang under
    the axon remote compile)."""
    G, B, _ = tgt8.shape
    S = slabT.shape[2]
    assert S % tile == 0, (tgt8.shape, slabT.shape, tile)
    # cap ti*tile at the known-good 512 x 2048 footprint (each (ti, tile)
    # f32 temporary is ti*tile*4 bytes; ~4 live at once must fit the
    # ~16 MB scoped-VMEM budget)
    ti = fit_target_tile(B, tile, target_tile, 1 << 20)
    assert B % ti == 0, (B, ti)
    dtype = tgt8.dtype
    scal = jnp.broadcast_to(g_soft * g_soft, (1, 128)).astype(dtype)
    bt = B // ti
    st = S // tile
    if mask is not None:
        assert mask.shape == (G, bt, st), (mask.shape, (G, bt, st))
        # one (8, 128) tile per (target-tile, source-tile) pair: Mosaic
        # requires block shapes divisible by (8, 128) unless equal to the
        # whole array — a (1, 128) row compiles in interpret mode but is
        # rejected by the real lowering (caught on TPU, round 3)
        maskx = jnp.repeat(
            jnp.repeat(mask.reshape(G * bt, st).astype(dtype), 8, axis=0),
            128, axis=1,
        )

    def call(guard):
        kern = _kernel if mask is None else _kernel_masked
        specs = [
            pl.BlockSpec((1, 128), lambda gi, bi, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        if mask is not None:
            specs.append(
                pl.BlockSpec((8, 128),
                             lambda gi, bi, j, bt=bt: (gi * bt + bi, j),
                             memory_space=pltpu.VMEM)
            )
        specs += [
            pl.BlockSpec((ti, 8),
                         lambda gi, bi, j, bt=bt: (gi * bt + bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile), lambda gi, bi, j: (gi, j),
                         memory_space=pltpu.VMEM),
        ]
        return pl.pallas_call(
            functools.partial(kern, guard=guard),
            grid=(G, bt, st),
            in_specs=specs,
            out_specs=pl.BlockSpec(
                (ti, 8), lambda gi, bi, j, bt=bt: (gi * bt + bi, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((G * B, 8), dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=int(G) * int(B) * int(S) * 13,
                bytes_accessed=int(G) * (int(B) * 64 + int(S) * 32 * int(bt)),
                transcendentals=int(G) * int(B) * int(S),
            ),
            interpret=interpret,
        )

    if mask is None:
        args = (scal, tgt8.reshape(G * B, 8), slabT.reshape(G * 8, S))
    else:
        args = (scal, maskx, tgt8.reshape(G * B, 8), slabT.reshape(G * 8, S))
    # runtime branch on the softening scalar (see the in-kernel note):
    # softened runs take the guard-free kernel
    out = jax.lax.cond(
        scal[0, 0] > 0.0,
        lambda a: call(False)(*a),
        lambda a: call(True)(*a),
        args,
    )
    return (out[:, :3] * g).reshape(G, B, 3)
