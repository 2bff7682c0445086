"""Pallas tiled all-pairs gravity kernel — the north-star brute-force kernel
(BASELINE.json: >=100x the reference Rust direct sum at N=64k on one chip).

Reference behavior being replaced: the *serial* symmetric pair loop in
``manual::BruteForceSimulation::update_forces`` (src/manual/brute_force.rs:64-82).

Kernel design (TPU-first):
  * 2D grid over (i-tiles, j-tiles); the Pallas pipeline streams blocks
    through VMEM with double buffering automatically.
  * Targets enter as column vectors [N, 1] and sources as row vectors
    [1, N], so each (i, j) program broadcasts a (TILE_I, 1) x (1, TILE_J)
    pair into clean 2D VPU tiles — no transposes, no 1D vectors.
  * The accumulator lives in the output block (TILE_I, 8): initialized when
    j == 0, accumulated across the sequential j grid dimension (the
    standard Pallas reduction pattern).
  * Self-pairs and exactly-coincident pairs contribute exactly zero via
    the d = 0 identity (no mask ops; see the in-kernel note) — same
    semantics as the LLM engine's r^2 guard (src/llm/barnes_hut.rs:819).

The kernel computes, for every target i (alive or not):
    a_i = G * sum_j m_j * (p_j - p_i) / (|p_j - p_i|^2 + eps^2)^{3/2}
with m_j = 0 for dead/padding sources — identical semantics to
``force_dense`` in engines/brute_force.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody_tpu.core.state import SimParams
from nbody_tpu.engines import Engine, register


def _kernel(scal_ref, xi, yi, zi, xj, yj, zj, mj, out, *, guard):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out[:] = jnp.zeros_like(out)

    # NOTE: scalars ride in a (1, 128) VMEM row, not SMEM — gridded kernels
    # with SMEM inputs hang under the axon remote-compile tunnel.
    eps2 = scal_ref[0, 0]

    dx = xj[:] - xi[:]  # (TI, 1) x (1, TJ) -> (TI, TJ)
    dy = yj[:] - yi[:]
    dz = zj[:] - zi[:]
    r2 = dx * dx + dy * dy + dz * dz + eps2

    # No explicit self-pair mask: a self (or exactly coincident) pair has
    # d = 0, so its contribution s*d is exactly +0.0 as long as s stays
    # finite — only the exact r2 == 0 case needs a guard (replacing the old
    # skip-select chain: 2 iotas, 2 compares, or, 2 selects — ~30% of the
    # kernel's VPU ops).  An absolute floor is NOT used: tiny-bounds scenes
    # have legitimate pairs below any fixed constant.  With softening,
    # r2 >= eps2 > 0 makes even that guard dead weight, so ``guard`` is a
    # STATIC kernel parameter and the wrapper lax.cond's on the softening
    # scalar.  Same semantics as the reference's r^2 guard
    # (src/llm/barnes_hut.rs:819) at every scale.
    if guard:
        r2 = jnp.where(r2 > 0.0, r2, 1.0)
    inv_r = jax.lax.rsqrt(r2)
    s = inv_r * inv_r * inv_r * mj[:]

    out[:, 0:1] += jnp.sum(s * dx, axis=1, keepdims=True)
    out[:, 1:2] += jnp.sum(s * dy, axis=1, keepdims=True)
    out[:, 2:3] += jnp.sum(s * dz, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def pairwise_acc_pallas(pos, mass, g, g_soft, *, tile_i=512, tile_j=2048,
                        interpret=False):
    """pos [N, 3], mass [N] -> acc [N, 3].  N must be a multiple of the tile
    sizes (states are capacity-padded; pad sources with m=0)."""
    return pairwise_acc_pallas_targets(pos, pos, mass, g, g_soft,
                                       tile_i=tile_i, tile_j=tile_j,
                                       interpret=interpret)


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def pairwise_acc_pallas_targets(pos_t, pos, mass, g, g_soft, *, tile_i=512,
                                tile_j=2048, interpret=False):
    """Exact direct sum onto an arbitrary target set: pos_t [K, 3] targets
    vs pos [N, 3] / mass [N] sources -> acc [K, 3].

    The kernel is target/source symmetric already (a target coincident
    with a source — e.g. a sampled row of ``pos`` — contributes exactly
    +0.0 through the d = 0 path, identical to the full kernel's self-pair
    handling), so this is the same code on a K x N grid.  Purpose: a
    sampled-row exact oracle at N where the full N² dispatch is
    impractical (a single 4M² kernel is ~105 s and has crashed the TPU
    worker mid-dispatch; 8192 x 4M is ~0.2 s)."""
    if pos.shape[1] != 3:
        # the kernel's coordinate unpacking is 3D-only; fail loudly instead
        # of indexing a phantom z column (2D states should use the
        # dimension-generic 'brute' / 'bh' engines)
        raise ValueError(
            f"brute-pallas supports 3D states only, got D={pos.shape[1]}; "
            "use engine='brute' or 'bh' for 2D"
        )
    n = pos.shape[0]
    k = pos_t.shape[0]
    dtype = pos.dtype
    # shrink tiles to the largest power-of-two divisor of k/n (capacities
    # are always multiples of 128, so 128 always works)
    while tile_i > 128 and k % tile_i:
        tile_i //= 2
    while tile_j > 128 and n % tile_j:
        tile_j //= 2
    tile_i = min(tile_i, k)
    tile_j = min(tile_j, n)
    assert k % tile_i == 0 and n % tile_j == 0, (k, n, tile_i, tile_j)

    col = lambda a: a.reshape(k, 1)
    row = lambda a: a.reshape(1, n)
    x, y, z = pos_t[:, 0], pos_t[:, 1], pos_t[:, 2]
    scal = jnp.broadcast_to(g_soft * g_soft, (1, 128)).astype(dtype)

    grid = (k // tile_i, n // tile_j)

    def call(guard):
        return pl.pallas_call(
            functools.partial(_kernel, guard=guard),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_i, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_i, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_i, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_j), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_j), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_j), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_j), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (tile_i, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((k, 8), dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=int(k) * int(n) * 18,
                bytes_accessed=int(k) * 4 * 4 + int(n) * 8 * 4,
                transcendentals=int(k) * int(n),
            ),
            interpret=interpret,
        )

    sx, sy, sz = pos[:, 0], pos[:, 1], pos[:, 2]
    args = (scal, col(x), col(y), col(z), row(sx), row(sy), row(sz),
            row(mass))
    # softened runs (r2 >= eps2 > 0) take the guard-free kernel
    out = jax.lax.cond(
        scal[0, 0] > 0.0,
        lambda a: call(False)(*a),
        lambda a: call(True)(*a),
        args,
    )
    return out[:, :3] * g


def _force(pos, mass, params: SimParams):
    # Newton-3 symmetric kernel where its (8, N) VMEM mirror accumulator
    # fits (1.28-1.33x measured, results/sym_kernel_tpu.jsonl; forces agree
    # to 1.2e-6 max rel on TPU @64k — f32 summation order only).  Below
    # ~4k the tile grid degenerates (128-row tiles, mostly diagonal band)
    # and the plain kernel's simpler pipeline wins (12727 vs 12020 steps/s
    # at N=1k, results/combined_sym_brute_r3.csv).
    if 4096 <= pos.shape[0] <= _SYM_MAX_N:
        return pairwise_acc_pallas_sym(pos, mass, params.g, params.g_soft)
    return pairwise_acc_pallas(pos, mass, params.g, params.g_soft)


register(
    Engine(
        name="brute-pallas",
        force=_force,
        description="O(N^2) direct sum, Pallas VMEM-tiled kernel, Newton-3 "
        "symmetric below 256k (replaces reference "
        "src/manual/brute_force.rs:64-82)",
    )
)


# ---------------------------------------------------------------------------
# Newton-3 symmetric formulation: each unordered pair is evaluated ONCE.
#
# The N x N interaction square is symmetric (F_ij = -F_ji), which the
# reference's serial loop exploits (src/manual/brute_force.rs:64-82 updates
# both bodies per iteration) but the round-1/2 TPU kernels did not: the
# (TI, 1) x (1, TJ) broadcast kernel evaluates every ORDERED pair, paying
# ~19 VPU ops each.  The symmetric kernel tiles the square and classifies
# tiles against the diagonal at tile granularity:
#
#   * bj >  bi // R  (strictly above the diagonal band): skipped — those
#     ordered pairs are the mirrors of a dual tile below.
#   * bj == bi // R  (the diagonal band, where the ti-row block lies inside
#     the tj-col block, R = tj // ti): plain one-directional eval, exactly
#     the ``_kernel`` body — self/coincident pairs vanish via d = 0.
#   * bj <  bi // R  (strictly below): DUAL eval — one r^2/rsqrt pays for
#     both directions: row sums accumulate force-on-targets (out1, indexed
#     by bi like the plain kernel) and column sums accumulate the mirrored
#     force-on-sources into a constant-index (8, N) accumulator (out2),
#     written back once at the end of the grid.
#
# Per-lane cost rises ~19 -> ~26 VPU ops on dual tiles, but each dual lane
# covers TWO ordered pairs -> ~0.7x total VPU work (the kernel is VPU
# ALU-bound at ~83% of the f32 ceiling, VALIDATION.md §11, so op count is
# wall time).  Tiles are (512, 1024) instead of the plain kernel's
# (512, 2048): the dual body keeps ~6 (ti, tj) f32 temporaries live
# (dx/dy/dz/ir3/s/product) and 2048-wide blocks would blow the ~16 MB
# scoped-VMEM budget that already limits the quad kernel.
# ---------------------------------------------------------------------------


def _sym_tile_common(scal_ref, xi, yi, zi, xj, yj, zj, guard):
    """Shared r^2 -> 1/r^3 for both tile classes.  Returns (dx, dy, dz, ir3)."""
    eps2 = scal_ref[0, 0]
    dx = xj[:] - xi[:]  # (TI, 1) x (1, TJ) -> (TI, TJ)
    dy = yj[:] - yi[:]
    dz = zj[:] - zi[:]
    r2 = dx * dx + dy * dy + dz * dz + eps2
    if guard:
        # exact-coincident guard only (see _kernel); scale-safe
        r2 = jnp.where(r2 > 0.0, r2, 1.0)
    inv_r = jax.lax.rsqrt(r2)
    return dx, dy, dz, inv_r * inv_r * inv_r


def _kernel_sym(scal_ref, xi, yi, zi, mi, xj, yj, zj, mj, out1, out2, *,
                guard, ratio, tile_j):
    bi = pl.program_id(0)
    bj = pl.program_id(1)

    @pl.when(bj == 0)
    def _():
        out1[:] = jnp.zeros_like(out1)

    @pl.when((bi == 0) & (bj == 0))
    def _():
        out2[:] = jnp.zeros_like(out2)

    band = bi // ratio

    @pl.when(bj == band)
    def _():
        # diagonal band: the row block lies inside the col block — evaluate
        # one-directionally (every ordered pair of this tile is native here)
        dx, dy, dz, ir3 = _sym_tile_common(
            scal_ref, xi, yi, zi, xj, yj, zj, guard)
        s = ir3 * mj[:]
        out1[:, 0:1] += jnp.sum(s * dx, axis=1, keepdims=True)
        out1[:, 1:2] += jnp.sum(s * dy, axis=1, keepdims=True)
        out1[:, 2:3] += jnp.sum(s * dz, axis=1, keepdims=True)

    @pl.when(bj < band)
    def _():
        # strictly-below tile: one eval serves both directions
        dx, dy, dz, ir3 = _sym_tile_common(
            scal_ref, xi, yi, zi, xj, yj, zj, guard)
        s = ir3 * mj[:]
        out1[:, 0:1] += jnp.sum(s * dx, axis=1, keepdims=True)
        out1[:, 1:2] += jnp.sum(s * dy, axis=1, keepdims=True)
        out1[:, 2:3] += jnp.sum(s * dz, axis=1, keepdims=True)
        # mirrored: force on the SOURCES from the targets = -sum_i mi*ir3*d
        sc = ir3 * mi[:]
        c = pl.ds(bj * tile_j, tile_j)
        out2[0:1, c] -= jnp.sum(sc * dx, axis=0, keepdims=True)
        out2[1:2, c] -= jnp.sum(sc * dy, axis=0, keepdims=True)
        out2[2:3, c] -= jnp.sum(sc * dz, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def pairwise_acc_pallas_sym(pos, mass, g, g_soft, *, tile_i=512, tile_j=1024,
                            interpret=False):
    """Newton-3 all-pairs kernel: same semantics as ``pairwise_acc_pallas``
    (every pair still softened/guarded identically; summation ORDER differs,
    so results agree to f32 rounding, not bitwise).  The mirrored column
    accumulator is a VMEM-resident (8, N) buffer, so N is capped by VMEM —
    callers above ``_SYM_MAX_N`` should use the plain kernel."""
    if pos.shape[1] != 3:
        raise ValueError(
            f"brute-pallas supports 3D states only, got D={pos.shape[1]}; "
            "use engine='brute' or 'bh' for 2D"
        )
    n = pos.shape[0]
    dtype = pos.dtype
    while tile_i > 128 and n % tile_i:
        tile_i //= 2
    while tile_j > 128 and n % tile_j:
        tile_j //= 2
    tile_i = min(tile_i, n)
    tile_j = min(tile_j, n)
    if tile_j % tile_i:
        tile_i = tile_j = min(tile_i, tile_j)
    ratio = tile_j // tile_i
    assert n % tile_i == 0 and n % tile_j == 0, (n, tile_i, tile_j)

    col = lambda a: a.reshape(n, 1)
    row = lambda a: a.reshape(1, n)
    x, y, z = pos[:, 0], pos[:, 1], pos[:, 2]
    scal = jnp.broadcast_to(g_soft * g_soft, (1, 128)).astype(dtype)
    grid = (n // tile_i, n // tile_j)

    def call(guard):
        return pl.pallas_call(
            functools.partial(_kernel_sym, guard=guard, ratio=ratio,
                              tile_j=tile_j),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_i, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_i, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_i, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_i, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_j), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_j), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_j), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_j), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tile_i, 8), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                # mirrored accumulator: whole-array block, constant index —
                # stays VMEM-resident across the grid, written back once
                pl.BlockSpec((8, n), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, 8), dtype),
                jax.ShapeDtypeStruct((8, n), dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=int(n) * int(n) * 13,
                bytes_accessed=int(n) * 4 * 4 * 2 + int(n) * 8 * 4,
                transcendentals=int(n) * int(n) // 2,
            ),
            interpret=interpret,
        )

    args = (scal, col(x), col(y), col(z), col(mass),
            row(x), row(y), row(z), row(mass))
    out1, out2 = jax.lax.cond(
        scal[0, 0] > 0.0,
        lambda a: call(False)(*a),
        lambda a: call(True)(*a),
        args,
    )
    return (out1[:, :3] + out2[:3, :].T) * g


# (8, N) f32 mirror accumulator + ~12 MB of dual-tile temporaries must fit
# VMEM; 256k (8 MB accumulator) compiles, 512k does not.  Brute is only
# competitive below the ~60k bh crossover anyway (results/crossover_r3b.jsonl
# — the post-sym-kernel measurement; crossover_r3.jsonl rows predate it).
_SYM_MAX_N = 262144


def _force_sym(pos, mass, params: SimParams):
    if pos.shape[0] > _SYM_MAX_N:
        return pairwise_acc_pallas(pos, mass, params.g, params.g_soft)
    return pairwise_acc_pallas_sym(pos, mass, params.g, params.g_soft)


register(
    Engine(
        name="brute-pallas-sym",
        force=_force_sym,
        description="O(N^2) direct sum, Newton-3 symmetric Pallas kernel "
        "(each unordered pair evaluated once; mirrors "
        "src/manual/brute_force.rs:64-82's dual update, TPU-tiled)",
    )
)


# ---------------------------------------------------------------------------
# MXU formulation: push the per-pair arithmetic onto the systolic array.
#
#   r^2_ij = |p_i - c|^2 + |p_j - c|^2 - 2 (p_i - c).(p_j - c) + eps^2
#   a_i    = G * ( sum_j s_ij (p_j - c)  -  (p_i - c) sum_j s_ij )
#
# The cross term and the accumulation are matmuls (K=3 and K=TILE_J); the
# VPU only assembles r^2 and the interaction weight.  NOTE: Mosaic only
# offers DEFAULT (bf16 — catastrophically wrong for r^2) and HIGHEST (true
# f32, 6-pass) matmul precision; at HIGHEST this kernel is ~2.5x slower
# than the direct VPU kernel, so it is kept as a documented alternative
# rather than the default.
# ---------------------------------------------------------------------------


def _kernel_mxu(scal_ref, pi8, pjT, pj8, out, *, tile_i, tile_j):
    """pi8/pj8: [T, 8] rows (x, y, z, 1, 0, 0, 0, 0); pjT: [8, TJ]
    (x, y, z, m, 0...).  All contractions are 8-wide so the MXU sees
    aligned shapes (narrow K=3 / N=4 dots miscompile under Mosaic)."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out[:] = jnp.zeros_like(out)

    eps2 = scal_ref[0, 0]
    # recenter on the midpoint of the two tile anchors; with Morton-sorted
    # inputs both tiles are spatially compact, so |p - c| stays small for
    # close (strong-force) pairs and the norm-trick cancellation is benign
    cx = 0.5 * (pi8[0, 0] + pj8[0, 0])
    cy = 0.5 * (pi8[0, 1] + pj8[0, 1])
    cz = 0.5 * (pi8[0, 2] + pj8[0, 2])
    one11 = jnp.ones((1, 1), pi8.dtype)
    zero15 = jnp.zeros((1, 5), pi8.dtype)
    # center row padded to 8 wide: (cx, cy, cz, 0, 0, 0, 0, 0) — built 2D
    # throughout (1D vectors are fragile under Mosaic)
    c_row = jnp.concatenate(
        [cx * one11, cy * one11, cz * one11, zero15], axis=1
    )  # [1, 8]
    # coords-only selector built from iota (avoids captured array constants)
    mask_row = (
        jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1) < 3
    ).astype(pi8.dtype)

    pic8 = (pi8[:] - c_row) * mask_row  # [TI, 8] recentred coords
    n2i = jnp.sum(pic8 * pic8, axis=1, keepdims=True)  # [TI, 1]

    zero51 = jnp.zeros((5, 1), pi8.dtype)
    c_col = jnp.concatenate(
        [cx * one11, cy * one11, cz * one11, zero51], axis=0
    )  # [8, 1]
    mask_col = (
        jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) < 3
    ).astype(pi8.dtype)
    pjc8 = (pjT[:] - c_col) * mask_col  # [8, TJ]
    mj = pjT[3:4, :]
    n2j = jnp.sum(pjc8 * pjc8, axis=0, keepdims=True)  # [1, TJ]

    cross = jnp.dot(pic8, pjc8, preferred_element_type=pi8.dtype,
                    precision=jax.lax.Precision.HIGHEST)  # [TI, TJ]
    r2 = n2i + n2j - 2.0 * cross + eps2

    rows = i * tile_i + jax.lax.broadcasted_iota(jnp.int32, (tile_i, tile_j), 0)
    cols = j * tile_j + jax.lax.broadcasted_iota(jnp.int32, (tile_i, tile_j), 1)
    skip = (rows == cols) | (r2 <= 0.0)
    inv_r = jax.lax.rsqrt(jnp.where(skip, 1.0, r2))
    s = jnp.where(skip, 0.0, inv_r * inv_r * inv_r * mj)

    # recentred accumulation [TI, 8]: cols 0..2 = sum s*pjc, col 3 = sum s
    pj8c = pj8[:] - c_row * mask_row
    A = jnp.dot(s, pj8c, preferred_element_type=pi8.dtype,
                precision=jax.lax.Precision.HIGHEST)  # [TI, 8]
    out[:] += A - pic8 * A[:, 3:4]


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def pairwise_acc_pallas_mxu(pos, mass, g, g_soft, *, tile_i=512, tile_j=1024,
                            interpret=False):
    """MXU-heavy all-pairs kernel; same semantics as pairwise_acc_pallas."""
    if pos.shape[1] != 3:
        raise ValueError(
            f"brute-pallas-mxu supports 3D states only, got D={pos.shape[1]}; "
            "use engine='brute' or 'bh' for 2D"
        )
    n = pos.shape[0]
    dtype = pos.dtype
    while tile_i > 128 and n % tile_i:
        tile_i //= 2
    while tile_j > 128 and n % tile_j:
        tile_j //= 2
    tile_i = min(tile_i, n)
    tile_j = min(tile_j, n)

    ones = jnp.ones((n, 1), dtype)
    zeros4 = jnp.zeros((n, 4), dtype)
    p8 = jnp.concatenate([pos, ones, zeros4], axis=1)  # [N, 8] (x,y,z,1,0..)
    pT = jnp.concatenate(
        [pos, mass[:, None], zeros4], axis=1
    ).T  # [8, N] (x, y, z, m, 0...)
    scal = jnp.broadcast_to(g_soft * g_soft, (1, 128)).astype(dtype)

    kernel = functools.partial(_kernel_mxu, tile_i=tile_i, tile_j=tile_j)
    out = pl.pallas_call(
        kernel,
        grid=(n // tile_i, n // tile_j),
        in_specs=[
            pl.BlockSpec((1, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_j), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_j, 8), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_i, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, 8), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(n) * int(n) * 22,
            bytes_accessed=int(n) * 16 * 2 + int(n) * 32,
            transcendentals=int(n) * int(n),
        ),
        interpret=interpret,
    )(scal, p8, pT, p8)
    return out[:, :3] * g


def _force_mxu(pos, mass, params: SimParams):
    """Morton-sort, run the MXU kernel on sorted data, scatter back.

    Sorting is what makes the norm-trick numerically safe: spatially close
    pairs land in nearby tiles whose shared anchor midpoint recentres them
    near the origin."""
    from nbody_tpu.ops import morton
    from nbody_tpu.ops.tree import grid_bounds

    gb = grid_bounds(params.bounds, 10)
    codes = morton.cell_codes(pos, gb, 10)
    codes = jnp.where(mass > 0, codes, jnp.int32(1 << 30))
    order = jnp.argsort(codes)
    acc_s = pairwise_acc_pallas_mxu(
        pos[order], mass[order], params.g, params.g_soft
    )
    return jnp.zeros_like(acc_s).at[order].set(acc_s)


register(
    Engine(
        name="brute-pallas-mxu",
        force=_force_mxu,
        description="O(N^2) direct sum, MXU-formulated Pallas kernel "
        "(Morton-sorted, recentred norm-trick r^2 + matmul accumulation)",
    )
)
