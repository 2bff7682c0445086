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
  * Self-pairs and exactly-coincident pairs are masked (matching the
    LLM engine's r^2 guard, src/llm/barnes_hut.rs:819).

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


def _kernel(scal_ref, xi, yi, zi, xj, yj, zj, mj, out, *, tile_i, tile_j):
    i = pl.program_id(0)
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

    rows = i * tile_i + jax.lax.broadcasted_iota(jnp.int32, (tile_i, tile_j), 0)
    cols = j * tile_j + jax.lax.broadcasted_iota(jnp.int32, (tile_i, tile_j), 1)
    skip = (rows == cols) | (r2 <= 0.0)

    inv_r = jax.lax.rsqrt(jnp.where(skip, 1.0, r2))
    s = jnp.where(skip, 0.0, inv_r * inv_r * inv_r * mj[:])

    out[:, 0:1] += jnp.sum(s * dx, axis=1, keepdims=True)
    out[:, 1:2] += jnp.sum(s * dy, axis=1, keepdims=True)
    out[:, 2:3] += jnp.sum(s * dz, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j"))
def pairwise_acc_pallas(pos, mass, g, g_soft, *, tile_i=256, tile_j=2048):
    """pos [N, 3], mass [N] -> acc [N, 3].  N must be a multiple of the tile
    sizes (states are capacity-padded; pad sources with m=0)."""
    n = pos.shape[0]
    dtype = pos.dtype
    # shrink tiles to the largest power-of-two divisor of n (capacities are
    # always multiples of 128, so 128 always works)
    while tile_i > 128 and n % tile_i:
        tile_i //= 2
    while tile_j > 128 and n % tile_j:
        tile_j //= 2
    tile_i = min(tile_i, n)
    tile_j = min(tile_j, n)
    assert n % tile_i == 0 and n % tile_j == 0, (n, tile_i, tile_j)

    col = lambda a: a.reshape(n, 1)
    row = lambda a: a.reshape(1, n)
    x, y, z = pos[:, 0], pos[:, 1], pos[:, 2]
    scal = jnp.broadcast_to(g_soft * g_soft, (1, 128)).astype(dtype)

    kernel = functools.partial(_kernel, tile_i=tile_i, tile_j=tile_j)
    grid = (n // tile_i, n // tile_j)
    out = pl.pallas_call(
        kernel,
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
        out_shape=jax.ShapeDtypeStruct((n, 8), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(n) * int(n) * 18,
            bytes_accessed=int(n) * 4 * 4 + int(n) * 8 * 4,
            transcendentals=int(n) * int(n),
        ),
    )(scal, col(x), col(y), col(z), row(x), row(y), row(z), row(mass))
    return out[:, :3] * g


def _force(pos, mass, params: SimParams):
    return pairwise_acc_pallas(pos, mass, params.g, params.g_soft)


register(
    Engine(
        name="brute-pallas",
        force=_force,
        description="O(N^2) direct sum, Pallas VMEM-tiled kernel "
        "(replaces reference src/manual/brute_force.rs:64-82)",
    )
)


# ---------------------------------------------------------------------------
# MXU formulation: push the per-pair arithmetic onto the systolic array.
#
#   r^2_ij = |p_i - c|^2 + |p_j - c|^2 - 2 (p_i - c).(p_j - c) + eps^2
#   a_i    = G * ( sum_j s_ij (p_j - c)  -  (p_i - c) sum_j s_ij )
#
# The cross term and the accumulation are matmuls (K=3 and K=TILE_J); the
# VPU only assembles r^2 and the interaction weight (~9 ops/pair vs ~20 in
# the direct kernel).  Recentring on the i-tile's first point keeps the
# norm-trick's cancellation error tiny for close pairs (the center drops out
# of the final difference exactly).
# ---------------------------------------------------------------------------


def _kernel_mxu(scal_ref, pi4, pjT, pj4, out, *, tile_i, tile_j):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out[:] = jnp.zeros_like(out)

    eps2 = scal_ref[0, 0]
    cx = pi4[0, 0]
    cy = pi4[0, 1]
    cz = pi4[0, 2]

    # recentred i-tile coordinates [TI, 3]
    pic = jnp.stack(
        [pi4[:, 0] - cx, pi4[:, 1] - cy, pi4[:, 2] - cz], axis=1
    )
    n2i = jnp.sum(pic * pic, axis=1, keepdims=True)  # [TI, 1]

    # recentred j-tile, transposed view [3, TJ] + mass row
    pjx = pjT[0:1, :] - cx
    pjy = pjT[1:2, :] - cy
    pjz = pjT[2:3, :] - cz
    mj = pjT[3:4, :]
    pjc = jnp.concatenate([pjx, pjy, pjz], axis=0)  # [3, TJ]
    n2j = pjx * pjx + pjy * pjy + pjz * pjz  # [1, TJ]

    cross = jnp.dot(pic, pjc, preferred_element_type=pi4.dtype)  # MXU [TI,TJ]
    r2 = n2i + n2j - 2.0 * cross + eps2

    rows = i * tile_i + jax.lax.broadcasted_iota(jnp.int32, (tile_i, tile_j), 0)
    cols = j * tile_j + jax.lax.broadcasted_iota(jnp.int32, (tile_i, tile_j), 1)
    skip = (rows == cols) | (r2 <= 0.0)
    inv_r = jax.lax.rsqrt(jnp.where(skip, 1.0, r2))
    s = jnp.where(skip, 0.0, inv_r * inv_r * inv_r * mj)

    # recentred accumulation [TI, 4]: (sum s*pjc, sum s)
    pj4c = pj4[:] - jnp.concatenate(
        [jnp.full((tile_j, 1), cx, pj4.dtype),
         jnp.full((tile_j, 1), cy, pj4.dtype),
         jnp.full((tile_j, 1), cz, pj4.dtype),
         jnp.zeros((tile_j, 1), pj4.dtype)], axis=1
    )
    A = jnp.dot(s, pj4c, preferred_element_type=pi4.dtype)  # MXU [TI, 4]
    out[:, 0:3] += A[:, 0:3] - pic * A[:, 3:4]


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def pairwise_acc_pallas_mxu(pos, mass, g, g_soft, *, tile_i=512, tile_j=1024,
                            interpret=False):
    """MXU-heavy all-pairs kernel; same semantics as pairwise_acc_pallas."""
    n = pos.shape[0]
    dtype = pos.dtype
    while tile_i > 128 and n % tile_i:
        tile_i //= 2
    while tile_j > 128 and n % tile_j:
        tile_j //= 2
    tile_i = min(tile_i, n)
    tile_j = min(tile_j, n)

    ones = jnp.ones((n, 1), dtype)
    p4 = jnp.concatenate([pos, ones], axis=1)  # [N, 4] (x, y, z, 1)
    pT = jnp.concatenate([pos, mass[:, None]], axis=1).T  # [4, N] (x,y,z,m)
    scal = jnp.broadcast_to(g_soft * g_soft, (1, 128)).astype(dtype)

    kernel = functools.partial(_kernel_mxu, tile_i=tile_i, tile_j=tile_j)
    out = pl.pallas_call(
        kernel,
        grid=(n // tile_i, n // tile_j),
        in_specs=[
            pl.BlockSpec((1, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tile_j), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_j, 4), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
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
    )(scal, p4, pT, p4)
    return out[:, :3] * g


register(
    Engine(
        name="brute-pallas-mxu",
        force=lambda pos, mass, params: pairwise_acc_pallas_mxu(
            pos, mass, params.g, params.g_soft
        ),
        description="O(N^2) direct sum, MXU-formulated Pallas kernel "
        "(norm-trick r^2 + matmul accumulation)",
    )
)
