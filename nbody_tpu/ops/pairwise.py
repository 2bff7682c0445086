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
