"""Brute-force O(N^2) direct-sum gravity.

Reference: ``manual::BruteForceSimulation::update_forces``
(src/manual/brute_force.rs:64-82) — a *serial* symmetric pair loop computing

    r      = p_i - p_j
    r_dist = sqrt(|r|^2 + eps^2)
    a_i   -= r * (G / r_dist^3) * m_j        (and + for a_j, Newton's 3rd law)

TPU re-design: no pair loop.  The accumulation over sources j is a matrix
product, which puts the dominant FLOPs on the MXU:

    a_i = G * ( (S @ [P | 1])[:, :D]  -  p_i * (S @ [P | 1])[:, D] )
    S_ij = m_j / (|p_i - p_j|^2 + eps^2)^{3/2},   S_ii = 0

Three variants:
  * ``force_dense``  — materializes the full [N, N] S (testing, small N).
  * ``force_tiled``  — row-tiles S under ``lax.map`` so memory is O(tile*N);
                       each tile contracts against all sources with one
                       [tile, N] @ [N, D+1] matmul.  Works at any N.
  * the Pallas kernel in ``nbody_tpu.ops.pairwise`` (engine name
    ``brute-pallas``) — VMEM-staged tiles, the benchmark kernel.

All variants treat dead particles correctly for free: their effective mass is
zero, so their column of S vanishes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from nbody_tpu.core.state import SimParams
from nbody_tpu.engines import Engine, register


def _pairwise_s(pos_rows, pos_cols, mass_cols, g_soft, row_ids, col_ids):
    """S block: S_ij = m_j * (|p_i - p_j|^2 + eps^2)^(-3/2), diagonal zeroed.

    Exactly-coincident pairs at eps=0 are skipped (zero weight) rather than
    producing inf — mirroring the reference LLM engine's r^2 < 1e-10 skip
    (src/llm/barnes_hut.rs:819); this also makes dead/padding particles
    parked at the origin harmless."""
    d = pos_rows[:, None, :] - pos_cols[None, :, :]  # [T, C, D]
    r2 = jnp.sum(d * d, axis=-1) + g_soft * g_soft  # [T, C]
    skip = (row_ids[:, None] == col_ids[None, :]) | (r2 <= 0.0)
    inv_r = jax.lax.rsqrt(jnp.where(skip, 1.0, r2))
    w = inv_r * inv_r * inv_r
    s = w * mass_cols[None, :]
    return jnp.where(skip, 0.0, s)


def _accumulate(s, pos_cols, pos_rows, g):
    """a = G * (S @ [P|1] -> split) — the MXU-friendly contraction.

    precision=HIGHEST forces true-f32 MXU passes: the TPU default (bf16
    multiplies) loses ~3 decimal digits, which measured at ~4% relative force
    error on close encounters — far outside the energy-drift budget."""
    ones = jnp.ones((pos_cols.shape[0], 1), dtype=pos_cols.dtype)
    p1 = jnp.concatenate([pos_cols, ones], axis=-1)  # [C, D+1]
    out = jnp.dot(
        s, p1,
        preferred_element_type=pos_cols.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )  # [T, D+1]
    d = pos_cols.shape[1]
    return g * (out[:, :d] - pos_rows * out[:, d:])


def force_dense(pos, mass, params: SimParams):
    n = pos.shape[0]
    ids = jnp.arange(n)
    # grid frame: the _accumulate contraction computes S@P - p_i*S@1, which
    # cancels ~|p|/separation digits — for a scene at |center| ~ 2^13 that
    # is ~4 f32 digits of the force (measured 9e-3 median relative error).
    # Acceleration is translation-invariant; recenter on the bounds.
    pos = pos - params.bounds.center
    s = _pairwise_s(pos, pos, mass, params.g_soft, ids, ids)
    return _accumulate(s, pos, pos, params.g)


@partial(jax.jit, static_argnames=("tile",))
def force_tiled(pos, mass, params: SimParams, tile: int = 1024):
    n = pos.shape[0]
    if n % tile != 0:
        # capacity is always padded to a multiple of 128 (state.create);
        # fall back to a tile that divides it.
        tile = 128
    pos = pos - params.bounds.center  # grid frame (see force_dense)
    ids = jnp.arange(n)
    pos_t = pos.reshape(n // tile, tile, -1)
    ids_t = ids.reshape(n // tile, tile)

    def body(args):
        pt, it = args
        s = _pairwise_s(pt, pos, mass, params.g_soft, it, ids)
        return _accumulate(s, pos, pt, params.g)

    acc = jax.lax.map(body, (pos_t, ids_t))
    return acc.reshape(n, -1)


register(
    Engine(
        name="brute",
        force=lambda pos, mass, params: force_tiled(pos, mass, params),
        description="O(N^2) direct sum, row-tiled matmul accumulation "
        "(reference src/manual/brute_force.rs:64-82)",
    )
)

register(
    Engine(
        name="brute-dense",
        force=force_dense,
        description="O(N^2) direct sum, fully materialized (small N / testing)",
    )
)
