"""Vectorized Morton (Z-order) encoding on integer grids.

Replaces the reference's per-particle Morton path (normalize to u32,
src/llm/barnes_hut.rs:283-297, then the `morton_encoding` crate,
src/llm/barnes_hut.rs:299-327) with branch-free bit interleaving over whole
arrays — pure VPU work under XLA.

Bit convention matches the reference orthant layout (``get_orthant`` packs
axis d into bit d, src/shared.rs:245-254): a cell id at level l is the
interleaved code ``x | y<<1 | z<<2`` per level, so

    child_id = parent_id * 8 + orthant
    parent_id = child_id >> 3

and level-l ids of a dense pyramid are contiguous ranges with 8 children per
parent — the property the level-wise tree build relies on.
"""

from __future__ import annotations

import jax.numpy as jnp

MAX_LEVEL_3D = 10  # 30-bit codes in uint32


def _spread3(v):
    """Spread the low 10 bits of v so bit i lands at bit 3i (uint32)."""
    v = v & jnp.uint32(0x3FF)
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def _squash3(v):
    """Inverse of _spread3: collect every 3rd bit into the low 10 bits."""
    v = v & jnp.uint32(0x09249249)
    v = (v | (v >> 2)) & jnp.uint32(0x030C30C3)
    v = (v | (v >> 4)) & jnp.uint32(0x0300F00F)
    v = (v | (v >> 8)) & jnp.uint32(0x030000FF)
    v = (v | (v >> 16)) & jnp.uint32(0x000003FF)
    return v


def encode3(ix, iy, iz):
    """Interleave three integer grids (each < 2^10) into Morton codes."""
    ix = ix.astype(jnp.uint32)
    iy = iy.astype(jnp.uint32)
    iz = iz.astype(jnp.uint32)
    return _spread3(ix) | (_spread3(iy) << 1) | (_spread3(iz) << 2)


def decode3(code):
    """Morton codes -> (ix, iy, iz)."""
    code = code.astype(jnp.uint32)
    return _squash3(code), _squash3(code >> 1), _squash3(code >> 2)


def quantize(pos, bounds, level):
    """Positions -> integer grid coords at ``level`` (grid 2^level per axis),
    clamped into the box (out-of-box/dead particles land on the boundary
    cell; callers must rely on their zero mass, not their cell)."""
    n = 1 << level
    u = bounds.normalize(pos)  # [N, 3] in [0,1) for in-box points
    i = jnp.clip((u * n).astype(jnp.int32), 0, n - 1)
    return i[..., 0], i[..., 1], i[..., 2]


def cell_codes(pos, bounds, level):
    """Positions -> level-``level`` Morton cell ids, int32 in [0, 8^level)."""
    ix, iy, iz = quantize(pos, bounds, level)
    return encode3(ix, iy, iz).astype(jnp.int32)


def cell_centers_from_codes(codes, bounds, level):
    """Cell ids (level ``level``) -> geometric centers [N, 3]."""
    ix, iy, iz = decode3(codes.astype(jnp.uint32))
    n = 1 << level
    w = bounds.width / n
    lo = bounds.min
    f = lambda i, d: lo[d] + (i.astype(w.dtype) + 0.5) * w
    return jnp.stack([f(ix, 0), f(iy, 1), f(iz, 2)], axis=-1)
