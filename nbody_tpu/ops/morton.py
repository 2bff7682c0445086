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
MAX_LEVEL_2D = 15  # 30-bit codes in uint32


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


def _spread2(v):
    """Spread the low 15 bits of v so bit i lands at bit 2i (uint32)."""
    v = v & jnp.uint32(0x7FFF)
    v = (v | (v << 8)) & jnp.uint32(0x00FF00FF)
    v = (v | (v << 4)) & jnp.uint32(0x0F0F0F0F)
    v = (v | (v << 2)) & jnp.uint32(0x33333333)
    v = (v | (v << 1)) & jnp.uint32(0x55555555)
    return v


def _squash2(v):
    v = v & jnp.uint32(0x55555555)
    v = (v | (v >> 1)) & jnp.uint32(0x33333333)
    v = (v | (v >> 2)) & jnp.uint32(0x0F0F0F0F)
    v = (v | (v >> 4)) & jnp.uint32(0x00FF00FF)
    v = (v | (v >> 8)) & jnp.uint32(0x0000FFFF)
    return v


def encode2(ix, iy):
    """Interleave two integer grids (each < 2^15) into Morton codes."""
    return _spread2(ix.astype(jnp.uint32)) | (_spread2(iy.astype(jnp.uint32)) << 1)


def decode2(code):
    code = code.astype(jnp.uint32)
    return _squash2(code), _squash2(code >> 1)


def quantize(pos, bounds, level):
    """Positions [..., D] -> D integer grids at ``level`` (2^level per axis),
    clamped into the box (out-of-box/dead particles land on the boundary
    cell; callers must rely on their zero mass, not their cell)."""
    n = 1 << level
    u = bounds.normalize(pos)  # [N, D] in [0,1) for in-box points
    i = jnp.clip((u * n).astype(jnp.int32), 0, n - 1)
    return tuple(i[..., d] for d in range(pos.shape[-1]))


def cell_codes(pos, bounds, level):
    """Positions [..., D] -> level-``level`` Morton cell ids, int32 in
    [0, (2^D)^level)."""
    axes = quantize(pos, bounds, level)
    if len(axes) == 3:
        return encode3(*axes).astype(jnp.int32)
    if len(axes) == 2:
        return encode2(*axes).astype(jnp.int32)
    raise ValueError(f"unsupported dimension {len(axes)}")


def cell_centers_from_codes(codes, bounds, level, dim: int = 3):
    """Cell ids (level ``level``) -> geometric centers [N, dim]."""
    if dim == 3:
        axes = decode3(codes.astype(jnp.uint32))
    elif dim == 2:
        axes = decode2(codes.astype(jnp.uint32))
    else:
        raise ValueError(f"unsupported dimension {dim}")
    n = 1 << level
    w = bounds.width / n
    lo = bounds.min
    f = lambda i, d: lo[d] + (i.astype(w.dtype) + 0.5) * w
    return jnp.stack([f(a, d) for d, a in enumerate(axes)], axis=-1)
