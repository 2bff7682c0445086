"""Morton encoding invariants."""

import jax.numpy as jnp
import numpy as np

from nbody_tpu.core.state import Bounds
from nbody_tpu.ops import morton


def test_roundtrip(rng):
    n = 1000
    ix = jnp.asarray(rng.integers(0, 1024, n), jnp.uint32)
    iy = jnp.asarray(rng.integers(0, 1024, n), jnp.uint32)
    iz = jnp.asarray(rng.integers(0, 1024, n), jnp.uint32)
    code = morton.encode3(ix, iy, iz)
    jx, jy, jz = morton.decode3(code)
    np.testing.assert_array_equal(np.asarray(jx), np.asarray(ix))
    np.testing.assert_array_equal(np.asarray(jy), np.asarray(iy))
    np.testing.assert_array_equal(np.asarray(jz), np.asarray(iz))


def test_orthant_bit_convention():
    """Child index within parent = x|y<<1|z<<2, matching the reference
    get_orthant bit packing (src/shared.rs:245-254)."""
    # cell (1,0,0) at level 1 -> code 1; (0,1,0) -> 2; (0,0,1) -> 4
    c = morton.encode3(*[jnp.asarray([a], jnp.uint32) for a in (1, 0, 0)])
    assert int(c[0]) == 1
    c = morton.encode3(*[jnp.asarray([a], jnp.uint32) for a in (0, 1, 0)])
    assert int(c[0]) == 2
    c = morton.encode3(*[jnp.asarray([a], jnp.uint32) for a in (0, 0, 1)])
    assert int(c[0]) == 4


def test_parent_child_nesting(rng):
    """Level-(l+1) code >> 3 == level-l code for the same point."""
    b = Bounds.cube([0.0, 0.0, 0.0], 10.0, dtype=jnp.float64)
    pos = jnp.asarray(rng.uniform(-5, 5, size=(500, 3)))
    for l in range(1, 7):
        fine = morton.cell_codes(pos, b, l)
        coarse = morton.cell_codes(pos, b, l - 1)
        np.testing.assert_array_equal(np.asarray(fine >> 3), np.asarray(coarse))


def test_cell_centers(rng):
    """A point's cell center is within half a cell width of the point."""
    b = Bounds.cube([1.0, -2.0, 0.5], 8.0, dtype=jnp.float64)
    pos = jnp.asarray(rng.uniform(-3, 3, size=(200, 3)) + np.array([1.0, -2.0, 0.5]))
    for l in (2, 5):
        codes = morton.cell_codes(pos, b, l)
        centers = morton.cell_centers_from_codes(codes, b, l)
        half = 8.0 / (1 << l) / 2
        assert float(jnp.max(jnp.abs(centers - pos))) <= half + 1e-12
