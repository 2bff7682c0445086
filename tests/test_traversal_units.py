"""White-box units for the traversal building blocks."""

import jax.numpy as jnp
import numpy as np

from nbody_tpu.ops.traversal import _compact


def test_compact_order_preserving():
    ids = jnp.arange(100, dtype=jnp.int32) * 3
    keep = (jnp.arange(100) % 7) == 0  # 15 kept
    out, valid, dropped = _compact(ids, keep, 32)
    got = np.asarray(out)[np.asarray(valid)]
    want = np.asarray(ids)[np.asarray(keep)]
    np.testing.assert_array_equal(got, want)
    assert int(dropped) == 0


def test_compact_overflow_counts():
    ids = jnp.arange(64, dtype=jnp.int32)
    keep = jnp.ones(64, bool)
    out, valid, dropped = _compact(ids, keep, 16)
    assert int(dropped) == 48
    np.testing.assert_array_equal(np.asarray(out), np.arange(16))
    assert bool(np.asarray(valid).all())


def test_compact_empty():
    ids = jnp.arange(8, dtype=jnp.int32)
    keep = jnp.zeros(8, bool)
    out, valid, dropped = _compact(ids, keep, 4)
    assert int(dropped) == 0
    assert not np.asarray(valid).any()
