"""Device mesh helpers.

The reference's only scaling knob is a thread count (``-t`` sizing a rayon
pool, src/main.rs:46-50).  The TPU-native analog is a 1-D device mesh over
which particles are sharded; XLA collectives over ICI replace shared memory
(SURVEY.md §2.5)."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


PARTICLE_AXIS = "p"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n_devices]), (PARTICLE_AXIS,))
