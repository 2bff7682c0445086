"""Core simulation state: SoA particle arrays, physics parameters, box bounds.

Replaces the reference's AoS particle vector and settings structs
(``PointParticle`` reference src/shared.rs:151-204, ``SimulationSettings``
src/shared.rs:61-78, ``Bounds`` src/shared.rs:215-273) with JAX pytrees of
fixed-capacity arrays.

The single biggest semantic translation from the reference: the reference
*deletes* particles that leave the domain box each step
(``points.retain(|p| bounds.contains(p.position()))``, reference
src/manual/brute_force.rs:86).  Deletion implies dynamic shapes, which XLA
cannot compile efficiently; instead every state carries a fixed capacity and a
boolean ``alive`` mask.  Dead particles have their *effective* mass zeroed so
they exert no force, are frozen in place, and are excluded from all
diagnostics — observationally identical to deletion.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Bounds
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Bounds:
    """Cubic axis-aligned box (reference ``Bounds``, src/shared.rs:215-273).

    ``center`` is a length-D vector; ``half_width`` a scalar.  Containment is
    inclusive on both faces, matching the reference's
    ``position >= min && position <= max`` (src/shared.rs:210-213).
    """

    center: jax.Array  # [D]
    half_width: jax.Array  # scalar

    @staticmethod
    def cube(center, width, dtype=jnp.float32) -> "Bounds":
        center = jnp.asarray(center, dtype=dtype)
        half = jnp.asarray(width, dtype=dtype) * jnp.asarray(0.5, dtype=dtype)
        return Bounds(center=center, half_width=half)

    @property
    def width(self) -> jax.Array:
        return self.half_width * 2

    @property
    def min(self) -> jax.Array:
        return self.center - self.half_width

    @property
    def max(self) -> jax.Array:
        return self.center + self.half_width

    def contains(self, pos: jax.Array) -> jax.Array:
        """pos: [..., D] -> bool [...]. Inclusive on both faces."""
        lo = pos >= self.min
        hi = pos <= self.max
        return jnp.all(lo & hi, axis=-1)

    def normalize(self, pos: jax.Array) -> jax.Array:
        """Map positions into [0, 1)^D relative to the box (for Morton codes)."""
        return (pos - self.min) / self.width

    def centered(self) -> "Bounds":
        """The same box translated to the origin (grid frame).  The BH accel
        entry points compute in this frame — every f32 accumulation is then
        bounded by the domain half-width, not |center| (ADVICE r2 #1)."""
        return Bounds(center=jnp.zeros_like(self.center),
                      half_width=self.half_width)


# ---------------------------------------------------------------------------
# Physics parameters
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SimParams:
    """Runtime physics parameters (reference ``SimulationSettings``,
    src/shared.rs:61-78, defaults src/shared.rs:69-78).

    All fields are traced scalars/vectors, so changing them (e.g. from a live
    UI slider, reference src/vis.rs:130-199) never retriggers compilation.
    """

    g: jax.Array  # gravitational constant, default 1.0
    g_soft: jax.Array  # Plummer softening length epsilon, default 0.0
    dt: jax.Array  # timestep, default 1e-3
    theta2: jax.Array  # Barnes-Hut opening angle squared, default 0.5
    bounds: Bounds

    @staticmethod
    def create(
        g=1.0,
        g_soft=0.0,
        dt=1e-3,
        theta2=0.5,
        bounds_center=(0.0, 0.0, 0.0),
        bounds_width=10.0,
        dtype=jnp.float32,
    ) -> "SimParams":
        f = lambda x: jnp.asarray(x, dtype=dtype)
        return SimParams(
            g=f(g),
            g_soft=f(g_soft),
            dt=f(dt),
            theta2=f(theta2),
            bounds=Bounds.cube(bounds_center, bounds_width, dtype=dtype),
        )

    def replace(self, **kw) -> "SimParams":
        if "bounds_center" in kw or "bounds_width" in kw:
            center = kw.pop("bounds_center", self.bounds.center)
            width = kw.pop("bounds_width", self.bounds.width)
            kw["bounds"] = Bounds.cube(center, width, dtype=self.dt.dtype)
        clean = {}
        for k, v in kw.items():
            if k == "bounds":
                clean[k] = v
            else:
                clean[k] = jnp.asarray(v, dtype=getattr(self, k).dtype)
        return dataclasses.replace(self, **clean)


# ---------------------------------------------------------------------------
# Particle state
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ParticleState:
    """SoA particle arrays with fixed capacity and an alive mask.

    Mirrors the data carried by the reference's ``Vec<PointParticle>``
    (position/velocity/acceleration/mass, src/shared.rs:151-158) plus the
    simulation clock (``elapsed``, src/shared.rs:94).
    """

    pos: jax.Array  # [cap, D]
    vel: jax.Array  # [cap, D]
    acc: jax.Array  # [cap, D]
    mass: jax.Array  # [cap]
    alive: jax.Array  # [cap] bool
    time: jax.Array  # scalar

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]

    @property
    def dim(self) -> int:
        return self.pos.shape[1]

    @property
    def dtype(self):
        return self.pos.dtype

    def n_alive(self) -> jax.Array:
        return jnp.sum(self.alive)

    def effective_mass(self) -> jax.Array:
        """Mass with dead particles zeroed — the only mass force engines see."""
        return jnp.where(self.alive, self.mass, jnp.zeros_like(self.mass))

    @staticmethod
    def create(
        pos,
        vel,
        mass,
        *,
        capacity: int | None = None,
        pad_multiple: int = 128,
        dtype=jnp.float32,
        time=0.0,
    ) -> "ParticleState":
        """Build a state from [N, D] arrays, padding capacity to a lane-friendly
        multiple (TPU lanes are 128 wide) with dead particles.

        Padding slots get zero mass, ``alive=False``, and positions parked at
        the origin; they are invisible to the dynamics.
        """
        pos = np.asarray(pos, dtype=np.float64)
        vel = np.asarray(vel, dtype=np.float64)
        mass = np.asarray(mass, dtype=np.float64)
        n, d = pos.shape
        if capacity is None:
            capacity = max(_round_up(n, pad_multiple), pad_multiple)
        if capacity < n:
            raise ValueError(f"capacity {capacity} < n {n}")

        def pad2(a):
            out = np.zeros((capacity, d), dtype=np.float64)
            out[:n] = a
            return jnp.asarray(out, dtype=dtype)

        m = np.zeros((capacity,), dtype=np.float64)
        m[:n] = mass
        alive = np.zeros((capacity,), dtype=bool)
        alive[:n] = True
        return ParticleState(
            pos=pad2(pos),
            vel=pad2(vel),
            acc=jnp.zeros((capacity, d), dtype=dtype),
            mass=jnp.asarray(m, dtype=dtype),
            alive=jnp.asarray(alive),
            time=jnp.asarray(time, dtype=dtype),
        )

    # -- host-side particle management (reference add_point/remove_point,
    #    src/shared.rs:91-92). These run outside jit and return new states of
    #    IDENTICAL shape, so compiled step functions stay cached.

    def add_point(self, pos, vel, mass) -> "ParticleState":
        """Occupy the first dead slot (errors if the state is full)."""
        alive = np.asarray(self.alive)
        free = np.nonzero(~alive)[0]
        if len(free) == 0:
            raise ValueError(
                "state is at capacity; rebuild with a larger capacity to add points"
            )
        i = int(free[0])
        return ParticleState(
            pos=self.pos.at[i].set(jnp.asarray(pos, dtype=self.dtype)),
            vel=self.vel.at[i].set(jnp.asarray(vel, dtype=self.dtype)),
            acc=self.acc.at[i].set(0),
            mass=self.mass.at[i].set(jnp.asarray(mass, dtype=self.dtype)),
            alive=self.alive.at[i].set(True),
            time=self.time,
        )

    def remove_point(self, index: int) -> "ParticleState":
        """Kill the index-th *alive* particle (reference ``remove_point`` is a
        swap_remove by index, src/shared.rs:92 — with masks, clearing the bit
        is equivalent)."""
        alive_idx = np.nonzero(np.asarray(self.alive))[0]
        i = int(alive_idx[index])
        return dataclasses.replace(
            self, alive=self.alive.at[i].set(False), mass=self.mass.at[i].set(0)
        )

    def get_points(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Return (pos, vel, acc, mass) of alive particles as numpy arrays —
        the analog of ``get_points() -> &Vec<P>`` (src/shared.rs:93)."""
        alive = np.asarray(self.alive)
        return (
            np.asarray(self.pos)[alive],
            np.asarray(self.vel)[alive],
            np.asarray(self.acc)[alive],
            np.asarray(self.mass)[alive],
        )
