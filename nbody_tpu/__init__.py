"""nbody_tpu — a TPU-native gravitational N-body engine (JAX / XLA / Pallas / pjit).

A from-scratch re-design of the capabilities of the reference Rust project
``alxn3/nbody-llm`` (see SURVEY.md): softened Newtonian gravity integrated with
a drift-kick-drift leapfrog inside an open box, with interchangeable force
engines (O(N^2) direct sum and Barnes-Hut octrees), a self-gravitating-disc
benchmark scene, an energy-diagnostic + perf-CSV benchmark harness, multi-chip
particle sharding over a `jax.sharding.Mesh`, and a host-side visualizer.

Design stance (reference -> TPU):
  * AoS ``Vec<PointParticle>`` (reference src/shared.rs:151-204) becomes an SoA
    ``ParticleState`` pytree of fixed-capacity arrays with an ``alive`` mask.
  * ``points.retain(in bounds)`` open-boundary deletion (reference
    src/manual/brute_force.rs:86) becomes mask clearing — shapes stay static.
  * rayon ``par_iter`` force loops become fused XLA programs and Pallas
    kernels; pointer octrees become Morton-sorted linear octrees with
    vectorized theta-acceptance traversal.
  * multi-thread scaling (``-t`` flag) becomes multi-chip particle sharding
    with per-step ICI collectives.
"""

from nbody_tpu.core.state import ParticleState, SimParams, Bounds
from nbody_tpu.core.integrators import get_integrator, LEAPFROG, EULER, INTEGRATORS
from nbody_tpu.core.stepper import make_step, make_run
from nbody_tpu.core.energy import total_energy, kinetic_energy, potential_energy
from nbody_tpu.api import Simulation
from nbody_tpu.engines import get_engine, ENGINES

__version__ = "0.1.0"

__all__ = [
    "ParticleState",
    "SimParams",
    "Bounds",
    "Simulation",
    "make_step",
    "make_run",
    "get_engine",
    "get_integrator",
    "ENGINES",
    "INTEGRATORS",
    "LEAPFROG",
    "EULER",
    "total_energy",
    "kinetic_energy",
    "potential_energy",
    "__version__",
]
