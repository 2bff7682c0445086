from nbody_tpu.core.state import ParticleState, SimParams, Bounds

__all__ = ["ParticleState", "SimParams", "Bounds"]
