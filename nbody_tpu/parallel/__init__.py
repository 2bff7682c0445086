from nbody_tpu.parallel.mesh import make_mesh
from nbody_tpu.parallel.sharded import ShardedSimulation, make_sharded_step

__all__ = ["make_mesh", "ShardedSimulation", "make_sharded_step"]
