from nbody_tpu.vis.server import run, VisServer

__all__ = ["run", "VisServer"]
