from nbody_tpu.scenes.disc import self_gravitating_disc
from nbody_tpu.scenes.extras import plummer_sphere, uniform_cube

SCENES = {
    "disc": self_gravitating_disc,
    "plummer": plummer_sphere,
    "cube": uniform_cube,
}

__all__ = ["self_gravitating_disc", "plummer_sphere", "uniform_cube", "SCENES"]
