from nbody_tpu.scenes.disc import self_gravitating_disc
from nbody_tpu.scenes.extras import (disc_bulge, hernquist_sphere,
                                     plummer_sphere, uniform_cube)

SCENES = {
    "disc": self_gravitating_disc,
    "plummer": plummer_sphere,
    "cube": uniform_cube,
    "hernquist": hernquist_sphere,
    "disc-bulge": disc_bulge,
}

__all__ = ["self_gravitating_disc", "plummer_sphere", "uniform_cube",
           "hernquist_sphere", "disc_bulge", "SCENES"]
