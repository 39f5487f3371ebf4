from . import camera, color, rng
