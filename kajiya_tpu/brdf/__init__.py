from . import ggx, sampling
