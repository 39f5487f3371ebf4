from .bvh import Bvh, build_bvh, bvh_from_scene, refit_bvh
from .trace import trace_closest, trace_shadow, Hit
