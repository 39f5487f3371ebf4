"""Multi-chip parallelism over a jax device mesh (ICI collectives).

The reference is a single-GPU renderer (SURVEY.md section 2.8); these axes are
new, TPU-first design: tile-parallel (shard pixels), sample-parallel (shard
spp / ray batches), and replicated scene+BVH. Collectives ride ICI via XLA
(psum for histograms/exposure, automatic resharding for halo reads). The
multi-host layer adds a ("host", "tile") mesh whose outer axis crosses DCN:
host-major row sharding keeps filter halos on ICI, and scene distribution is
a one-to-all broadcast from the baking host.
"""
from .mesh import (collective_summary, compile_frame_sharded,
                   distribute_scene, frame_state_sharding, init_distributed,
                   make_mesh, make_multihost_mesh, render_frame_multihost,
                   render_frame_sharded, shard_rays_pt)

__all__ = ["make_mesh", "frame_state_sharding", "render_frame_sharded",
           "shard_rays_pt", "make_multihost_mesh", "render_frame_multihost",
           "distribute_scene", "init_distributed", "compile_frame_sharded",
           "collective_summary"]
