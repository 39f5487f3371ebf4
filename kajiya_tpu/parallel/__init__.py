"""Multi-chip parallelism over a jax device mesh (ICI collectives).

The reference is a single-GPU renderer (SURVEY.md section 2.8); these axes are
new, TPU-first design: tile-parallel (shard pixels), sample-parallel (shard
spp / ray batches), and replicated scene+BVH. Collectives ride ICI via XLA
(psum for histograms/exposure, automatic resharding for halo reads).
"""
from .mesh import (frame_state_sharding, make_mesh, render_frame_sharded,
                   shard_rays_pt)

__all__ = ["make_mesh", "frame_state_sharding", "render_frame_sharded",
           "shard_rays_pt"]
