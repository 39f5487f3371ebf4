"""kajiya-tpu: a TPU-native real-time global-illumination renderer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
EmbarkStudios/kajiya (Rust + Vulkan + HLSL). The Vulkan render graph becomes a
jitted pass-DAG over a pytree of persistent arrays; hardware ray tracing
becomes a software wavefront tracer over a flattened BVH; HLSL kernels become
JAX/Pallas ops.

Layer map (mirrors SURVEY.md section 1, re-designed TPU-first):
  core/       -- camera math, RNG, color, frame state pytree      (~ kajiya-rg types)
  scene/      -- glTF import, mesh packing, RON scenes, materials (~ kajiya-asset)
  rt/         -- BVH build/refit + traversal kernels              (~ vulkan/ray_tracing.rs)
  brdf/       -- GGX/layered BRDF, sampling, SH                   (~ assets/shaders/inc/brdf*.hlsl)
  sky/        -- procedural atmosphere                            (~ assets/shaders/inc/atmosphere.hlsl)
  renderers/  -- per-feature passes: gbuffer, shadows, rtdgi, rtr,
                 ircache, ssgi, taa, post, reference PT           (~ kajiya/src/renderers/)
  parallel/   -- device-mesh sharding of tiles/spp over ICI       (new; no reference analog)
  world.py    -- WorldRenderer equivalent                         (~ kajiya/src/world_renderer.rs)
  frame.py    -- full-frame pass DAG                              (~ world_render_passes.rs)
"""

__version__ = "0.1.0"
