"""Frame assembly: the full hybrid-GI pass DAG over an explicit FrameState.

Role of `world_render_passes.rs:13-292` (standard pipeline) and the temporal
resource registry (`kajiya-rg/src/temporal.rs`): where the reference wires
~60 passes through a render graph with named persistent images, the TPU
build threads one explicit pytree of persistent arrays through a single
jitted function:

    state', outputs = render_frame(trace_scene, state, view, cfg)

XLA sees the whole frame at once — pass fusion, scheduling, and memory
aliasing replace the hand-built graph/barrier machinery (SURVEY.md section 5:
"barriers/usage inference disappear"). Ping-pong pairs become functional
array swaps; `DynamicConstants` become traced scalars.

Pass order mirrors the reference DAG: refit BVH -> sky env + convolve ->
gbuffer (primary trace) -> reprojection -> ssao -> shadow trace + denoise ->
rtdgi -> rtr -> light_gbuffer -> taa -> post (exposure, glare, tonemap).
"""
from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp

from .core import img as im
from .core import rng as rng_mod
from .core.camera import ViewConstants
from .core.profiling import pass_scope
from .renderers import deferred, gbuffer, ircache, post, reprojection, rtdgi, rtr, shadows, ssgi, taa
from .renderers.ircache import IrcacheConfig
from .renderers.wrc import WrcConfig
from .sky import env as sky_env_mod
from .world import refresh_trace_scene


@dataclass(frozen=True)
class RenderConfig:
    """Static frame configuration (shapes/flags must be static for jit).
    Mirrors the builder params of `SimpleMainLoop` + `RenderOverrides`."""

    width: int = 1920
    height: int = 1080
    temporal_upsampling: float = 1.0     # output res = render res * this
    near: float = 0.01
    max_trace_steps: int | None = None   # None = run traversal to completion
    sun_soft_shadows: bool = True
    # Primary visibility: "raster" = tile-binned software rasterizer
    # ("raster simple" — the reference rasterizes its gbuffer too,
    # `raster_meshes.rs:28-178`; RT starts at the shadow/GI rays), "trace" =
    # coherent camera-ray trace. Identical gbuffer output (same Woop
    # intersector); raster's exact screen-rect binning replaces the 3D
    # cone cull for primaries — strictly tighter lists, and sky tiles bin
    # to zero blocks where a cone cull cannot.
    primary: str = "raster"
    use_rtdgi: bool = True
    use_rtr: bool = True
    use_ssao: bool = True
    use_taa: bool = True
    use_ircache: bool = True
    ircache_feeds_gi: bool = True   # False: update the cache but keep the
                                    # GI passes on the sky fallback (debug)
    use_restir_gi: bool = True
    use_mesh_light_specular: bool = False   # auto-enabled by Renderer when
                                            # the scene has emissive lights
    # World radiance cache: traced + bound into secondary hit lighting when
    # on. Matches the reference's wired-but-default-off status
    # (`world_render_passes.rs:101-111`).
    use_wrc: bool = False
    wrc: WrcConfig = WrcConfig()
    use_motion_blur: bool = True
    motion_blur_scale: float = 0.5
    # Depth of field: opt-in, mirroring the reference's unwired-by-default
    # status (`world_render_passes.rs:250` is commented out there;
    # `renderers/dof.rs` exists). Enabling inserts coc+gather after motion
    # blur. focus_dist is in view-space units, aperture in CoC px/unit.
    use_dof: bool = False
    dof_focus_dist: float = 2.0
    dof_aperture: float = 4.0
    # Shade secondary (GI/reflection/ircache) hits with interpolated vertex
    # attributes + mip-biased textures, as the reference's gbuffer.rchit
    # does. False trades textured color bleed for ~2x cheaper bounce rays
    # (flat face normal + constant material color); the PT oracle always
    # shades fully, so tests quantify the bias (tests/test_oracle_textured).
    secondary_full_shading: bool = True
    ircache: IrcacheConfig = IrcacheConfig()
    debug_mode: str = "none"             # deferred.DEBUG_MODES
    ev_shift: float = 0.0
    dt: float = 1.0 / 60.0
    # RenderOverrides (rust-shaders-shared/src/render_overrides.rs:1-37)
    force_face_normals: bool = False
    no_normal_maps: bool = False
    no_metal: bool = False
    roughness_scale: float = 1.0

    @property
    def out_width(self):
        return int(round(self.width * self.temporal_upsampling))

    @property
    def out_height(self):
        return int(round(self.height * self.temporal_upsampling))


# 128-entry Halton(2,3) jitter sequence (world_renderer.rs:425-428)
_HALTON = None


def jitter_for_frame(frame_idx, enabled: bool = True):
    """(2,) sub-pixel jitter in [-0.5, 0.5) for TAA."""
    global _HALTON
    if _HALTON is None:
        _HALTON = jnp.asarray(rng_mod.halton23_sequence(128) - 0.5)
    if not enabled:
        return jnp.zeros((2,), jnp.float32)
    return _HALTON[jnp.asarray(frame_idx, jnp.int32) % 128]


def init_frame_state(cfg: RenderConfig):
    """The explicit temporal-resource pytree (~40 named arrays in the
    reference's TemporalRenderGraph; here one checkpointable dict)."""
    h, w = cfg.height, cfg.width
    oh, ow = cfg.out_height, cfg.out_width
    state = {
        "frame_idx": jnp.asarray(0, jnp.int32),
        "prev_depth": jnp.zeros((h, w), jnp.float32),
        "prev_lit": jnp.zeros((h, w, 3), jnp.float32),
    }
    state.update(shadows.init_state(h, w))
    state.update(ssgi.init_state(h, w))
    state.update(rtdgi.init_state(h, w))
    state.update(rtr.init_state(h, w))
    state.update(taa.init_state(oh, ow))
    state.update(post.init_exposure_state())
    if cfg.use_ircache:
        state.update(ircache.init_state(cfg.ircache))
    if cfg.use_rtdgi and cfg.use_restir_gi:
        from .renderers import restir_gi

        state.update(restir_gi.init_state(h, w))
    if cfg.use_wrc:
        from .renderers import wrc as wrc_mod

        state.update(wrc_mod.init_state(cfg.wrc))
    return state


def render_frame(ts, state, view: ViewConstants, cfg: RenderConfig,
                 levels=None, ircache_lookup=None, ibl_env=None):
    """One frame. Returns (new_state, outputs) where outputs carries the
    display image and intermediate buffers for debugging/testing.

    `levels` is the static BVH refit schedule from `build_trace_scene`; when
    given, geometry is re-transformed and the BVH refit in-jit (the per-frame
    'rebuild tlas' pass, `world_renderer.rs:865-911`)."""
    h, w = cfg.height, cfg.width
    frame_idx = state["frame_idx"]
    mts = cfg.max_trace_steps

    if levels is not None:
        with pass_scope("tlas_refit"):
            ts = refresh_trace_scene(ts.gpu, ts.bvh, levels)

    # --- sky + convolve (sky.rs); an IBL env map replaces the procedural
    # atmosphere when provided (ibl.rs:18-85). Gather-free forms: the
    # diffuse term becomes an L2-SH polynomial; the procedural sky is
    # evaluated analytically per direction instead of fetched from a map.
    if ibl_env is not None:
        sky_env = ibl_env
        sky_env_bg = ibl_env
        diffuse_env = sky_env_mod.sh9_irradiance_fn(
            sky_env_mod.project_sh9(ibl_env))
    else:
        from .sky.atmosphere import sky_radiance

        sun_dir = ts.gpu.sun_direction
        sky_env_bg = lambda d: sky_radiance(d, sun_dir)         # noqa: E731
        # secondary rays reconstruct the sky from SH9 of the small env map
        # — the reference's secondary hits fetch the 64x64 sky CUBE, not
        # the analytic atmosphere (rt/gbuffer.rmiss.hlsl), so a smooth
        # reconstruction is parity; per-ray it is ~30 flops instead of a
        # 6-step scattering march (was ~3 ms of the GI wavefront's shade)
        small = sky_env_mod.build_sky_env(sun_dir, res=32)
        sky_sh = sky_env_mod.project_sh9(small)
        sky_env = sky_env_mod.sh9_radiance_fn(sky_sh)
        diffuse_env = sky_env_mod.sh9_irradiance_fn(sky_sh)

    # --- primary visibility ("raster simple")
    with pass_scope("gbuffer"):
        primary = (gbuffer.raster_gbuffer if cfg.primary == "raster"
                   else gbuffer.raytrace_gbuffer)
        gb = primary(ts, view, w, h, max_trace_steps=mts,
                     no_normal_maps=cfg.no_normal_maps)

    # --- render overrides (debug isolation knobs, render_overrides.rs)
    if cfg.force_face_normals:
        gb = dict(gb, normal=gb["geo_normal"])
    if cfg.no_metal:
        gb = dict(gb, metallic=jnp.zeros_like(gb["metallic"]))
    if cfg.roughness_scale != 1.0:
        gb = dict(gb, roughness=jnp.clip(
            gb["roughness"] * cfg.roughness_scale, 1e-3, 1.0))

    # --- reprojection map
    with pass_scope("reprojection"):
        reproj = reprojection.calculate_reprojection_map(
            gb, state["prev_depth"], view, near=cfg.near)

    # --- irradiance cache: allocate from quarter-res surface query points,
    # trace per-entry rays, expose the lookup to every downstream pass
    # (ircache prepare/trace/sum block of the reference DAG)
    ir_state = {k: v for k, v in state.items() if k.startswith("ircache_")}
    if cfg.use_ircache and ircache_lookup is None:
        eye = view.eye_position
        # bounded query budget independent of resolution (the reference's
        # allocation is likewise output-sensitive but budgeted)
        sy = 4
        while (h // sy) * (w // sy) > 32768:
            sy *= 2
        q_pos = gb["pos"]
        q_mask = gb["hit"]
        _s = sy
        while _s > 1:                      # stride via contiguous halving
            q_pos = im.decimate2(q_pos)
            q_mask = im.decimate2(q_mask)
            _s //= 2
        q_pos = q_pos.reshape(-1, 3)
        q_mask = q_mask.reshape(-1)
        with pass_scope("ircache"):
            with pass_scope("alloc"):
                grid0 = ircache.build_grid(ir_state, eye, cfg.ircache)
                ir_state = ircache.allocate(ir_state, grid0, q_pos, q_mask,
                                            eye, frame_idx, cfg.ircache)
            with pass_scope("trace"):
                ir_state = ircache.trace_update(
                    ir_state, ts, sky_env, diffuse_env, eye, frame_idx,
                    cfg.ircache, max_trace_steps=mts,
                    secondary_full_shading=cfg.secondary_full_shading)
            with pass_scope("value_grid"):
                ir_grid = ircache.build_value_grid(
                    ir_state, ircache.build_grid(ir_state, eye, cfg.ircache),
                    cfg.ircache)

        def ircache_lookup(p, n, _st=ir_state, _g=ir_grid, _e=eye):
            return ircache.lookup_irradiance(_st, _g, p, n, _e, diffuse_env,
                                             cfg.ircache)

        if not cfg.ircache_feeds_gi:
            ircache_lookup = None

    # --- ssao
    if cfg.use_ssao:
        with pass_scope("ssao"):
            ao, ssgi_state = ssgi.ssao_pipeline(
                gb, view, frame_idx,
                {"ssao_history": state["ssao_history"]}, reproj,
                near=cfg.near)
    else:
        ao = jnp.ones((h, w), jnp.float32)
        ssgi_state = {"ssao_history": state["ssao_history"]}

    # --- sun shadows + denoise
    if cfg.sun_soft_shadows:
        with pass_scope("shadow_trace"):
            mask = shadows.trace_sun_shadow_mask(ts, gb, frame_idx,
                                                 max_trace_steps=mts)
        with pass_scope("shadow_denoise"):
            shadow, shadow_state = shadows.denoise(
                mask, {"moments": state["moments"],
                       "history_len": state["history_len"]},
                reproj, gb, near=cfg.near)
    else:
        shadow = jnp.ones((h, w), jnp.float32)
        shadow_state = {"moments": state["moments"],
                        "history_len": state["history_len"]}

    # --- shared secondary-ray wavefront. The GI candidate rays (rtdgi),
    # VNDF reflection rays (rtr), and both passes' every-3rd-frame
    # validation re-traces are CONCATENATED into single trace+shade calls,
    # so XLA sees ONE traversal kernel + ONE hit-lighting subgraph instead
    # of four copies (the reference instantiates one RT pipeline per pass —
    # rtdgi.rs:294/322, rtr.rs:133/209 — because hardware TraceRay is free
    # to re-bind; here every instantiation is program size and compile
    # time). Also a runtime win: one big wavefront keeps the Pallas
    # intersector's tiles full.
    restir_state = {k: v for k, v in state.items() if k.startswith("gi_res_")}
    rtr_keys = [k for k in state if k.startswith("rtr_")]
    rtr_state_in = {k: state[k] for k in rtr_keys}
    rtdgi_candidates = None
    gi_invalidity = None

    # --- world radiance cache ('wrc trace' pass): update probes, expose the
    # lookup to secondary hit lighting (off by default, like the reference)
    wrc_state = {}
    wrc_lookup = None
    if cfg.use_wrc:
        from .renderers import wrc as wrc_mod

        wrc_cfg = cfg.wrc
        with pass_scope("wrc"):
            wrc_state = wrc_mod.trace_wrc(
                {"wrc_atlas": state["wrc_atlas"]}, ts, sky_env, diffuse_env,
                frame_idx, wrc_cfg, max_trace_steps=mts)

        def wrc_lookup(p, d, _st=wrc_state, _c=wrc_cfg):
            return wrc_mod.lookup(_st, _c, p, d)

    # screen-space radiance reuse reads a QUARTER-res copy of last frame's
    # lit image: the fetch is a non-local per-ray gather whose device cost
    # drops ~1.7x once the source table is cache-resident (measured
    # tools/micro_gather_table.py: 4.3 ns/row at 2M rows vs 2.5 ns at
    # 130k), and the reused radiance feeds spatially-filtered GI terms
    # where a 4x4 average is invisible. The depth-consistency test gets
    # conservative at quarter res (edge mismatches reject the reuse and
    # fall back to ircache ambient — the safe direction).
    # halve only while the source stays >= ~480 px wide: at production
    # resolutions that is a 4x decimation; tiny test frames keep full res
    # (a 32x24 reuse source would wash the whole image into one blob)
    prev_lit_q, prev_depth_q = state["prev_lit"], state["prev_depth"]
    while prev_lit_q.shape[1] >= 960:
        prev_lit_q = im.downsample_2x(prev_lit_q)
        prev_depth_q = im.downsample_nearest(prev_depth_q)
    shade_kw = dict(
        prev_lit=prev_lit_q, prev_depth=prev_depth_q,
        view=view, ircache_lookup=ircache_lookup, max_trace_steps=mts,
        full_shading=cfg.secondary_full_shading, wrc_lookup=wrc_lookup)
    gb_h = rtdgi.half_gbuffer(gb) if (cfg.use_rtdgi or cfg.use_rtr) else None
    rtr_half = None
    use_gi_restir = cfg.use_rtdgi and cfg.use_restir_gi
    use_rtr_restir = cfg.use_rtr
    if cfg.use_rtdgi or cfg.use_rtr:
        from .renderers.hit_lighting import hit_radiance
        from .rt.trace import scene_trace_closest

        # ---- batched validation of both passes' stored reservoir rays
        if use_gi_restir or use_rtr_restir:
            from .renderers import restir_gi

            def _do_validate(pair):
                rs, rrs = pair
                orgs, dirs = [], []
                ctx_a = ctx_b = None
                if use_gi_restir:
                    oa, da, ctx_a = restir_gi.validation_rays(rs, gb_h)
                    orgs.append(oa)
                    dirs.append(da)
                if use_rtr_restir:
                    ob, db, ctx_b = rtr.validation_rays(rrs, gb)
                    orgs.append(ob)
                    dirs.append(db)
                org = jnp.concatenate(orgs)
                d = jnp.concatenate(dirs)
                hit = scene_trace_closest(ts, org, d, t_min=1e-4,
                                          max_steps=mts, sort=True)
                fresh = hit_radiance(ts, hit, d, sky_env, diffuse_env,
                                     **shade_kw)
                na = orgs[0].shape[0] if use_gi_restir else 0
                new_rs, inv = rs, None
                if use_gi_restir:
                    new_rs, inv = restir_gi.apply_validation(
                        rs, ctx_a, hit.t[:na], fresh[:na])
                new_rrs = rrs
                if use_rtr_restir:
                    new_rrs = rtr.apply_validation(
                        rrs, ctx_b, hit.t[na:], fresh[na:])
                if inv is None:
                    inv = jnp.zeros(gb_h["hit"].shape, jnp.float32)
                return new_rs, inv, new_rrs

            def _no_validate(pair):
                rs, rrs = pair
                return rs, jnp.zeros(gb_h["hit"].shape, jnp.float32), rrs

            with pass_scope("gi_validate"):
                restir_state, gi_invalidity, rtr_res_valid = jax.lax.cond(
                    jnp.asarray(frame_idx, jnp.int32) % 3 == 0,
                    _do_validate, _no_validate,
                    (restir_state, rtr_state_in))
                rtr_state_in = dict(rtr_state_in, **rtr_res_valid)
            if not use_gi_restir:
                gi_invalidity = None

        # ---- batched candidate + reflection trace/shade
        with pass_scope("gi_trace"):
            orgs, dirs, rngs = [], [], []
            if cfg.use_rtdgi:
                org_c, wi_c, rng_c = rtdgi.candidate_rays(gb_h, frame_idx)
                orgs.append(org_c)
                dirs.append(wi_c)
                rngs.append(rng_c)
            if cfg.use_rtr:
                org_r, wi_r, pdf_r, rng_r = rtr.reflection_rays(gb, frame_idx)
                orgs.append(org_r)
                dirs.append(wi_r)
                rngs.append(rng_r)
            org = jnp.concatenate(orgs)
            d = jnp.concatenate(dirs)
            rng = jnp.concatenate(rngs)
            with pass_scope("trace"):
                hit = scene_trace_closest(ts, org, d, t_min=1e-4,
                                          max_steps=mts, sort=True)
            with pass_scope("shade"):
                rad, aux = hit_radiance(ts, hit, d, sky_env, diffuse_env,
                                        rng=rng, return_aux=True, **shade_kw)
            nc = orgs[0].shape[0] if cfg.use_rtdgi else 0
            if cfg.use_rtdgi:
                rtdgi_candidates = rtdgi.finish_candidates(
                    gb_h, org_c, wi_c, hit.hit_mask[:nc], hit.t[:nc],
                    rad[:nc],
                    {"hit_pos": aux["hit_pos"][:nc],
                     "hit_geo_normal": aux["hit_geo_normal"][:nc]})
            if cfg.use_rtr:
                rtr_half = rtr.finish_reflections(
                    gb, wi_r, pdf_r, hit.t[nc:], rad[nc:])

    # --- diffuse GI
    if cfg.use_rtdgi:
      with pass_scope("rtdgi"):
        dgi, rtdgi_state, restir_state, rtdgi_candidates = rtdgi.rtdgi_pipeline(
            ts, gb, view, frame_idx,
            {"rtdgi_history": state["rtdgi_history"],
             "rtdgi_hist_len": state["rtdgi_hist_len"]},
            reproj, sky_env, diffuse_env, ssao=ao,
            prev_lit=state["prev_lit"], prev_depth=state["prev_depth"],
            ircache_lookup=ircache_lookup, max_trace_steps=mts,
            use_restir=cfg.use_restir_gi,
            restir_state=restir_state if cfg.use_restir_gi else None,
            secondary_full_shading=cfg.secondary_full_shading,
            candidates=rtdgi_candidates, invalidity=gi_invalidity,
            validated=True)
        restir_state = restir_state or {}
    else:
        dgi = sky_env_mod.sample_env(diffuse_env, gb["normal"].reshape(-1, 3)
                                     ).reshape(h, w, 3) * ao[..., None]
        rtdgi_state = {"rtdgi_history": state["rtdgi_history"],
                       "rtdgi_hist_len": state["rtdgi_hist_len"]}

    # --- reflections
    if cfg.use_rtr:
      with pass_scope("rtr"):
        refl, rtr_state = rtr.rtr_pipeline(
            ts, gb, view, frame_idx, rtr_state_in,
            reproj, sky_env, diffuse_env,
            prev_lit=state["prev_lit"], prev_depth=state["prev_depth"],
            ircache_lookup=ircache_lookup, max_trace_steps=mts,
            half=rtr_half,
            mesh_light_specular=cfg.use_mesh_light_specular,
            rtdgi_candidates=rtdgi_candidates,
            secondary_full_shading=cfg.secondary_full_shading,
            validated=True)
    else:
        refl = sky_env_mod.sample_env(
            sky_env, _reflect(gb["ray_dir"], gb["normal"]).reshape(-1, 3)
        ).reshape(h, w, 3)
        rtr_state = {k: state[k] for k in rtr_keys}

    # --- deferred combine (light_gbuffer). The background sky is smooth:
    # evaluate at quarter res and upsample (4x fewer atmosphere marches)
    with pass_scope("sky_bg"):
        if h % 4 == 0 and w % 4 == 0:
            sky_q = sky_env_mod.sample_env(
                sky_env_bg,
                im.decimate2(im.decimate2(gb["ray_dir"])).reshape(-1, 3)
            ).reshape(h // 4, w // 4, 3)
            sky_bg = im.upsample2x_bilinear(im.upsample2x_bilinear(sky_q))
        else:
            sky_bg = sky_env_mod.sample_env(
                sky_env_bg, gb["ray_dir"].reshape(-1, 3)).reshape(h, w, 3)
    with pass_scope("deferred"):
        lit = deferred.light_gbuffer(
            gb, shadow, dgi, refl, sky_bg,
            ts.gpu.sun_radiance, ts.gpu.sun_direction,
            ssao=ao, debug_mode=cfg.debug_mode)

    # --- pre-exposure split (update_pre_exposure, world_renderer.rs:919-948):
    # pre_mult smoothly chases last frame's metered exposure (0.9/0.1 EMA);
    # everything temporal downstream of `lit` runs PRE-EXPOSED, history is
    # rescaled by this frame's pre_mult delta, and post_combine applies only
    # the remaining exposure / pre_mult.
    pre_prev = state["pre_mult"]
    if cfg.use_taa:
        ev_mult = jnp.exp2(state["smoothed_ev"])
        pre_mult = pre_prev * 0.9 + ev_mult * 0.1
    else:
        pre_mult = jnp.ones_like(pre_prev)
    pre_delta = pre_mult / jnp.maximum(pre_prev, 1e-20)

    # --- taa (temporal super-res)
    taa_keys = ("taa_history", "taa_coverage", "taa_smooth_var",
                "taa_velocity")
    if cfg.use_taa:
      with pass_scope("taa"):
        aa, taa_state = taa.taa(
            lit * pre_mult, {k: state[k] for k in taa_keys},
            reproj, gb["depth"], view.sample_offset_pixels,
            cfg.out_height, cfg.out_width, pre_delta=pre_delta)
    else:
        aa = lit
        taa_state = {k: state[k] for k in taa_keys}

    # --- motion blur (taa -> motion blur -> post, world_render_passes order)
    if cfg.use_motion_blur:
        from .renderers import motion_blur as mb

        vel_out = gb["velocity"]
        depth_for_mb = gb["depth"]
        if aa.shape[:2] != gb["depth"].shape:
            from .core import img as _im

            vel_out = _im.upsample_bilinear(vel_out, aa.shape[0], aa.shape[1])
            depth_for_mb = _im.upsample_bilinear(gb["depth"], aa.shape[0],
                                                 aa.shape[1])
        with pass_scope("motion_blur"):
            aa = mb.motion_blur(aa, vel_out, depth_for_mb,
                                frame_fraction=cfg.motion_blur_scale)

    # --- depth of field ('coc'/'dof gather', renderers/dof.rs — opt-in)
    if cfg.use_dof:
        from .renderers import dof as dof_mod

        depth_for_dof = gb["depth"]
        if aa.shape[:2] != depth_for_dof.shape:
            depth_for_dof = im.upsample_bilinear(
                depth_for_dof, aa.shape[0], aa.shape[1])
        with pass_scope("dof"):
            aa = dof_mod.dof_gather(aa, depth_for_dof, cfg.dof_focus_dist,
                                    cfg.dof_aperture, near=cfg.near)

    # --- post: exposure + glare + tonemap. `aa` is pre-exposed, so post
    # applies only the remainder (post_mult = exposure / pre_mult).
    with pass_scope("post"):
        exposure, exp_state = post.update_exposure(
            {"smoothed_ev": state["smoothed_ev"]}, lit,
            dt=cfg.dt, ev_shift=cfg.ev_shift)
        final = post.post_combine(aa, exposure / pre_mult)

    new_state = {
        "frame_idx": frame_idx + 1,
        "prev_depth": gb["depth"],
        "prev_lit": lit,
        "pre_mult": pre_mult,
        **shadow_state, **ssgi_state, **rtdgi_state, **rtr_state,
        **taa_state, **exp_state, **ir_state, **restir_state, **wrc_state,
    }
    outputs = {
        "final": final, "lit": lit, "gbuffer": gb, "shadow": shadow,
        "ssao": ao, "diffuse_gi": dgi, "reflections": refl,
        "reproj": reproj, "exposure": exposure, "taa": aa,
    }
    return new_state, outputs


def _reflect(d, n):
    return d - 2.0 * jnp.sum(d * n, axis=-1, keepdims=True) * n


# ----------------------------------------------------------------------------
# Reference path-tracing mode (render mode Standard | Reference,
# `world_renderer.rs:288-292`, `world_render_passes.rs:294-330`)
# ----------------------------------------------------------------------------

def init_reference_state(cfg: RenderConfig):
    """The `refpt.accum` temporal image + sample counter + exposure."""
    return {
        "refpt_accum": jnp.zeros((cfg.height, cfg.width, 3), jnp.float32),
        "refpt_samples": jnp.asarray(0.0, jnp.float32),
        "smoothed_ev": jnp.asarray(0.0, jnp.float32),
    }


def render_frame_reference(ts, state, view: ViewConstants, cfg: RenderConfig,
                           levels=None, num_bounces: int = 16,
                           spp_per_frame: int = 1, max_spp: float = 1000.0,
                           pixel_filter: bool = True):
    """One progressive reference-PT frame: trace spp_per_frame paths/pixel,
    blend into the accumulator (up to max_spp, as the reference's 1000-spp
    cap), then run the same post chain. Returns (new_state, outputs)."""
    from .renderers import reference as refpt

    if levels is not None:
        with pass_scope("tlas_refit"):
            ts = refresh_trace_scene(ts.gpu, ts.bvh, levels)

    # PT ray cone: the reference shrinks the pixel cone to 0.3x for its
    # path tracer (`reference_path_trace.rgen.hlsl:128`)
    pt_spread = 0.3 * 2.0 / (view.view_to_clip[1, 1] * cfg.height)
    frame_radiance = refpt.render_sample(
        ts, view, cfg.width, cfg.height,
        frame_idx=state["refpt_samples"].astype(jnp.int32),
        spp_chunk=spp_per_frame, num_bounces=num_bounces,
        max_trace_steps=cfg.max_trace_steps, pixel_filter=pixel_filter,
        cone_spread=pt_spread)

    n = jnp.minimum(state["refpt_samples"], max_spp)
    accum = state["refpt_accum"] + (frame_radiance - state["refpt_accum"]) / (n + 1.0)

    exposure, exp_state = post.update_exposure(
        {"smoothed_ev": state["smoothed_ev"]}, accum, dt=cfg.dt,
        ev_shift=cfg.ev_shift)
    final = post.post_combine(accum, exposure)

    new_state = {
        "refpt_accum": accum,
        "refpt_samples": n + 1.0,
        **exp_state,
    }
    return new_state, {"final": final, "lit": accum, "exposure": exposure}


class Renderer:
    """Convenience wrapper: owns scene tables, BVH, FrameState, and the
    jit-compiled frame (the `WorldRenderer` + `rg::Renderer` pair of the
    reference, `world_renderer.rs:142-215` / `kajiya-rg/src/renderer.rs`)."""

    def __init__(self, scene, cfg: RenderConfig = RenderConfig(),
                 ibl: str | None = None):
        from .scene.scene import build_gpu_scene
        from .world import build_trace_scene

        self.gpu = build_gpu_scene(scene)
        if int(self.gpu.num_lights) > 0 and cfg.use_rtr:
            cfg = replace(cfg, use_mesh_light_specular=True)
        self.cfg = cfg
        self.ts, self.levels = build_trace_scene(self.gpu)
        self.state = init_frame_state(cfg)
        self.ibl_env = None
        if ibl is not None:
            from .sky.ibl import load_ibl_env

            self.ibl_env = load_ibl_env(ibl)
        self._last_good = None
        self._last_error = None
        self.rebuild()

    def rebuild(self):
        """(Re)build the jitted frame closure from the CURRENT pass modules.

        Hot reload (`core/reload.py`): after `ModuleWatcher.poll()` reloads
        edited modules, calling rebuild re-traces the frame against the
        fresh code — the jit-cache-invalidation analog of the reference's
        stale-pipeline recompile (`pipeline_cache.rs:229-392`). FrameState
        (all temporal arrays) is untouched, mirroring the temporal-resource
        rescue in `renderer.rs:466-497`."""
        import importlib

        cfg, levels, ibl_env = self.cfg, self.levels, self.ibl_env

        def _frame(ts, state, view):
            # late-bind through sys.modules so a reloaded kajiya_tpu.frame
            # (and everything it imports) is what gets traced
            fm = importlib.import_module("kajiya_tpu.frame")
            return fm.render_frame(ts, state, view, cfg, levels=levels,
                                   ibl_env=ibl_env)

        from .ops.hoist import jit_hoisted

        self._frame = jit_hoisted(_frame)

    def draw(self, view: ViewConstants):
        """Render one frame, advancing temporal state. Returns outputs dict.

        A jit/compile failure must not kill the interactive loop: the
        reference keeps presenting on the previous pipelines when a shader
        rebuild fails (`kajiya-rg/src/renderer.rs:466-497`, the main loop
        prints the error and carries on). Here: on any tracing/compile/
        execute error the temporal state is left untouched and the last
        good frame's outputs are returned again; the first frame has no
        fallback, so there the error propagates."""
        import logging

        try:
            self.state, outputs = self._frame(self.ts, self.state, view)
            self._last_good = outputs
            self._last_error = None
            return outputs
        except Exception as e:  # noqa: BLE001 — any XLA failure class
            if self._last_good is None:
                raise
            msg = f"{type(e).__name__}: {e}"
            if msg != self._last_error:       # log each distinct error once
                logging.getLogger("kajiya_tpu").error(
                    "frame failed, presenting last good frame — %s", msg)
                self._last_error = msg
            return self._last_good

    def set_transforms(self, xforms):
        """Update instance transforms (I, 3, 4); previous transforms roll."""
        self.ts.gpu.xforms_prev = self.ts.gpu.xforms
        self.ts.gpu.xforms = jnp.asarray(xforms, jnp.float32)

    def jitter(self, enabled: bool = True):
        return jitter_for_frame(self.state["frame_idx"], enabled)
