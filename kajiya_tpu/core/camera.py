"""Camera math: reversed-infinite-Z projection and view constant matrices.

Behavior parity with the reference's camera layer
(`crates/lib/kajiya/src/camera.rs:41-126`: vertical FoV + near plane,
reversed-infinite-Z projection; `rust-shaders-shared/src/view_constants.rs:6-23`:
the 8-matrix view-constant bundle incl. previous-frame and jittered variants).

Conventions (right-handed, OpenGL-style view space):
  * view space looks down -Z, +Y up, +X right.
  * clip-space depth is REVERSED and INFINITE: depth = near / -z_view, so the
    near plane maps to 1.0 and infinity to 0.0 (better f32 distribution).
  * matrices are (4, 4) float32, column-vector convention: p' = M @ p.

Everything here is plain jnp so it can run either on host (scene setup) or
inside the jitted frame.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def perspective_reversed_infinite_z(fov_y_rad, aspect_w_over_h, near):
    """Reversed-infinite-Z projection (cf. `camera.rs:89-126`)."""
    f = 1.0 / jnp.tan(jnp.asarray(fov_y_rad, jnp.float32) * 0.5)
    m = jnp.zeros((4, 4), jnp.float32)
    m = m.at[0, 0].set(f / aspect_w_over_h)
    m = m.at[1, 1].set(f)
    m = m.at[2, 3].set(near)
    m = m.at[3, 2].set(-1.0)
    return m


def inverse_perspective_reversed_infinite_z(fov_y_rad, aspect_w_over_h, near):
    f = 1.0 / jnp.tan(jnp.asarray(fov_y_rad, jnp.float32) * 0.5)
    m = jnp.zeros((4, 4), jnp.float32)
    m = m.at[0, 0].set(aspect_w_over_h / f)
    m = m.at[1, 1].set(1.0 / f)
    m = m.at[2, 3].set(-1.0)
    m = m.at[3, 2].set(1.0 / near)
    return m


def look_rotation(forward, up=(0.0, 1.0, 0.0)):
    """3x3 world-from-view rotation whose -Z column is `forward`."""
    fwd = jnp.asarray(forward, jnp.float32)
    fwd = fwd / jnp.linalg.norm(fwd)
    upv = jnp.asarray(up, jnp.float32)
    right = jnp.cross(fwd, upv)
    right = right / jnp.maximum(jnp.linalg.norm(right), 1e-8)
    true_up = jnp.cross(right, fwd)
    # columns: view X, Y, -Z axes expressed in world space
    return jnp.stack([right, true_up, -fwd], axis=1)


def world_to_view_from(position, rotation3):
    """4x4 world->view from camera position and 3x3 world-from-view rotation."""
    pos = jnp.asarray(position, jnp.float32)
    r_t = rotation3.T
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[:3, :3].set(r_t)
    m = m.at[:3, 3].set(-r_t @ pos)
    return m


def view_to_world_from(position, rotation3):
    pos = jnp.asarray(position, jnp.float32)
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[:3, :3].set(rotation3)
    m = m.at[:3, 3].set(pos)
    return m


@jax.tree_util.register_pytree_node_class
@dataclass
class ViewConstants:
    """The per-frame matrix bundle (cf. `view_constants.rs:6-23`).

    `*_prev` matrices are last frame's, used by reprojection/velocity.
    `sample_offset_pixels` is the TAA sub-pixel jitter in pixel units.
    """

    view_to_clip: Any
    clip_to_view: Any
    world_to_view: Any
    view_to_world: Any
    view_to_clip_prev: Any
    world_to_view_prev: Any
    view_to_world_prev: Any
    sample_offset_pixels: Any  # (2,) in [-0.5, 0.5)
    eye_position: Any  # (3,)

    def tree_flatten(self):
        children = (
            self.view_to_clip, self.clip_to_view, self.world_to_view,
            self.view_to_world, self.view_to_clip_prev, self.world_to_view_prev,
            self.view_to_world_prev, self.sample_offset_pixels, self.eye_position,
        )
        return children, None

    @classmethod
    def tree_unflatten(cls, _aux, children):
        return cls(*children)

    @property
    def world_to_clip(self):
        return self.view_to_clip @ self.world_to_view

    @property
    def world_to_clip_prev(self):
        return self.view_to_clip_prev @ self.world_to_view_prev


def make_view_constants(
    position,
    forward,
    fov_y_deg: float = 52.0,
    width: int = 1920,
    height: int = 1080,
    near: float = 0.01,
    up=(0.0, 1.0, 0.0),
    jitter=(0.0, 0.0),
    prev: "ViewConstants | None" = None,
):
    import jax

    from .._compat import default_cpu_if_eager

    with default_cpu_if_eager():
        return _make_view_constants(position, forward, fov_y_deg, width,
                                    height, near, up, jitter, prev)


def _make_view_constants(position, forward, fov_y_deg, width, height, near,
                         up, jitter, prev):
    fov = jnp.deg2rad(jnp.asarray(fov_y_deg, jnp.float32))
    aspect = width / height
    rot = look_rotation(forward, up)
    v2c = perspective_reversed_infinite_z(fov, aspect, near)
    c2v = inverse_perspective_reversed_infinite_z(fov, aspect, near)
    w2v = world_to_view_from(position, rot)
    v2w = view_to_world_from(position, rot)
    if prev is None:
        v2c_prev, w2v_prev, v2w_prev = v2c, w2v, v2w
    else:
        v2c_prev, w2v_prev, v2w_prev = prev.view_to_clip, prev.world_to_view, prev.view_to_world
    return ViewConstants(
        view_to_clip=v2c,
        clip_to_view=c2v,
        world_to_view=w2v,
        view_to_world=v2w,
        view_to_clip_prev=v2c_prev,
        world_to_view_prev=w2v_prev,
        view_to_world_prev=v2w_prev,
        sample_offset_pixels=jnp.asarray(jitter, jnp.float32),
        eye_position=jnp.asarray(position, jnp.float32),
    )


# ----------------------------------------------------------------------------
# Screen <-> ray helpers
# ----------------------------------------------------------------------------

def pixel_centers_uv(width: int, height: int, jitter=(0.0, 0.0)):
    """(H, W, 2) uv in [0,1): pixel centers plus sub-pixel jitter."""
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5)
    ys = (jnp.arange(height, dtype=jnp.float32) + 0.5)
    u = (xs[None, :] + jitter[0]) / width
    v = (ys[:, None] + jitter[1]) / height
    uu = jnp.broadcast_to(u, (height, width))
    vv = jnp.broadcast_to(v, (height, width))
    return jnp.stack([uu, vv], axis=-1)


def uv_to_clip(uv):
    """uv in [0,1)^2 (origin top-left) -> clip xy in [-1,1]^2 (origin center, +Y up)."""
    return jnp.stack([uv[..., 0] * 2.0 - 1.0, 1.0 - uv[..., 1] * 2.0], axis=-1)


def camera_rays(view: ViewConstants, width: int, height: int,
                jitter_px=None):
    """Primary ray origins/directions for every pixel. Returns (org, dir),
    each (H, W, 3). `jitter_px` ((H, W, 2), pixels) adds per-pixel sub-pixel
    offsets on top of the TAA jitter (the path tracer's gaussian pixel
    filter, `reference_path_trace.rgen.hlsl:20-150`)."""
    uv = pixel_centers_uv(width, height, view.sample_offset_pixels)
    if jitter_px is not None:
        uv = uv + jitter_px / jnp.asarray([float(width), float(height)])
    cs = uv_to_clip(uv)
    # A point on the near plane in clip space: (x, y, 1, 1) since reversed-Z near==1.
    ones = jnp.ones_like(cs[..., :1])
    clip = jnp.concatenate([cs, ones, ones], axis=-1)  # (H, W, 4)
    from ..ops.smallvec import transform_dirs, transform_h

    vpos = transform_h(view.clip_to_view, clip)
    vpos = vpos[..., :3] / vpos[..., 3:4]
    wdir = transform_dirs(view.view_to_world, vpos)
    wdir = wdir / jnp.linalg.norm(wdir, axis=-1, keepdims=True)
    org = jnp.broadcast_to(view.eye_position, wdir.shape)
    return org, wdir


def depth_to_view_z(depth, near: float = 0.01):
    """Reversed-infinite-Z buffer value -> positive view-space distance along -Z."""
    return near / jnp.maximum(depth, 1e-12)
