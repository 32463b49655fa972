"""Pinhole camera (csrt src/renderer/camera.cpp).

Precomputes the (front, right, up) basis and view_dx/view_dy spans; ray
generation is pure jnp over pixel-index batches, matching the reference's
screen mapping x = 2(i+u)/w - 1, y = 1 - 2(j+v)/h (renderer.cpp:70-75).
"""

from __future__ import annotations

import math

import flax.struct
import jax.numpy as jnp
import numpy as np

from mcpt_tpu.ops.math import to_radians
from mcpt_tpu.scene.ir import CameraInfo


@flax.struct.dataclass
class Camera:
    eye: jnp.ndarray       # [3]
    front: jnp.ndarray     # [3]
    view_dx: jnp.ndarray   # [3] right * tan(fov_x / 2)
    view_dy: jnp.ndarray   # [3] up * tan(fov_y / 2)
    width: int = flax.struct.field(pytree_node=False)
    height: int = flax.struct.field(pytree_node=False)
    spp: int = flax.struct.field(pytree_node=False)


def make_camera(info: CameraInfo) -> Camera:
    eye = np.asarray(info.eye, np.float32)
    look_at = np.asarray(info.look_at, np.float32)
    up = np.asarray(info.up, np.float32)

    fov_y = info.fov_x * info.height / info.width
    front = look_at - eye
    front /= max(np.linalg.norm(front), 1e-12)
    right = np.cross(front, up)
    right /= max(np.linalg.norm(right), 1e-12)
    up = np.cross(right, front)
    up /= max(np.linalg.norm(up), 1e-12)

    return Camera(
        eye=jnp.asarray(eye),
        front=jnp.asarray(front),
        view_dx=jnp.asarray(right * math.tan(to_radians(0.5 * info.fov_x))),
        view_dy=jnp.asarray(up * math.tan(to_radians(0.5 * fov_y))),
        width=int(info.width),
        height=int(info.height),
        spp=int(info.spp),
    )


def generate_rays(camera: Camera, pixel_idx, u, v):
    """Rays for a batch of linear pixel indices.

    pixel_idx: [N] int32 (row-major j * width + i).
    u, v: [N] or scalar jitter in [0, 1).
    Returns (origins [N, 3], directions [N, 3]).
    """
    i = (pixel_idx % camera.width).astype(jnp.float32)
    j = (pixel_idx // camera.width).astype(jnp.float32)
    x = 2.0 * (i + u) / camera.width - 1.0
    y = 1.0 - 2.0 * (j + v) / camera.height
    d = (
        camera.front[None, :]
        + x[:, None] * camera.view_dx[None, :]
        + y[:, None] * camera.view_dy[None, :]
    )
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(camera.eye, d.shape)
    return o, d
