"""Cameras: pixel-grid positions -> world-space ray bundles.

Behavioral parity:
  * FoVPerspectiveCamera — the fork-added
    ``FoVPerspectiveCameras.sample_positions`` (renderer/cameras.py:539-575):
    pixel -> NDC via ``-2 (pos/size) + 1``, unproject the NDC point at the
    far plane through the inverse full projection transform, then NORMALIZE
    THE WORLD POINT as the ray direction (a reference quirk: the camera
    center is not subtracted; with zfar=100 >> scene radius the error is
    O(dist/zfar) and the trained models bake it in), origins = camera center.
    Conventions follow PyTorch3D: row-vector transforms ``X_view = X R + T``,
    camera looks down +z with +x left / +y up.
  * look_at_view_transform / look_at_rotation (renderer/cameras.py:1313-1420)
  * NeRFCamera / NeRFMMCamera / NeRVCamera / DTUCamera
    (pathtracer/cameras/cameras.py:16-192).  The reference's NeRVCamera never
    defines its ray origins (cameras.py:129, a latent bug); here it uses the
    provided camera location.

All cameras are pytrees (NamedTuples of arrays) so a batch of views can be
built on host per training step and passed straight into a jitted step.
``positions[..., 0]`` is the second image axis ("u"/y-grid) and
``positions[..., 1]`` the first ("v"/x-grid), matching the renderer's
``stack([grid_y, grid_x], -1)`` (main.py:66-71).
Rays are returned as ``[N, *grid, bundle, 6]`` (origin ++ direction).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

from ..ops.math import normalize, rotate_vector


def camera_position_from_spherical_angles(dist, elev, azim, degrees=True):
    dist, elev, azim = jnp.broadcast_arrays(
        jnp.atleast_1d(jnp.asarray(dist, jnp.float32)),
        jnp.atleast_1d(jnp.asarray(elev, jnp.float32)),
        jnp.atleast_1d(jnp.asarray(azim, jnp.float32)))
    if degrees:
        elev = elev * (math.pi / 180.0)
        azim = azim * (math.pi / 180.0)
    x = dist * jnp.cos(elev) * jnp.sin(azim)
    y = dist * jnp.sin(elev)
    z = dist * jnp.cos(elev) * jnp.cos(azim)
    return jnp.stack([x, y, z], axis=-1)


def look_at_rotation(camera_position, at=((0.0, 0.0, 0.0),),
                     up=((0.0, 1.0, 0.0),)):
    """World->view rotation matrices ``[N, 3, 3]`` (row-vector convention)."""
    camera_position = jnp.atleast_2d(jnp.asarray(camera_position, jnp.float32))
    at = jnp.broadcast_to(jnp.atleast_2d(jnp.asarray(at, jnp.float32)),
                          camera_position.shape)
    up = jnp.broadcast_to(jnp.atleast_2d(jnp.asarray(up, jnp.float32)),
                          camera_position.shape)
    z_axis = normalize(at - camera_position, eps=1e-5)
    x_axis = normalize(jnp.cross(up, z_axis), eps=1e-5)
    y_axis = normalize(jnp.cross(z_axis, x_axis), eps=1e-5)
    is_close = jnp.all(jnp.isclose(x_axis, 0.0, atol=5e-3), axis=1,
                       keepdims=True)
    replacement = normalize(jnp.cross(y_axis, z_axis), eps=1e-5)
    x_axis = jnp.where(is_close, replacement, x_axis)
    r = jnp.stack([x_axis, y_axis, z_axis], axis=1)
    return jnp.transpose(r, (0, 2, 1))


def look_at_view_transform(dist=1.0, elev=0.0, azim=0.0, degrees=True,
                           eye=None, at=((0.0, 0.0, 0.0),),
                           up=((0.0, 1.0, 0.0),)):
    """(R [N,3,3], T [N,3]) such that ``X_view = X_world R + T``."""
    if eye is not None:
        c = jnp.atleast_2d(jnp.asarray(eye, jnp.float32))
        at = jnp.broadcast_to(jnp.atleast_2d(jnp.asarray(at, jnp.float32)),
                              c.shape)
    else:
        at_arr = jnp.atleast_2d(jnp.asarray(at, jnp.float32))
        c = camera_position_from_spherical_angles(dist, elev, azim, degrees)
        c, at = jnp.broadcast_arrays(c, at_arr)
        c = c + at
    r = look_at_rotation(c, at, up)
    t = -jnp.einsum("nij,ni->nj", r, c)
    return r, t


def nerf_c2w(elev_deg, azim_deg, dist=2.0):
    """NeRF-convention 4x4 camera-to-world (camera -z looks at the origin).

    Host-side helper for building synthetic ``transforms_*.json`` pose
    grids (the layout test_nerf_resources expects, training_utils.py:572-594);
    used by the dataset generators and the e2e tests.
    """
    import numpy as np

    e, a = math.radians(elev_deg), math.radians(azim_deg)
    pos = np.asarray([
        dist * math.cos(e) * math.sin(a),
        dist * math.sin(e),
        dist * math.cos(e) * math.cos(a),
    ])
    forward = pos / np.linalg.norm(pos)              # camera -z
    right = np.cross([0.0, 1.0, 0.0], forward)
    right = right / max(np.linalg.norm(right), 1e-9)
    up = np.cross(forward, right)
    m = np.eye(4, dtype=np.float32)
    m[:3, 0] = right
    m[:3, 1] = up
    m[:3, 2] = forward
    m[:3, 3] = pos
    return m


def spherical_positions(min_elev=0.0, max_elev=45.0, min_azim=-135.0,
                        max_azim=135.0, n_elev: int = 8, n_azim: int = 8,
                        dist: float = 1.0):
    """Grid of look-at views about the origin (utils.py:506-519)."""
    elevs = jnp.linspace(min_elev, max_elev, n_elev)
    azims = jnp.linspace(min_azim, max_azim, n_azim)
    ee, aa = jnp.meshgrid(elevs, azims, indexing="ij")
    return look_at_view_transform(dist=dist, elev=ee.ravel(), azim=aa.ravel())


def _expand_bundle(positions, key, bundle_size, with_noise):
    """[..., 2] -> [..., bundle, 2], jittered if ``with_noise``."""
    pos = jnp.broadcast_to(positions[..., None, :],
                           positions.shape[:-1] + (bundle_size, 2))
    if with_noise and key is not None:
        d = float(with_noise)
        pos = pos + d * jax.random.uniform(key, pos.shape) - d / 2.0
    return pos


class FoVPerspectiveCamera(NamedTuple):
    """Batched FoV perspective camera (PyTorch3D conventions)."""

    R: jax.Array                     # [N, 3, 3] world->view rotation
    T: jax.Array                     # [N, 3] world->view translation
    fov: float = 60.0                # full field of view, degrees
    znear: float = 1.0
    zfar: float = 100.0
    aspect: float = 1.0

    def __len__(self):
        return self.R.shape[0]

    def camera_center(self) -> jax.Array:
        return -jnp.einsum("ni,nji->nj", self.T, jnp.transpose(self.R, (0, 2, 1)))

    def sample_positions(self, positions, key=None, bundle_size: int = 1,
                         size: int = 512, with_noise=False) -> jax.Array:
        n = len(self)
        pos = _expand_bundle(positions, key, bundle_size, with_noise)
        # [0, size] -> [-1, 1] NDC (flipped: pixel 0 -> +1)
        ndc = -2.0 * (pos / size) + 1.0
        # fov may be a traced leaf (cameras are pytrees) — use jnp math
        tan_half = jnp.tan(0.5 * jnp.asarray(self.fov) * math.pi / 180.0)
        # NDC point at the far plane in view space (x left, y up, z forward)
        x = ndc[..., 0:1] * tan_half * self.aspect * self.zfar
        y = ndc[..., 1:2] * tan_half * self.zfar
        z = jnp.full_like(x, self.zfar)
        view_pts = jnp.concatenate([x, y, z], axis=-1)      # [..., B, 3]
        # world point: X_world = (X_view - T) R^T  (row-vector convention)
        world_pts = jnp.einsum("...j,nkj->n...k",
                               view_pts, jnp.transpose(self.R, (0, 2, 1)))
        world_pts = world_pts - jnp.einsum(
            "ni,nki->nk", self.T,
            jnp.transpose(self.R, (0, 2, 1)))[(slice(None),) +
                                              (None,) * (world_pts.ndim - 2)]
        # reference quirk: normalize the world POINT, not point - center
        directions = normalize(world_pts)
        origins = jnp.broadcast_to(
            self.camera_center()[(slice(None),) + (None,) * (directions.ndim - 2)],
            directions.shape)
        return jnp.concatenate([origins, directions], axis=-1)


class NeRFCamera(NamedTuple):
    """NeRF-convention pinhole camera from a ``[N, 3, 4]`` c2w matrix."""

    cam_to_world: jax.Array          # [N, 3, 4]
    focal: Union[float, jax.Array]

    def __len__(self):
        return self.cam_to_world.shape[0]

    def sample_positions(self, positions, key=None, bundle_size: int = 1,
                         size: int = 512, with_noise=False) -> jax.Array:
        pos = _expand_bundle(positions, key, bundle_size, with_noise)
        u, v = pos[..., 0:1], pos[..., 1:2]
        d = jnp.concatenate([
            (u - size * 0.5) / self.focal,
            -(v - size * 0.5) / self.focal,
            -jnp.ones_like(u),
        ], axis=-1)                                        # [..., B, 3]
        r_d = jnp.einsum("...j,nij->n...i", d, self.cam_to_world[..., :3, :3])
        r_d = normalize(r_d)
        r_o = jnp.broadcast_to(
            self.cam_to_world[..., :3, -1][(slice(None),) +
                                           (None,) * (r_d.ndim - 2)],
            r_d.shape)
        return jnp.concatenate([r_o, r_d], axis=-1)


class NeRFMMCamera(NamedTuple):
    """NeRF-- style camera with learnable axis-angle pose and focals."""

    t: jax.Array                     # [N, 3] positions
    angle: jax.Array                 # [N, 1] rotation angle
    axis: jax.Array                  # [N, 3] rotation axis
    focals: jax.Array                # [N, 2]

    def __len__(self):
        return self.t.shape[0]

    def sample_positions(self, positions, key=None, bundle_size: int = 1,
                         size: int = 512, with_noise=False) -> jax.Array:
        pos = _expand_bundle(positions, key, bundle_size, with_noise)
        u, v = pos[..., 0], pos[..., 1]
        extra = (None,) * pos.ndim  # per-view params -> [N, 1, ..., 1(, C)]
        fx = self.focals[(slice(None),) + extra[:-1] + (0,)]
        fy = self.focals[(slice(None),) + extra[:-1] + (1,)]
        dx = (u - size * 0.5) / fx          # [N, ..., B]
        dy = -(v - size * 0.5) / fy
        d = jnp.stack([dx, dy, -jnp.ones_like(dx)], axis=-1)
        axis = self.axis[(slice(None),) + extra[:-1]]
        angle = self.angle[(slice(None),) + extra[:-1]]
        r_d = rotate_vector(d, axis, jnp.cos(angle), jnp.sin(angle))
        r_d = normalize(r_d)
        r_o = jnp.broadcast_to(self.t[(slice(None),) + extra[:-1]],
                               r_d.shape)
        return jnp.concatenate([r_o, r_d], axis=-1)


class NeRVCamera(NamedTuple):
    """NeRV-style w2c camera (origins from the provided camera location)."""

    world_to_cam: jax.Array          # [N, 3, 3] or [N, 4, 4]
    loc: jax.Array                   # [N, 3]
    focal: Union[float, jax.Array]

    def __len__(self):
        return self.world_to_cam.shape[0]

    def sample_positions(self, positions, key=None, bundle_size: int = 1,
                         size: int = 512, with_noise=False) -> jax.Array:
        pos = _expand_bundle(positions, key, bundle_size, with_noise)
        u, v = pos[..., 0:1], pos[..., 1:2]
        d = jnp.concatenate([
            (u - size * 0.5) / self.focal,
            (v - size * 0.5) / self.focal,
            jnp.ones_like(u),
        ], axis=-1)
        rot = self.world_to_cam[..., :3, :3]
        r_d = jnp.einsum("...j,nji->n...i", d, rot)
        r_d = normalize(r_d)
        r_o = jnp.broadcast_to(
            self.loc[(slice(None),) + (None,) * (r_d.ndim - 2)], r_d.shape)
        return jnp.concatenate([r_o, r_d], axis=-1)


def lift(x, y, z, intrinsics):
    """Unproject pixel coords through a ``[N, 3|4, 3|4]`` intrinsic matrix."""
    fx = intrinsics[..., 0, 0, None]
    fy = intrinsics[..., 1, 1, None]
    cx = intrinsics[..., 0, 2, None]
    cy = intrinsics[..., 1, 2, None]
    sk = intrinsics[..., 0, 1, None]
    x_lift = (x - cx + cy * sk / fy - sk * y / fy) / fx * z
    y_lift = (y - cy) / fy * z
    return jnp.stack([x_lift, y_lift, z, jnp.ones_like(z)], axis=-1)


class DTUCamera(NamedTuple):
    """IDR-style DTU camera: pose [N,4,4] + intrinsic [N,4,4 or 3,3].

    ``src_size`` is the source-image resolution used to scale pixel
    coordinates (the reference hardcodes 1600x1200, cameras.py:177).
    """

    pose: jax.Array
    intrinsic: jax.Array
    src_size: jax.Array = None       # [2] = (src_w, src_h)

    def __len__(self):
        return self.pose.shape[0]

    def sample_positions(self, positions, key=None, bundle_size: int = 1,
                         size: int = 512, with_noise=False) -> jax.Array:
        n = len(self)
        grid = positions.shape[:-1]
        src = (self.src_size if self.src_size is not None
               else jnp.asarray([1600.0, 1200.0]))
        scale = src / size
        uv = (positions * scale).reshape(-1, 2)
        u = jnp.broadcast_to(uv[:, 0], (n, uv.shape[0]))
        v = jnp.broadcast_to(uv[:, 1], (n, uv.shape[0]))
        points = lift(u, v, jnp.ones_like(u), self.intrinsic)   # [N, P, 4]
        pose = self.pose
        if pose.shape[-2] == 3:
            pad = jnp.zeros(pose.shape[:-2] + (1, 4), pose.dtype)
            pad = pad.at[..., 0, 3].set(1.0)
            pose = jnp.concatenate([pose, pad], axis=-2)
        world = jnp.einsum("nij,npj->npi", pose, points)[..., :3]
        r_o = pose[:, :3, 3][:, None, :]
        r_d = normalize(world - r_o)
        r_o = jnp.broadcast_to(r_o, r_d.shape)
        rays = jnp.concatenate([r_o, r_d], axis=-1)
        rays = rays.reshape((n,) + grid + (1, 6))
        return jnp.broadcast_to(rays, (n,) + grid + (bundle_size, 6))
