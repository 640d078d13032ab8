"""Rasterization renderer front-ends.

Behavioral parity with the reference's renderer layer:
  * ``SpheresRasterizer`` / ``SphereFragments`` — the fork-added
    pytorch3d/renderer/spheres/rasterizer.py:13-60 (project centers with
    the camera, RETAIN view-space z — rasterizer.py:60-66 — then
    rasterize with per-sphere radii)
  * ``PointsRasterizer`` / ``MeshRasterizer`` — the upstream
    renderer/points/rasterizer.py and renderer/mesh/rasterizer.py
    machinery those build on.

The rasterizers take a ``FoVPerspectiveCamera`` (batch size 1) and
world-space geometry; projection happens inline (one einsum + divide),
then the chunk-scanned top-K rasterizers in ``.rasterize`` do the work.
``bin_size`` / ``max_faces_per_bin`` select the tiled coarse-to-fine
mesh path (the binned rasterize_meshes.cu counterpart, rasterize.py);
unset, the naive chunk scan runs and ``chunk`` bounds memory.
``max_points_per_bin`` remains a signature-parity no-op (the point
rasterizer stays binless).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

from .rasterize import (
    Fragments, rasterize_meshes, rasterize_points, rasterize_spheres,
)


class SphereFragments(NamedTuple):
    """Mirror of renderer/spheres/rasterizer.py:14-17."""
    idx: jax.Array
    zbuf: jax.Array
    dists: jax.Array


class RasterizationSettings:
    """Union of the reference's raster settings classes
    (SpheresRasterizationSettings renderer/spheres/rasterizer.py:21-39 and
    the mesh/points equivalents)."""

    def __init__(self, image_size: Union[int, tuple] = 256,
                 blur_radius: float = 0.0,
                 faces_per_pixel: int = 8,
                 points_per_pixel: int = 8,
                 bin_size: Optional[int] = None,
                 max_points_per_bin: Optional[int] = None,
                 max_faces_per_bin: Optional[int] = None,
                 chunk: int = 256):
        self.image_size = image_size
        self.blur_radius = blur_radius
        self.faces_per_pixel = faces_per_pixel
        self.points_per_pixel = points_per_pixel
        self.bin_size = bin_size          # meshes: tiled coarse-to-fine
        self.max_points_per_bin = max_points_per_bin  # parity no-op
        self.max_faces_per_bin = max_faces_per_bin
        self.chunk = chunk


def transform_points_screen(camera, pts_world: jax.Array) -> jax.Array:
    """World -> (x_ndc, y_ndc, z_view), the spheres-rasterizer transform
    (rasterizer.py:60-66: project xy, RETAIN view-space z).

    Uses the repo camera's row-vector convention (X_view = X_world R + T,
    cameras.py) and the FoV projection that inverts
    ``FoVPerspectiveCamera.sample_positions``.
    """
    r = camera.R[0]
    t = camera.T[0]
    view = pts_world @ r + t                              # [P, 3]
    tan_half = jnp.tan(0.5 * jnp.asarray(camera.fov) * math.pi / 180.0)
    z = view[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    x_ndc = view[..., 0] / (tan_half * camera.aspect * safe_z)
    y_ndc = view[..., 1] / (tan_half * safe_z)
    return jnp.stack([x_ndc, y_ndc, z], axis=-1)


class PointsRasterizer:
    """Project a world-space point cloud and rasterize it."""

    def __init__(self, cameras=None, raster_settings=None):
        self.cameras = cameras
        self.raster_settings = raster_settings or RasterizationSettings()

    def __call__(self, points_world: jax.Array,
                 radius: Union[float, jax.Array] = 0.01,
                 cameras=None) -> Fragments:
        cam = cameras or self.cameras
        if cam is None:
            raise ValueError("Cameras must be specified either at "
                             "initialization or in the forward pass")
        s = self.raster_settings
        pts = transform_points_screen(cam, points_world)
        return rasterize_points(pts, s.image_size, radius,
                                s.points_per_pixel, chunk=s.chunk)


class MeshRasterizer:
    """Project a world-space triangle mesh and rasterize it."""

    def __init__(self, cameras=None, raster_settings=None):
        self.cameras = cameras
        self.raster_settings = raster_settings or RasterizationSettings()

    def __call__(self, verts_world: jax.Array, faces: jax.Array,
                 cameras=None) -> Fragments:
        cam = cameras or self.cameras
        if cam is None:
            raise ValueError("Cameras must be specified either at "
                             "initialization or in the forward pass")
        s = self.raster_settings
        verts = transform_points_screen(cam, verts_world)
        return rasterize_meshes(verts, faces, s.image_size,
                                s.blur_radius, s.faces_per_pixel,
                                chunk=s.chunk, bin_size=s.bin_size,
                                max_faces_per_bin=s.max_faces_per_bin)


class SpheresRasterizer:
    """The fork's sphere-cloud rasterizer (renderer/spheres/rasterizer.py
    :41-82).  ``radii`` are NDC-units screen radii carried alongside the
    projected centers, exactly as the fork's 4th points column."""

    def __init__(self, cameras=None, raster_settings=None):
        self.cameras = cameras
        self.raster_settings = raster_settings or RasterizationSettings()

    def transform(self, centers_world: jax.Array,
                  cameras=None) -> jax.Array:
        cam = cameras or self.cameras
        if cam is None:
            raise ValueError("Cameras must be specified either at "
                             "initialization or in the forward pass of "
                             "SpheresRasterizer")
        return transform_points_screen(cam, centers_world)

    def __call__(self, centers_world: jax.Array, radii: jax.Array,
                 cameras=None) -> SphereFragments:
        s = self.raster_settings
        pts = self.transform(centers_world, cameras)
        spheres = jnp.concatenate([pts, radii[:, None]], axis=-1)
        frags = rasterize_spheres(spheres, s.image_size,
                                  s.points_per_pixel, chunk=s.chunk)
        return SphereFragments(idx=frags.idx, zbuf=frags.zbuf,
                               dists=frags.dists)
