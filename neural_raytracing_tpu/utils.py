"""Visualization and miscellaneous helpers.

Behavioral parity: pytorch3d/pathtracer/utils.py:389-445 —
``sphere_render_bsdf`` renders a BSDF on a unit sphere with a point light
(the standard basis-BSDF visualization), ``sphere_examples`` does so for
every basis of a mixture BSDF, ``heightmap`` rasterizes a warp pdf,
``depth_image`` normalizes a depth channel.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def sphere_render_bsdf(bsdf, bsdf_params, integrator=None, size: int = 256,
                       chunk_size: int = 128, scale: float = 100.0,
                       key=None):
    """Render ``bsdf`` on a unit sphere lit by a point light (one view)."""
    from . import Scene, pathtrace
    from .cameras import FoVPerspectiveCamera, look_at_view_transform
    from .integrators import Direct
    from .lights import PointLights
    from .shapes import Sphere

    if integrator is None:
        integrator = Direct(training=False)
    if key is None:
        key = jax.random.PRNGKey(0)
    chunk_size = min(chunk_size, size)
    r, t = look_at_view_transform(dist=2.0, elev=0.0, azim=0.0)
    camera = FoVPerspectiveCamera(R=r, T=t)
    lights = PointLights(location=(0.0, 1.0, 4.0), scale=scale)
    scene = Scene(shape=Sphere((0.0, 0.0, 0.0), 1.0), bsdf=bsdf,
                  lights=lights)
    params = {"shape": {}, "bsdf": bsdf_params,
              "lights": lights.init(), "occ": {}}
    img, _ = pathtrace(scene, params, camera, integrator, size=size,
                       chunk_size=chunk_size, bundle_size=1,
                       background=1.0, key=key)
    return img


def sphere_examples(mixture_bsdf, mixture_params, size: int = 256,
                    chunk_size: int = 128, scale: float = 100.0):
    """Per-basis sphere renders of a Compose/ComposeSpatialVarying BSDF."""
    out = []
    for basis, params in zip(mixture_bsdf.bsdfs, mixture_params["bsdfs"]):
        out.append(sphere_render_bsdf(basis, params, size=size,
                                      chunk_size=chunk_size, scale=scale))
    return out


def heightmap(warp, warp_params, size: int = 256):
    """Rasterize a 2D warp's pdf over the [0,1]^2 uv square."""
    u, v = jnp.meshgrid(jnp.linspace(0.0, 1.0, size),
                        jnp.linspace(0.0, 1.0, size), indexing="ij")
    return warp.pdf(warp_params, jnp.stack([u, v], axis=-1))


def depth_image(img: jax.Array) -> jax.Array:
    """[..., 2] (depth, mask) -> normalized grayscale RGBA."""
    depth, mask = img[..., 0:1], img[..., 1:2]
    depth = depth / jnp.maximum(jnp.max(depth), 1e-9)
    return jnp.concatenate([depth, depth, depth, mask], axis=-1)


def count_parameters(tree) -> int:
    return sum(int(np.prod(np.shape(x)))
               for x in jax.tree_util.tree_leaves(tree))
