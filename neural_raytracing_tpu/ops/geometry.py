"""Ray/segment/point geometry helpers (JAX, jittable).

Behavioral parity: pytorch3d/pathtracer/scene.py:169-287 —
  * ray_point_dist (:220-227): distance from rays to points
  * distance_between_rays_and_segments (:169-218): closest distance between
    rays and line segments
  * mesh_level_surfaces (:231-287): per-ray minimum distance to a mesh
    (approximated by vertex/edge distances, as in the reference)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .math import normalize


def ray_point_dist(r_o: jax.Array, r_d: jax.Array,
                   points: jax.Array) -> jax.Array:
    """Distance from each ray to each point.

    r_o/r_d ``[..., 3]``; points ``[P, 3]`` -> ``[..., P]`` distances from
    the (half-) ray to each point (closest approach clamped to t >= 0).
    """
    d = normalize(r_d)
    w = points - r_o[..., None, :]                       # [..., P, 3]
    along = jnp.maximum(jnp.sum(w * d[..., None, :], axis=-1), 0.0)
    closest = r_o[..., None, :] + along[..., None] * d[..., None, :]
    return jnp.linalg.norm(points - closest, axis=-1)


def distance_between_rays_and_segments(r_o, r_d, seg_a, seg_b,
                                       eps: float = 1e-8):
    """Minimum distance between rays and line segments.

    r_o/r_d ``[..., 3]``; seg_a/seg_b ``[S, 3]`` -> ``[..., S]``.
    Standard closest-point-between-lines with the segment parameter
    clamped to [0, 1] and the ray parameter to t >= 0.
    """
    u = normalize(r_d)[..., None, :]                     # ray dir
    v = seg_b - seg_a                                    # [S, 3]
    w0 = r_o[..., None, :] - seg_a                       # [..., S, 3]

    a = jnp.sum(u * u, axis=-1)
    b = jnp.sum(u * v, axis=-1)
    c = jnp.sum(v * v, axis=-1)
    d = jnp.sum(u * w0, axis=-1)
    e = jnp.sum(v * w0, axis=-1)

    denom = jnp.maximum(a * c - b * b, eps)
    s = (b * e - c * d) / denom          # ray parameter
    t = (a * e - b * d) / denom          # segment parameter
    s = jnp.maximum(s, 0.0)
    t = jnp.clip(t, 0.0, 1.0)
    # re-project s after clamping t
    s = jnp.maximum((t * b - d) / jnp.maximum(a, eps), 0.0)

    p_ray = r_o[..., None, :] + s[..., None] * u
    p_seg = seg_a + t[..., None] * v
    return jnp.linalg.norm(p_ray - p_seg, axis=-1)


def mesh_level_surfaces(r_o, r_d, verts, faces, chunk: int = 256):
    """Per-ray minimum distance to a mesh's edges/vertices.

    Like the reference (scene.py:231-287), this approximates ray-mesh
    distance by the minimum over face-edge segments — adequate for the
    ``LevelSurfaces`` visualization it feeds.
    """
    tris = verts[faces]                                  # [F, 3, 3]
    seg_a = jnp.concatenate([tris[:, 0], tris[:, 1], tris[:, 2]])
    seg_b = jnp.concatenate([tris[:, 1], tris[:, 2], tris[:, 0]])
    n = seg_a.shape[0]
    pad = (-n) % chunk
    if pad:
        seg_a = jnp.concatenate([seg_a, jnp.full((pad, 3), 1e6)], axis=0)
        seg_b = jnp.concatenate([seg_b, jnp.full((pad, 3), 1e6)], axis=0)

    def body(carry, segs):
        a, b = segs
        d = distance_between_rays_and_segments(r_o, r_d, a, b)
        return jnp.minimum(carry, jnp.min(d, axis=-1)), None

    init = jnp.full(r_o.shape[:-1], jnp.inf)
    out, _ = jax.lax.scan(
        body, init, (seg_a.reshape(-1, chunk, 3), seg_b.reshape(-1, chunk, 3)))
    return out
