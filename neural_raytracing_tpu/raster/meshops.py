"""Mesh utility ops — the TPU-native counterparts of the reference's
small csrc kernels.

Behavioral parity (each op mirrors the CUDA/C++ extension it replaces):
  * ``face_areas_normals``    — pytorch3d/csrc/face_areas_normals/ (ext.cpp:24-25)
  * ``interp_face_attrs``     — pytorch3d/csrc/interp_face_attrs/ (ext.cpp:28-29)
  * ``packed_to_padded`` / ``padded_to_packed``
                              — pytorch3d/csrc/packed_to_padded_tensor/ (ext.cpp:26-27)
  * ``gather_scatter``        — pytorch3d/csrc/gather_scatter/ (ext.cpp:35)
  * ``point_face_distance`` / ``face_point_distance`` /
    ``point_edge_distance`` / ``edge_point_distance``
                              — pytorch3d/csrc/point_mesh/ (ext.cpp:67-81)

TPU-first design: everything is batched vectorized math (VPU) or gathers —
no per-element host loops.  The ragged mesh batching the reference handles
with first-index arrays becomes segment-id masks over statically-shaped
arrays, which is the XLA-friendly formulation (no dynamic shapes under
jit).  All distance ops are differentiable end-to-end (the csrc kernels
ship hand-written backwards; here JAX AD provides them).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def face_areas_normals(verts: jax.Array, faces: jax.Array,
                       eps: float = 1e-6) -> Tuple[jax.Array, jax.Array]:
    """Per-face areas and unit normals.

    verts ``[V, 3]``, faces ``[F, 3]`` int -> (areas ``[F]``,
    normals ``[F, 3]``).  Degenerate faces get area 0 and normal 0,
    matching the csrc forward (face_areas_normals.cu: normal = cross /
    max(2*area, eps)).
    """
    tris = verts[faces]                                    # [F, 3, 3]
    cross = jnp.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    # double-where: jnp.linalg.norm has a NaN gradient at cross = 0
    # (degenerate faces), and the eps clamp below does not block it
    sq = jnp.sum(cross * cross, axis=-1)
    norm = jnp.where(sq > 0.0, jnp.sqrt(jnp.where(sq > 0.0, sq, 1.0)), 0.0)
    areas = 0.5 * norm
    normals = cross / jnp.maximum(norm, eps)[..., None]
    return areas, normals


def interp_face_attrs(pix_to_face: jax.Array, barycentric: jax.Array,
                      face_attrs: jax.Array) -> jax.Array:
    """Barycentric interpolation of per-face-vertex attributes.

    pix_to_face ``[..., ]`` int (-1 = no face), barycentric ``[..., 3]``,
    face_attrs ``[F, 3, D]`` -> ``[..., D]``; -1 pixels get zeros
    (interp_face_attrs.cu semantics).
    """
    safe = jnp.maximum(pix_to_face, 0)
    attrs = face_attrs[safe]                               # [..., 3, D]
    out = jnp.sum(barycentric[..., :, None] * attrs, axis=-2)
    return jnp.where((pix_to_face >= 0)[..., None], out, 0.0)


def packed_to_padded(inputs: jax.Array, first_idxs: jax.Array,
                     max_size: int) -> jax.Array:
    """Ragged packed ``[P, ...]`` -> padded ``[N, max_size, ...]`` (zeros).

    first_idxs ``[N]`` is the packed start index of each batch element
    (packed_to_padded_tensor.cu).  Out-of-range slots read as zero.
    """
    n = first_idxs.shape[0]
    p = inputs.shape[0]
    ends = jnp.concatenate([first_idxs[1:], jnp.asarray([p])])
    offs = jnp.arange(max_size)[None, :]                   # [1, M]
    idx = first_idxs[:, None] + offs                       # [N, M]
    valid = idx < ends[:, None]
    flat = inputs[jnp.minimum(idx, p - 1).reshape(-1)]
    flat = flat.reshape((n, max_size) + inputs.shape[1:])
    shape = (valid.shape + (1,) * (flat.ndim - 2))
    return jnp.where(valid.reshape(shape), flat, 0)


def padded_to_packed(inputs: jax.Array, first_idxs: jax.Array,
                     num_inputs: int) -> jax.Array:
    """Padded ``[N, M, ...]`` -> packed ``[num_inputs, ...]`` (inverse of
    :func:`packed_to_padded`)."""
    n, m = inputs.shape[:2]
    p = num_inputs
    pos = jnp.arange(p)
    # batch of each packed element: count of first_idxs <= pos, minus 1
    batch = jnp.sum(pos[:, None] >= first_idxs[None, :], axis=-1) - 1
    within = pos - first_idxs[batch]
    return inputs[batch, jnp.minimum(within, m - 1)]


def gather_scatter(inputs: jax.Array, edges: jax.Array,
                   directed: bool = False) -> jax.Array:
    """Graph-conv neighbor aggregation (gather_scatter.cu).

    inputs ``[V, D]``, edges ``[E, 2]`` int -> ``[V, D]`` where
    ``out[v0] += in[v1]`` for each edge and, if not directed, also
    ``out[v1] += in[v0]``.  XLA scatter-add; deterministic on TPU.
    """
    out = jnp.zeros_like(inputs)
    out = out.at[edges[:, 0]].add(inputs[edges[:, 1]])
    if not directed:
        out = out.at[edges[:, 1]].add(inputs[edges[:, 0]])
    return out


def point_line_seg_dists(points: jax.Array, seg_a: jax.Array,
                         seg_b: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Squared distance from each point to each segment.

    points ``[P, 3]``, seg_a/seg_b ``[S, 3]`` -> ``[P, S]``
    (point_mesh/geometry_utils PointLine3DistanceForward).
    """
    v = seg_b - seg_a                                      # [S, 3]
    w = points[:, None, :] - seg_a[None, :, :]             # [P, S, 3]
    t = jnp.sum(w * v, axis=-1) / jnp.maximum(
        jnp.sum(v * v, axis=-1), eps)
    t = jnp.clip(t, 0.0, 1.0)
    closest = seg_a + t[..., None] * v
    d = points[:, None, :] - closest
    return jnp.sum(d * d, axis=-1)


def point_triangle_dists(points: jax.Array, tris: jax.Array,
                         eps: float = 1e-8) -> jax.Array:
    """Squared distance from each point to each triangle.

    points ``[P, 3]``, tris ``[T, 3, 3]`` -> ``[P, T]``.  Branch-free
    region test (point_mesh/geometry_utils PointTriangle3DistanceForward):
    project onto the plane; inside -> plane distance, outside -> min of
    the three edge-segment distances.
    """
    a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]           # [T, 3]
    n = jnp.cross(b - a, c - a)                            # [T, 3]
    nn = jnp.sum(n * n, axis=-1)                           # [T]
    w = points[:, None, :] - a[None, :, :]                 # [P, T, 3]
    dist_plane = jnp.sum(w * n, axis=-1)                   # signed * |n|
    proj = points[:, None, :] - (dist_plane / jnp.maximum(nn, eps))[..., None] * n

    # barycentric coordinates of the projection (doubled areas vs n)
    def tri_dot(u, v):
        return jnp.sum(u * v, axis=-1)

    w_a = tri_dot(jnp.cross(c - b, proj - b[None]), n)
    w_b = tri_dot(jnp.cross(a - c, proj - c[None]), n)
    w_c = tri_dot(jnp.cross(b - a, proj - a[None]), n)
    inside = (w_a >= 0) & (w_b >= 0) & (w_c >= 0) & (nn > eps)[None, :]

    d_in = dist_plane * dist_plane / jnp.maximum(nn, eps)
    d_ab = point_line_seg_dists(points, a, b, eps)
    d_bc = point_line_seg_dists(points, b, c, eps)
    d_ca = point_line_seg_dists(points, c, a, eps)
    d_edge = jnp.minimum(jnp.minimum(d_ab, d_bc), d_ca)
    return jnp.where(inside, d_in, d_edge)


def _segment_min(dists: jax.Array, row_seg: jax.Array, col_seg: jax.Array,
                 axis: int) -> Tuple[jax.Array, jax.Array]:
    """Min (+argmin) of ``dists [R, C]`` over ``axis`` restricted to
    same-segment (ragged-batch) pairs; cross-batch pairs read +inf."""
    mask = row_seg[:, None] == col_seg[None, :]
    masked = jnp.where(mask, dists, jnp.inf)
    return jnp.min(masked, axis=axis), jnp.argmin(masked, axis=axis)


def point_face_distance(points: jax.Array, tris: jax.Array,
                        points_seg: Optional[jax.Array] = None,
                        tris_seg: Optional[jax.Array] = None):
    """Per-point min squared distance to its mesh's faces.

    -> (dists ``[P]``, face idx ``[P]``).  ``*_seg`` are segment ids
    replacing the csrc first-index arrays (None = single mesh).
    Mirrors PointFaceDistanceForward (ext.cpp:68-71).
    """
    d = point_triangle_dists(points, tris)
    if points_seg is None:
        return jnp.min(d, axis=-1), jnp.argmin(d, axis=-1)
    return _segment_min(d, points_seg, tris_seg, axis=-1)


def face_point_distance(points: jax.Array, tris: jax.Array,
                        points_seg: Optional[jax.Array] = None,
                        tris_seg: Optional[jax.Array] = None):
    """Per-face min squared distance to its mesh's points
    (FacePointDistanceForward, ext.cpp:72-75) -> (dists ``[T]``, idx)."""
    d = point_triangle_dists(points, tris)
    if points_seg is None:
        return jnp.min(d, axis=0), jnp.argmin(d, axis=0)
    mn, am = _segment_min(d, points_seg, tris_seg, axis=0)
    return mn, am


def point_edge_distance(points: jax.Array, seg_a: jax.Array,
                        seg_b: jax.Array,
                        points_seg: Optional[jax.Array] = None,
                        edges_seg: Optional[jax.Array] = None):
    """Per-point min squared distance to its mesh's edges
    (PointEdgeDistanceForward, ext.cpp:76-78)."""
    d = point_line_seg_dists(points, seg_a, seg_b)
    if points_seg is None:
        return jnp.min(d, axis=-1), jnp.argmin(d, axis=-1)
    return _segment_min(d, points_seg, edges_seg, axis=-1)


def edge_point_distance(points: jax.Array, seg_a: jax.Array,
                        seg_b: jax.Array,
                        points_seg: Optional[jax.Array] = None,
                        edges_seg: Optional[jax.Array] = None):
    """Per-edge min squared distance to its mesh's points
    (EdgePointDistanceForward, ext.cpp:79-81)."""
    d = point_line_seg_dists(points, seg_a, seg_b)
    if points_seg is None:
        return jnp.min(d, axis=0), jnp.argmin(d, axis=0)
    return _segment_min(d, points_seg, edges_seg, axis=0)
