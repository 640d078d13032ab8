"""Triangle-mesh shape: jittable Moller-Trumbore + native host backend.

Behavioral parity: pytorch3d/pathtracer/scene.py:10-162 (``mesh_intersect``
with min-t, barycentric uv, geometric normals, 1e-5 normal offset;
``mesh_intersect_test`` any-hit) and the OBJ loading the reference pulls
from pytorch3d (io/obj_io.py:222 / Meshes.verts_packed).

TPU-first: the compute path is a vectorized all-faces Moller-Trumbore with
a ``lax.scan`` over face CHUNKS (bounding memory like the reference's
split_n=256 python loop, but compiled) — batched triangle math maps onto
the VPU.  The native (C++/OpenMP) backend in ``..native`` serves host-side
bulk queries (dataset generation) without an accelerator round trip.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..interaction import Interaction
from ..ops.math import normalize

EPS = 1e-8


def load_obj(path: str):
    """Minimal OBJ loader -> (verts [V,3] f32, faces [F,3] i32).

    Handles v / f records with polygon fan triangulation and v/vt/vn
    index syntax (1-based and negative indices).
    """
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v":
                verts.append([float(x) for x in parts[1:4]])
            elif parts[0] == "f":
                idx = []
                for tok in parts[1:]:
                    i = int(tok.split("/")[0])
                    idx.append(i - 1 if i > 0 else len(verts) + i)
                for k in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return (np.asarray(verts, np.float32), np.asarray(faces, np.int32))


def _moller_trumbore(r_o, r_d, v0, v1, v2):
    """Batched ray x face-chunk intersection.

    r_o/r_d: [..., 3]; v0/v1/v2: [F, 3].
    Returns (t [..., F] with inf misses, u, v barycentrics).
    """
    e1 = v1 - v0                                   # [F, 3]
    e2 = v2 - v0
    pv = jnp.cross(r_d[..., None, :], e2)          # [..., F, 3]
    det = jnp.sum(e1 * pv, axis=-1)                # [..., F]
    inv_det = jnp.where(jnp.abs(det) < EPS, 0.0, 1.0 / det)
    tv = r_o[..., None, :] - v0
    u = jnp.sum(tv * pv, axis=-1) * inv_det
    qv = jnp.cross(tv, jnp.broadcast_to(e1, tv.shape))
    v = jnp.sum(r_d[..., None, :] * qv, axis=-1) * inv_det
    t = jnp.sum(e2 * qv, axis=-1) * inv_det
    valid = ((jnp.abs(det) >= EPS) & (u >= 0) & (u <= 1) & (v >= 0)
             & (u + v <= 1) & (t > EPS))
    return jnp.where(valid, t, jnp.inf), u, v


class TriangleMesh:
    """Static triangle mesh (non-learnable geometry)."""

    def __init__(self, verts, faces, chunk: int = 256,
                 backend: str = "jax"):
        assert backend in ("jax", "native")
        self.verts = jnp.asarray(verts, jnp.float32)
        self.faces = jnp.asarray(faces, jnp.int32)
        self.chunk = chunk
        self.backend = backend
        # pad faces to a chunk multiple with degenerate (all-0) triangles
        f = self.faces.shape[0]
        pad = (-f) % chunk
        if pad:
            self.faces = jnp.concatenate(
                [self.faces, jnp.zeros((pad, 3), jnp.int32)], axis=0)
        self._tris = self.verts[self.faces]        # [F, 3, 3]

    @classmethod
    def from_obj(cls, path: str, **kwargs) -> "TriangleMesh":
        verts, faces = load_obj(path)
        return cls(verts, faces, **kwargs)

    def init(self, key=None):
        return {}

    def _scan_min(self, r_o, r_d, max_t):
        """lax.scan over face chunks tracking (min_t, chunk+face idx, uv)."""
        tris = self._tris.reshape(-1, self.chunk, 3, 3)

        def body(carry, tri_chunk):
            best_t, best_i, best_uv, i0 = carry
            t, u, v = _moller_trumbore(r_o, r_d, tri_chunk[:, 0],
                                       tri_chunk[:, 1], tri_chunk[:, 2])
            tc = jnp.min(t, axis=-1)
            ic = jnp.argmin(t, axis=-1)
            uc = jnp.take_along_axis(u, ic[..., None], axis=-1)[..., 0]
            vc = jnp.take_along_axis(v, ic[..., None], axis=-1)[..., 0]
            better = tc < best_t
            best_uv = jnp.where(better[..., None],
                                jnp.stack([uc, vc], axis=-1), best_uv)
            best_i = jnp.where(better, ic + i0, best_i)
            best_t = jnp.where(better, tc, best_t)
            return (best_t, best_i, best_uv, i0 + self.chunk), None

        batch = r_o.shape[:-1]
        init = (jnp.full(batch, jnp.asarray(max_t, jnp.float32)),
                jnp.full(batch, -1, jnp.int32),
                jnp.zeros(batch + (2,), jnp.float32),
                jnp.int32(0))
        (best_t, best_i, best_uv, _), _ = lax.scan(body, init, tris)
        return best_t, best_i, best_uv

    def intersect(self, params, rays, key=None, primary: bool = True,
                  active=None, max_t: float = 1e10):
        r_o, r_d = rays[..., :3], rays[..., 3:]
        if self.backend == "native":
            from .. import native
            t_np, face_np, uv_np, n_np, hit_np = native.mesh_intersect(
                np.asarray(rays, np.float32).reshape(-1, 6),
                np.asarray(self.verts), np.asarray(self.faces), max_t)
            batch = r_o.shape[:-1]
            t = jnp.asarray(t_np).reshape(batch)
            hit = jnp.asarray(hit_np).reshape(batch)
            n = jnp.asarray(n_np).reshape(batch + (3,))
            t_safe = jnp.where(hit, t, 0.0)
        else:
            best_t, best_i, best_uv = self._scan_min(r_o, r_d, max_t)
            hit = best_i >= 0
            t_safe = jnp.where(hit, best_t, 0.0)
            tri = self._tris[jnp.maximum(best_i, 0)]
            n = normalize(jnp.cross(tri[..., 1, :] - tri[..., 0, :],
                                    tri[..., 2, :] - tri[..., 0, :]))
            # geometric normal faces the ray origin
            n = jnp.where(jnp.sum(n * r_d, axis=-1, keepdims=True) > 0,
                          -n, n)
            t = best_t
        n = jnp.where(hit[..., None], n, 0.0)
        p = r_o + t_safe[..., None] * r_d + n * 1e-5
        it = Interaction(p=p, t=t_safe).with_normals(n)
        it = it._replace(wi=it.to_local(-r_d))
        return it, hit

    def intersect_test(self, params, rays, max_t=1e10, active=None):
        r_o, r_d = rays[..., :3], rays[..., 3:]
        max_t_b = jnp.broadcast_to(jnp.asarray(max_t, jnp.float32),
                                   r_o.shape[:-1])
        if self.backend == "native":
            from .. import native
            nb = native.mesh_intersect_test(
                np.asarray(rays, np.float32).reshape(-1, 6),
                np.asarray(self.verts), np.asarray(self.faces),
                np.asarray(max_t_b).reshape(-1))
            return jnp.asarray(nb).reshape(r_o.shape[:-1])
        best_t, best_i, _ = self._scan_min(r_o, r_d, 1e10)
        blocked = (best_i >= 0) & (best_t < max_t_b)
        return ~blocked
