"""Differentiable rasterizers — TPU-native counterparts of the reference's
csrc rasterizers.

Behavioral parity:
  * ``rasterize_points``  — pytorch3d/csrc/rasterize_points/ (ext.cpp:37,41)
  * ``rasterize_meshes``  — pytorch3d/csrc/rasterize_meshes/ (ext.cpp:38,42)
  * ``rasterize_spheres`` — the fork-added pytorch3d/csrc/rasterize_spheres/
    (ext.cpp:39,43): a per-point-radius point rasterizer — zbuf is the
    CENTER z, candidates with z < 0 or radius <= 0 are skipped, empty
    slots read -1 (rasterize_spheres_cpu.cpp:30-88)

Conventions (matching the reference rasterizers): screen x, y are NDC in
[-1, 1] with pixel (0, 0) at (+1, +1) (PixToNdc: ndc = 1 - 2*(i+0.5)/S),
z is retained view-space depth (smaller = closer, z < 0 culled), K
fragments per pixel sorted by ascending z, empty slots have idx -1 /
zbuf -1 / dists -1.

TPU-first design: instead of the reference's per-pixel priority queues
(dynamic, divergent — rasterize_points.cu) or coarse bin queues with
dynamic overflow, the K-buffer is a statically-shaped running top-K merged
through a ``lax.scan`` over primitive CHUNKS: each chunk computes its
coverage for ALL pixels as one batched VPU evaluation, takes its chunk-
local top-K, and merges with the carry via one sort of 2K candidates.
Every shape is static, so the whole rasterization jits into a single XLA
program; memory is bounded by pixels x chunk.  Gradients flow to the
primitive coordinates through zbuf/dists/barycentrics exactly where the
csrc backward kernels propagate them (idx is integral, as upstream).

For large face counts ``rasterize_meshes(bin_size=...)`` adds the
coarse-to-fine counterpart of the reference's binned rasterize_meshes.cu
(978 LoC of atomics into dynamic bin queues) as a static-shape two-pass:
a [tiles, F] bbox-overlap test builds fixed-capacity per-tile face lists
with one ``top_k``, then the same chunk-scanned fine pass runs per tile
over only its faces (vmapped).  Identical output to the naive rule when
no tile overflows its capacity.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax


class Fragments(NamedTuple):
    """Per-pixel K-buffer (idx ``[H, W, K]``, zbuf, dists; bary
    ``[H, W, K, 3]`` for meshes, None otherwise).  Empty slots fill
    every field with -1, matching the reference rasterizer's padding
    (rasterize_meshes.py) — test ``idx >= 0`` (or ``bary >= 0``) for
    occupancy before consuming values."""
    idx: jax.Array
    zbuf: jax.Array
    dists: jax.Array
    bary: Optional[jax.Array] = None


def _image_size(image_size) -> Tuple[int, int]:
    if isinstance(image_size, int):
        return image_size, image_size
    h, w = image_size
    return int(h), int(w)


def pix_to_ndc(i: jax.Array, s: int) -> jax.Array:
    """Pixel index -> NDC center, reference convention (ndc = 1 - 2*(i+.5)/S,
    rasterize_points_cpu.cpp PixToNdc)."""
    return 1.0 - 2.0 * (i + 0.5) / s


def _pixel_grid(h: int, w: int):
    ys = pix_to_ndc(jnp.arange(h, dtype=jnp.float32), h)
    xs = pix_to_ndc(jnp.arange(w, dtype=jnp.float32), w)
    return jnp.meshgrid(ys, xs, indexing="ij")           # [H, W] each


def _pad_chunks(arr: jax.Array, chunk: int, fill) -> jax.Array:
    n = arr.shape[0]
    pad = (-n) % chunk
    if pad:
        filler = jnp.full((pad,) + arr.shape[1:], fill, arr.dtype)
        arr = jnp.concatenate([arr, filler], axis=0)
    return arr


def _topk_scan(chunked, chunk_fn, k: int, pix_shape, n_payload: int):
    """Running per-pixel top-K (ascending z) over primitive chunks.

    ``chunk_fn(prim_chunk, base_idx) -> (z, valid, payload)`` with
    z ``pix_shape + [C]`` (any value where invalid), valid boolean, and
    payload ``pix_shape + [C, n_payload]``.  Returns (z ``pix+ [K]``,
    idx int32 (-1 empty), payload ``pix + [K, n_payload]``).
    """
    chunk = chunked.shape[1]

    def body(carry, inp):
        cz, cidx, cpay = carry
        prims, base = inp
        z, valid, pay = chunk_fn(prims, base)
        z = jnp.where(valid, z, jnp.inf)
        # chunk-local top-K then a 2K merge keeps the sort small
        kk = min(k, chunk)
        nz, sel = lax.top_k(-z, kk)                       # ascending z
        gz = -nz
        gidx = jnp.where(jnp.isfinite(gz),
                         base + sel.astype(jnp.int32), -1)
        gpay = jnp.take_along_axis(pay, sel[..., None], axis=-2)
        mz = jnp.concatenate([cz, gz], axis=-1)
        nz2, sel2 = lax.top_k(-mz, k)
        mz = -nz2
        midx = jnp.take_along_axis(
            jnp.concatenate([cidx, gidx], axis=-1), sel2, axis=-1)
        mpay = jnp.take_along_axis(
            jnp.concatenate([cpay, gpay], axis=-2), sel2[..., None],
            axis=-2)
        return (mz, midx, mpay), None

    init = (jnp.full(pix_shape + (k,), jnp.inf, jnp.float32),
            jnp.full(pix_shape + (k,), -1, jnp.int32),
            jnp.zeros(pix_shape + (k, n_payload), jnp.float32))
    bases = jnp.arange(chunked.shape[0], dtype=jnp.int32) * chunk
    (z, idx, pay), _ = lax.scan(body, init, (chunked, bases))
    return z, idx, pay


def rasterize_points(points: jax.Array, image_size=256,
                     radius: Union[float, jax.Array] = 0.01,
                     points_per_pixel: int = 8,
                     chunk: int = 256) -> Fragments:
    """Point-cloud rasterization (rasterize_points_cpu.cpp:26-96).

    points ``[P, 3]`` = (x_ndc, y_ndc, z_view); radius scalar or ``[P]``
    NDC radius.  -> Fragments with dists = squared NDC distance pixel
    center -> point.
    """
    h, w = _image_size(image_size)
    p = points.shape[0]
    radius = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), (p,))
    prims = jnp.concatenate([points, radius[:, None]], axis=-1)
    prims = _pad_chunks(prims, chunk, 0.0).reshape(-1, chunk, 4)
    py, px = _pixel_grid(h, w)

    def chunk_fn(pr, base):
        x, y, z, r = pr[:, 0], pr[:, 1], pr[:, 2], pr[:, 3]
        dx = px[..., None] - x
        dy = py[..., None] - y
        d2 = dx * dx + dy * dy
        valid = (d2 < r * r) & (z >= 0) & (r > 0)
        return jnp.broadcast_to(z, d2.shape), valid, d2[..., None]

    z, idx, pay = _topk_scan(prims, chunk_fn, points_per_pixel, (h, w), 1)
    filled = idx >= 0
    return Fragments(idx=idx,
                     zbuf=jnp.where(filled, z, -1.0),
                     dists=jnp.where(filled, pay[..., 0], -1.0))


def rasterize_spheres(spheres: jax.Array, image_size=256,
                      points_per_pixel: int = 8,
                      chunk: int = 256) -> Fragments:
    """The fork's sphere rasterizer (rasterize_spheres_cpu.cpp:26-96).

    spheres ``[S, 4]`` = (x_ndc, y_ndc, z_view, radius_ndc) — identical
    to :func:`rasterize_points` with a per-sphere radius column (the
    fork's only semantic difference; zbuf is the center z, :81).
    """
    return rasterize_points(spheres[:, :3], image_size,
                            radius=spheres[:, 3],
                            points_per_pixel=points_per_pixel, chunk=chunk)


_EPS = 1e-8


def _tri_chunk_coverage(tri, px, py, blur_radius, cull_backfaces):
    """Coverage of a triangle chunk ``[C, 3, 3]`` over pixel centers
    ``px``/``py`` (any shape): the csrc coverage rule shared by the naive
    and binned paths.  Returns ``(z, covered, payload[dist, b0, b1, b2])``
    with leading pixel dims + ``[C]``."""
    eps = _EPS

    def edge_fn(pxy, a, b):
        # 2x signed area of (a, b, p); positive = left of a->b
        return ((b[..., 0] - a[..., 0]) * (pxy[..., 1] - a[..., 1])
                - (b[..., 1] - a[..., 1]) * (pxy[..., 0] - a[..., 0]))

    def seg_d2(pxy, a, b):
        v = b - a
        t = (jnp.sum((pxy - a) * v, axis=-1)
             / jnp.maximum(jnp.sum(v * v, axis=-1), eps))
        t = jnp.clip(t, 0.0, 1.0)
        d = pxy - (a + t[..., None] * v)
        return jnp.sum(d * d, axis=-1)

    a2, b2, c2 = (tri[:, 0, :2], tri[:, 1, :2], tri[:, 2, :2])
    az, bz, cz = tri[:, 0, 2], tri[:, 1, 2], tri[:, 2, 2]
    pxy = jnp.stack([px, py], axis=-1)[..., None, :]      # pix + [1, 2]
    area = edge_fn(a2, b2, c2)                            # [C]
    w0 = edge_fn(pxy, b2, c2)
    w1 = edge_fn(pxy, c2, a2)
    w2 = edge_fn(pxy, a2, b2)
    inv = jnp.where(jnp.abs(area) < eps, 0.0, 1.0 / area)
    b0, b1, b2_ = w0 * inv, w1 * inv, w2 * inv
    inside = (b0 >= 0) & (b1 >= 0) & (b2_ >= 0)
    d_ab = seg_d2(pxy, a2, b2)
    d_bc = seg_d2(pxy, b2, c2)
    d_ca = seg_d2(pxy, c2, a2)
    d_edge = jnp.minimum(jnp.minimum(d_ab, d_bc), d_ca)
    dist = jnp.where(inside, -d_edge, d_edge)
    ok = jnp.abs(area) >= eps
    if cull_backfaces:
        ok = ok & (area > 0)
    ok = ok & (az >= 0) & (bz >= 0) & (cz >= 0)
    covered = inside | (d_edge < blur_radius)
    # clip barycentrics for z interpolation outside the face
    cb0 = jnp.maximum(b0, 0.0)
    cb1 = jnp.maximum(b1, 0.0)
    cb2 = jnp.maximum(b2_, 0.0)
    s = jnp.maximum(cb0 + cb1 + cb2, eps)
    cb0, cb1, cb2 = cb0 / s, cb1 / s, cb2 / s
    z = cb0 * az + cb1 * bz + cb2 * cz
    pay = jnp.stack([dist, b0, b1, b2_], axis=-1)
    return z, covered & ok, pay


def _mesh_fragments(z, idx, pay) -> Fragments:
    filled = idx >= 0
    return Fragments(
        idx=idx,
        zbuf=jnp.where(filled, z, -1.0),
        dists=jnp.where(filled, pay[..., 0], -1.0),
        # empty slots follow the reference's -1 fill for ALL fields
        # (rasterize_meshes.py pads idx/zbuf/dists/bary with -1), so code
        # that tests bary < 0 for emptiness behaves identically
        bary=jnp.where(filled[..., None], pay[..., 1:4], -1.0))


def rasterize_meshes(verts: jax.Array, faces: jax.Array, image_size=256,
                     blur_radius: float = 0.0, faces_per_pixel: int = 8,
                     chunk: int = 256,
                     cull_backfaces: bool = False,
                     bin_size: Optional[int] = None,
                     max_faces_per_bin: Optional[int] = None) -> Fragments:
    """Triangle rasterization (rasterize_meshes_cpu.cpp naive rule; binned
    coarse-to-fine when ``bin_size`` is set, rasterize_meshes.cu).

    verts ``[V, 3]`` in (x_ndc, y_ndc, z_view); faces ``[F, 3]`` int.
    -> Fragments with NDC barycentrics (clipped to the face for zbuf
    interpolation when the pixel is in the blur region) and dists =
    squared NDC distance to the nearest edge, NEGATED inside the face
    (the signed distance the soft blending consumes).  A pixel keeps a
    face if it is inside it or within ``blur_radius`` (squared) of an
    edge, faces with |area| < eps or any vertex z < 0 are skipped —
    matching the csrc coverage rule.

    ``bin_size`` selects the TPU-native coarse-to-fine path (the
    counterpart of the reference's binned rasterize_meshes.cu): the image
    is split into ``bin_size``-pixel tiles, a coarse pass intersects every
    face's blur-expanded NDC bbox with each tile, each tile keeps its
    first ``max_faces_per_bin`` overlapping faces (static shape; like the
    reference's bin overflow, faces beyond capacity are DROPPED — size
    capacity generously), and the fine top-K scan runs per tile over only
    those faces.  Cost falls from pixels x F to pixels x Q (+ the [tiles,
    F] coarse test); results are identical to the naive rule whenever no
    bin overflows.  ``bin_size=None``/``0`` = naive (the default; every
    pathtracer workload has tiny face counts — SURVEY §2.4).
    """
    h, w = _image_size(image_size)
    if bin_size:
        return _rasterize_meshes_binned(
            verts, faces, h, w, blur_radius, faces_per_pixel, chunk,
            cull_backfaces, bin_size, max_faces_per_bin)
    tris = verts[faces]                                   # [F, 3, 3]
    tris = _pad_chunks(tris, chunk, 0.0).reshape(-1, chunk, 3, 3)
    py, px = _pixel_grid(h, w)

    def chunk_fn(tri, base):
        return _tri_chunk_coverage(tri, px, py, blur_radius,
                                   cull_backfaces)

    z, idx, pay = _topk_scan(tris, chunk_fn, faces_per_pixel, (h, w), 4)
    return _mesh_fragments(z, idx, pay)


def _rasterize_meshes_binned(verts, faces, h, w, blur_radius,
                             faces_per_pixel, chunk, cull_backfaces,
                             bin_size, max_faces_per_bin) -> Fragments:
    """Coarse-to-fine tiled rasterization (rasterize_meshes.cu redesigned
    for XLA: static-capacity per-tile face lists built with one top-k
    instead of atomics into dynamic bin queues, fine pass vmapped over
    tiles)."""
    f = faces.shape[0]
    k = faces_per_pixel
    b = int(bin_size)
    th, tw = -(-h // b), -(-w // b)                       # tile grid
    q = max_faces_per_bin or max(1024, f // 5)
    q = min(q, f)
    tris_all = verts[faces]                               # [F, 3, 3]

    # --- coarse pass: blur-expanded face bbox vs tile pixel-center rects
    expand = math.sqrt(max(blur_radius, 0.0))
    xy = tris_all[..., :2]                                # [F, 3, 2]
    fx_min = xy[..., 0].min(axis=1) - expand
    fx_max = xy[..., 0].max(axis=1) + expand
    fy_min = xy[..., 1].min(axis=1) - expand
    fy_max = xy[..., 1].max(axis=1) + expand
    # tile extents over PIXEL CENTERS (padded rows/cols beyond the image
    # belong to crop-away tiles; their centers extrapolate harmlessly)
    rows = jnp.arange(th) * b
    cols = jnp.arange(tw) * b
    ty_max = pix_to_ndc(rows.astype(jnp.float32), h)      # first row center
    ty_min = pix_to_ndc((rows + b - 1).astype(jnp.float32), h)
    tx_max = pix_to_ndc(cols.astype(jnp.float32), w)
    tx_min = pix_to_ndc((cols + b - 1).astype(jnp.float32), w)
    ov_y = ((fy_min[None, :] <= ty_max[:, None])
            & (fy_max[None, :] >= ty_min[:, None]))       # [TH, F]
    ov_x = ((fx_min[None, :] <= tx_max[:, None])
            & (fx_max[None, :] >= tx_min[:, None]))       # [TW, F]
    overlap = (ov_y[:, None, :] & ov_x[None, :, :]).reshape(th * tw, f)

    # --- per-tile face lists: first q overlapping face ids (ascending),
    # one top-k on a rank key (no atomics / dynamic queues)
    key = jnp.where(overlap, jnp.arange(f, 0, -1, dtype=jnp.int32), 0)
    topv, topi = lax.top_k(key, q)                        # [T, q]
    tile_ids = jnp.where(topv > 0, topi, -1)              # [T, q] face ids
    tile_tris = tris_all[jnp.maximum(tile_ids, 0)]        # [T, q, 3, 3]
    tile_ok = tile_ids >= 0

    # --- fine pass: the naive top-K scan per tile over its q faces.
    # NDC mapping uses the TRUE h/w scale; padded rows/cols extrapolate
    # past [-1, 1] and are cropped after stitching.
    ys = pix_to_ndc(jnp.arange(th * b, dtype=jnp.float32), h)
    xs = pix_to_ndc(jnp.arange(tw * b, dtype=jnp.float32), w)
    py_full, px_full = jnp.meshgrid(ys, xs, indexing="ij")
    tile_px = (px_full.reshape(th, b, tw, b).transpose(0, 2, 1, 3)
               .reshape(th * tw, b, b))
    tile_py = (py_full.reshape(th, b, tw, b).transpose(0, 2, 1, 3)
               .reshape(th * tw, b, b))
    c = min(chunk, q)
    pad_q = (-q) % c

    def fine(tri_q, ok_q, px, py):
        tri_q = _pad_chunks(tri_q, c, 0.0).reshape(-1, c, 3, 3)
        ok_q = jnp.concatenate(
            [ok_q, jnp.zeros((pad_q,), bool)]).reshape(-1, c)

        def chunk_fn(tri, base):
            z, cov, pay = _tri_chunk_coverage(tri, px, py, blur_radius,
                                              cull_backfaces)
            return z, cov & ok_q[base // c], pay

        return _topk_scan(tri_q, chunk_fn, k, (b, b), 4)

    z, lidx, pay = jax.vmap(fine)(tile_tris, tile_ok, tile_px, tile_py)
    # map list-local indices back to original face ids
    idx = jnp.where(
        lidx >= 0,
        jnp.take_along_axis(
            tile_ids,
            jnp.clip(lidx, 0, q - 1).reshape(th * tw, -1),
            axis=1).reshape(lidx.shape),
        -1)

    def stitch(a):
        a = a.reshape((th, tw, b, b) + a.shape[3:])
        a = jnp.moveaxis(a, 2, 1).reshape((th * b, tw * b) + a.shape[4:])
        return a[:h, :w]

    return _mesh_fragments(stitch(z), stitch(idx), stitch(pay))
