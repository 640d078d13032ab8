"""Render drivers: full-image tiled rendering and crop sampling.

Behavioral parity: pytorch3d/pathtracer/main.py —
  * ``pathtrace`` (:13-93): tile the image, generate per-tile camera ray
    bundles, run the integrator, average the bundle dim, write background
    into invalid pixels
  * ``pathtrace_sample`` (:97-179): render only a random crop (training)

TPU-first design: the per-tile work is one jitted pure function of
``(params, camera, tile_offset, key)`` with static tile shape — every tile
reuses the same executable; tile iteration is host-side index math only.
``render_rays`` exposes the flat ``[R, 6]`` ray-batch path for benchmarks
and sharded rendering.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .scene import Scene


def render_rays(scene: Scene, params: dict, rays: jax.Array, integrator,
                key: Optional[jax.Array] = None, training: bool = False):
    """Run the integrator over an arbitrary ray batch ``[..., 6]``."""
    return integrator.sample(scene, params, rays, key=key, training=training)


# Scene/integrator objects are jit STATIC args hashed by identity.  jax's
# static-arg cache can FALSELY HIT when a dead static's id is recycled by a
# new object (observed: an edited scene rendering the old scene's images).
# Retaining a strong reference per object pins the ids for the process
# lifetime (bounded: one entry per distinct scene/integrator).
_STATIC_RETAIN: dict = {}


def _retain(*objs):
    for o in objs:
        _STATIC_RETAIN[id(o)] = o


def _tile_positions(x_start, y_start, chunk: int):
    """Pixel-position grid for one tile: [chunk, chunk, 2] = (y, x) coords."""
    xs = x_start + jnp.arange(chunk, dtype=jnp.float32)
    ys = y_start + jnp.arange(chunk, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys, indexing="ij")
    # positions[..., 0] = second image axis (y), [..., 1] = first (x) —
    # matches the reference's stack([grid_y, grid_x], -1) (main.py:66-71)
    return jnp.stack([gy, gx], axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("scene", "integrator", "chunk", "bundle_size", "size",
                     "with_noise", "training"))
def _render_tile(scene, integrator, params, camera, x_start, y_start,
                 key, background, chunk: int, bundle_size: int, size: int,
                 with_noise, training: bool):
    positions = _tile_positions(x_start, y_start, chunk)
    ckey = ikey = None
    if key is not None:
        ckey, ikey = jax.random.split(key)
    rays = camera.sample_positions(positions, key=ckey,
                                   bundle_size=bundle_size, size=size,
                                   with_noise=with_noise)
    values, mask, it = integrator.sample(scene, params, rays, key=ikey,
                                         training=training)
    # mean over the bundle dim; background written in-device so the host
    # loop can enqueue every tile before any transfer (tiles pipeline on
    # the device instead of a host sync per tile)
    valid = jnp.any(mask, axis=-1)                       # [N, c, c]
    v = jnp.mean(values, axis=-2)                        # [N, c, c, dims]
    v = jnp.where(valid[..., None], v, background)
    return v, it


@functools.partial(
    jax.jit,
    static_argnames=("scene", "integrator", "chunk", "n_tiles",
                     "bundle_size", "size", "with_noise", "training"))
def _render_tiles_scanned(scene, integrator, params, camera, key, background,
                          chunk: int, n_tiles: int, bundle_size: int,
                          size: int, with_noise, training: bool):
    """ONE dispatch for the whole image: ``lax.map`` over the tile grid.

    The per-tile Python loop paid tunnel/dispatch latency per tile, making
    eval renders ~2x slower per ray than training; the in-device tile scan
    reuses the single traced tile body.  RNG per tile is
    ``fold_in(key, linear_index)`` — identical to the loop path.
    """

    def body(idx):
        x0 = (idx // n_tiles).astype(jnp.float32) * chunk
        y0 = (idx % n_tiles).astype(jnp.float32) * chunk
        positions = _tile_positions(x0, y0, chunk)
        ckey = ikey = None
        if key is not None:
            ckey, ikey = jax.random.split(jax.random.fold_in(key, idx))
        rays = camera.sample_positions(positions, key=ckey,
                                       bundle_size=bundle_size, size=size,
                                       with_noise=with_noise)
        values, mask, _ = integrator.sample(scene, params, rays, key=ikey,
                                            training=training)
        valid = jnp.any(mask, axis=-1)                   # [N, c, c]
        v = jnp.mean(values, axis=-2)                    # [N, c, c, dims]
        return jnp.where(valid[..., None], v, background)

    tiles = lax.map(body, jnp.arange(n_tiles * n_tiles))  # [T, N, c, c, d]
    n, d = tiles.shape[1], tiles.shape[-1]
    img = tiles.reshape(n_tiles, n_tiles, n, chunk, chunk, d)
    img = jnp.transpose(img, (2, 0, 3, 1, 4, 5))
    return img.reshape(n, n_tiles * chunk, n_tiles * chunk, d)


def pathtrace(scene: Scene, params: dict, camera, integrator,
              size: int = 512, chunk_size: int = 32, bundle_size: int = 4,
              background: float = 1.0, key: Optional[jax.Array] = None,
              with_noise=1e-3, training: bool = False,
              squeeze_first: bool = True, scan_tiles: bool = True):
    """Full-image render; returns ``(images [N, W, H, dims], last it)``.

    ``scan_tiles=True`` (default) renders the whole tile grid in one jitted
    dispatch (`lax.map`); ``False`` keeps the per-tile host loop, whose
    return carries the last tile's interaction.  Both produce identical
    images (same per-tile fold_in keys).
    """
    assert size % chunk_size == 0, \
        f"chunk_size must divide size ({size} % {chunk_size})"
    _retain(scene, integrator)
    n = len(camera)
    dims = integrator.dims()
    bg = jnp.float32(background)
    n_tiles = size // chunk_size

    if scan_tiles:
        img = _render_tiles_scanned(
            scene, integrator, params, camera, key, bg,
            chunk=chunk_size, n_tiles=n_tiles, bundle_size=bundle_size,
            size=size, with_noise=with_noise, training=training)
        out = np.asarray(img)
        if squeeze_first and n == 1:
            out = out[0]
        return out, None

    out = np.full((n, size, size, dims), background, dtype=np.float32)
    it = None
    tiles = []
    for ti in range(n_tiles):
        for tj in range(n_tiles):
            tkey = None
            if key is not None:
                tkey = jax.random.fold_in(key, ti * n_tiles + tj)
            x0 = jnp.float32(ti * chunk_size)
            y0 = jnp.float32(tj * chunk_size)
            v, it = _render_tile(
                scene, integrator, params, camera, x0, y0, tkey, bg,
                chunk=chunk_size, bundle_size=bundle_size, size=size,
                with_noise=with_noise, training=training)
            tiles.append((ti, tj, v))
    # single transfer pass after all tiles are enqueued
    for ti, tj, v in tiles:
        out[:, ti * chunk_size:(ti + 1) * chunk_size,
            tj * chunk_size:(tj + 1) * chunk_size, :] = np.asarray(v)
    if squeeze_first and n == 1:
        out = out[0]
    return out, it


def pathtrace_sample(scene: Scene, integrator, params: dict, camera,
                     uv, key, crop_size: int = 32,
                     bundle_size: int = 1, size: int = 256,
                     with_noise=False, training: bool = True):
    """Render a ``crop_size``^2 window at pixel offset ``uv=(u, v)``.

    Fully jitted (static crop shape, dynamic offset): the training loop
    calls this once per step with no retracing.
    Returns ``(values [N, S, S, bundle, dims], active, it)``.
    """
    _retain(scene, integrator)
    return _pathtrace_sample_jit(scene, integrator, params, camera, uv, key,
                                 crop_size=crop_size,
                                 bundle_size=bundle_size, size=size,
                                 with_noise=with_noise, training=training)


@functools.partial(
    jax.jit,
    static_argnames=("scene", "integrator", "crop_size", "bundle_size",
                     "size", "with_noise", "training"))
def _pathtrace_sample_jit(scene: Scene, integrator, params: dict, camera,
                          uv, key, crop_size: int = 32,
                          bundle_size: int = 1, size: int = 256,
                          with_noise=False, training: bool = True):
    u, v = uv
    positions = _tile_positions(jnp.float32(u), jnp.float32(v), crop_size)
    ckey = ikey = None
    if key is not None:
        ckey, ikey = jax.random.split(key)
    rays = camera.sample_positions(positions, key=ckey,
                                   bundle_size=bundle_size, size=size,
                                   with_noise=with_noise)
    values, active, it = integrator.sample(scene, params, rays, key=ikey,
                                           training=training)
    return values, active, it
