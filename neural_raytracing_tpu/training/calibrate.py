"""One-shot light-exposure calibration at init.

Why this exists (round-4 NeRV forensics, RESULTS.md): ``PointLights``
radiance is ``scale * normalize(intensity) / falloff(d)`` (reference
lights.py:89-110) — the intensity vector is NORMALIZED, so only the scalar
``scale``/falloff parameters set the global exposure, and AdamW at the
reference's light LR (4e-5) moves a scalar by roughly ``lr * steps`` ~ 1.0
over a 25k run.  An init scale sitting far from the capture rig's (the
reference's NeRV default is 100) therefore CANNOT train away; the BSDF
absorbs what it can and the run equilibrates off-brightness (measured:
a global 0.447x rescale recovered +4.2 dB on the uncalibrated model).

The reference never hit this because its NeRV datasets and light scale
were authored together; a framework ingesting arbitrary captures needs the
measurement.  ``calibrate_exposure`` renders a few training frames with
the INIT parameters and rescales the light's ``scale`` so the masked
render brightness matches the ground truth's.  It is a pure measurement —
no training semantics change; the returned state differs from the input
only in ``params["lights"]["scale"]``.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import numpy as np

from ..integrators import Direct
from ..render import pathtrace
from ..scene import Scene


def calibrate_exposure(scene: Scene, state, make_camera: Callable,
                       images, masks, *, size: int, chunk_size: int,
                       light_update: Optional[Callable] = None,
                       views: Optional[Sequence[int]] = None,
                       key=None, log_fn: Callable = print):
    """Rescale ``params["lights"]["scale"]`` so init renders match GT
    brightness on the object mask.

    ``make_camera([i]) -> camera`` builds the view-i camera batch;
    ``light_update(params, camera, [i]) -> params`` applies per-view
    lighting (NeRV per-frame light locations) before rendering.  Uses
    views ``[0, V//2]`` by default.  Returns ``(state, ratio)``; a scene
    whose light params have no ``"scale"`` leaf is returned unchanged
    with ratio 1.0.
    """
    lights_params = state.params.get("lights")
    if not isinstance(lights_params, dict) or "scale" not in lights_params:
        return state, 1.0
    if key is None:
        key = jax.random.PRNGKey(2)
    if views is None:
        # dedup: a single-image dataset would otherwise render view 0
        # twice (and duplicates double-weight the ratio in general)
        views = tuple(sorted({0, len(images) // 2}))
    rsum = gsum = 0.0
    n_used = 0
    for i in views:
        p = state.params
        if light_update is not None:
            p = light_update(p, None, [i])
        img, _ = pathtrace(scene, p, make_camera([i]),
                           Direct(training=False), size=size,
                           chunk_size=chunk_size, background=0.0, key=key)
        im = np.asarray(img)[..., :3]
        im = im.reshape(im.shape[-3:])
        m = np.asarray(masks[i]) > 0.5
        if not m.any():
            continue
        n_used += 1
        rsum += float(im[m].mean())
        gsum += float(np.asarray(images[i])[..., :3][m].mean())
    # degenerate measurements must NOT be committed: empty masks / a black
    # GT would zero the scale; an init render that misses the object in
    # every probe view (rsum ~ 0) would explode it.  Leave the state alone
    # and let training proceed from the init scale in those cases.
    if n_used == 0 or rsum <= 1e-6 or gsum <= 1e-6:
        log_fn("exposure calibration: degenerate measurement "
               f"(views used {n_used}, render {rsum:.2e}, GT {gsum:.2e}) "
               "— leaving light scale unchanged")
        return state, 1.0
    ratio = gsum / rsum
    new_lights = dict(lights_params)
    new_lights["scale"] = lights_params["scale"] * ratio
    params = dict(state.params)
    params["lights"] = new_lights
    state = state._replace(params=params)
    log_fn(f"exposure calibration: render {rsum / n_used:.4f} "
           f"vs GT {gsum / n_used:.4f} -> scale x{ratio:.4f} = "
           f"{float(new_lights['scale']):.2f}")
    return state, ratio
