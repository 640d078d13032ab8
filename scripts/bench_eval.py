"""Measure the 256^2 hard-shadow eval render (scan_tiles vs host tile loop).

Serving-path benchmark: full-frame render through the public pathtrace API
(SDF march 64 + hard shadows + 8-lobe spatially-varying BSDF). Run on an
idle TPU. Measured r2: scan 128.7 ms (509k rays/s) vs loop 166 ms.
"""
import os
import sys
import time
_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))      # repo root (package import)
sys.path.insert(0, _here)                       # scripts dir (_common)
from _common import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
import neural_raytracing_tpu as nrt
from neural_raytracing_tpu.bsdf import ComposeSpatialVarying, NeuralBSDF
from neural_raytracing_tpu.cameras import FoVPerspectiveCamera, look_at_view_transform
from neural_raytracing_tpu.integrators import Direct
from neural_raytracing_tpu.lights import PointLights
from neural_raytracing_tpu.shapes import SDF, SphereSDF

scene = nrt.Scene(shape=SDF(SphereSDF(n=128), max_steps=64,
                            throughput_steps=128),
                  bsdf=ComposeSpatialVarying(
                      [NeuralBSDF(activation="softplus") for _ in range(8)]),
                  lights=PointLights(location=[0., 1., 4.], scale=100.),
                  occlusion="hard")
params = scene.init(jax.random.PRNGKey(0))
r, t = look_at_view_transform(dist=2.0, elev=10.0, azim=20.0)
cam = FoVPerspectiveCamera(R=r, T=t)
integ = Direct(training=False)

scene_exit = scene.replace(shape=SDF(
    SphereSDF(n=128), max_steps=64, throughput_steps=128,
    shadow_past_light_exit=True))

for mode, chunk in [("scan128", 128), ("scan256", 256), ("loop128", 128),
                    ("scan128+shadow_exit", 128)]:
    scan = mode.startswith("scan")
    if mode.endswith("shadow_exit"):
        scene = scene_exit
    # warmup/compile
    img, _ = nrt.pathtrace(scene, params, cam, integ, size=256,
                           chunk_size=chunk, bundle_size=1, background=0.0,
                           key=jax.random.PRNGKey(1), scan_tiles=scan)
    t0 = time.perf_counter()
    n = 10
    for i in range(n):
        img, _ = nrt.pathtrace(scene, params, cam, integ, size=256,
                               chunk_size=chunk, bundle_size=1,
                               background=0.0,
                               key=jax.random.PRNGKey(2 + i),
                               scan_tiles=scan)
        float(np.asarray(img).sum())      # host sync
    dt = (time.perf_counter() - t0) / n
    print(f"{mode}: {dt*1e3:.1f} ms  ({256*256/dt/1e3:.0f}k rays/s)")
