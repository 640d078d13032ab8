"""Golden-image regression tests.

Renders tiny canonical scenes and compares against checked-in golden
arrays (tests/golden/*.npy).  Regenerate with
``python tests/test_golden.py regen`` after INTENDED visual changes.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neural_raytracing_tpu as nrt
from neural_raytracing_tpu.bsdf import Conductor, Diffuse, Phong
from neural_raytracing_tpu.cameras import (
    FoVPerspectiveCamera, look_at_view_transform,
)
from neural_raytracing_tpu.integrators import Debug, Direct
from neural_raytracing_tpu.lights import PointLights
from neural_raytracing_tpu.shapes import Sphere

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
SIZE = 32


def render(bsdf, integrator=None):
    scene = nrt.Scene(shape=Sphere((0.0, 0.0, 0.0), 1.0), bsdf=bsdf,
                      lights=PointLights(location=(0.0, 1.0, 4.0),
                                         scale=100.0))
    params = scene.init(jax.random.PRNGKey(0))
    r, t = look_at_view_transform(dist=2.0, elev=0.0, azim=0.0)
    cam = FoVPerspectiveCamera(R=r, T=t)
    img, _ = nrt.pathtrace(scene, params, cam,
                           integrator or Direct(training=False),
                           size=SIZE, chunk_size=SIZE, bundle_size=1,
                           background=0.0, key=jax.random.PRNGKey(1),
                           with_noise=False)
    return np.asarray(img)


def render_sdf_shadow(shadow_past_light_exit=True):
    from neural_raytracing_tpu.nn import SkipConnMLP
    from neural_raytracing_tpu.shapes import SDF, SphereSDF
    mlp = SkipConnMLP(in_size=3, out=1, num_layers=2, hidden_size=32,
                      freqs=8, activation="softplus", init="uniform")
    shape = SDF(SphereSDF(n=8, mlp=mlp), max_steps=24, throughput_steps=16,
                shadow_past_light_exit=shadow_past_light_exit)
    scene = nrt.Scene(shape=shape, bsdf=Diffuse(),
                      lights=PointLights(location=(1.5, 1.0, 1.5),
                                         scale=50.0),
                      occlusion="hard")
    params = scene.init(jax.random.PRNGKey(0))
    r, t = look_at_view_transform(dist=2.0, elev=10.0, azim=30.0)
    cam = FoVPerspectiveCamera(R=r, T=t)
    img, _ = nrt.pathtrace(scene, params, cam, Direct(training=False),
                           size=SIZE, chunk_size=SIZE, bundle_size=1,
                           background=0.0, key=jax.random.PRNGKey(1),
                           with_noise=False)
    return np.asarray(img)


CASES = {
    "sphere_diffuse": lambda: render(Diffuse()),
    "sphere_phong": lambda: render(Phong()),
    "sphere_conductor": lambda: render(Conductor()),
    "sphere_normals": lambda: render(Diffuse(), Debug()),
    "sdf_hard_shadow": render_sdf_shadow,
}


def test_shadow_exit_default_matches_reference_parity():
    """The r3 default (past-light shadow early exit) must be
    image-identical to the reference's keep-marching semantics."""
    a = render_sdf_shadow(True)
    b = render_sdf_shadow(False)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npy")
    if not os.path.exists(path):
        pytest.skip(f"golden missing: run `python {__file__} regen`")
    got = CASES[name]()
    expected = np.load(path)
    np.testing.assert_allclose(got, expected, atol=2e-3,
                               err_msg=f"golden mismatch: {name}")


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] in ("regen", "regen-missing"):
        # goldens are CPU-rendered (the suite runs on the forced CPU mesh;
        # TPU numerics differ at bf16 matmul tolerance)
        jax.config.update("jax_platforms", "cpu")
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for name, fn in CASES.items():
            path = os.path.join(GOLDEN_DIR, f"{name}.npy")
            if sys.argv[1] == "regen-missing" and os.path.exists(path):
                continue
            np.save(path, fn())
            print("wrote", name)
