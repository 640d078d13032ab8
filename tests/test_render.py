"""Renderer regression tests."""

import jax
import jax.numpy as jnp
import numpy as np

import neural_raytracing_tpu as nrt
from neural_raytracing_tpu import edits
from neural_raytracing_tpu.bsdf import Diffuse
from neural_raytracing_tpu.cameras import (
    FoVPerspectiveCamera, look_at_view_transform,
)
from neural_raytracing_tpu.integrators import Direct
from neural_raytracing_tpu.lights import PointLights
from neural_raytracing_tpu.nn import SkipConnMLP
from neural_raytracing_tpu.shapes import SDF, SphereSDF


def small_scene():
    sdf = SDF(SphereSDF(n=8, mlp=SkipConnMLP(
        in_size=3, out=1, num_layers=2, hidden_size=16, freqs=4,
        activation="softplus", init="zeros")),
        max_steps=16, throughput_steps=8)
    return nrt.Scene(shape=sdf, bsdf=Diffuse(),
                     lights=PointLights(location=(0.0, 1.0, 4.0), scale=50.0))


class TestStaticArgCacheSafety:
    def test_edited_scene_after_render_is_not_stale(self):
        """Regression: jit static-arg id reuse must not serve stale renders.

        The failing pattern was: render scene A (with inline integrator
        objects that die immediately), THEN build an edited scene B and
        render it — B's render came back bit-identical to A's because a
        recycled object id collided in the static-arg cache.
        """
        scene = small_scene()
        params = scene.init(jax.random.PRNGKey(0))
        r, t = look_at_view_transform(dist=1.2, elev=10.0, azim=20.0)
        cam = FoVPerspectiveCamera(R=r, T=t)
        img0, _ = nrt.pathtrace(scene, params, cam, Direct(training=False),
                                size=16, chunk_size=16, background=0.0,
                                key=jax.random.PRNGKey(1), with_noise=False)
        edited = scene.replace(
            shape=scene.shape.with_warp(edits.scale_axis(s=0.3, axis=2)))
        img1, _ = nrt.pathtrace(edited, params, cam, Direct(training=False),
                                size=16, chunk_size=16, background=0.0,
                                key=jax.random.PRNGKey(1), with_noise=False)
        assert float(np.abs(np.asarray(img0) - np.asarray(img1)).max()) > 1e-5

    def test_pathtrace_sample_edit_not_stale(self):
        from neural_raytracing_tpu.render import pathtrace_sample
        scene = small_scene()
        params = scene.init(jax.random.PRNGKey(0))
        r, t = look_at_view_transform(dist=1.2, elev=10.0, azim=20.0)
        cam = FoVPerspectiveCamera(R=r, T=t)
        uv = (jnp.float32(4.0), jnp.float32(4.0))
        v0, _, _ = pathtrace_sample(scene, Direct(training=True), params,
                                    cam, uv, jax.random.PRNGKey(1),
                                    crop_size=8, size=16)
        edited = scene.replace(
            shape=scene.shape.with_warp(edits.scale_axis(s=0.3, axis=2)))
        v1, _, _ = pathtrace_sample(edited, Direct(training=True), params,
                                    cam, uv, jax.random.PRNGKey(1),
                                    crop_size=8, size=16)
        assert float(np.abs(np.asarray(v0) - np.asarray(v1)).max()) > 1e-6


def test_equal_config_integrators_share_jit_cache():
    """Fresh Direct(training=False) instances must not retrace the tile fn."""
    from neural_raytracing_tpu.integrators import Direct, Mask, Path
    from neural_raytracing_tpu.render import _render_tile
    assert Direct(training=False) == Direct(training=False)
    assert hash(Direct(training=False)) == hash(Direct(training=False))
    assert Direct(training=False) != Direct(training=True)
    assert Mask(Direct(training=False)) == Mask(Direct(training=False))
    assert Path(max_depth=2) != Path(max_depth=3)

    import jax
    import neural_raytracing_tpu as nrt
    from neural_raytracing_tpu.shapes import Sphere
    from neural_raytracing_tpu.bsdf import Diffuse
    from neural_raytracing_tpu.lights import PointLights
    from neural_raytracing_tpu.cameras import (
        FoVPerspectiveCamera, look_at_view_transform,
    )
    R, T = look_at_view_transform(dist=2.0, elev=0.0, azim=0.0)
    cam = FoVPerspectiveCamera(R=R, T=T)
    scene = nrt.Scene(shape=Sphere((0, 0, 0), 1.0), bsdf=Diffuse(),
                      lights=PointLights(location=[0., 1., 4.], scale=10.))
    params = scene.init(jax.random.PRNGKey(0))
    before = _render_tile._cache_size()
    for k in range(3):
        nrt.pathtrace(scene, params, cam, Direct(training=False), size=16,
                      chunk_size=16, bundle_size=1,
                      key=jax.random.PRNGKey(k), background=0.0)
    added = _render_tile._cache_size() - before
    assert added <= 1, f"tile fn retraced {added} times for equal integrators"


class TestScannedTiles:
    def test_scanned_matches_loop(self):
        """The one-dispatch lax.map tile render must match the per-tile
        host loop bit-for-bit (same per-tile fold_in keys)."""
        scene = small_scene()
        params = scene.init(jax.random.PRNGKey(0))
        r, t = look_at_view_transform(dist=1.2, elev=10.0, azim=20.0)
        cam = FoVPerspectiveCamera(R=r, T=t)
        kw = dict(size=32, chunk_size=16, bundle_size=2, background=0.25,
                  key=jax.random.PRNGKey(3))
        scanned, it_s = nrt.pathtrace(scene, params, cam,
                                      Direct(training=False),
                                      scan_tiles=True, **kw)
        looped, _ = nrt.pathtrace(scene, params, cam, Direct(training=False),
                                  scan_tiles=False, **kw)
        assert it_s is None
        np.testing.assert_array_equal(np.asarray(scanned),
                                      np.asarray(looped))

    def test_scanned_multiview_shape(self):
        scene = small_scene()
        params = scene.init(jax.random.PRNGKey(0))
        r, t = look_at_view_transform(dist=1.2, elev=np.asarray([0.0, 20.0]),
                                      azim=np.asarray([0.0, 45.0]))
        cam = FoVPerspectiveCamera(R=r, T=t)
        img, _ = nrt.pathtrace(scene, params, cam, Direct(training=False),
                               size=32, chunk_size=16, background=0.0,
                               key=jax.random.PRNGKey(1))
        assert img.shape == (2, 32, 32, 3)
        assert np.isfinite(img).all()
