"""Tests for visualization helpers and the profiling module."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from neural_raytracing_tpu import profiling
from neural_raytracing_tpu.bsdf import ComposeSpatialVarying, Diffuse
from neural_raytracing_tpu.nn import SkipConnMLP
from neural_raytracing_tpu.utils import (
    count_parameters, depth_image, sphere_examples, sphere_render_bsdf,
)


class TestSphereRenders:
    def test_sphere_render_bsdf(self):
        bsdf = Diffuse((0.9, 0.2, 0.1))
        img = sphere_render_bsdf(bsdf, bsdf.init(), size=32, chunk_size=32)
        img = np.asarray(img)
        assert img.shape == (32, 32, 3)
        # background is white (1.0), sphere is lit reddish in the middle
        assert img[0, 0].min() == 1.0
        center = img[16, 16]
        assert center[0] > center[2]

    def test_sphere_examples_per_basis(self):
        mix = ComposeSpatialVarying(
            [Diffuse((1.0, 0.1, 0.1)), Diffuse((0.1, 0.1, 1.0))],
            sp_var_fn=SkipConnMLP(in_size=3, out=2, num_layers=2,
                                  hidden_size=16, freqs=4))
        params = mix.init(jax.random.PRNGKey(0))
        outs = sphere_examples(mix, params, size=32, chunk_size=32)
        assert len(outs) == 2
        a, b = np.asarray(outs[0]), np.asarray(outs[1])
        assert a[16, 16, 0] > a[16, 16, 2]   # red basis
        assert b[16, 16, 2] > b[16, 16, 0]   # blue basis


class TestDepthImage:
    def test_normalizes(self):
        img = jnp.stack([jnp.asarray([[1.0, 2.0], [4.0, 0.0]]),
                         jnp.asarray([[1.0, 1.0], [1.0, 0.0]])], axis=-1)
        out = np.asarray(depth_image(img))
        assert out.shape == (2, 2, 4)
        assert out[..., 0].max() == 1.0


class TestProfiling:
    def test_throughput_meter(self):
        m = profiling.Throughput()
        m.step(100)
        time.sleep(0.01)
        m.step(100)
        s = m.summary()
        assert s["rays_per_sec_ema"] > 0
        assert s["step_time_ema"] > 0

    def test_step_timer(self):
        t = profiling.StepTimer()
        with t.phase("work"):
            time.sleep(0.01)
        assert t.times["work"] >= 0.01

    def test_count_parameters(self):
        tree = {"a": jnp.zeros((2, 3)), "b": (jnp.zeros(5),)}
        assert count_parameters(tree) == 11

    def test_debug_nans_toggle(self):
        profiling.debug_nans(True)
        try:
            raised = False
            try:
                jnp.log(jnp.asarray(-1.0)) + 0  # nan -> error when enabled
            except FloatingPointError:
                raised = True
            assert raised
        finally:
            profiling.debug_nans(False)
