"""Tests for samplers, learned warps, edits, MPI, NeuralApprox, geometry."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neural_raytracing_tpu as nrt
from neural_raytracing_tpu import edits
from neural_raytracing_tpu.ops.geometry import (
    distance_between_rays_and_segments, mesh_level_surfaces, ray_point_dist,
)
from neural_raytracing_tpu.samplers import (
    OrthogonalSampler, Sampler, permute_kensler,
)
from neural_raytracing_tpu.warps import (
    MipMap, NeuralWarp, SphericalHarmonics, legendre,
)


class TestSamplers:
    def test_uniform_range(self):
        s = Sampler(seed=0)
        x = s.sample((1000,))
        assert (np.asarray(x) >= 0).all() and (np.asarray(x) < 1).all()

    def test_distinct_draws(self):
        s = Sampler(seed=0)
        a, b = s.sample((10,)), s.sample((10,))
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_permute_kensler_is_permutation(self):
        for samples in (5, 8, 16, 37):
            idx = jnp.arange(samples)
            out = np.asarray(permute_kensler(idx, samples, seed=1234))
            assert sorted(out.tolist()) == list(range(samples))

    def test_permute_kensler_seed_varies(self):
        idx = jnp.arange(16)
        a = np.asarray(permute_kensler(idx, 16, seed=1))
        b = np.asarray(permute_kensler(idx, 16, seed=2))
        assert not np.array_equal(a, b)

    def test_orthogonal_sampler_stratified(self):
        s = OrthogonalSampler(sample_count=25, jitter=True, seed=0)
        pts = np.asarray(s.next_2d(s.sample_count))
        assert pts.shape == (25, 2)
        assert (pts >= 0).all() and (pts <= 1).all()
        # strength-2: each of the resolution strata in each dim holds
        # exactly `resolution` samples
        r = s.resolution
        for dim in range(2):
            counts = np.bincount((pts[:, dim] * r).astype(int), minlength=r)
            assert (counts == r).all(), counts


class TestNeuralWarp:
    def test_sample_and_pdf_shapes(self):
        w = NeuralWarp(dists=8)
        p = w.init(jax.random.PRNGKey(0))
        d, pdf = w.sample(p, jax.random.PRNGKey(1), (32,))
        assert d.shape == (32, 3)
        assert pdf.shape == (32,)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1),
                                   1.0, atol=1e-3)

    def test_prime_reduces_loss(self):
        w = NeuralWarp(dists=8)
        p = w.init(jax.random.PRNGKey(0))
        _, l0 = w.prime(p, jax.random.PRNGKey(1), iters=1)
        _, l1 = w.prime(p, jax.random.PRNGKey(1), iters=200)
        assert float(l1) < float(l0)


class TestMipMap:
    def test_pdf_normalized(self):
        m = MipMap(depth=4)
        p = m.init(jax.random.PRNGKey(0))
        xs = jnp.linspace(-0.999, 0.999, 64)
        gx, gy = jnp.meshgrid(xs, xs)
        grid = jnp.stack([gx, gy], axis=-1)
        pdf = m.pdf(p, grid)
        # integral over [-1,1]^2 with density defined on unit square scale
        integral = float(jnp.mean(pdf))  # mean of density*... uniform cells
        assert abs(integral - 1.0) < 0.05

    def test_sample_matches_pdf_regions(self):
        m = MipMap(depth=2)
        p = {"percents": jnp.asarray([5.0, -5.0, -5.0, -5.0])}
        uv, pdf = m.sample(p, jax.random.PRNGKey(0), (512,))
        # nearly all samples must fall in the high-weight leaf, and their
        # pdf must be the leaf weight * n_cells
        w = jax.nn.softmax(p["percents"])[0] * 4
        assert float(jnp.mean(pdf)) == pytest.approx(float(w), rel=0.05)

    def test_sample_pdf_consistency(self):
        m = MipMap(depth=3)
        p = m.init(jax.random.PRNGKey(3))
        uv, pdf = m.sample(p, jax.random.PRNGKey(1), (256,))
        pdf2 = m.pdf(p, uv)
        np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2),
                                   rtol=1e-4)


class TestSphericalHarmonics:
    def test_legendre_known_values(self):
        x = jnp.asarray([0.5])
        out = np.asarray(legendre(x, 4))[:, 0]
        np.testing.assert_allclose(
            out, [1.0, 0.5, 0.5 * (3 * 0.25 - 1) / 1.0,
                  0.5 * (5 * 0.125 - 3 * 0.5)], atol=1e-5)

    def test_basis_orthonormal(self):
        sh = SphericalHarmonics(order=2)
        key = jax.random.PRNGKey(0)
        d, _ = jax.random.normal(key, (200_000, 3)), None
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        b = sh.basis(d)
        gram = (b[..., None] * b[..., None, :]).mean(0) * 4 * math.pi
        np.testing.assert_allclose(np.asarray(gram), np.eye(4), atol=0.05)

    def test_fit_reconstructs(self):
        sh = SphericalHarmonics(order=3)
        true = {"coeffs": jax.random.normal(jax.random.PRNGKey(0), (9,))}
        d = jax.random.normal(jax.random.PRNGKey(1), (512, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        vals = sh(true, d)
        fitted = sh.fit({}, d, vals)
        np.testing.assert_allclose(np.asarray(fitted["coeffs"]),
                                   np.asarray(true["coeffs"]), atol=1e-3)


class TestEdits:
    def test_bend_identity_at_zero_k(self):
        w = edits.bend(k=0.0)
        p = jax.random.normal(jax.random.PRNGKey(0), (16, 3))
        np.testing.assert_allclose(np.asarray(w(p)), np.asarray(p),
                                   atol=1e-6)

    def test_translate_above(self):
        w = edits.translate_above(a=0.5, thresh=0.0)
        p = jnp.asarray([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0]])
        out = np.asarray(w(p))
        assert out[0, 0] == pytest.approx(0.5)
        assert out[1, 0] == pytest.approx(0.0)

    def test_add_hole_carves(self):
        from neural_raytracing_tpu.shapes import UNIT_SPHERE
        edited = edits.add_hole(lambda params, p: UNIT_SPHERE(params, p),
                                radius=0.3)
        # at the center: plain sphere sdf = -1, hole pushes it positive
        val = edited({}, jnp.asarray([[0.0, 0.0, 0.0]]))
        assert float(val[0]) > 0

    def test_compose(self):
        w = edits.compose(edits.bend(k=0.0), edits.scale_axis(s=0.5, axis=2))
        p = jnp.asarray([[0.0, 0.0, 1.0]])
        np.testing.assert_allclose(np.asarray(w(p)), [[0.0, 0.0, 2.0]],
                                   atol=1e-6)


class TestMPI:
    def test_renders_finite(self):
        from neural_raytracing_tpu.shapes import MPI
        mpi = MPI(num_planes=6)
        p = mpi.init(jax.random.PRNGKey(0))
        rays = jnp.concatenate([
            jnp.zeros((8, 3)).at[:, 2].set(2.0),
            jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (8, 1))], axis=-1)
        out = mpi.volume_render(p, rays)
        assert out.shape == (8, 3)
        assert np.isfinite(np.asarray(out)).all()


class TestNeuralApprox:
    def test_runs_and_shapes(self):
        from neural_raytracing_tpu.integrators import NeuralApprox
        from neural_raytracing_tpu.lights import PointLights
        from neural_raytracing_tpu.shapes import Sphere
        integ = NeuralApprox()
        scene = nrt.Scene(shape=Sphere((0, 0, 0), 1.0),
                          lights=PointLights(location=(0.0, 1.0, 4.0)))
        params = scene.init(jax.random.PRNGKey(0))
        params["integrator"] = integ.init(jax.random.PRNGKey(1))
        rays = jnp.asarray([[0.0, 0, 3, 0, 0, -1.0],
                            [5.0, 0, 3, 0, 0, -1.0]])
        out, active, _ = integ.sample(scene, params, rays,
                                      key=jax.random.PRNGKey(2))
        assert out.shape == (2, 3)
        assert bool(active[0]) and not bool(active[1])
        assert (np.asarray(out[1]) == 0).all()


class TestGeometry:
    def test_ray_point_dist(self):
        r_o = jnp.asarray([[0.0, 0, 0]])
        r_d = jnp.asarray([[1.0, 0, 0]])
        pts = jnp.asarray([[2.0, 1.0, 0.0], [-2.0, 0.0, 0.0]])
        d = ray_point_dist(r_o, r_d, pts)
        np.testing.assert_allclose(np.asarray(d[0]), [1.0, 2.0], atol=1e-5)

    def test_ray_segment_distance(self):
        r_o = jnp.asarray([[0.0, 0, 0]])
        r_d = jnp.asarray([[1.0, 0, 0]])
        a = jnp.asarray([[2.0, 1.0, -1.0]])
        b = jnp.asarray([[2.0, 1.0, 1.0]])
        d = distance_between_rays_and_segments(r_o, r_d, a, b)
        np.testing.assert_allclose(np.asarray(d[0]), [1.0], atol=1e-4)

    def test_mesh_level_surfaces(self):
        verts = jnp.asarray([[0.0, 1.0, -1.0], [0.0, 1.0, 1.0],
                             [1.0, 1.0, 0.0]])
        faces = jnp.asarray([[0, 1, 2]])
        r_o = jnp.asarray([[0.0, 0.0, 0.0]])
        r_d = jnp.asarray([[1.0, 0.0, 0.0]])
        d = mesh_level_surfaces(r_o, r_d, verts, faces, chunk=4)
        np.testing.assert_allclose(np.asarray(d), [1.0], atol=1e-4)


class TestDiscriminator:
    def test_logits_shape(self):
        from neural_raytracing_tpu.nn import Discriminator
        d = Discriminator(num_features=8)
        p = d.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 64, 64))
        out = d(p, x)
        assert out.shape == (2,)
        g = jax.grad(lambda pp: jnp.sum(d(pp, x)))(p)
        assert all(np.isfinite(np.asarray(v)).all()
                   for v in jax.tree_util.tree_leaves(g))


class TestEmbedder:
    def test_latent_shape_and_grads(self):
        from neural_raytracing_tpu.nn import Embedder
        e = Embedder(latent_size=16, num_features=8)
        p = e.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 64, 64))
        out = e(p, x)
        assert out.shape == (2, 16)
        # resolution-agnostic (global pool)
        out32 = e(p, jax.random.normal(jax.random.PRNGKey(2), (1, 3, 32, 32)))
        assert out32.shape == (1, 16)
        g = jax.grad(lambda pp: jnp.sum(e(pp, x)))(p)
        assert all(np.isfinite(np.asarray(v)).all()
                   for v in jax.tree_util.tree_leaves(g))


class TestNeRFLE:
    def test_volume_render_both_conditionings(self):
        from neural_raytracing_tpu.shapes import NeRFLE
        from neural_raytracing_tpu.lights import PointLights
        for envmap in (False, True):
            nerf = NeRFLE(envmap=envmap, steps=4)
            lights = PointLights(
                location=np.zeros((3, 3)) + np.asarray([0.0, 1.0, 2.0]))
            p = nerf.init(jax.random.PRNGKey(0))
            lp = lights.init()
            # structured [N, H, W, B, 6] rays like the render driver emits
            rays = (jnp.zeros((3, 4, 4, 1, 6))
                    .at[..., 5].set(-1.0).at[..., 2].set(2.0))
            out = nerf.volume_render(p, rays, key=jax.random.PRNGKey(1),
                                     lights=lights, light_params=lp)
            assert out.shape == (3, 4, 4, 1, 3)
            assert np.isfinite(np.asarray(out)).all()
