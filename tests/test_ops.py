"""Unit tests for the math/ops layer against closed forms."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_raytracing_tpu import ops


def keys(n, seed=0):
    return jax.random.split(jax.random.PRNGKey(seed), n)


class TestFrames:
    def test_orthonormality(self):
        k, = keys(1)
        n = jax.random.normal(k, (128, 3))
        frame = ops.coordinate_system(n)
        eye = jnp.einsum("bij,bik->bjk", frame, frame)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (128, 3, 3)),
                                   atol=1e-5)

    def test_normal_is_third_column(self):
        k, = keys(1)
        n = jax.random.normal(k, (64, 3))
        frame = ops.coordinate_system(n)
        np.testing.assert_allclose(frame[..., 2], ops.normalize(n), atol=1e-5)

    def test_local_world_roundtrip(self):
        k1, k2 = keys(2)
        n = jax.random.normal(k1, (64, 3))
        v = ops.normalize(jax.random.normal(k2, (64, 3)))
        frame = ops.coordinate_system(n)
        back = ops.from_local(frame, ops.to_local(frame, v))
        np.testing.assert_allclose(back, v, atol=1e-5)

    def test_to_local_maps_normal_to_z(self):
        k, = keys(1)
        n = ops.normalize(jax.random.normal(k, (32, 3)))
        frame = ops.coordinate_system(n)
        local = ops.to_local(frame, n)
        expected = np.zeros((32, 3))
        expected[:, 2] = 1.0
        np.testing.assert_allclose(local, expected, atol=1e-5)


class TestWarps:
    def test_cos_hemisphere_upper(self):
        k, = keys(1)
        s = jax.random.uniform(k, (4096, 2))
        d = ops.square_to_cos_hemisphere(s)
        assert (np.asarray(d[..., 2]) >= 0).all()
        np.testing.assert_allclose(jnp.linalg.norm(d, axis=-1), 1.0, atol=1e-3)

    def test_cos_hemisphere_pdf_integrates_to_one(self):
        # MC estimate: E[pdf(d)/pdf(d)] = 1 trivially; instead integrate
        # cos/pi over the hemisphere with uniform sphere samples
        k, = keys(1)
        s = jax.random.uniform(k, (200_000, 2))
        d = ops.square_to_uniform_sphere(s)
        upper = d[..., 2] > 0
        pdf_vals = ops.square_to_cos_hemisphere_pdf(d)
        # integral over hemisphere of cos/pi dA should be 1;
        # uniform-sphere pdf = 1/4pi
        est = jnp.mean(jnp.where(upper, pdf_vals, 0.0)) * 4 * math.pi
        assert abs(float(est) - 1.0) < 0.02

    def test_uniform_sphere_mean_zero(self):
        k, = keys(1)
        s = jax.random.uniform(k, (100_000, 2))
        d = ops.square_to_uniform_sphere(s)
        np.testing.assert_allclose(jnp.mean(d, axis=0), 0.0, atol=0.02)
        np.testing.assert_allclose(jnp.linalg.norm(d, axis=-1), 1.0, atol=1e-3)

    def test_disk_concentric_in_disk(self):
        k, = keys(1)
        s = jax.random.uniform(k, (10_000, 2))
        p = ops.square_to_uniform_disk_concentric(s)
        assert (np.asarray(jnp.linalg.norm(p, axis=-1)) <= 1.0 + 1e-6).all()


class TestDirs:
    def test_dir_elev_azim_roundtrip(self):
        k, = keys(1)
        d = ops.normalize(jax.random.normal(k, (256, 3)))
        ea = ops.dir_to_elev_azim(d)
        # reconstruct: reference convention x=sin(az)cos(el), y=cos(az)cos(el), z=sin(el)
        d2 = ops.elev_azim_to_dir(ea)
        # y sign is not recoverable from (elev, azim) when |azim|>pi/2 is
        # collapsed by atan2's sqrt argument; restrict to y>0 directions
        mask = np.asarray(d[..., 1]) > 0.05
        np.testing.assert_allclose(np.asarray(d2)[mask], np.asarray(d)[mask],
                                   atol=1e-2)

    def test_uv_roundtrip(self):
        k, = keys(1)
        uv = jax.random.uniform(k, (256, 2), minval=-0.7, maxval=0.7)
        back = ops.elev_azim_to_uv(ops.uv_to_elev_azim(uv))
        np.testing.assert_allclose(back, uv, atol=1e-4)


class TestFresnel:
    def test_fresnel_normal_incidence(self):
        # R at normal incidence = ((eta-1)/(eta+1))^2
        eta = 1.5
        r, _, _, _ = ops.fresnel(jnp.asarray([1.0]), eta)
        expected = ((eta - 1) / (eta + 1)) ** 2
        np.testing.assert_allclose(r, expected, atol=1e-6)

    def test_fresnel_grazing(self):
        r, _, _, _ = ops.fresnel(jnp.asarray([0.0]), 1.5)
        np.testing.assert_allclose(r, 1.0, atol=1e-6)

    def test_fresnel_conductor_range(self):
        cos_t = jnp.linspace(0.01, 1.0, 64)
        r = ops.fresnel_conductor(cos_t, 1.3, 1.0)
        assert (np.asarray(r) >= 0).all() and (np.asarray(r) <= 1).all()


class TestRusin:
    def test_param_rusin2_range(self):
        k1, k2 = keys(2)
        wo = ops.normalize(jax.random.normal(k1, (512, 3)))
        wi = ops.normalize(jax.random.normal(k2, (512, 3)))
        out = ops.param_rusin2(wo, wi)
        assert out.shape == (512, 3)
        assert np.isfinite(np.asarray(out)).all()
        assert (np.abs(np.asarray(out[..., 0])) <= 1 + 1e-5).all()

    def test_param_rusin2_half_vector_symmetry(self):
        # swapping wi/wo keeps theta_h (half-vector) unchanged
        k1, k2 = keys(2)
        wo = ops.normalize(jnp.abs(jax.random.normal(k1, (128, 3))))
        wi = ops.normalize(jnp.abs(jax.random.normal(k2, (128, 3))))
        a = ops.param_rusin2(wo, wi)
        b = ops.param_rusin2(wi, wo)
        np.testing.assert_allclose(a[..., 1], b[..., 1], atol=1e-5)


class TestMath:
    def test_smooth_min_approaches_min(self):
        # note the reference clamp (utils.py:387) saturates the output at
        # -log(1e-4)/k, so test within that range
        v = jnp.asarray([[0.05, 0.5, 1.0]])
        out = ops.smooth_min(v.T, k=100.0, axis=0)
        np.testing.assert_allclose(out, 0.05, atol=1e-2)

    def test_eikonal_zero_for_unit(self):
        g = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]])
        assert float(ops.eikonal_loss(g)) < 1e-10

    def test_reflect(self):
        n = jnp.asarray([[0.0, 0, 1.0]])
        v = ops.normalize(jnp.asarray([[1.0, 0, 1.0]]))
        r = ops.reflect(n, v)
        np.testing.assert_allclose(r, ops.normalize(jnp.asarray([[-1.0, 0, 1.0]])),
                                   atol=1e-6)

    def test_rotate_vector_z_90(self):
        v = jnp.asarray([[1.0, 0.0, 0.0]])
        axis = jnp.asarray([[0.0, 0.0, 1.0]])
        out = ops.rotate_vector(v, axis, jnp.asarray([[0.0]]), jnp.asarray([[1.0]]))
        np.testing.assert_allclose(out, [[0.0, 1.0, 0.0]], atol=1e-6)


class TestLosses:
    def test_bce_logits_matches_manual(self):
        logits = jnp.asarray([-2.0, 0.0, 3.0])
        targets = jnp.asarray([0.0, 1.0, 1.0])
        got = ops.binary_cross_entropy_with_logits(logits, targets)
        p = jax.nn.sigmoid(logits)
        expected = -(targets * jnp.log(p) + (1 - targets) * jnp.log(1 - p))
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_masked_loss_zero_for_perfect(self):
        k, = keys(1)
        img = jax.random.uniform(k, (1, 32, 32, 3))
        mask = jnp.ones((1, 32, 32))
        tp = jnp.full((1, 32, 32), 100.0)  # logits, sigmoid ~ 1
        loss = ops.masked_loss(img, img, tp, mask, mask_weight=1.0)
        assert float(loss) < 1e-3

    def test_masked_loss_penalizes_mismatch(self):
        k, = keys(1)
        img = jax.random.uniform(k, (1, 32, 32, 3))
        mask = jnp.ones((1, 32, 32))
        tp = jnp.full((1, 32, 32), 100.0)
        loss = ops.masked_loss(img, 1.0 - img, tp, mask)
        assert float(loss) > 0.5
