"""BSDF model tests: energy behavior, masking, mixtures, sampling."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from neural_raytracing_tpu.bsdf import (
    Bidirectional, Compose, ComposeSpatialVarying, Conductor, Diffuse,
    GlobalNeuralBSDF, NeuralBSDF, Phong, Plastic, SelectBSDF, invert_z,
)
from neural_raytracing_tpu.interaction import Interaction
from neural_raytracing_tpu.nn import SkipConnMLP
from neural_raytracing_tpu.ops.frames import coordinate_system


def make_it(n=64, seed=0, up_only=True):
    """An interaction batch with frames from random normals, wi in-hemisphere."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    normal = jax.random.normal(k1, (n, 3))
    if up_only:
        normal = normal.at[:, 2].set(jnp.abs(normal[:, 2]) + 0.5)
    normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
    p = jax.random.normal(k2, (n, 3))
    it = Interaction(p=p, t=jnp.ones(n)).with_normals(normal)
    wi = jnp.asarray([0.2, 0.1, 0.95])
    wi = jnp.broadcast_to(wi / jnp.linalg.norm(wi), (n, 3))
    return it._replace(wi=wi)


WO = jnp.asarray([0.1, -0.2, 0.97])
WO = WO / jnp.linalg.norm(WO)


class TestPlastic:
    def test_eval_positive_and_pdf(self):
        b = Plastic()
        p = b.init()
        it = make_it()
        wo = jnp.broadcast_to(WO, it.p.shape)
        spec, pdf, _ = b.eval_and_pdf(p, it, wo)
        assert (np.asarray(spec) >= 0).all()
        np.testing.assert_allclose(np.asarray(pdf) <= WO[2] / math.pi + 1e-6,
                                   True)

    def test_sample_mixes_lobes(self):
        b = Plastic()
        p = b.init()
        it = make_it(256)
        bs, spec = b.sample(p, it, jax.random.PRNGKey(3))
        assert np.isfinite(np.asarray(bs.wo)).all()
        assert np.isfinite(np.asarray(spec)).all()
        assert (np.asarray(bs.pdf) > 0).all()
        # some samples should be the mirror direction, some diffuse
        mirror = np.asarray(
            jnp.sum(bs.wo * jnp.broadcast_to(
                jnp.asarray([-0.2, -0.1, 0.95]) / jnp.linalg.norm(
                    jnp.asarray([-0.2, -0.1, 0.95])), it.p.shape), -1)) > 0.999


class TestBidirectional:
    def test_backside_mirrors_frontside(self):
        inner = Diffuse((0.5, 0.5, 0.5))
        b = Bidirectional(inner)
        p = b.init(jax.random.PRNGKey(0))
        it = make_it()
        wo = jnp.broadcast_to(WO, it.p.shape)
        front_spec, front_pdf, _ = b.eval_and_pdf(p, it, wo)
        # flipped incident directions with flipped outgoing == front result
        it_flipped = it._replace(wi=invert_z(it.wi))
        back_spec, back_pdf, _ = b.eval_and_pdf(p, it_flipped, invert_z(wo))
        np.testing.assert_allclose(np.asarray(front_spec),
                                   np.asarray(back_spec), atol=1e-6)
        np.testing.assert_allclose(np.asarray(front_pdf),
                                   np.asarray(back_pdf), atol=1e-6)


class TestCompose:
    def test_softmax_mixture_eval(self):
        b = Compose([Diffuse((1.0, 0.0, 0.0)), Diffuse((0.0, 1.0, 0.0))])
        p = b.init(jax.random.PRNGKey(0))
        it = make_it()
        wo = jnp.broadcast_to(WO, it.p.shape)
        spec, pdf, _ = b.eval_and_pdf(p, it, wo)
        w = jax.nn.softmax(p["weights"])
        expected_r = float(w[0]) * WO[2] / math.pi
        np.testing.assert_allclose(np.asarray(spec[:, 0]), expected_r,
                                   rtol=1e-5)
        # pdfs mix to the cos-hemisphere pdf
        np.testing.assert_allclose(np.asarray(pdf), WO[2] / math.pi,
                                   rtol=1e-5)

    def test_sample_joint_pdf_and_frequencies(self):
        """Compose.sample (completed beyond the reference's stub): the
        joint pdf is selection-prob x basis pdf, and selection frequencies
        follow the softmax weights."""
        b = Compose([Diffuse((1.0, 0.0, 0.0)), Diffuse((0.0, 1.0, 0.0))])
        p = b.init(jax.random.PRNGKey(0))
        p = dict(p, weights=jnp.asarray([2.0, 0.0]))  # asymmetric mixture
        w = np.asarray(jax.nn.softmax(p["weights"]))
        n = 4096
        it = make_it(n)
        bs, spec = b.sample(p, it, jax.random.PRNGKey(7))
        wo, pdf = np.asarray(bs.wo), np.asarray(bs.pdf)
        assert (wo[:, 2] > 0).all() and (pdf > 0).all()
        # joint pdf = k_sel * cos/pi with k_sel in the softmax weights
        ratio = pdf / (wo[:, 2] / math.pi)
        sel0 = np.isclose(ratio, w[0], rtol=1e-4)
        sel1 = np.isclose(ratio, w[1], rtol=1e-4)
        assert (sel0 | sel1).all()
        # frequencies follow the weights (binomial 3-sigma)
        sigma = math.sqrt(n * w[0] * w[1])
        assert abs(sel0.sum() - n * w[0]) < 3 * sigma
        # spectrum comes from the selected basis
        spec = np.asarray(spec)
        np.testing.assert_allclose(spec[sel0, 1], 0.0, atol=1e-7)
        np.testing.assert_allclose(spec[sel1, 0], 0.0, atol=1e-7)

    def test_sample_direction_distribution(self):
        # both bases cos-hemisphere => marginal E[cos theta] = 2/3
        b = Compose([Diffuse(), Diffuse()])
        p = b.init(jax.random.PRNGKey(0))
        bs, _ = b.sample(p, make_it(8192), jax.random.PRNGKey(9))
        assert abs(float(jnp.mean(bs.wo[:, 2])) - 2.0 / 3.0) < 0.01

    def test_eval_pdf_integrates_to_one(self):
        """Mixture pdf integrates to 1 over the hemisphere (MC, uniform)."""
        b = Compose([Diffuse((1.0, 0.0, 0.0)), Diffuse((0.0, 1.0, 0.0))])
        p = b.init(jax.random.PRNGKey(0))
        n = 20000
        v = jax.random.normal(jax.random.PRNGKey(3), (n, 3))
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        wo = v.at[:, 2].set(jnp.abs(v[:, 2]))  # uniform upper hemisphere
        it = make_it(n)
        _, pdf, _ = b.eval_and_pdf(p, it, wo)
        integral = float(jnp.mean(pdf) * 2.0 * math.pi)
        assert abs(integral - 1.0) < 0.03, integral


class TestSelectBSDF:
    def test_hard_selection(self):
        b = SelectBSDF(lambda p: (p[..., 0] > 0).astype(jnp.int32),
                       [Diffuse((1.0, 0.0, 0.0)), Diffuse((0.0, 1.0, 0.0))])
        p = b.init(jax.random.PRNGKey(0))
        it = make_it(128)
        wo = jnp.broadcast_to(WO, it.p.shape)
        spec, _, _ = b.eval_and_pdf(p, it, wo)
        left = np.asarray(it.p[:, 0]) <= 0
        assert (np.asarray(spec)[left, 1] < 1e-7).all()
        assert (np.asarray(spec)[~left, 0] < 1e-7).all()

    def test_sample_follows_selector(self):
        """SelectBSDF.sample (completed beyond the reference's stub): each
        ray gets exactly the selected basis's sample — the mirror lobe where
        the selector picks the Conductor, cos-hemisphere elsewhere."""
        from neural_raytracing_tpu.ops.math import local_reflect

        b = SelectBSDF(lambda p: (p[..., 0] > 0).astype(jnp.int32),
                       [Diffuse((1.0, 0.0, 0.0)), Conductor()])
        p = b.init(jax.random.PRNGKey(0))
        it = make_it(256)
        bs, _ = b.sample(p, it, jax.random.PRNGKey(5))
        mirror = np.asarray(local_reflect(it.wi))
        right = np.asarray(it.p[:, 0]) > 0
        np.testing.assert_allclose(np.asarray(bs.wo)[right], mirror[right],
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(bs.pdf)[right], 1.0, atol=1e-6)
        # diffuse side: cos-hemisphere samples with matching pdf
        wo_l = np.asarray(bs.wo)[~right]
        assert (wo_l[:, 2] > 0).all()
        np.testing.assert_allclose(np.asarray(bs.pdf)[~right],
                                   wo_l[:, 2] / math.pi, rtol=1e-4)


class TestComposeSpatialVarying:
    def small(self):
        return ComposeSpatialVarying(
            [Diffuse((1.0, 0.2, 0.1)), Diffuse((0.1, 0.2, 1.0))],
            sp_var_fn=SkipConnMLP(in_size=3, out=2, num_layers=2,
                                  hidden_size=16, freqs=4, init="xavier"))

    def test_weights_in_01(self):
        b = self.small()
        p = b.init(jax.random.PRNGKey(0))
        w, raw = b.normalized_weights(p, jax.random.normal(
            jax.random.PRNGKey(1), (32, 3)))
        assert (np.asarray(w) >= 0).all() and (np.asarray(w) <= 1).all()

    def test_aux_weights_surface(self):
        b = self.small()
        p = b.init(jax.random.PRNGKey(0))
        it = make_it()
        wo = jnp.broadcast_to(WO, it.p.shape)
        spec, pdf, aux = b.eval_and_pdf(p, it, wo)
        assert aux["normalized_weights"].shape == (64, 2)
        assert aux["nonnormalized_weights"].shape == (64, 2)

    def test_sample_selects_basis(self):
        b = self.small()
        p = b.init(jax.random.PRNGKey(0))
        it = make_it(512)
        bs, spec = b.sample(p, it, jax.random.PRNGKey(2))
        assert np.isfinite(np.asarray(bs.wo)).all()
        # sampled spectra must come from one of the two bases
        r = np.asarray(spec[:, 0])
        close_a = np.isclose(r, 1.0 / math.pi, atol=1e-5)
        close_b = np.isclose(r, 0.1 / math.pi, atol=1e-5)
        assert (close_a | close_b).all()
        assert close_a.any() and close_b.any()


class TestNeuralBSDF:
    def test_zeroed_lobe(self):
        b = NeuralBSDF().zero()
        p = b.init(jax.random.PRNGKey(0))
        it = make_it()
        wo = jnp.broadcast_to(WO, it.p.shape)
        spec, _, _ = b.eval_and_pdf(p, it, wo)
        np.testing.assert_allclose(np.asarray(spec), 0.0)

    def test_reciprocity_of_rusin_input(self):
        # NeuralBSDF(wi, wo) uses half/difference angles: swapping wi and wo
        # keeps theta_h; spectra should vary smoothly and stay in (0, 1)
        b = NeuralBSDF()
        p = b.init(jax.random.PRNGKey(0))
        it = make_it()
        wo = jnp.broadcast_to(WO, it.p.shape)
        spec, pdf, _ = b.eval_and_pdf(p, it, wo)
        assert ((np.asarray(spec) > 0) & (np.asarray(spec) < 1)).all()
        np.testing.assert_allclose(np.asarray(pdf), 1.0)


class TestGlobalNeuralBSDF:
    def test_runs(self):
        b = GlobalNeuralBSDF()
        p = b.init(jax.random.PRNGKey(0))
        it = make_it(16)
        wo = jnp.broadcast_to(WO, it.p.shape)
        spec, pdf, _ = b.eval_and_pdf(p, it, wo)
        assert spec.shape == (16, 3)
        assert np.isfinite(np.asarray(spec)).all()
        bs, s2 = b.sample(p, it, jax.random.PRNGKey(1))
        assert np.isfinite(np.asarray(bs.wo)).all()
