"""BSDF (reflectance) models — analytic and learned.

Behavioral parity: pytorch3d/pathtracer/bsdf/bsdfs.py —
  * Diffuse (:78-118), Phong (:132-189), Plastic (:238-325),
    Conductor (:345-401), Bidirectional (:409-453)
  * Compose (:456-478): global softmax mixture
  * ComposeSpatialVarying (:482-539): the paper's spatially-varying
    basis-BSDF — weights = sigmoid(SkipConnMLP_16x256(x)); eval is the
    weighted sum of per-basis joint (spectrum, pdf); sampling picks a basis
    categorically (the reference's ``torch.multinomial`` becomes a
    Gumbel-argmax so shapes stay static under jit)
  * NeuralBSDF (:613-644): MLP(Rusinkiewicz(wi, wo)) -> RGB with
    cos-hemisphere sampling

Uniform interface (all pure functions over params pytrees):
  ``eval_and_pdf(params, it, wo, active) -> (spectrum [...,3], pdf [...], aux)``
  ``sample(params, it, key, active)      -> (BSDFSample, spectrum [...,3])``
``aux`` carries the spatially-varying mixture activations that the reference
attached to the interaction via setattr (used by training regularizers).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from ..interaction import BSDFSample, Interaction
from ..nn.mlp import SkipConnMLP, resolve_activation
from ..ops.fresnel import fresnel, fresnel_conductor, fresnel_diff_refl
from ..ops.math import local_reflect, normalize, reflect
from ..ops.rusin import param_rusin2
from ..ops.warps import (
    square_to_cos_hemisphere, square_to_cos_hemisphere_pdf,
)


def identity(x):
    return x


def identity_div_pi(x):
    return x / math.pi


def invert_z(xyz: jax.Array) -> jax.Array:
    return xyz * jnp.asarray([1.0, 1.0, -1.0], xyz.dtype)


def _active_mask(active, batch_shape):
    return jnp.broadcast_to(jnp.asarray(active), batch_shape)


def _gumbel_argmax(key, weights: jax.Array) -> jax.Array:
    """Categorical selection ∝ weights with static shapes (replaces the
    reference's torch.multinomial, bsdfs.py:506)."""
    gumbel = -jnp.log(-jnp.log(
        jax.random.uniform(key, weights.shape, minval=1e-10, maxval=1.0)))
    return jnp.argmax(jnp.log(jnp.maximum(weights, 1e-20)) + gumbel, axis=-1)


def _combine_samples(samples, onehot: jax.Array):
    """Gather per-basis (BSDFSample, spectrum) pairs by a one-hot selection.

    -> (wo [..., 3], pdf [...], spectrum [..., 3]) of the selected basis.
    """
    wos = jnp.stack([bs.wo for bs, _ in samples], axis=-1)      # [..., 3, K]
    pdfs = jnp.stack([bs.pdf for bs, _ in samples], axis=-1)    # [..., K]
    specs = jnp.stack([s for _, s in samples], axis=-1)         # [..., 3, K]
    wo = normalize(jnp.sum(wos * onehot[..., None, :], axis=-1))
    pdf = jnp.sum(pdfs * onehot, axis=-1)
    spectrum = jnp.sum(specs * onehot[..., None, :], axis=-1)
    return wo, pdf, spectrum


class Diffuse:
    """Lambertian lobe with a learnable reflectance color."""

    def __init__(self, reflectance=(0.25, 0.2, 0.7), preprocess=identity_div_pi):
        self._reflectance = jnp.asarray(reflectance, jnp.float32)
        self.preproc = preprocess

    def init(self, key=None) -> dict:
        return {"reflectance": self._reflectance}

    def eval_and_pdf(self, params, it, wo, active=True):
        cos_theta_o = wo[..., 2]
        spectrum = self.preproc(cos_theta_o[..., None] * params["reflectance"])
        pdf = square_to_cos_hemisphere_pdf(wo)
        return spectrum, pdf, {}

    def sample(self, params, it, key, active=True):
        sample = jax.random.uniform(key, it.p.shape[:-1] + (2,))
        wo = normalize(square_to_cos_hemisphere(sample))
        bs = BSDFSample(wo=wo, pdf=square_to_cos_hemisphere_pdf(wo))
        spectrum = jnp.broadcast_to(self.preproc(params["reflectance"]),
                                    it.p.shape)
        return bs, spectrum


class Phong:
    """Phong lobe with learnable diffuse/specular colors and shininess."""

    def __init__(self, diffuse=(0.6, 0.5, 0.7), specular=(0.8, 0.8, 0.8),
                 shine: float = 40.0, min_spec: float = 1.0):
        self._diffuse = jnp.asarray(diffuse, jnp.float32)
        self._specular = jnp.asarray(specular, jnp.float32)
        self._shine = float(shine)
        self.min_spec = float(min_spec)

    def init(self, key=None) -> dict:
        return {"diffuse": self._diffuse, "specular": self._specular,
                "shine": jnp.float32(self._shine)}

    def _spectrum(self, params, it, wo):
        cos_theta_i = it.wi[..., 2]
        r = reflect(it.frame[..., 2], it.wi)
        spectral = jnp.power(
            jnp.maximum(jnp.sum(r * wo, axis=-1), 1e-20),
            self.min_spec + jnp.exp(params["shine"]))
        return (cos_theta_i[..., None] * params["diffuse"] / math.pi
                + spectral[..., None] * params["specular"] / math.pi)

    def eval_and_pdf(self, params, it, wo, active=True):
        return (self._spectrum(params, it, wo),
                square_to_cos_hemisphere_pdf(wo), {})

    def sample(self, params, it, key, active=True):
        sample = jax.random.uniform(key, it.p.shape[:-1] + (2,))
        wo = square_to_cos_hemisphere(sample)
        pdf = square_to_cos_hemisphere_pdf(wo)
        ok = (_active_mask(active, it.p.shape[:-1])
              & (it.wi[..., 2] > 0) & (wo[..., 2] > 0) & (pdf > 0))
        spectrum = jnp.where(ok[..., None], self._spectrum(params, it, wo), 0.0)
        return BSDFSample(wo=wo, pdf=pdf), spectrum


class Plastic:
    """Mitsuba-style smooth plastic (specular + internally-scattered diffuse)."""

    def __init__(self, diffuse=(0.5, 0.5, 0.5), specular=(1.0, 1.0, 1.0),
                 int_ior: float = 1.49, ext_ior: float = 1.000277):
        self._diffuse = jnp.asarray(diffuse, jnp.float32)
        self._specular = jnp.asarray(specular, jnp.float32)
        assert int_ior > 0 and ext_ior > 0
        self.eta = int_ior / ext_ior
        self.inv_eta_2 = 1.0 / (self.eta * self.eta)
        self.fdr_int = fresnel_diff_refl(1.0 / self.eta)
        self.fdr_ext = fresnel_diff_refl(self.eta)

    def init(self, key=None) -> dict:
        return {"diffuse": self._diffuse, "specular": self._specular}

    def _spec_sample_weight(self, params):
        d = jnp.mean(params["diffuse"])
        s = jnp.mean(params["specular"])
        return s / (d + s)

    def eval_and_pdf(self, params, it, wo, active=True):
        cos_theta_i = it.wi[..., 2]
        cos_theta_o = wo[..., 2]
        f_i = fresnel(cos_theta_i, self.eta)[0]
        f_o = fresnel(cos_theta_o, self.eta)[0]
        pdf = square_to_cos_hemisphere_pdf(wo)
        spectrum = (params["diffuse"] / (1.0 - self.fdr_int)
                    * self.inv_eta_2
                    * (pdf * (1.0 - f_i) * (1.0 - f_o))[..., None])
        ssw = self._spec_sample_weight(params)
        prob_specular = ssw * f_i
        prob_diffuse = (1.0 - f_i) * (1.0 - ssw)
        prob_diffuse = prob_diffuse / (prob_specular + prob_diffuse)
        return spectrum, pdf * prob_diffuse, {}

    def sample(self, params, it, key, active=True):
        k1, k2 = jax.random.split(key)
        cos_theta_i = it.wi[..., 2]
        f_i = fresnel(cos_theta_i, self.eta)[0]
        ssw = self._spec_sample_weight(params)
        p_spec = f_i * ssw
        p_diff = (1.0 - f_i) * (1.0 - ssw)
        p_spec = p_spec / (p_spec + p_diff)
        p_diff = 1.0 - p_spec
        ok = _active_mask(active, it.p.shape[:-1]) & (cos_theta_i > 0)
        sample_spec = ok & (jax.random.uniform(k1, p_spec.shape) < p_spec)
        diff_wo = square_to_cos_hemisphere(
            jax.random.uniform(k2, it.p.shape[:-1] + (2,)))
        wo = jnp.where(sample_spec[..., None],
                       reflect(it.frame[..., 2], it.wi), diff_wo)
        pdf = jnp.maximum(
            jnp.where(sample_spec, p_spec,
                      p_diff * square_to_cos_hemisphere_pdf(wo)), 1e-10)
        f_o = fresnel(wo[..., 2], self.eta)[0]
        spectrum = jnp.where(
            sample_spec[..., None],
            params["specular"] * (f_i / pdf)[..., None],
            params["diffuse"] / (1.0 - self.fdr_int)
            * pdf[..., None] * self.inv_eta_2
            * (1.0 - f_i[..., None]) * (1.0 - f_o[..., None]))
        return BSDFSample(wo=wo, pdf=pdf), spectrum


class Conductor:
    """Near-mirror conductor lobe, thresholded around the reflection vector."""

    def __init__(self, specular=(1.0, 1.0, 1.0), eta: float = 1.3,
                 k: float = 1.0, activation="sigmoid", threshold: float = 0.94):
        self._specular = jnp.asarray(specular, jnp.float32)
        self._eta = float(eta)
        self._k = float(k)
        self.act = resolve_activation(activation)
        self.threshold = float(threshold)

    def init(self, key=None) -> dict:
        return {"specular": self._specular, "eta": jnp.float32(self._eta),
                "k": jnp.float32(self._k)}

    def eval_and_pdf(self, params, it, wo, active=True):
        refl = local_reflect(it.wi)
        thresh = jnp.sum(refl * wo, axis=-1) > self.threshold
        fr = fresnel_conductor(it.wi[..., 2], jax.nn.softplus(params["eta"]),
                               0.0)
        spectrum = jnp.where(thresh[..., None],
                             fr[..., None] * self.act(params["specular"]), 0.0)
        pdf = jnp.where(thresh, 1.0, 0.0)
        ok = _active_mask(active, it.p.shape[:-1])
        spectrum = jnp.where(ok[..., None], spectrum, 0.0)
        return spectrum, pdf, {}

    def sample(self, params, it, key, active=True):
        cos_theta_i = it.wi[..., 2]
        ok = _active_mask(active, it.p.shape[:-1]) & (cos_theta_i > 0)
        wo = local_reflect(it.wi)
        fr = fresnel_conductor(cos_theta_i, params["eta"], params["k"])
        spectrum = jnp.where(ok[..., None],
                             params["specular"] * fr[..., None], 0.0)
        return BSDFSample(wo=wo, pdf=jnp.ones_like(cos_theta_i)), spectrum


class Bidirectional:
    """Two-sided wrapper that flips the local frame for back-facing hits."""

    def __init__(self, front, back=None):
        self.front = front
        self.back = back if back is not None else front
        self.shared = back is None

    def init(self, key) -> dict:
        k1, k2 = jax.random.split(key)
        front = self.front.init(k1)
        return {"front": front,
                "back": front if self.shared else self.back.init(k2)}

    def eval_and_pdf(self, params, it, wo, active=True):
        cos_theta_i = it.wi[..., 2]
        act = _active_mask(active, it.p.shape[:-1])
        front = (cos_theta_i > 0) & act
        back = (cos_theta_i < 0) & act
        f_spec, f_pdf, f_aux = self.front.eval_and_pdf(params["front"], it, wo,
                                                       front)
        it_b = it._replace(wi=invert_z(it.wi))
        b_spec, b_pdf, _ = self.back.eval_and_pdf(params["back"], it_b,
                                                  invert_z(wo), back)
        spectrum = jnp.where(front[..., None], f_spec,
                             jnp.where(back[..., None], b_spec, 0.0))
        pdf = jnp.where(front, f_pdf, jnp.where(back, b_pdf, 0.0))
        return spectrum, pdf, f_aux

    def sample(self, params, it, key, active=True):
        cos_theta_i = it.wi[..., 2]
        act = _active_mask(active, it.p.shape[:-1])
        front = (cos_theta_i > 0) & act
        back = (cos_theta_i < 0) & act
        k1, k2 = jax.random.split(key)
        f_bs, f_spec = self.front.sample(params["front"], it, k1, front)
        it_b = it._replace(wi=invert_z(it.wi))
        b_bs, b_spec = self.back.sample(params["back"], it_b, k2, back)
        b_wo = invert_z(b_bs.wo)
        wo = jnp.where(front[..., None], f_bs.wo,
                       jnp.where(back[..., None], b_wo, 0.0))
        pdf = jnp.where(front, f_bs.pdf, jnp.where(back, b_bs.pdf, 0.0))
        spectrum = jnp.where(front[..., None], f_spec,
                             jnp.where(back[..., None], b_spec, 0.0))
        return BSDFSample(wo=wo, pdf=pdf), spectrum


class Compose:
    """Global (not spatially varying) softmax mixture of BSDFs."""

    def __init__(self, bsdfs: Sequence):
        self.bsdfs = tuple(bsdfs)

    def init(self, key) -> dict:
        keys = jax.random.split(key, len(self.bsdfs) + 1)
        return {
            "weights": jax.random.uniform(keys[-1], (len(self.bsdfs),)) + 0.5,
            "bsdfs": tuple(b.init(k) for b, k in zip(self.bsdfs, keys)),
        }

    def normalized_weights(self, params):
        return jax.nn.softmax(params["weights"])

    def eval_and_pdf(self, params, it, wo, active=True):
        k = self.normalized_weights(params)
        spec_pdfs = [b.eval_and_pdf(p, it, wo, active)
                     for b, p in zip(self.bsdfs, params["bsdfs"])]
        spectrum = sum(k[i] * s for i, (s, _, _) in enumerate(spec_pdfs))
        pdf = sum(k[i] * p for i, (_, p, _) in enumerate(spec_pdfs))
        return spectrum, pdf, {}

    def sample(self, params, it, key, active=True):
        """Completes the reference's unimplemented Compose.sample
        (bsdfs.py:456-478 has no sample): pick a basis categorically ∝ the
        global softmax weights; joint pdf = selection prob x basis pdf."""
        keys = jax.random.split(key, len(self.bsdfs) + 1)
        samples = [b.sample(bp, it, k, active)
                   for b, bp, k in zip(self.bsdfs, params["bsdfs"], keys)]
        k_w = jnp.broadcast_to(self.normalized_weights(params),
                               it.p.shape[:-1] + (len(self.bsdfs),))
        onehot = jax.nn.one_hot(_gumbel_argmax(keys[-1], k_w),
                                len(self.bsdfs), dtype=k_w.dtype)
        wo, pdf, spectrum = _combine_samples(samples, onehot)
        pdf = pdf * jnp.sum(k_w * onehot, axis=-1)
        return BSDFSample(wo=wo, pdf=pdf), spectrum


class ComposeSpatialVarying:
    """Spatially-varying mixture: weights = sigmoid(MLP(x)) per basis BSDF."""

    def __init__(self, bsdfs: Sequence, sp_var_fn: Optional[SkipConnMLP] = None,
                 preprocess: Callable = identity):
        self.bsdfs = tuple(bsdfs)
        if sp_var_fn is None:
            from ..kernels.fused_mlp import FusedSkipConnMLP
            sp_var_fn = FusedSkipConnMLP(
                in_size=3, out=len(self.bsdfs), num_layers=16,
                hidden_size=256, freqs=128, sigma=128.0, init="xavier")
        self.sp_var_fn = sp_var_fn
        self.preprocess = preprocess

    def init(self, key) -> dict:
        keys = jax.random.split(key, len(self.bsdfs) + 1)
        return {
            "sp_var_fn": self.sp_var_fn.init(keys[-1]),
            "bsdfs": tuple(b.init(k) for b, k in zip(self.bsdfs, keys)),
        }

    def normalized_weights(self, params, p):
        """-> (sigmoid weights [..., K], raw logits [..., K])"""
        raw = self.sp_var_fn(params["sp_var_fn"], self.preprocess(p))
        # reference uses sigmoid rather than softmax (bsdfs.py:534-536)
        return jax.nn.sigmoid(raw), raw

    def eval_and_pdf(self, params, it, wo, active=True):
        k, raw = self.normalized_weights(params, it.p)
        spec_pdf = jnp.stack([
            jnp.concatenate([s, p[..., None]], axis=-1)
            for s, p, _ in (b.eval_and_pdf(bp, it, wo, active)
                            for b, bp in zip(self.bsdfs, params["bsdfs"]))
        ], axis=-1)                                        # [..., 4, K]
        ok = _active_mask(active, it.p.shape[:-1])
        spec_pdf = jnp.where(ok[..., None, None],
                             spec_pdf * k[..., None, :], 0.0)
        summed = jnp.sum(spec_pdf, axis=-1)
        aux = {"nonnormalized_weights": raw, "normalized_weights": k}
        # The SPECTRUM keeps the reference's sigmoid weighting as-is
        # (sum_i k_i f_i, bsdfs.py:515-536 — k does not sum to 1).  The PDF
        # must be the true density of sample() below, whose basis selection
        # is categorical ∝ k (i.e. k_i / sum k): q = sum_i k_i p_i / sum k.
        # Without the normalization the one-sample-mixture estimator
        # f/q in Direct's BSDF arm is biased by the factor sum_k.
        ksum = jnp.maximum(jnp.sum(k, axis=-1), 1e-10)
        return summed[..., :3], summed[..., 3] / ksum, aux

    def sample(self, params, it, key, active=True):
        keys = jax.random.split(key, len(self.bsdfs) + 1)
        samples = [b.sample(bp, it, k, active)
                   for b, bp, k in zip(self.bsdfs, params["bsdfs"], keys)]
        k_w, _ = self.normalized_weights(params, it.p)
        onehot = jax.nn.one_hot(_gumbel_argmax(keys[-1], k_w),
                                len(self.bsdfs), dtype=k_w.dtype)
        wo, pdf, spectrum = _combine_samples(samples, onehot)
        # joint pdf of (select basis, sample direction); gumbel-argmax over
        # k selects basis i with probability k_i / sum k, so that factor —
        # NOT the raw sigmoid weight — multiplies the basis pdf
        sel = (jnp.sum(k_w * onehot, axis=-1)
               / jnp.maximum(jnp.sum(k_w, axis=-1), 1e-10))
        pdf = pdf * sel
        return BSDFSample(wo=wo, pdf=pdf), spectrum


class SelectBSDF:
    """Hard spatial classifier over BSDFs (selector(p) -> basis index)."""

    def __init__(self, selector: Callable, bsdfs: Sequence):
        self.selector = selector
        self.bsdfs = tuple(bsdfs)

    def init(self, key) -> dict:
        keys = jax.random.split(key, len(self.bsdfs))
        return {"bsdfs": tuple(b.init(k) for b, k in zip(self.bsdfs, keys))}

    def eval_and_pdf(self, params, it, wo, active=True):
        idx = self.selector(it.p)
        onehot = jax.nn.one_hot(idx, len(self.bsdfs))
        spec_pdf = jnp.stack([
            jnp.concatenate([s, p[..., None]], axis=-1)
            for s, p, _ in (b.eval_and_pdf(bp, it, wo, active)
                            for b, bp in zip(self.bsdfs, params["bsdfs"]))
        ], axis=-1)
        summed = jnp.sum(spec_pdf * onehot[..., None, :], axis=-1)
        return summed[..., :3], summed[..., 3], {}

    def sample(self, params, it, key, active=True):
        """Completes the reference's unimplemented SelectBSDF.sample
        (bsdfs.py:542-565 has no sample): the selector is deterministic, so
        the sample IS the chosen basis's sample (no selection pdf factor)."""
        idx = self.selector(it.p)
        onehot = jax.nn.one_hot(idx, len(self.bsdfs))
        keys = jax.random.split(key, len(self.bsdfs))
        samples = [b.sample(bp, it, k, active)
                   for b, bp, k in zip(self.bsdfs, params["bsdfs"], keys)]
        wo, pdf, spectrum = _combine_samples(samples, onehot)
        return BSDFSample(wo=wo, pdf=pdf), spectrum


class NeuralBSDF:
    """Single neural lobe: MLP(rusin(wi, wo)) -> RGB, cos-hemisphere sampling."""

    def __init__(self, activation="sigmoid", mlp: Optional[SkipConnMLP] = None):
        if mlp is None:
            from ..kernels.fused_mlp import FusedSkipConnMLP
            mlp = FusedSkipConnMLP(in_size=3, out=3, num_layers=6,
                                   hidden_size=96, freqs=64)
        self.mlp = mlp
        self.act = resolve_activation(activation)
        self.zeroed = False

    def init(self, key) -> dict:
        return {"mlp": self.mlp.init(key)}

    def zero(self) -> "NeuralBSDF":
        """Ablation: make this lobe return black (reference bsdfs.py:640-644)."""
        self.zeroed = True
        return self

    def _spectrum(self, params, it, wo):
        if self.zeroed:
            return jnp.zeros(it.p.shape[:-1] + (3,), it.p.dtype)
        return self.act(self.mlp(params["mlp"], param_rusin2(it.wi, wo)))

    def eval_and_pdf(self, params, it, wo, active=True):
        spectrum = self._spectrum(params, it, wo)
        pdf = jnp.ones(spectrum.shape[:-1], spectrum.dtype)
        return spectrum, pdf, {}

    def sample(self, params, it, key, active=True):
        sample = jax.random.uniform(key, it.p.shape[:-1] + (2,))
        wo = normalize(square_to_cos_hemisphere(sample))
        bs = BSDFSample(wo=wo, pdf=square_to_cos_hemisphere_pdf(wo))
        return bs, self._spectrum(params, it, wo)


class GlobalNeuralBSDF:
    """One global MLP pair for attenuation(rusin) * color(x) (dev-era model)."""

    def __init__(self):
        from ..nn.mlp import DensityEstimator
        self.attenuation = SkipConnMLP(in_size=3, out=1, num_layers=3,
                                       hidden_size=64, activation="relu")
        self.color = SkipConnMLP(in_size=3, out=3, num_layers=3,
                                 hidden_size=64, activation="relu")
        self.dist = DensityEstimator()

    def init(self, key) -> dict:
        k1, k2, k3 = jax.random.split(key, 3)
        return {"attenuation": self.attenuation.init(k1),
                "color": self.color.init(k2),
                "dist": self.dist.init(k3)}

    def eval_and_pdf(self, params, it, wo, active=True):
        from ..ops.rusin import param_rusin
        from ..ops.dirs import dir_to_uv
        att = self.attenuation(params["attenuation"],
                               param_rusin(it.n, it.wi, wo))
        spectrum = att * (1.0 + self.color(params["color"], it.p)) / 2.0
        pdf = self.dist.pdf(params["dist"], dir_to_uv(wo))[..., 0]
        return spectrum, pdf, {}

    def sample(self, params, it, key, active=True):
        from ..ops.rusin import param_rusin
        from ..ops.dirs import uv_to_dir
        val, pdf = self.dist.sample(params["dist"], key, it.p.shape[:-1])
        wo = normalize(uv_to_dir(jnp.tanh(val)), eps=1e-7)
        att = (1.0 + self.attenuation(params["attenuation"],
                                      param_rusin(it.n, it.wi, wo))) / 2.0
        spectrum = att * (1.0 + self.color(params["color"], it.p)) / 2.0
        return BSDFSample(wo=wo, pdf=pdf), spectrum
