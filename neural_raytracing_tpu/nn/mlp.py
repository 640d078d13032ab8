"""Neural building blocks as pure functions over params pytrees.

Behavioral parity: pytorch3d/pathtracer/neural_blocks.py —
  * SkipConnMLP (:12-102): Gaussian-Fourier-encoded MLP with skip
    re-concatenation of the encoded input every ``skip`` layers, activation
    applied BEFORE each linear layer, optional latent concat, zero/xavier init.
  * TwoStageMLP (:104-178): two skip-MLP stages with a sigmoid bottleneck.
  * AutoDecoder (:249-307) / PartitionedAutoDecoder (:309-389): DeepSDF-style
    learned codes (global / 8^3 voxel grid).
  * DensityEstimator (:391-436): learned mixture of 2D gaussians with
    reparameterized sampling, used by NeuralWarp.

Static configuration lives on the Python object; all learnable state is in
the params dict returned by ``init`` so components jit/shard/checkpoint as
plain pytrees.  The Fourier basis is stored in params (self-contained
checkpoints) but stop-gradiented at application time.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops.encoding import fourier_basis, fourier_encode, fourier_size

ACTIVATIONS: dict = {
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
    "relu": jax.nn.relu,
    "softplus": jax.nn.softplus,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "elu": jax.nn.elu,
    "identity": lambda x: x,
}

# derivative wrt the pre-activation (used by hand-written Pallas backwards)
ACTIVATION_GRADS: dict = {
    "leaky_relu": lambda x: jnp.where(x >= 0, 1.0, 0.01),
    "relu": lambda x: jnp.where(x >= 0, 1.0, 0.0),
    "softplus": jax.nn.sigmoid,
    "sigmoid": lambda x: jax.nn.sigmoid(x) * (1.0 - jax.nn.sigmoid(x)),
    "tanh": lambda x: 1.0 - jnp.square(jnp.tanh(x)),
    "identity": lambda x: jnp.ones_like(x),
}


def resolve_activation(act) -> Callable:
    if callable(act):
        return act
    return ACTIVATIONS[act]


def activation_name(act) -> Optional[str]:
    """The registry name of an activation, or None if custom."""
    if isinstance(act, str):
        return act
    for name, fn in ACTIVATIONS.items():
        if fn is act:
            return name
    return None


def _linear_init(key, fan_in: int, fan_out: int, mode: str):
    """Initialize one linear layer. ``mode`` in {uniform, zeros, xavier}.

    'uniform' matches torch.nn.Linear's default U(-1/sqrt(fan_in), ..) for
    both weight and bias, which is what the reference relies on.
    """
    wk, bk = jax.random.split(key)
    if mode == "zeros":
        return {"w": jnp.zeros((fan_in, fan_out), jnp.float32),
                "b": jnp.zeros((fan_out,), jnp.float32)}
    if mode == "xavier":
        limit = math.sqrt(6.0 / (fan_in + fan_out))
        w = jax.random.uniform(wk, (fan_in, fan_out), jnp.float32, -limit, limit)
        return {"w": w, "b": jnp.zeros((fan_out,), jnp.float32)}
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(wk, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(bk, (fan_out,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def linear(params, x):
    return x @ params["w"] + params["b"]


def _weight_norm_init(key, fan_in: int, fan_out: int, mode: str):
    """Weight-normed linear: w = g * v / ||v||, norm over fan_in (matches
    torch.nn.utils.weight_norm's default dim=0 on a Linear).  g starts at
    ||v|| so the initial function equals the plain layer."""
    p = _linear_init(key, fan_in, fan_out, mode)
    g = jnp.linalg.norm(p["w"], axis=0)
    return {"v": p["w"], "g": g, "b": p["b"]}


def wn_linear(params, x):
    v = params["v"]
    w = params["g"] * v / jnp.maximum(jnp.linalg.norm(v, axis=0), 1e-12)
    return x @ w + params["b"]


def _hidden_linear(params, x):
    """Apply a hidden layer by its PARAMS layout ({v,g,b} weight-normed or
    {w,b} plain) rather than by the module config, so checkpoints saved
    before the ``weight_norm=True`` default (plain layout) keep loading."""
    return wn_linear(params, x) if "v" in params else linear(params, x)


class SkipConnMLP:
    """Fourier-encoded MLP with periodic skip re-injection of the encoding.

    apply: ``(params, p[..., in_size], latent[..., latent_size]?) -> [..., out]``
    """

    def __init__(self, in_size: int = 3, out: int = 3, num_layers: int = 8,
                 hidden_size: int = 64, skip: int = 3, freqs: int = 16,
                 sigma: float = 32.0, latent_size: int = 0,
                 activation="leaky_relu", init: str = "uniform",
                 zero_out: bool = False, compute_dtype=jnp.float32):
        self.in_size = in_size
        self.out_size = out
        self.num_layers = num_layers
        self.hidden_size = hidden_size
        self.skip = skip
        self.freqs = freqs
        self.sigma = sigma
        self.latent_size = latent_size
        self.activation = resolve_activation(activation)
        self.activation_name = activation_name(activation)
        self.init_mode = init
        # zero only the output layer: function starts at 0 while hidden
        # layers keep healthy gradients (prevents sigmoid-head saturation
        # collapse observed in long spatially-varying-BSDF runs)
        self.zero_out = zero_out
        self.compute_dtype = compute_dtype

        self.enc_size = fourier_size(freqs, in_size)
        self.dim_p = self.enc_size + latent_size
        self.skip_size = hidden_size + self.dim_p

    def _is_skip_layer(self, i: int) -> bool:
        return (i % self.skip) == 0 and i != self.num_layers - 1

    def init(self, key: jax.Array) -> dict:
        keys = jax.random.split(key, self.num_layers + 3)
        layers = tuple(
            _linear_init(
                keys[i],
                self.skip_size if self._is_skip_layer(i) else self.hidden_size,
                self.hidden_size, self.init_mode)
            for i in range(self.num_layers))
        out = _linear_init(keys[-2], self.hidden_size, self.out_size,
                           "zeros" if self.zero_out else self.init_mode)
        return {
            "B": fourier_basis(keys[-1], self.freqs, self.in_size, self.sigma),
            "init": _linear_init(keys[-3], self.dim_p, self.hidden_size,
                                 self.init_mode),
            "layers": layers,
            "out": out,
        }

    def __call__(self, params: dict, p: jax.Array,
                 latent: Optional[jax.Array] = None) -> jax.Array:
        batches = p.shape[:-1]
        x = p.reshape(-1, self.in_size).astype(self.compute_dtype)
        enc = fourier_encode(x, params["B"])
        if latent is not None:
            enc = jnp.concatenate(
                [enc, latent.reshape(-1, self.latent_size).astype(enc.dtype)],
                axis=-1)
        h = linear(params["init"], enc)
        for i in range(self.num_layers):
            if self._is_skip_layer(i):
                h = jnp.concatenate([h, enc], axis=-1)
            h = linear(params["layers"][i], self.activation(h))
        out = linear(params["out"], self.activation(h))
        return out.astype(jnp.float32).reshape(batches + (self.out_size,))


def prime_identity(mlp: "SkipConnMLP", params, key, lr: float = 1e-4,
                   iters: int = 2000, batches: int = 4096):
    """Pre-train an MLP to approximate the identity on [0, 1]^in.

    Parity: ``SkipConnMLP.prime_identity`` (neural_blocks.py:88-102).
    """
    import optax

    opt = optax.adamw(lr, weight_decay=0.0)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        xkey, key = jax.random.split(key)
        x = jax.random.uniform(xkey, (batches, mlp.in_size))

        def loss_fn(p):
            return jnp.mean(jnp.square(mlp(p, x) - x[:, :mlp.out_size]))

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, key, loss

    loss = None
    for _ in range(iters):
        params, opt_state, key, loss = step(params, opt_state, key)
    return params, loss


class TwoStageMLP:
    """Two chained skip-MLP stages with a sigmoid bottleneck between them.

    apply: ``(params, i1[..., in_1], i2[..., in_2]) -> [..., out]``

    Parity (neural_blocks.py:104-178): the HIDDEN linears of both stages
    are weight-normed (nn.utils.weight_norm at :135,149 — w = g·v/||v||
    per output neuron, g init'd to ||v||); init/inter/from_inter/out stay
    plain.  ``weight_norm=False`` opts out (plain layout).
    """

    def __init__(self, in_1: int = 3, in_2: int = 3, intermediate: int = 1,
                 out: int = 3, num_layers: int = 6, hidden_size: int = 128,
                 skip: int = 3, freqs: int = 10, sigma: float = 64.0,
                 activation="relu", init: str = "uniform",
                 weight_norm: bool = True):
        self.weight_norm = weight_norm
        self.in_1, self.in_2 = in_1, in_2
        self.intermediate = intermediate
        self.out_size = out
        self.num_layers = num_layers
        self.hidden_size = hidden_size
        self.skip = skip
        self.freqs = freqs
        self.sigma = sigma
        self.activation = resolve_activation(activation)
        self.init_mode = init

        self.dim_1 = fourier_size(freqs, in_1)
        self.mid_input = intermediate + fourier_size(freqs, in_2)

    def _is_skip_layer(self, i: int) -> bool:
        return (i % self.skip) == 0 and i != self.num_layers - 1

    def init(self, key: jax.Array) -> dict:
        n = self.num_layers
        keys = jax.random.split(key, 2 * n + 6)
        skip1 = self.hidden_size + self.dim_1
        skip2 = self.hidden_size + self.mid_input
        hidden_init = _weight_norm_init if self.weight_norm else _linear_init
        return {
            "B1": fourier_basis(keys[0], self.freqs, self.in_1, self.sigma),
            "B2": fourier_basis(keys[1], self.freqs, self.in_2, self.sigma),
            "init": _linear_init(keys[2], self.dim_1, self.hidden_size,
                                 self.init_mode),
            "layers1": tuple(
                hidden_init(keys[3 + i],
                            skip1 if self._is_skip_layer(i) else self.hidden_size,
                            self.hidden_size, self.init_mode)
                for i in range(n)),
            "inter": _linear_init(keys[3 + n], self.hidden_size,
                                  self.intermediate, self.init_mode),
            "from_inter": _linear_init(keys[4 + n], self.mid_input,
                                       self.hidden_size, self.init_mode),
            "layers2": tuple(
                hidden_init(keys[5 + n + i],
                            skip2 if self._is_skip_layer(i) else self.hidden_size,
                            self.hidden_size, self.init_mode)
                for i in range(n)),
            "out": _linear_init(keys[5 + 2 * n], self.hidden_size,
                                self.out_size, self.init_mode),
        }

    def __call__(self, params: dict, i1: jax.Array, i2: jax.Array) -> jax.Array:
        batches = i1.shape[:-1]
        act = self.activation
        hidden = _hidden_linear
        enc1 = fourier_encode(i1.reshape(-1, self.in_1), params["B1"])
        h = linear(params["init"], enc1)
        for i in range(self.num_layers):
            if self._is_skip_layer(i):
                h = jnp.concatenate([h, enc1], axis=-1)
            h = hidden(params["layers1"][i], act(h))
        h = jax.nn.sigmoid(linear(params["inter"], act(h)))
        enc2 = fourier_encode(i2.reshape(-1, self.in_2), params["B2"])
        mid = jnp.concatenate([h, enc2], axis=-1)
        h = linear(params["from_inter"], mid)
        for i in range(self.num_layers):
            if self._is_skip_layer(i):
                h = jnp.concatenate([h, mid], axis=-1)
            h = hidden(params["layers2"][i], act(h))
        out = linear(params["out"], act(h))
        return out.reshape(batches + (self.out_size,))


class AutoDecoder:
    """SkipConnMLP conditioned on a single learned global code (DeepSDF-style)."""

    def __init__(self, in_size: int = 3, out: int = 3, num_layers: int = 4,
                 code_size: int = 64, hidden_size: int = 64, skip: int = 3,
                 freqs: int = 8, sigma: float = 64.0,
                 activation="leaky_relu", init: str = "uniform"):
        self.code_size = code_size
        self.mlp = SkipConnMLP(
            in_size=in_size, out=out, num_layers=num_layers,
            hidden_size=hidden_size, skip=skip, freqs=freqs, sigma=sigma,
            latent_size=code_size, activation=activation, init=init)

    def init(self, key: jax.Array) -> dict:
        k1, k2 = jax.random.split(key)
        return {
            "code": jax.random.uniform(k1, (self.code_size,), jnp.float32),
            "mlp": self.mlp.init(k2),
        }

    def __call__(self, params: dict, p: jax.Array,
                 code: Optional[jax.Array] = None) -> jax.Array:
        code = params["code"] if code is None else code
        latent = jnp.broadcast_to(code, p.shape[:-1] + (self.code_size,))
        return self.mlp(params["mlp"], p, latent)


class PartitionedAutoDecoder:
    """A voxel grid of learned codes + one shared decoder MLP.

    Positions in ``[-bound, bound]^3`` are binned into a ``ps^3`` grid; each
    cell owns a code that conditions the shared MLP on in-cell coordinates.
    """

    def __init__(self, in_size: int = 3, out: int = 3, num_layers: int = 4,
                 code_size: int = 64, partition_size: int = 8,
                 bound: float = 3.0, hidden_size: int = 64, skip: int = 3,
                 freqs: int = 8, sigma: float = 64.0,
                 activation="leaky_relu", init: str = "uniform"):
        self.code_size = code_size
        self.ps = partition_size
        self.bound = bound
        self.in_size = in_size
        self.mlp = SkipConnMLP(
            in_size=in_size, out=out, num_layers=num_layers,
            hidden_size=hidden_size, skip=skip, freqs=freqs, sigma=sigma,
            latent_size=code_size, activation=activation, init=init)

    def init(self, key: jax.Array) -> dict:
        k1, k2 = jax.random.split(key)
        return {
            "codes": jax.random.normal(
                k1, (self.ps ** 3, self.code_size), jnp.float32),
            "mlp": self.mlp.init(k2),
        }

    def partition(self, p: jax.Array):
        """-> (flat cell index [...], local coords in [0,1) [..., 3])"""
        ps, bound = self.ps, self.bound
        xyz = jnp.clip(p, -bound, bound) + bound
        inv = (ps - 1) / (2.0 * bound)
        idx = jnp.clip((xyz * inv).astype(jnp.int32), 0, ps - 1)
        local = xyz * inv - idx
        flat = idx[..., 0] + idx[..., 1] * ps + idx[..., 2] * ps * ps
        return flat, local

    def __call__(self, params: dict, p: jax.Array) -> jax.Array:
        flat, local = self.partition(p.reshape(-1, self.in_size))
        codes = params["codes"][flat]
        out = self.mlp(params["mlp"], local, codes)
        return out.reshape(p.shape[:-1] + (self.mlp.out_size,))


class DensityEstimator:
    """Learned mixture of 2D gaussians with reparameterized sampling.

    apply-sample: ``(params, key, shape) -> (values[shape + (2,)], pdf[shape])``
    pdf:          ``(params, val[..., 2]) -> [..., 1]``
    """

    def __init__(self, in_size: int = 2, dists: int = 32):
        assert in_size == 2, "reference DensityEstimator is 2D"
        self.in_size = in_size
        self.dists = dists

    def init(self, key: jax.Array) -> dict:
        return {
            "centers": jnp.zeros((self.dists, self.in_size), jnp.float32),
            "vars": jnp.zeros((self.dists, 3), jnp.float32),  # (a, d0, d1)
            "weights": jnp.zeros((self.dists,), jnp.float32),
        }

    def _scale_tril(self, params):
        a = params["vars"][:, 0]
        d0 = jnp.exp(params["vars"][:, 1])
        d1 = jnp.exp(params["vars"][:, 2])
        zeros = jnp.zeros_like(a)
        return jnp.stack([
            jnp.stack([d0, zeros], axis=-1),
            jnp.stack([a, d1], axis=-1),
        ], axis=-2)  # [dists, 2, 2]

    def _log_prob(self, params, val):
        """log N(val; centers_k, L_k L_k^T) for each mixture component k."""
        tril = self._scale_tril(params)                       # [K, 2, 2]
        diff = val[..., None, :] - params["centers"]          # [..., K, 2]
        # solve L z = diff  (lower-triangular 2x2, closed form)
        l00 = tril[:, 0, 0]
        l10 = tril[:, 1, 0]
        l11 = tril[:, 1, 1]
        z0 = diff[..., 0] / l00
        z1 = (diff[..., 1] - l10 * z0) / l11
        maha = z0 * z0 + z1 * z1
        logdet = jnp.log(l00) + jnp.log(l11)
        return -0.5 * maha - logdet - math.log(2.0 * math.pi)

    def sample(self, params: dict, key: jax.Array, shape: tuple):
        tril = self._scale_tril(params)
        eps = jax.random.normal(key, shape + (self.dists, self.in_size))
        samples = params["centers"] + jnp.einsum("kij,...kj->...ki", tril, eps)
        k = jax.nn.softmax(params["weights"])
        val = jnp.sum(samples * k[:, None], axis=-2)
        pdf = jnp.sum(jnp.exp(self._log_prob(params, val)) * k, axis=-1)
        return val, pdf

    def pdf(self, params: dict, val: jax.Array) -> jax.Array:
        k = jax.nn.softmax(params["weights"])
        p = jnp.sum(jnp.exp(self._log_prob(params, val)) * k, axis=-1,
                    keepdims=True)
        return p
