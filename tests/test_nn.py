"""Tests for the neural blocks."""

import jax
import jax.numpy as jnp
import numpy as np

from neural_raytracing_tpu.nn import (
    SkipConnMLP, TwoStageMLP, AutoDecoder, PartitionedAutoDecoder,
    DensityEstimator,
)


class TestSkipConnMLP:
    def test_shapes(self):
        mlp = SkipConnMLP(in_size=3, out=4, num_layers=4, hidden_size=32,
                          freqs=8)
        params = mlp.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (5, 7, 3))
        y = mlp(params, x)
        assert y.shape == (5, 7, 4)
        assert np.isfinite(np.asarray(y)).all()

    def test_zero_init_returns_zero(self):
        mlp = SkipConnMLP(in_size=3, out=1, init="zeros",
                          activation="softplus")
        params = mlp.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (16, 3))
        np.testing.assert_allclose(mlp(params, x), 0.0)

    def test_latent_conditioning(self):
        mlp = SkipConnMLP(in_size=2, out=3, latent_size=8, num_layers=3,
                          hidden_size=16, freqs=4)
        params = mlp.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (10, 2))
        l1 = jnp.zeros((10, 8))
        l2 = jnp.ones((10, 8))
        y1, y2 = mlp(params, x, l1), mlp(params, x, l2)
        assert not np.allclose(np.asarray(y1), np.asarray(y2))

    def test_can_fit_simple_function(self):
        import optax
        mlp = SkipConnMLP(in_size=1, out=1, num_layers=3, hidden_size=32,
                          freqs=8, sigma=4.0)
        params = mlp.init(jax.random.PRNGKey(0))
        opt = optax.adam(1e-3)
        state = opt.init(params)
        x = jnp.linspace(-1, 1, 256)[:, None]
        y = jnp.sin(3 * x)

        @jax.jit
        def step(params, state):
            def loss_fn(p):
                return jnp.mean(jnp.square(mlp(p, x) - y))
            loss, g = jax.value_and_grad(loss_fn)(params)
            updates, state2 = opt.update(g, state)
            return optax.apply_updates(params, updates), state2, loss

        for _ in range(300):
            params, state, loss = step(params, state)
        assert float(loss) < 1e-2

    def test_gradients_flow(self):
        mlp = SkipConnMLP(in_size=3, out=1, num_layers=4, hidden_size=16,
                          freqs=4)
        params = mlp.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (8, 3))
        g = jax.grad(lambda p: jnp.sum(mlp(p, x)))(params)
        # basis must receive NO gradient (stop_gradient parity with the
        # reference's requires_grad_(False))
        np.testing.assert_allclose(g["B"], 0.0)
        # every linear layer weight must receive some gradient
        assert float(jnp.abs(g["init"]["w"]).sum()) > 0
        assert float(jnp.abs(g["out"]["w"]).sum()) > 0


class TestTwoStageMLP:
    def test_shapes(self):
        mlp = TwoStageMLP(in_1=3, in_2=2, out=3, num_layers=2, hidden_size=16,
                          freqs=4)
        params = mlp.init(jax.random.PRNGKey(0))
        a = jax.random.normal(jax.random.PRNGKey(1), (4, 6, 3))
        b = jax.random.normal(jax.random.PRNGKey(2), (4, 6, 2))
        y = mlp(params, a, b)
        assert y.shape == (4, 6, 3)
        assert np.isfinite(np.asarray(y)).all()

    def test_weight_norm_parity(self):
        """Hidden layers are weight-normed (ref neural_blocks.py:135,149):
        g init'd to ||v|| makes the initial function equal the plain layout,
        and both g and v receive gradients."""
        kw = dict(in_1=3, in_2=2, out=3, num_layers=2, hidden_size=16,
                  freqs=4)
        wn = TwoStageMLP(**kw)
        plain = TwoStageMLP(weight_norm=False, **kw)
        p_wn = wn.init(jax.random.PRNGKey(0))
        p_plain = plain.init(jax.random.PRNGKey(0))
        assert "v" in p_wn["layers1"][0] and "g" in p_wn["layers1"][0]
        a = jax.random.normal(jax.random.PRNGKey(1), (8, 3))
        b = jax.random.normal(jax.random.PRNGKey(2), (8, 2))
        np.testing.assert_allclose(np.asarray(wn(p_wn, a, b)),
                                   np.asarray(plain(p_plain, a, b)),
                                   rtol=1e-5, atol=1e-6)
        g = jax.grad(lambda p: jnp.sum(wn(p, a, b)))(p_wn)
        assert float(jnp.abs(g["layers1"][0]["g"]).sum()) > 0
        assert float(jnp.abs(g["layers1"][0]["v"]).sum()) > 0

    def test_plain_checkpoint_loads_under_wn_default(self):
        """Params saved with the old plain {w,b} hidden layout must still
        apply through a weight_norm=True (default) module: the hidden-layer
        apply dispatches on the PARAMS layout, not the config flag."""
        kw = dict(in_1=3, in_2=2, out=3, num_layers=2, hidden_size=16,
                  freqs=4)
        plain = TwoStageMLP(weight_norm=False, **kw)
        p_plain = plain.init(jax.random.PRNGKey(0))
        a = jax.random.normal(jax.random.PRNGKey(1), (8, 3))
        b = jax.random.normal(jax.random.PRNGKey(2), (8, 2))
        np.testing.assert_allclose(
            np.asarray(TwoStageMLP(**kw)(p_plain, a, b)),
            np.asarray(plain(p_plain, a, b)))


class TestAutoDecoders:
    def test_auto_decoder(self):
        ad = AutoDecoder(in_size=3, out=2, num_layers=2, hidden_size=16,
                         code_size=8, freqs=4)
        params = ad.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (12, 3))
        y = ad(params, x)
        assert y.shape == (12, 2)

    def test_partitioned(self):
        pad = PartitionedAutoDecoder(in_size=3, out=2, num_layers=2,
                                     hidden_size=16, code_size=8,
                                     partition_size=4, freqs=4)
        params = pad.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (12, 3))
        y = pad(params, x)
        assert y.shape == (12, 2)
        flat, local = pad.partition(x)
        assert (np.asarray(flat) >= 0).all()
        assert (np.asarray(flat) < 4 ** 3).all()


class TestDensityEstimator:
    def test_sample_and_pdf(self):
        de = DensityEstimator(dists=8)
        params = de.init(jax.random.PRNGKey(0))
        val, pdf = de.sample(params, jax.random.PRNGKey(1), (32,))
        assert val.shape == (32, 2)
        assert pdf.shape == (32,)
        assert (np.asarray(pdf) >= 0).all()
        p2 = de.pdf(params, val)
        np.testing.assert_allclose(p2[..., 0], pdf, rtol=1e-4)

    def test_pdf_integrates_to_one(self):
        de = DensityEstimator(dists=4)
        params = de.init(jax.random.PRNGKey(0))
        # grid integrate over a wide box (components are near-standard
        # normals at zero-init)
        xs = jnp.linspace(-6, 6, 200)
        gx, gy = jnp.meshgrid(xs, xs)
        grid = jnp.stack([gx, gy], axis=-1).reshape(-1, 2)
        pdf = de.pdf(params, grid)[..., 0]
        integral = float(jnp.sum(pdf)) * (12 / 200) ** 2
        assert abs(integral - 1.0) < 0.02


class TestHashEncoding:
    def test_shapes_and_interpolation_continuity(self):
        from neural_raytracing_tpu.nn.hash_encoding import HashEncoding
        enc = HashEncoding(levels=4, table_size_log2=10, features=2,
                           base_resolution=4, max_resolution=32, bound=1.0)
        params = enc.init(jax.random.PRNGKey(0))
        p = jax.random.uniform(jax.random.PRNGKey(1), (64, 3),
                               minval=-1, maxval=1)
        out = enc(params, p)
        assert out.shape == (64, 4 * 2)
        # trilinear interpolation -> tiny input perturbation, tiny output
        out2 = enc(params, p + 1e-5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                                   atol=1e-3)

    def test_stacked_gather_matches_per_level_loop(self):
        # the stacked single-gather variant (opt-in; measured slower on
        # TPU at flagship scale, r5) must stay numerically identical to
        # the default per-level loop, gradients included
        from neural_raytracing_tpu.nn.hash_encoding import HashEncoding
        kw = dict(levels=4, table_size_log2=10, features=2,
                  base_resolution=4, max_resolution=32, bound=1.0)
        loop, stacked = HashEncoding(**kw), HashEncoding(stacked=True, **kw)
        params = loop.init(jax.random.PRNGKey(0))
        p = jax.random.uniform(jax.random.PRNGKey(1), (64, 3),
                               minval=-1, maxval=1)
        np.testing.assert_array_equal(np.asarray(loop(params, p)),
                                      np.asarray(stacked(params, p)))
        g1 = jax.grad(lambda pr: jnp.sum(loop(pr, p) ** 2))(params)
        g2 = jax.grad(lambda pr: jnp.sum(stacked(pr, p) ** 2))(params)
        np.testing.assert_allclose(np.asarray(g1["tables"]),
                                   np.asarray(g2["tables"]), atol=1e-7)

    def test_hash_sdf_starts_as_sphere(self):
        from neural_raytracing_tpu.nn.hash_encoding import HashSDF
        sdf = HashSDF(init_sphere_radius=0.5)
        params = sdf.init(jax.random.PRNGKey(0))
        p = jax.random.normal(jax.random.PRNGKey(1), (32, 3))
        got = sdf(params, p)
        expected = jnp.linalg.norm(p, axis=-1) - 0.5
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   atol=1e-6)

    def test_hash_sdf_fits_faster_than_fourier(self):
        import optax
        from neural_raytracing_tpu.nn.hash_encoding import HashSDF
        from neural_raytracing_tpu.shapes import SDF, prime

        target = lambda p: jnp.linalg.norm(
            p - jnp.asarray([0.2, 0.0, 0.0]), axis=-1) - 0.6
        sdf = SDF(HashSDF())
        params = sdf.init(jax.random.PRNGKey(0))
        params, loss = prime(sdf, params, target, jax.random.PRNGKey(1),
                             lr=5e-3, iters=300, batch_size=1024,
                             lo=-1.0, hi=1.0)
        assert float(loss) < 1e-3, float(loss)
