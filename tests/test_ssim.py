"""SSIM/MS-SSIM vs an independent numpy reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np

from neural_raytracing_tpu.ops import ssim, ms_ssim


def _np_gaussian(win=11, sigma=1.5):
    coords = np.arange(win) - win // 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    return g / g.sum()


def _np_blur(img, win=11, sigma=1.5):
    """Valid-mode separable gaussian filter of a 2D image."""
    g = _np_gaussian(win, sigma)
    out = np.apply_along_axis(
        lambda r: np.convolve(r, g, mode="valid"), 0, img)
    out = np.apply_along_axis(
        lambda r: np.convolve(r, g, mode="valid"), 1, out)
    return out


def _np_ssim(x, y, data_range=1.0, win=11, sigma=1.5, k1=0.01, k2=0.03):
    """Reference SSIM of two 2D arrays (valid conv, pytorch_msssim-style)."""
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_x = _np_blur(x, win, sigma)
    mu_y = _np_blur(y, win, sigma)
    sxx = _np_blur(x * x, win, sigma) - mu_x ** 2
    syy = _np_blur(y * y, win, sigma) - mu_y ** 2
    sxy = _np_blur(x * y, win, sigma) - mu_x * mu_y
    num = (2 * mu_x * mu_y + c1) * (2 * sxy + c2)
    den = (mu_x ** 2 + mu_y ** 2 + c1) * (sxx + syy + c2)
    return np.mean(num / den)


class TestSSIM:
    def test_identical_images(self):
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 32, 32))
        assert abs(float(ssim(x, x)) - 1.0) < 1e-5

    def test_matches_numpy_reference(self):
        key = jax.random.PRNGKey(0)
        x = jax.random.uniform(key, (48, 48))
        y = jnp.clip(x + 0.1 * jax.random.normal(jax.random.PRNGKey(1),
                                                 (48, 48)), 0, 1)
        ours = float(ssim(x[None, None], y[None, None]))
        theirs = _np_ssim(np.asarray(x), np.asarray(y))
        assert abs(ours - theirs) < 1e-4, (ours, theirs)

    def test_decreases_with_noise(self):
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 32, 32))
        noise = jax.random.normal(jax.random.PRNGKey(1), x.shape)
        s1 = float(ssim(x, jnp.clip(x + 0.05 * noise, 0, 1)))
        s2 = float(ssim(x, jnp.clip(x + 0.3 * noise, 0, 1)))
        assert s2 < s1 < 1.0

    def test_differentiable(self):
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 24, 24))
        y = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 24, 24))
        g = jax.grad(lambda a: ssim(a, y))(x)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


class TestMSSSIM:
    def test_identical_images(self):
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 192, 192))
        assert abs(float(ms_ssim(x, x)) - 1.0) < 1e-4

    def test_decreases_with_noise(self):
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 192, 192))
        noise = jax.random.normal(jax.random.PRNGKey(1), x.shape)
        s1 = float(ms_ssim(x, jnp.clip(x + 0.05 * noise, 0, 1)))
        s2 = float(ms_ssim(x, jnp.clip(x + 0.3 * noise, 0, 1)))
        assert s2 < s1 <= 1.0
