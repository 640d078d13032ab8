"""Pallas kernel parity tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_raytracing_tpu.kernels import FusedSkipConnMLP, fused_mlp_apply
from neural_raytracing_tpu.nn import SkipConnMLP


def make_pair(**kwargs):
    ref = SkipConnMLP(**kwargs)
    fused = FusedSkipConnMLP(mode="force", block_rows=64, **kwargs)
    params = ref.init(jax.random.PRNGKey(0))
    return ref, fused, params


class TestFusedMLP:
    @pytest.mark.parametrize("cfg", [
        dict(in_size=3, out=1, num_layers=2, hidden_size=32, freqs=8),
        dict(in_size=3, out=3, num_layers=6, hidden_size=96, freqs=64),
        dict(in_size=3, out=8, num_layers=4, hidden_size=128, freqs=32,
             activation="softplus"),
    ])
    def test_matches_reference_forward(self, cfg):
        ref, fused, params = make_pair(**cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (100, cfg["in_size"]))
        a = ref(params, x)
        b = fused(params, x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)

    def test_nonaligned_batch(self):
        ref, fused, params = make_pair(in_size=3, out=1, num_layers=2,
                                       hidden_size=32, freqs=8)
        for n in (1, 7, 63, 65):
            x = jax.random.normal(jax.random.PRNGKey(n), (n, 3))
            np.testing.assert_allclose(np.asarray(ref(params, x)),
                                       np.asarray(fused(params, x)),
                                       atol=2e-5, rtol=2e-5)

    def test_batched_shape(self):
        ref, fused, params = make_pair(in_size=3, out=2, num_layers=2,
                                       hidden_size=32, freqs=8)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 5, 3))
        assert fused(params, x).shape == (4, 5, 2)

    def test_gradients_match_reference(self):
        ref, fused, params = make_pair(in_size=3, out=1, num_layers=3,
                                       hidden_size=32, freqs=8)
        x = jax.random.normal(jax.random.PRNGKey(1), (64, 3))

        ga = jax.grad(lambda p: jnp.sum(jnp.square(ref(p, x))))(params)
        gb = jax.grad(lambda p: jnp.sum(jnp.square(fused(p, x))))(params)
        for a, b in zip(jax.tree_util.tree_leaves(ga),
                        jax.tree_util.tree_leaves(gb)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-3)

    def test_second_order_through_input_grad(self):
        # the SDF-normal pattern: d/dparams of (d/dx sdf)
        ref, fused, params = make_pair(in_size=3, out=1, num_layers=2,
                                       hidden_size=32, freqs=8)
        x = jax.random.normal(jax.random.PRNGKey(1), (16, 3))

        def normals(model, p):
            return jax.grad(lambda q: jnp.sum(model(p, q)))(x)

        def loss(model, p):
            return jnp.sum(jnp.square(normals(model, p)))

        ga = jax.grad(lambda p: loss(ref, p))(params)
        gb = jax.grad(lambda p: loss(fused, p))(params)
        for a, b in zip(jax.tree_util.tree_leaves(ga),
                        jax.tree_util.tree_leaves(gb)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3, rtol=1e-2)


class TestFusedSphereSDF:
    def test_forward_and_grad_parity(self):
        from neural_raytracing_tpu.kernels.fused_sdf import (
            FusedSphereSDF, _jnp_forward,
        )
        m = FusedSphereSDF(n=32, mode="force", block_rows=64)
        p = m.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (100, 3))
        np.testing.assert_allclose(np.asarray(_jnp_forward(m, p, x)),
                                   np.asarray(m(p, x)), atol=1e-5)
        ga = jax.grad(lambda pp: jnp.sum(jnp.square(_jnp_forward(m, pp, x))))(p)
        gb = jax.grad(lambda pp: jnp.sum(jnp.square(m(pp, x))))(p)
        for a, b in zip(jax.tree_util.tree_leaves(ga),
                        jax.tree_util.tree_leaves(gb)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-3)

    def test_matches_plain_sphere_sdf_module(self):
        from neural_raytracing_tpu.kernels.fused_sdf import FusedSphereSDF
        from neural_raytracing_tpu.nn import SkipConnMLP
        from neural_raytracing_tpu.shapes import SphereSDF
        mlp = SkipConnMLP(in_size=3, out=1, num_layers=2, hidden_size=32,
                          freqs=8, activation="softplus", init="zeros")
        fused = FusedSphereSDF(n=16, mode="off", mlp=mlp)
        plain = SphereSDF(n=16, mlp=mlp)
        p = plain.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (50, 3))
        np.testing.assert_allclose(np.asarray(fused(p, x)),
                                   np.asarray(plain(p, x)), atol=1e-5)


class TestPallasBackwardKernel:
    @pytest.mark.parametrize("act", ["leaky_relu", "softplus"])
    @pytest.mark.parametrize("segments", [0, 2])
    def test_grad_parity(self, act, segments):
        cfg = dict(in_size=3, out=2, num_layers=4, hidden_size=32, freqs=8,
                   activation=act)
        ref = SkipConnMLP(**cfg)
        fused = FusedSkipConnMLP(mode="force", block_rows=64,
                                 pallas_bwd=True,
                                 pallas_bwd_segments=segments, **cfg)
        p = ref.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (100, 3))

        def loss(model, pp, xx):
            return jnp.sum(jnp.sin(model(pp, xx)))

        ga, gxa = jax.grad(lambda pp, xx: loss(ref, pp, xx),
                           argnums=(0, 1))(p, x)
        gb, gxb = jax.grad(lambda pp, xx: loss(fused, pp, xx),
                           argnums=(0, 1))(p, x)
        for a, b in zip(jax.tree_util.tree_leaves(ga),
                        jax.tree_util.tree_leaves(gb)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(gxa), np.asarray(gxb),
                                   atol=2e-4, rtol=1e-3)


class TestFusedComposite:
    def test_matches_jnp_compositing(self):
        from neural_raytracing_tpu.kernels.composite import (
            volumetric_integrate_fused,
        )
        from neural_raytracing_tpu.shapes.nerf import volumetric_integrate
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        t, n = 24, 37
        sigma = jax.nn.relu(jax.random.normal(k1, (t, n)))
        rgb = jax.nn.sigmoid(jax.random.normal(k2, (t, n, 3)))
        ts = jnp.linspace(0.1, 2.0, t)
        ref = volumetric_integrate(sigma, rgb, ts)
        got = volumetric_integrate_fused(sigma, rgb, ts, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_gradients_match(self):
        from neural_raytracing_tpu.kernels.composite import (
            volumetric_integrate_fused,
        )
        from neural_raytracing_tpu.shapes.nerf import volumetric_integrate
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        t, n = 8, 16
        sigma = jax.nn.relu(jax.random.normal(k1, (t, n)))
        rgb = jax.nn.sigmoid(jax.random.normal(k2, (t, n, 3)))
        ts = jnp.linspace(0.1, 1.5, t)

        ga = jax.grad(lambda s: jnp.sum(
            jnp.square(volumetric_integrate(s, rgb, ts))))(sigma)
        gb = jax.grad(lambda s: jnp.sum(jnp.square(
            volumetric_integrate_fused(s, rgb, ts, interpret=True))))(sigma)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   atol=1e-4, rtol=1e-3)


class TestFusedMarch:
    """Whole-loop march / min-scan kernels vs the generic lax loops."""

    def _sdfs(self, max_steps=6, throughput_steps=8):
        from neural_raytracing_tpu.shapes import SDF, SphereSDF
        mlp = SkipConnMLP(in_size=3, out=1, num_layers=2, hidden_size=32,
                          freqs=8, activation="softplus", init="uniform")
        module = SphereSDF(n=8, mlp=mlp)
        params = module.init(jax.random.PRNGKey(0))
        # explicit reference-parity shadow mode: the package default
        # flipped to past-light-exit=True in round 3
        ref = SDF(module, max_steps=max_steps,
                  throughput_steps=throughput_steps, fused_loops="off",
                  shadow_past_light_exit=False)
        fused = SDF(module, max_steps=max_steps,
                    throughput_steps=throughput_steps, fused_loops="force",
                    march_dtype=jnp.float32, shadow_past_light_exit=False)
        return ref, fused, params

    def _rays(self, n=70):
        r_o = jnp.zeros((n, 3)).at[:, 2].set(2.0)
        d = jax.random.normal(jax.random.PRNGKey(1), (n, 3)) * 0.15
        r_d = d.at[:, 2].add(-1.0)
        r_d = r_d / jnp.linalg.norm(r_d, axis=-1, keepdims=True)
        return r_o, r_d

    def test_march_matches_generic(self):
        ref, fused, params = self._sdfs()
        r_o, r_d = self._rays()
        from neural_raytracing_tpu.kernels import fused_march as fm
        d_ref, h_ref = ref._march(params, r_o, r_d, 10.0)
        d_f, h_f = fm.fused_march(fused.module, params, r_o, r_d, 10.0,
                                  max_steps=6, epsilon=1e-3, block_rows=64,
                                  interpret=True)
        assert d_f.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(h_ref), np.asarray(h_f))
        np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_f),
                                   atol=1e-5, rtol=1e-5)

    def test_min_scan_matches_generic(self):
        ref, fused, params = self._sdfs()
        r_o, r_d = self._rays()
        from neural_raytracing_tpu.kernels import fused_march as fm
        # generic argmin indices via the reference scan
        steps = ref.throughput_steps
        step = ref.dist / steps
        idx_f = fm.fused_min_scan(fused.module, params, r_o, r_d, step,
                                  steps=steps, block_rows=64, interpret=True)
        sd_ref, pos_ref = ref.throughput(params, r_o, r_d)
        pos_fused = r_o + (idx_f * step)[..., None] * r_d
        np.testing.assert_allclose(np.asarray(pos_ref), np.asarray(pos_fused),
                                   atol=1e-6, rtol=1e-6)

    def test_throughput_dispatch_and_grads(self):
        ref, fused, params = self._sdfs()
        r_o, r_d = self._rays(33)

        def loss(sdf_obj, p):
            sd, _ = sdf_obj.throughput(p, r_o, r_d)
            return jnp.sum(jnp.square(sd))

        a = loss(ref, params)
        b = loss(fused, params)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
        ga = jax.grad(lambda p: loss(ref, p))(params)
        gb = jax.grad(lambda p: loss(fused, p))(params)
        for x, y in zip(jax.tree_util.tree_leaves(ga),
                        jax.tree_util.tree_leaves(gb)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=1e-4, rtol=1e-3)

    def test_intersect_dispatch_matches(self):
        ref, fused, params = self._sdfs()
        r_o, r_d = self._rays(48)
        rays = jnp.concatenate([r_o, r_d], axis=-1)
        it_ref, hit_ref = ref.intersect(params, rays)
        it_f, hit_f = fused.intersect(params, rays)
        np.testing.assert_array_equal(np.asarray(hit_ref), np.asarray(hit_f))
        np.testing.assert_allclose(np.asarray(it_ref.p), np.asarray(it_f.p),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(it_ref.throughput),
                                   np.asarray(it_f.throughput),
                                   atol=1e-4, rtol=1e-4)

    def test_warp_disables_fused(self):
        _, fused, params = self._sdfs()
        warped = fused.with_warp(lambda p: p * 1.1)
        use, _ = warped._fused_loop_state()
        assert not use

    def test_bf16_march_close_to_f32(self):
        """bf16 matmul operands in the no-grad march: hits must agree and
        depths stay within the marcher's own epsilon scale."""
        ref, _, params = self._sdfs(max_steps=12)
        r_o, r_d = self._rays(96)
        from neural_raytracing_tpu.kernels import fused_march as fm
        d_ref, h_ref = ref._march(params, r_o, r_d, 10.0)
        d_b, h_b = fm.fused_march(ref.module, params, r_o, r_d, 10.0,
                                  max_steps=12, epsilon=1e-3, block_rows=64,
                                  compute_dtype=jnp.bfloat16, interpret=True)
        agree = np.mean(np.asarray(h_ref) == np.asarray(h_b))
        assert agree >= 0.95, agree
        both = np.asarray(h_ref) & np.asarray(h_b)
        if both.any():
            err = np.abs(np.asarray(d_ref)[both] - np.asarray(d_b)[both])
            assert np.median(err) < 2e-2, np.median(err)

    def test_shadow_march_matches_generic(self):
        ref, fused, params = self._sdfs(max_steps=8)
        r_o, r_d = self._rays(96)
        rays = jnp.concatenate([r_o, r_d], axis=-1)
        from neural_raytracing_tpu.kernels import fused_march as fm
        for max_t in (10.0, jnp.full((96,), 1.5)):
            nb_ref = ref.intersect_test(params, rays, max_t=max_t)
            nb_f = fm.fused_shadow_march(ref.module, params, r_o, r_d, max_t,
                                         max_steps=8, epsilon=1e-3,
                                         block_rows=64, interpret=True)
            np.testing.assert_array_equal(np.asarray(nb_ref), np.asarray(nb_f))

    def test_shadow_past_light_exit_matches(self):
        """Opt-in past-light freeze: fused (interpret) == generic with the
        same flag, and both == reference-parity baseline on this
        well-behaved (near-true-SDF) module where pullback-past-the-light
        never happens."""
        from neural_raytracing_tpu.shapes import SDF

        ref, _, params = self._sdfs(max_steps=8)
        r_o, r_d = self._rays(96)
        rays = jnp.concatenate([r_o, r_d], axis=-1)
        exit_sdf = SDF(ref.module, max_steps=8, fused_loops="off",
                       shadow_past_light_exit=True)
        from neural_raytracing_tpu.kernels import fused_march as fm
        for max_t in (10.0, jnp.full((96,), 1.5)):
            nb_base = ref.intersect_test(params, rays, max_t=max_t)
            nb_gen = exit_sdf.intersect_test(params, rays, max_t=max_t)
            nb_f = fm.fused_shadow_march(ref.module, params, r_o, r_d, max_t,
                                         max_steps=8, epsilon=1e-3,
                                         block_rows=64, interpret=True,
                                         past_light_exit=True)
            np.testing.assert_array_equal(np.asarray(nb_gen),
                                          np.asarray(nb_f))
            np.testing.assert_array_equal(np.asarray(nb_base),
                                          np.asarray(nb_gen))

    def test_shadow_march_inactive_rays(self):
        # zero-direction (masked) rays must come back not-blocked, matching
        # the generic loop, and must not stall the block's early exit
        ref, _, params = self._sdfs(max_steps=8)
        r_o, r_d = self._rays(32)
        r_d = r_d.at[::3].set(0.0)
        rays = jnp.concatenate([r_o, r_d], axis=-1)
        from neural_raytracing_tpu.kernels import fused_march as fm
        nb_ref = ref.intersect_test(params, rays, max_t=2.0)
        nb_f = fm.fused_shadow_march(ref.module, params, r_o, r_d, 2.0,
                                     max_steps=8, epsilon=1e-3,
                                     block_rows=64, interpret=True)
        np.testing.assert_array_equal(np.asarray(nb_ref), np.asarray(nb_f))

    def test_overrelaxed_march_fused_matches_generic(self):
        from neural_raytracing_tpu.shapes import SDF, SphereSDF
        mlp = SkipConnMLP(in_size=3, out=1, num_layers=2, hidden_size=32,
                          freqs=8, activation="softplus", init="uniform")
        module = SphereSDF(n=8, mlp=mlp)
        params = module.init(jax.random.PRNGKey(0))
        gen = SDF(module, max_steps=10, fused_loops="off", omega=1.5)
        r_o, r_d = self._rays(96)
        from neural_raytracing_tpu.kernels import fused_march as fm
        d_g, h_g = gen._march(params, r_o, r_d, 10.0)
        d_f, h_f = fm.fused_march(module, params, r_o, r_d, 10.0,
                                  max_steps=10, epsilon=1e-3, block_rows=64,
                                  omega=1.5, interpret=True)
        np.testing.assert_array_equal(np.asarray(h_g), np.asarray(h_f))
        np.testing.assert_allclose(np.asarray(d_g), np.asarray(d_f),
                                   atol=1e-5, rtol=1e-5)

    def test_overrelaxed_march_converges_on_exact_sdf(self):
        # on an exact unit-sphere SDF the relaxed march must find the same
        # hits as the plain march, in no more steps
        from neural_raytracing_tpu.shapes import SDF, UNIT_SPHERE
        base = SDF(UNIT_SPHERE, max_steps=48, fused_loops="off")
        rel = SDF(UNIT_SPHERE, max_steps=48, fused_loops="off", omega=1.5)
        r_o, r_d = self._rays(128)
        d_b, h_b = base._march({}, r_o, r_d, 10.0)
        d_r, h_r = rel._march({}, r_o, r_d, 10.0)
        assert np.mean(np.asarray(h_b) == np.asarray(h_r)) > 0.98
        both = np.asarray(h_b) & np.asarray(h_r)
        np.testing.assert_allclose(np.asarray(d_b)[both],
                                   np.asarray(d_r)[both], atol=5e-3)

    def test_overrelaxed_march_rejects_interior_overshoot(self):
        # perpendicular rays with slight length jitter historically slipped
        # past the sphere-overlap test and "hit" deep inside the surface;
        # the interior-overshoot fail must retreat them to the boundary
        from neural_raytracing_tpu.shapes import SDF, UNIT_SPHERE
        n = 64
        r_o = jnp.zeros((n, 3)).at[:, 2].set(2.0)
        jit = 1.0 + 1e-3 * jax.random.normal(jax.random.PRNGKey(3), (n, 1))
        r_d = jnp.concatenate(
            [jnp.zeros((n, 2)), -jnp.ones((n, 1))], -1) * jit
        base = SDF(UNIT_SPHERE, max_steps=64, fused_loops="off")
        d_b, h_b = base._march({}, r_o, r_d, 10.0)
        for om in (1.4, 1.6):
            rel = SDF(UNIT_SPHERE, max_steps=64, fused_loops="off", omega=om)
            d_r, h_r = rel._march({}, r_o, r_d, 10.0)
            np.testing.assert_array_equal(np.asarray(h_b), np.asarray(h_r))
            # depths may differ by a few epsilon (different trajectories
            # both stop within epsilon of the surface)
            np.testing.assert_allclose(np.asarray(d_b), np.asarray(d_r),
                                       atol=5e-3)

    def test_fused_loops_under_grad_of_inputs(self):
        # colocate regression: shadow march runs inside grad with
        # differentiated ray origins (it.p) and light distances; the
        # kernels must sever input tangents, not crash linearization
        ref, fused, params = self._sdfs(max_steps=6)
        r_o, r_d = self._rays(33)

        def loss(ro):
            rays = jnp.concatenate([ro, r_d], axis=-1)
            nb = fused.intersect_test(params, rays, max_t=2.0)
            it, hit = fused.intersect(params, rays)
            return jnp.sum(it.p * (1.0 + nb[..., None]))

        g = jax.grad(loss)(r_o)
        assert np.isfinite(np.asarray(g)).all()


class TestStableMin:
    """SphereSDF(stable_min=True): exact logsumexp smooth-min — no
    saturation plateau — with full plain/fused parity."""

    def _module(self, stable):
        mlp = SkipConnMLP(in_size=3, out=1, num_layers=2, hidden_size=32,
                          freqs=8, activation="softplus", init="zeros")
        from neural_raytracing_tpu.shapes import SphereSDF
        m = SphereSDF(n=8, mlp=mlp, stable_min=stable)
        return m, m.init(jax.random.PRNGKey(0))

    def test_agrees_with_clamped_near_surface(self):
        m_ref, params = self._module(False)
        m_st, _ = self._module(True)
        p = jax.random.normal(jax.random.PRNGKey(1), (256, 3)) * 0.15
        a = np.asarray(m_ref(params, p))
        b = np.asarray(m_st(params, p))
        # within the unclamped band the two forms are identical
        near = a < 0.2
        assert near.sum() > 20
        np.testing.assert_allclose(a[near], b[near], atol=1e-5)

    def test_no_plateau_far_away(self):
        m_st, params = self._module(True)
        import math
        plateau = -math.log(1e-4) / m_st.k          # 0.288 for k=32
        far = jnp.asarray([[3.0, 0.0, 0.0], [0.0, 5.0, 0.0]])
        vals = np.asarray(m_st(params, far))
        # the stable field keeps growing with distance (zero-init shift)
        assert (vals > 4.0 * plateau).all(), vals
        m_ref, _ = self._module(False)
        clamped = np.asarray(m_ref(params, far))
        assert (clamped <= plateau + 1e-5).all(), clamped

    def test_fused_kernels_match_generic_with_stable_min(self):
        from neural_raytracing_tpu.shapes import SDF, SphereSDF
        mlp = SkipConnMLP(in_size=3, out=1, num_layers=2, hidden_size=32,
                          freqs=8, activation="softplus", init="uniform")
        module = SphereSDF(n=8, mlp=mlp, stable_min=True)
        params = module.init(jax.random.PRNGKey(0))
        ref = SDF(module, max_steps=8, throughput_steps=8,
                  fused_loops="off")
        fused = SDF(module, max_steps=8, throughput_steps=8,
                    fused_loops="force")
        n = 96
        r_o = jnp.zeros((n, 3)).at[:, 2].set(2.0)
        d = jax.random.normal(jax.random.PRNGKey(1), (n, 3)) * 0.15
        r_d = (jnp.asarray([0.0, 0.0, -1.0]) + d)
        r_d = r_d / jnp.linalg.norm(r_d, axis=-1, keepdims=True)
        rays = jnp.concatenate([r_o, r_d], axis=-1)

        it_r, hit_r = ref.intersect(params, rays, key=None)
        it_f, hit_f = fused.intersect(params, rays, key=None)
        np.testing.assert_array_equal(np.asarray(hit_r), np.asarray(hit_f))
        np.testing.assert_allclose(np.asarray(it_r.t), np.asarray(it_f.t),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(it_r.throughput),
                                   np.asarray(it_f.throughput), atol=1e-4)
        nb_r = ref.intersect_test(params, rays, max_t=1.5)
        nb_f = fused.intersect_test(params, rays, max_t=1.5)
        np.testing.assert_array_equal(np.asarray(nb_r), np.asarray(nb_f))

    def test_fused_sphere_sdf_module_stable_min(self):
        from neural_raytracing_tpu.kernels.fused_sdf import FusedSphereSDF
        from neural_raytracing_tpu.shapes import SphereSDF
        mlp = SkipConnMLP(in_size=3, out=1, num_layers=2, hidden_size=32,
                          freqs=8, activation="softplus", init="uniform")
        fused = FusedSphereSDF(n=8, mlp=mlp, mode="force", stable_min=True)
        plain = SphereSDF(n=8, mlp=mlp, stable_min=True)
        params = plain.init(jax.random.PRNGKey(0))
        p = jax.random.normal(jax.random.PRNGKey(2), (64, 3))
        np.testing.assert_allclose(np.asarray(fused(params, p)),
                                   np.asarray(plain(params, p)), atol=1e-5)


class TestMarchBound:
    """Opt-in bounding-sphere march clip: fused == generic, and on scenes
    inside the bound the hits/depths match the unbounded march."""

    def _scene(self, **kw):
        from neural_raytracing_tpu.shapes import SDF, SphereSDF
        mlp = SkipConnMLP(in_size=3, out=1, num_layers=2, hidden_size=32,
                          freqs=8, activation="softplus", init="uniform")
        module = SphereSDF(n=8, mlp=mlp)
        return SDF(module, max_steps=24, throughput_steps=8, **kw), module

    def _rays(self, n=96):
        r_o = jnp.zeros((n, 3)).at[:, 2].set(2.0)
        d = jax.random.normal(jax.random.PRNGKey(3), (n, 3)) * 0.25
        r_d = jnp.asarray([0.0, 0.0, -1.0]) + d
        r_d = r_d / jnp.linalg.norm(r_d, axis=-1, keepdims=True)
        return jnp.concatenate([r_o, r_d], axis=-1)

    def test_bounded_matches_unbounded_inside_bound(self):
        # the random-init SphereSDF lives well inside radius 1.2
        plain, module = self._scene(fused_loops="off")
        bounded, _ = self._scene(fused_loops="off", march_bound=1.2)
        params = module.init(jax.random.PRNGKey(0))
        rays = self._rays()
        it_a, hit_a = plain.intersect(params, rays, key=None)
        it_b, hit_b = bounded.intersect(params, rays, key=None)
        np.testing.assert_array_equal(np.asarray(hit_a), np.asarray(hit_b))
        # hit depths agree (miss depths legitimately differ)
        ha = np.asarray(it_a.t)[np.asarray(hit_a)]
        hb = np.asarray(it_b.t)[np.asarray(hit_a)]
        np.testing.assert_allclose(ha, hb, atol=1e-5)

    def test_fused_bounded_matches_generic_bounded(self):
        gen, module = self._scene(fused_loops="off", march_bound=1.2)
        fused, _ = self._scene(fused_loops="force", march_bound=1.2)
        params = module.init(jax.random.PRNGKey(0))
        rays = self._rays()
        it_a, hit_a = gen.intersect(params, rays, key=None)
        it_b, hit_b = fused.intersect(params, rays, key=None)
        np.testing.assert_array_equal(np.asarray(hit_a), np.asarray(hit_b))
        np.testing.assert_allclose(np.asarray(it_a.t), np.asarray(it_b.t),
                                   atol=1e-5)

    def test_rays_missing_bound_resolve_as_misses(self):
        gen, module = self._scene(fused_loops="off", march_bound=0.5)
        params = module.init(jax.random.PRNGKey(0))
        # rays pointing AWAY from the origin: never intersect the bound
        n = 16
        r_o = jnp.zeros((n, 3)).at[:, 2].set(2.0)
        r_d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
        rays = jnp.concatenate([r_o, r_d], axis=-1)
        it, hit = gen.intersect(params, rays, key=None)
        assert not np.asarray(hit).any()
