"""End-to-end training smoke: fit an SDF scene to rendered ground truth.

This is the integration test the reference never had: generate GT by
rendering an analytic sphere scene (the reference's ``pathtrace_labels``
pattern, training_utils.py:35-51), then optimize a learnable SDF + BSDF to
reproduce it and assert the loss drops and the silhouette is learned.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neural_raytracing_tpu as nrt
from neural_raytracing_tpu.bsdf import Diffuse
from neural_raytracing_tpu.cameras import (
    FoVPerspectiveCamera, look_at_view_transform,
)
from neural_raytracing_tpu.integrators import Direct, Mask
from neural_raytracing_tpu.lights import PointLights
from neural_raytracing_tpu.nn import SkipConnMLP
from neural_raytracing_tpu.shapes import SDF, Sphere, SphereSDF
from neural_raytracing_tpu.training import (
    LossSampler, TrainState, init_train_state, make_optimizer,
    make_train_step, train, save_scene, load_scene, save_train_state,
    load_train_state,
)

SIZE = 32


def gt_scene():
    return nrt.Scene(
        shape=Sphere((0.0, 0.0, 0.0), 0.7),
        bsdf=Diffuse(reflectance=(0.8, 0.3, 0.2)),
        lights=PointLights(location=(0.0, 1.0, 4.0), scale=50.0))


def make_views(n=4):
    elevs = np.linspace(0, 30, n)
    azims = np.linspace(-45, 45, n)
    r, t = look_at_view_transform(dist=2.0, elev=elevs, azim=azims)
    return FoVPerspectiveCamera(R=r, T=t)


@pytest.fixture(scope="module")
def gt_data():
    scene = gt_scene()
    params = scene.init(jax.random.PRNGKey(0))
    cams = make_views(4)
    img, _ = nrt.pathtrace(scene, params, cams, Mask(Direct(training=False)),
                           size=SIZE, chunk_size=SIZE, bundle_size=1,
                           background=0.0, key=jax.random.PRNGKey(1),
                           squeeze_first=False)
    imgs = np.asarray(img[..., :3])
    masks = np.asarray(img[..., 3])
    return imgs, masks, cams


def small_sdf():
    module = SphereSDF(n=8, mlp=SkipConnMLP(
        in_size=3, out=1, num_layers=2, hidden_size=32, freqs=8,
        activation="softplus", init="zeros"))
    return SDF(module, max_steps=24, throughput_steps=32, dist=4.0)


class TestTrainSmoke:
    def test_fit_sphere(self, gt_data):
        imgs, masks, cams = gt_data
        scene = nrt.Scene(
            shape=small_sdf(),
            bsdf=Diffuse(reflectance=(0.5, 0.5, 0.5)),
            lights=PointLights(location=(0.0, 1.0, 4.0), scale=50.0))
        opt = make_optimizer({"shape": 5e-3, "bsdf": 1e-2, "lights": 0.0})
        state = init_train_state(scene, opt, jax.random.PRNGKey(2))

        def make_camera(idxs):
            return FoVPerspectiveCamera(R=cams.R[idxs], T=cams.T[idxs])

        state, losses = train(
            scene, Direct(training=True), opt, state, make_camera,
            imgs, masks, jax.random.PRNGKey(3),
            size=SIZE, crop_size=16, iters=150, n_views=2,
            log_every=50)

        first = np.mean(losses[:10])
        last = np.mean(losses[-10:])
        assert last < 0.6 * first, (first, last)

        # the learned silhouette must overlap the GT mask far better than
        # at init: render mask channel from the trained SDF
        from neural_raytracing_tpu.integrators import NeRFIntegrator
        img, _ = nrt.pathtrace(scene, state.params,
                               make_camera(np.asarray([0])),
                               NeRFIntegrator(Direct(training=True)),
                               size=SIZE, chunk_size=SIZE, bundle_size=1,
                               background=0.0, key=jax.random.PRNGKey(4),
                               training=True)
        alpha = np.asarray(img[..., 3])
        gt_mask = masks[0]
        iou = ((alpha > 0.5) & (gt_mask > 0.5)).sum() / max(
            ((alpha > 0.5) | (gt_mask > 0.5)).sum(), 1)
        assert iou > 0.7, iou

    def test_state_checkpoint_roundtrip(self, tmp_path, gt_data):
        imgs, masks, cams = gt_data
        scene = nrt.Scene(
            shape=small_sdf(),
            bsdf=Diffuse(),
            lights=PointLights(location=(0.0, 1.0, 4.0), scale=50.0))
        opt = make_optimizer({"shape": 1e-3})
        state = init_train_state(scene, opt, jax.random.PRNGKey(0))

        path = str(tmp_path / "state.msgpack")
        save_train_state(path, state.params, state.opt_state, 7)
        template = init_train_state(scene, opt, jax.random.PRNGKey(1))
        params, opt_state, step = load_train_state(path, template.params,
                                                   template.opt_state)
        assert step == 7
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_scene_artifacts_separately_loadable(self, tmp_path):
        scene = nrt.Scene(
            shape=small_sdf(),
            bsdf=Diffuse(),
            lights=PointLights())
        params = scene.init(jax.random.PRNGKey(0))
        save_scene(str(tmp_path), params, step=3)
        # tweak template and reload: shape comes from disk, others template
        template = scene.init(jax.random.PRNGKey(5))
        loaded = load_scene(str(tmp_path), template)
        np.testing.assert_array_equal(
            np.asarray(loaded["shape"]["centers"]),
            np.asarray(params["shape"]["centers"]))


class TestLossSampler:
    def test_prefers_high_loss(self):
        s = LossSampler(4, rng=np.random.default_rng(0))
        for i in range(4):
            s.update(i, 0.01)
        s.update(2, 100.0)
        counts = np.bincount(
            np.concatenate([s.sample(1) for _ in range(200)]), minlength=4)
        assert counts[2] > 150

    def test_no_replacement(self):
        s = LossSampler(8)
        idxs = s.sample(8)
        assert len(set(idxs.tolist())) == 8


class TestOptimizer:
    def test_per_component_lrs(self):
        import optax
        params = {"shape": {"w": jnp.ones(3)}, "bsdf": {"w": jnp.ones(3)},
                  "lights": {"w": jnp.ones(3)}}
        opt = make_optimizer({"shape": 1e-1, "bsdf": 1e-3, "lights": 0.0})
        state = opt.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = opt.update(grads, state, params)
        up = jax.tree_util.tree_map(lambda x: float(jnp.abs(x).max()), updates)
        assert up["shape"]["w"] > up["bsdf"]["w"]
        assert up["lights"]["w"] == 0.0


class TestNanSkip:
    def test_skip_nan_updates_keeps_state(self, gt_data):
        """skip_nan_updates (reference train parity, training_utils.py:112):
        a NaN batch leaves params, opt state and the step counter untouched;
        a clean batch still updates."""
        import optax

        from neural_raytracing_tpu.training import init_train_state
        from neural_raytracing_tpu.training.loop import build_step_fn

        imgs, masks, cams = gt_data
        scene = nrt.Scene(shape=small_sdf(),
                          bsdf=Diffuse(),
                          lights=PointLights(location=(0.0, 1.0, 4.0),
                                             scale=50.0))
        opt = optax.adamw(1e-3)
        state = init_train_state(scene, opt, jax.random.PRNGKey(0))
        step = jax.jit(build_step_fn(
            scene, Direct(training=True), opt, size=SIZE, crop_size=8,
            skip_nan_updates=True))
        # a poisoned loss term makes the loss AND every grad NaN
        step_bad = jax.jit(build_step_fn(
            scene, Direct(training=True), opt, size=SIZE, crop_size=8,
            skip_nan_updates=True,
            extra_loss=lambda it, got, exp, mask: jnp.nan * jnp.sum(got)))
        cam = FoVPerspectiveCamera(R=cams.R[:1], T=cams.T[:1])
        uv = (jnp.float32(4), jnp.float32(4))
        exp = jnp.asarray(imgs[:1, 4:12, 4:12])
        mask = jnp.asarray(masks[:1, 4:12, 4:12])
        key = jax.random.PRNGKey(2)

        bad, aux_bad = step_bad(state, cam, uv, exp, mask, key)
        assert not np.isfinite(float(aux_bad["loss"]))
        assert int(bad.step) == int(state.step)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            bad.params, state.params)

        good, aux_good = step(state, cam, uv, exp, mask, key)
        assert np.isfinite(float(aux_good["loss"]))
        assert int(good.step) == int(state.step) + 1
        deltas = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).sum()), good.params,
            state.params)
        assert sum(jax.tree_util.tree_leaves(deltas)) > 0


def test_device_data_path_trains():
    """ON-DEVICE data path: view/crop sampling + GT gather + camera build
    inside the jitted step; loss must be finite and decrease."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import neural_raytracing_tpu as nrt
    from neural_raytracing_tpu.bsdf import Diffuse
    from neural_raytracing_tpu.cameras import (
        FoVPerspectiveCamera, look_at_view_transform,
    )
    from neural_raytracing_tpu.integrators import Direct
    from neural_raytracing_tpu.lights import PointLights
    from neural_raytracing_tpu.nn import SkipConnMLP
    from neural_raytracing_tpu.shapes import SDF, SphereSDF
    from neural_raytracing_tpu.training import (
        device_dataset, init_train_state, make_optimizer, rand_uv_mask,
        train,
    )

    sdf = SDF(SphereSDF(n=8, mlp=SkipConnMLP(
        in_size=3, out=1, num_layers=2, hidden_size=16, freqs=4,
        activation="softplus", init="zeros")),
        max_steps=8, throughput_steps=8)
    scene = nrt.Scene(shape=sdf, bsdf=Diffuse(),
                      lights=PointLights(location=(0.0, 1.0, 4.0),
                                         scale=50.0))
    opt = make_optimizer({"shape": 1e-3, "bsdf": 1e-3, "lights": 1e-3})
    state = init_train_state(scene, opt, jax.random.PRNGKey(0))

    n_views, size, crop = 4, 32, 16
    r, t = look_at_view_transform(dist=2.0,
                                  elev=np.linspace(0, 30, n_views),
                                  azim=np.linspace(-45, 45, n_views))
    # use R/T pytree as the 'pose' batch via a builder over stacked leaves
    rt = jnp.concatenate([r.reshape(n_views, -1), t.reshape(n_views, -1)],
                         axis=-1)
    imgs = 0.3 * np.ones((n_views, size, size, 3), np.float32)
    masks = np.zeros((n_views, size, size), np.float32)
    masks[:, 8:24, 8:24] = 1.0

    def camera_builder(batch):
        return FoVPerspectiveCamera(R=batch[:, :9].reshape(-1, 3, 3),
                                    T=batch[:, 9:12])

    data = device_dataset(imgs, masks, rt, crop)
    state2, losses = train(
        scene, Direct(training=True), opt, state, None, imgs, masks,
        jax.random.PRNGKey(1), size=size, crop_size=crop, iters=6,
        n_views=n_views, log_every=0, uv_select=rand_uv_mask,
        device_data=data, camera_builder=camera_builder)
    assert len(losses) >= 5
    assert all(np.isfinite(losses))
    # params moved
    delta = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(state2.params)))
    assert delta > 0.0


def test_device_dataset_crop_gather_matches_host():
    """The on-device crop gather equals host numpy slicing."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neural_raytracing_tpu.training import device_dataset

    rng = np.random.default_rng(0)
    imgs = rng.random((3, 16, 16, 3), np.float32)
    masks = (rng.random((3, 16, 16)) > 0.4).astype(np.float32)
    c2ws = rng.random((3, 3, 4), np.float32)
    data = device_dataset(imgs, masks, c2ws, 8)
    u, w, vi = 5, 2, 1
    got = jax.lax.dynamic_slice(data["images"][vi], (u, w, 0), (8, 8, 3))
    np.testing.assert_allclose(np.asarray(got),
                               imgs[vi, u:u + 8, w:w + 8, :3], atol=0)
    # mask pixel table: every stored coordinate is a true mask pixel
    px = np.asarray(data["mask_px"])
    cnt = np.asarray(data["mask_counts"])
    for v in range(3):
        for j in range(cnt[v]):
            y, x = px[v, j]
            assert masks[v, y, x] > 0.5


def test_device_data_path_with_light_locs():
    """Device path injects per-frame light locations inside the step
    (NeRV-style): trains finite with PointLights."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import neural_raytracing_tpu as nrt
    from neural_raytracing_tpu.bsdf import Diffuse
    from neural_raytracing_tpu.cameras import NeRFCamera
    from neural_raytracing_tpu.integrators import Direct
    from neural_raytracing_tpu.lights import PointLights
    from neural_raytracing_tpu.nn import SkipConnMLP
    from neural_raytracing_tpu.shapes import SDF, SphereSDF
    from neural_raytracing_tpu.training import (
        device_dataset, init_train_state, make_optimizer, rand_uv_mask,
        train,
    )

    sdf = SDF(SphereSDF(n=8, mlp=SkipConnMLP(
        in_size=3, out=1, num_layers=2, hidden_size=16, freqs=4,
        activation="softplus", init="zeros")),
        max_steps=8, throughput_steps=8)
    scene = nrt.Scene(shape=sdf, bsdf=Diffuse(),
                      lights=PointLights(scale=50.0))
    opt = make_optimizer({"shape": 1e-3, "bsdf": 1e-3, "lights": 1e-3})
    state = init_train_state(scene, opt, jax.random.PRNGKey(0))

    n_views, size, crop = 3, 32, 16
    from neural_raytracing_tpu.cameras import nerf_c2w
    c2ws = np.stack([nerf_c2w(20.0, a, dist=2.0)[:3, :4]
                     for a in (0.0, 90.0, 180.0)]).astype(np.float32)
    imgs = 0.2 * np.ones((n_views, size, size, 3), np.float32)
    masks = np.ones((n_views, size, size), np.float32)
    lights = np.asarray([[0, 1, 3], [1, 0, 3], [0, -1, 3]], np.float32)

    data = device_dataset(imgs, masks, c2ws, crop, light_locs=lights)
    focal = 30.0
    state2, losses = train(
        scene, Direct(training=True), opt, state, None, imgs, masks,
        jax.random.PRNGKey(1), size=size, crop_size=crop, iters=4,
        n_views=n_views, log_every=0, uv_select=rand_uv_mask,
        tone_mapping=True, device_data=data,
        camera_builder=lambda c: NeRFCamera(cam_to_world=c, focal=focal))
    assert all(np.isfinite(losses)) and len(losses) >= 3


def test_device_data_path_dtu_packed_cameras():
    """DTU cameras are a (pose, intrinsic) pair per view; scripts/dtu.py
    packs both into one [V, 2, 4, 4] array so the generic device path can
    gather them like a c2w.  Trains finite with params moving."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import neural_raytracing_tpu as nrt
    from neural_raytracing_tpu.bsdf import Diffuse
    from neural_raytracing_tpu.cameras import DTUCamera
    from neural_raytracing_tpu.integrators import Direct
    from neural_raytracing_tpu.lights import PointLights
    from neural_raytracing_tpu.nn import SkipConnMLP
    from neural_raytracing_tpu.shapes import SDF, SphereSDF
    from neural_raytracing_tpu.training import (
        device_dataset, init_train_state, make_optimizer, rand_uv_mask,
        train,
    )

    sdf = SDF(SphereSDF(n=8, mlp=SkipConnMLP(
        in_size=3, out=1, num_layers=2, hidden_size=16, freqs=4,
        activation="softplus", init="zeros")),
        max_steps=8, throughput_steps=8)
    scene = nrt.Scene(shape=sdf, bsdf=Diffuse(),
                      lights=PointLights(location=(0.0, 1.0, 4.0),
                                         scale=50.0))
    opt = make_optimizer({"shape": 1e-3, "bsdf": 1e-3, "lights": 1e-3})
    state = init_train_state(scene, opt, jax.random.PRNGKey(0))

    n_views, size, crop = 3, 32, 16
    poses = np.stack([np.eye(4, dtype=np.float32)] * n_views)
    for i in range(n_views):
        poses[i, 2, 3] = 2.0 + 0.1 * i     # back the camera off along +z
    intr = np.stack([np.eye(4, dtype=np.float32)] * n_views)
    intr[:, 0, 0] = intr[:, 1, 1] = 60.0   # focal px
    intr[:, 0, 2] = intr[:, 1, 2] = size / 2.0
    packed = np.stack([poses, intr], axis=1)          # [V, 2, 4, 4]
    imgs = 0.25 * np.ones((n_views, size, size, 3), np.float32)
    masks = np.ones((n_views, size, size), np.float32)
    src = np.asarray([size, size], np.float32)

    data = device_dataset(imgs, masks, packed, crop)
    state2, losses = train(
        scene, Direct(training=True), opt, state, None, imgs, masks,
        jax.random.PRNGKey(1), size=size, crop_size=crop, iters=4,
        n_views=n_views, log_every=0, uv_select=rand_uv_mask,
        device_data=data,
        camera_builder=lambda c: DTUCamera(pose=c[:, 0], intrinsic=c[:, 1],
                                           src_size=src))
    assert all(np.isfinite(losses)) and len(losses) >= 3
    delta = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(state2.params)))
    assert delta > 0.0


def test_calibrate_exposure_recovers_light_scale():
    """A 10x-wrong init light scale is recovered by the one-shot exposure
    calibration (round-4 NeRV fix): radiance is linear in the scale, so
    matching masked render brightness to GT recovers the true scale."""
    import jax
    import numpy as np

    import neural_raytracing_tpu as nrt
    from neural_raytracing_tpu.bsdf import Diffuse
    from neural_raytracing_tpu.cameras import (
        FoVPerspectiveCamera, look_at_view_transform,
    )
    from neural_raytracing_tpu.integrators import Direct
    from neural_raytracing_tpu.lights import PointLights
    from neural_raytracing_tpu.shapes import Sphere
    from neural_raytracing_tpu.training import (
        calibrate_exposure, init_train_state, make_optimizer,
    )

    size = 24
    n_views = 2
    r, t = look_at_view_transform(dist=2.5, elev=np.asarray([10.0, 30.0]),
                                  azim=np.asarray([0.0, 40.0]))
    cams = [FoVPerspectiveCamera(R=r[i:i + 1], T=t[i:i + 1])
            for i in range(n_views)]
    make_camera = lambda idxs: cams[idxs[0]]

    def build(scale):
        return nrt.Scene(shape=Sphere(radius=1.0), bsdf=Diffuse(),
                         lights=PointLights(location=(0.0, 1.0, 4.0),
                                            scale=scale))

    opt = make_optimizer({"bsdf": 1e-3, "lights": 1e-3})
    true_scale = 30.0
    gt_state = init_train_state(build(true_scale), opt, jax.random.PRNGKey(0))
    imgs, masks = [], []
    for i in range(n_views):
        img, _ = nrt.pathtrace(build(true_scale), gt_state.params, cams[i],
                               Direct(training=False), size=size,
                               chunk_size=size, background=0.0,
                               key=jax.random.PRNGKey(2))
        im = np.asarray(img)[..., :3].reshape(size, size, 3)
        imgs.append(im)
        masks.append((im.sum(-1) > 0).astype(np.float32))

    bad = build(true_scale * 10.0)
    state = init_train_state(bad, opt, jax.random.PRNGKey(0))
    state2, ratio = calibrate_exposure(
        bad, state, make_camera, imgs, masks, size=size, chunk_size=size)
    got_scale = float(state2.params["lights"]["scale"])
    assert abs(got_scale - true_scale) / true_scale < 0.05, got_scale
    assert abs(ratio - 0.1) < 0.02

    # a lights model without a "scale" leaf is returned unchanged
    from neural_raytracing_tpu.lights import LightField
    lf_scene = nrt.Scene(shape=Sphere(radius=1.0), bsdf=Diffuse(),
                         lights=LightField())
    lf_state = init_train_state(lf_scene, opt, jax.random.PRNGKey(0))
    lf_state2, r2 = calibrate_exposure(
        lf_scene, lf_state, make_camera, imgs, masks, size=size,
        chunk_size=size)
    assert r2 == 1.0 and lf_state2.params is lf_state.params

    # degenerate measurement guard: empty masks must leave the scale alone
    empty = [np.zeros_like(m) for m in masks]
    st_deg, r_deg = calibrate_exposure(
        bad, state, make_camera, imgs, empty, size=size, chunk_size=size)
    assert r_deg == 1.0
    assert float(st_deg.params["lights"]["scale"]) == float(
        state.params["lights"]["scale"])


def test_evaluate_gt_clamp_protocol():
    """GT clamping parity (reference protocols): test_nerv_ptl clamps the
    GT for the per-view L1/L2/PSNR only (training_utils.py:810), test_nerf
    never clamps it (:321-343), and BOTH build the set-level SSIM stack
    from the RAW GT (:340, :836)."""
    import jax
    import numpy as np

    import neural_raytracing_tpu as nrt
    from neural_raytracing_tpu.bsdf import Diffuse
    from neural_raytracing_tpu.cameras import (
        FoVPerspectiveCamera, look_at_view_transform,
    )
    from neural_raytracing_tpu.integrators import Direct
    from neural_raytracing_tpu.lights import PointLights
    from neural_raytracing_tpu.ops.ssim import ssim as ssim_fn
    from neural_raytracing_tpu.shapes import Sphere
    from neural_raytracing_tpu.training import evaluate

    size = 16
    r, t = look_at_view_transform(dist=2.5, elev=np.asarray([10.0]),
                                  azim=np.asarray([0.0]))
    cam = FoVPerspectiveCamera(R=r, T=t)
    scene = nrt.Scene(shape=Sphere(radius=1.0), bsdf=Diffuse(),
                      lights=PointLights(location=(0.0, 1.0, 4.0),
                                         scale=30.0))
    params = scene.init(jax.random.PRNGKey(0))
    img, _ = nrt.pathtrace(scene, params, cam, Direct(training=False),
                           size=size, chunk_size=size, background=0.0,
                           key=jax.random.fold_in(jax.random.PRNGKey(0), 0))
    got = np.clip(np.asarray(img)[..., :3], 0.0, 1.0)

    # HDR ground truth: pixels above 1 discriminate the clamp policies
    exp = np.full((1, size, size, 3), 2.0, np.float32)

    # NeRV protocol (tone_map=True): per-view L2 vs CLAMPED GT,
    # set-level SSIM vs tone-mapped RAW GT
    out_tm = evaluate(scene, params, lambda i: cam, exp,
                      Direct(training=False), size=size, chunk_size=size,
                      tone_map=True, log_fn=lambda *a: None)
    l2_clamped = float(np.mean((got - np.clip(exp[0], 0, 1)) ** 2))
    assert abs(out_tm["l2"] - l2_clamped) < 1e-5, out_tm["l2"]
    tm = lambda x: x / (1.0 + x)
    want_ssim = float(ssim_fn(
        np.transpose(tm(got)[None], (0, 3, 1, 2)),
        np.transpose(tm(exp), (0, 3, 1, 2)), data_range=1.0))
    assert abs(out_tm["ssim"] - want_ssim) < 1e-4, (out_tm["ssim"], want_ssim)

    # test_nerf protocol (tone_map=False): GT unclamped everywhere
    out_lin = evaluate(scene, params, lambda i: cam, exp,
                       Direct(training=False), size=size, chunk_size=size,
                       tone_map=False, log_fn=lambda *a: None)
    l2_raw = float(np.mean((got - exp[0]) ** 2))
    assert abs(out_lin["l2"] - l2_raw) < 1e-5, (out_lin["l2"], l2_raw)
    assert out_lin["l2"] > out_tm["l2"] + 0.5  # the policies truly differ


def test_eval_march_bound_flag_wiring():
    """--eval-march-bound: default 1.2 flows into the TEST scene's SDF;
    0 disables (None = reference semantics); training scenes unaffected."""
    import os
    import sys
    sp = os.path.join(os.path.dirname(__file__), "..", "scripts")
    sys.path.insert(0, sp)
    try:
        from _common import base_parser, eval_bound
        ap = base_parser("t")
        args = ap.parse_args(["--iters", "0"])
        assert eval_bound(args) == 1.2
        args0 = ap.parse_args(["--iters", "0", "--eval-march-bound", "0"])
        assert eval_bound(args0) is None

        from nerf_synthetic import build_scene
        s_train = build_scene(max_steps=8)
        assert s_train.shape.march_bound is None
        s_eval = build_scene(max_steps=8, march_bound=eval_bound(args))
        assert s_eval.shape.march_bound == 1.2
        # SDF.replace: config clone differing ONLY in the overridden field
        clone = s_train.shape.replace(march_bound=2.0)
        assert clone.march_bound == 2.0
        assert clone.module is s_train.shape.module
        assert s_train.shape.march_bound is None
        import pytest
        with pytest.raises(AttributeError):
            s_train.shape.replace(not_a_field=1)
    finally:
        sys.path.remove(sp)


def test_metrics_use_global_step_across_segments(gt_data):
    """train() labels metrics/log rows with the GLOBAL applied step
    (base = state.step at entry), so segmented or resumed runs — e.g. the
    half-res-warmup schedule in scripts/nerf_synthetic.py — emit one
    continuous curve instead of restarting at 0 each phase."""
    imgs, masks, cams = gt_data
    scene = nrt.Scene(
        shape=small_sdf(),
        bsdf=Diffuse(reflectance=(0.5, 0.5, 0.5)),
        lights=PointLights(location=(0.0, 1.0, 4.0), scale=50.0))
    opt = make_optimizer({"shape": 5e-3, "bsdf": 1e-2, "lights": 0.0})
    state = init_train_state(scene, opt, jax.random.PRNGKey(2))

    def make_camera(idxs):
        return FoVPerspectiveCamera(R=cams.R[idxs], T=cams.T[idxs])

    metrics: list = []
    for seg in range(2):
        state, _ = train(
            scene, Direct(training=True), opt, state, make_camera,
            imgs, masks, jax.random.fold_in(jax.random.PRNGKey(3), seg),
            size=SIZE, crop_size=16, iters=3, n_views=2, log_every=0,
            metrics=metrics)
    steps = [m["step"] for m in metrics if "loss" in m]
    assert steps == list(range(6)), steps
    assert int(state.step) == 6


def test_space_reg_volumetric_eikonal(gt_data):
    """space_reg hook: a full-space eikonal term (the reference's
    nerv.py:110 TODO) is added to the loss and moves the SHAPE params
    differently from the hookless step — the at-hit eikonal alone goes
    silent when nothing hits (the r5 mirror field-collapse mechanism)."""
    import optax

    from neural_raytracing_tpu.ops.math import eikonal_loss
    from neural_raytracing_tpu.training import init_train_state
    from neural_raytracing_tpu.training.loop import build_step_fn

    imgs, masks, cams = gt_data
    scene = nrt.Scene(shape=small_sdf(), bsdf=Diffuse(),
                      lights=PointLights(location=(0.0, 1.0, 4.0),
                                         scale=50.0))
    opt = optax.adamw(1e-3)
    state = init_train_state(scene, opt, jax.random.PRNGKey(0))

    def space_reg(params, key):
        pts = jax.random.uniform(key, (64, 3), minval=-1.25, maxval=1.25)
        f = lambda p: scene.shape.sdf(params["shape"], p[None])[0]
        return eikonal_loss(jax.vmap(jax.grad(f))(pts))

    common = dict(size=SIZE, crop_size=8)
    step_plain = jax.jit(build_step_fn(scene, Direct(training=True), opt,
                                       **common))
    step_reg = jax.jit(build_step_fn(scene, Direct(training=True), opt,
                                     space_reg=space_reg, **common))
    cam = FoVPerspectiveCamera(R=cams.R[:1], T=cams.T[:1])
    uv = (jnp.float32(4), jnp.float32(4))
    exp = jnp.asarray(imgs[:1, 4:12, 4:12])
    mask = jnp.asarray(masks[:1, 4:12, 4:12])
    key = jax.random.PRNGKey(3)

    plain, aux_plain = step_plain(state, cam, uv, exp, mask, key)
    reg, aux_reg = step_reg(state, cam, uv, exp, mask, key)
    assert np.isfinite(float(aux_reg["loss"]))
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).sum()),
                               reg.params["shape"], plain.params["shape"])
    assert sum(jax.tree_util.tree_leaves(d)) > 0
