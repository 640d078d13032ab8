"""End-to-end nerf-synthetic pipeline: dataset on disk -> loader -> train.

Generates a miniature dataset in the exact nerf-synthetic layout
(transforms_train.json + RGBA PNGs), loads it through the standard loader,
and runs the flagship-path training step (NeRFCamera + SDF + Direct).
"""

import json
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neural_raytracing_tpu as nrt
from neural_raytracing_tpu.bsdf import Diffuse
from neural_raytracing_tpu.cameras import NeRFCamera, nerf_c2w
from neural_raytracing_tpu.integrators import Direct, Mask
from neural_raytracing_tpu.lights import PointLights
from neural_raytracing_tpu.nn import SkipConnMLP
from neural_raytracing_tpu.shapes import SDF, Sphere, SphereSDF
from neural_raytracing_tpu.training import (
    init_train_state, make_optimizer, train,
)
from neural_raytracing_tpu.training.datasets import load_nerf_synthetic

SIZE = 32


@pytest.fixture(scope="module")
def mini_dataset(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("mini_nerf")
    os.makedirs(root / "train")

    gt = nrt.Scene(shape=Sphere((0.0, 0.0, 0.0), 0.6),
                   bsdf=Diffuse((0.8, 0.3, 0.2)),
                   lights=PointLights(location=(0.0, 1.0, 3.0), scale=40.0))
    gtp = gt.init(jax.random.PRNGKey(0))

    camera_angle_x = math.radians(60.0)
    frames = []
    views = [(10.0 * i, 40.0 * i) for i in range(4)]
    focal = 0.5 * SIZE / math.tan(0.5 * camera_angle_x)
    for i, (elev, azim) in enumerate(views):
        c2w = nerf_c2w(elev, azim)
        cam = NeRFCamera(cam_to_world=jnp.asarray(c2w[None, :3, :4]),
                         focal=focal)
        img, _ = nrt.pathtrace(gt, gtp, cam, Mask(Direct(training=False)),
                               size=SIZE, chunk_size=SIZE, bundle_size=1,
                               background=0.0, key=jax.random.PRNGKey(i))
        rgba = (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
        Image.fromarray(rgba, "RGBA").save(root / "train" / f"r_{i}.png")
        frames.append({"file_path": f"train/r_{i}",
                       "transform_matrix": c2w.tolist()})

    with open(root / "transforms_train.json", "w") as f:
        json.dump({"camera_angle_x": camera_angle_x, "frames": frames}, f)
    return str(root)


class TestNeRFSyntheticPipeline:
    def test_loader_layout(self, mini_dataset):
        data = load_nerf_synthetic(mini_dataset, SIZE, "train")
        assert data.images.shape == (4, SIZE, SIZE, 3)
        assert data.masks.shape == (4, SIZE, SIZE)
        assert data.cam_to_worlds.shape == (4, 3, 4)
        # translations normalized to the unit sphere
        np.testing.assert_allclose(
            np.linalg.norm(data.cam_to_worlds[:, :3, 3], axis=-1), 1.0,
            rtol=1e-5)
        # masks must cover part but not all of each image
        cov = data.masks.mean(axis=(1, 2))
        assert ((cov > 0.02) & (cov < 0.9)).all(), cov

    def test_train_path_runs_and_learns(self, mini_dataset):
        data = load_nerf_synthetic(mini_dataset, SIZE, "train")
        # cameras were generated at dist 2 but the loader normalizes to 1:
        # rescale our scene expectations accordingly by using the sphere at
        # radius 0.3 (0.6 / 2)
        sdf = SDF(SphereSDF(n=8, mlp=SkipConnMLP(
            in_size=3, out=1, num_layers=2, hidden_size=32, freqs=8,
            activation="softplus", init="zeros")),
            max_steps=24, throughput_steps=32, dist=2.0)
        scene = nrt.Scene(shape=sdf, bsdf=Diffuse((0.5, 0.5, 0.5)),
                          lights=PointLights(location=(0.0, 0.5, 1.5),
                                             scale=40.0))
        opt = make_optimizer({"shape": 5e-3, "bsdf": 1e-2, "lights": 0.0})
        state = init_train_state(scene, opt, jax.random.PRNGKey(1))

        def make_camera(idxs):
            return NeRFCamera(
                cam_to_world=jnp.asarray(data.cam_to_worlds[np.asarray(idxs)]),
                focal=data.focal)

        state, losses = train(
            scene, Direct(training=True), opt, state, make_camera,
            data.images, data.masks, jax.random.PRNGKey(2),
            size=SIZE, crop_size=16, iters=60, n_views=2, log_every=0)
        assert np.mean(losses[-5:]) < 0.7 * np.mean(losses[:5])
