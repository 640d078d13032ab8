"""Dataset loader math + disk-layout tests."""

import json
import os

import numpy as np
import pytest

from neural_raytracing_tpu.training.datasets import (
    decompose_projection, load_colocate, load_nerv,
)


class TestDecomposeProjection:
    def make_P(self, seed=0):
        rng = np.random.default_rng(seed)
        # intrinsics: positive diag, principal point, slight skew
        K = np.asarray([[800.0, 0.5, 320.0],
                        [0.0, 780.0, 240.0],
                        [0.0, 0.0, 1.0]])
        # a proper rotation
        a, b, c = rng.uniform(-0.5, 0.5, 3)
        Rx = np.asarray([[1, 0, 0], [0, np.cos(a), -np.sin(a)],
                         [0, np.sin(a), np.cos(a)]])
        Ry = np.asarray([[np.cos(b), 0, np.sin(b)], [0, 1, 0],
                         [-np.sin(b), 0, np.cos(b)]])
        Rz = np.asarray([[np.cos(c), -np.sin(c), 0],
                         [np.sin(c), np.cos(c), 0], [0, 0, 1]])
        R = Rx @ Ry @ Rz
        center = rng.uniform(-2, 2, 3)
        t = -R @ center
        P = K @ np.concatenate([R, t[:, None]], axis=1)
        return P, K, R, center

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_roundtrip(self, seed):
        P, K, R, c = self.make_P(seed)
        K2, R2, c2 = decompose_projection(P)
        np.testing.assert_allclose(K2, K / K[2, 2], atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(R2, R, atol=1e-5)
        np.testing.assert_allclose(c2, c, atol=1e-5)

    def test_scale_invariance(self):
        P, K, R, c = self.make_P(0)
        K2, R2, c2 = decompose_projection(3.7 * P)
        np.testing.assert_allclose(K2, K / K[2, 2], atol=1e-3, rtol=1e-3)
        np.testing.assert_allclose(R2, R, atol=1e-5)


class TestDiskLayouts:
    def test_nerv_layout(self, tmp_path):
        from PIL import Image
        d = tmp_path / "nerv"
        os.makedirs(d / "train_point" / "train")
        frames = []
        for i in range(2):
            img = np.zeros((8, 8, 4), np.uint8)
            img[2:5, 2:5] = 255
            Image.fromarray(img, "RGBA").save(
                d / "train_point" / "train" / f"r_{i}.png")
            frames.append({
                "file_path": f"train/r_{i}",
                "transform_matrix": np.eye(4).tolist(),
                "light_loc": [1.0, 2.0, float(i)],
            })
        with open(d / "train_point" / "transforms_train.json", "w") as f:
            json.dump({"camera_angle_x": 0.7, "frames": frames}, f)
        data = load_nerv(str(d), 8, "train")
        assert data.images.shape == (2, 8, 8, 3)
        np.testing.assert_allclose(data.light_locs,
                                   [[1, 2, 0], [1, 2, 1]])
        assert data.light_weights is None
        assert (data.masks[0] > 0).any()

    def test_colocate_layout(self, tmp_path):
        from PIL import Image
        for i in range(2):
            for j in range(2):
                img = np.full((8, 8, 4), 128, np.uint8)
                Image.fromarray(img, "RGBA").save(
                    tmp_path / f"bunny_{i}_{j}.png")
        data = load_colocate(str(tmp_path), "bunny", 8, n_elev=2, n_azim=2)
        assert data.images.shape == (4, 8, 8, 3)
        assert data.elevs.shape == (4,)


class TestLoadDTU:
    def _write_ds(self, d, dists=(1.6, 2.4)):
        from PIL import Image
        os.makedirs(d / "image")
        os.makedirs(d / "mask")
        K = np.asarray([[80.0, 0.0, 32.0],
                        [0.0, 80.0, 32.0],
                        [0.0, 0.0, 1.0]])
        cams = {}
        for i, dist in enumerate(dists):
            R = np.eye(3)
            c = np.asarray([0.0, 0.0, dist])
            t = -R @ c
            P = np.eye(4, dtype=np.float32)
            P[:3, :4] = K @ np.concatenate([R, t[:, None]], axis=1)
            cams[f"world_mat_{i}"] = P
            cams[f"scale_mat_{i}"] = np.eye(4, dtype=np.float32)
            img = (np.ones((8, 8, 3)) * 128).astype(np.uint8)
            Image.fromarray(img).save(d / "image" / f"{i:03}.png")
            Image.fromarray(img).save(d / "mask" / f"{i:03}.png")
        np.savez(d / "cameras.npz", **cams)

    def test_normalize_dist(self, tmp_path):
        """Camera centers are scaled so the farthest sits on the unit
        sphere (reference dtu.py:87-89) — and normalize_dist=False keeps
        the raw scale."""
        from neural_raytracing_tpu.training.datasets import load_dtu
        d = tmp_path / "dtu"
        self._write_ds(d)
        ds = load_dtu(str(d), 8)
        dists = np.linalg.norm(ds.poses[:, :3, 3], axis=-1)
        np.testing.assert_allclose(dists, [1.6 / 2.4, 1.0], atol=1e-4)
        raw = load_dtu(str(d), 8, normalize_dist=False)
        dists = np.linalg.norm(raw.poses[:, :3, 3], axis=-1)
        np.testing.assert_allclose(dists, [1.6, 2.4], atol=1e-4)
