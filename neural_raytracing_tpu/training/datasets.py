"""Dataset loaders for the reference workloads.

Behavioral parity:
  * NeRF-synthetic: ``transforms_{train,test}.json`` + per-frame PNGs;
    focal from camera_angle_x; camera translations normalized to unit
    distance; masks = ceil(alpha - 1e-5)
    (scripts/nerf_synthetic.py:46-57, training_utils.py:572-594)
  * DTU / IDR: ``cameras.npz`` with world_mat_i (P = K [R|t]) and
    scale_mat_i; decompose P into intrinsics + pose (the reference uses
    cv2.decomposeProjectionMatrix, dtu.py:69-89 — here an RQ decomposition
    in numpy), normalize poses into the unit sphere; every-10th-view test
    split (dtu.py:115-121)
  * NeRV: ``transforms_train.json`` with per-frame ``light_loc`` (and
    optional multi-light ``light_weights``) (scripts/nerv.py:47-69,
    test_nerv.py:86-103)
  * colocate (mitsuba cbox_relight): 8x8 elev/azim grid of
    ``{kind}_{i}_{j}.png`` RGBA renders with colocated camera+light at
    1.05x camera radius (mitsuba_scenes/cbox_relight/cbox.py:29-44);
    relight GT grid ``gt_{kind}_{i}_{j}_{k}_{l}.png`` (gt.py:29-46)
"""

from __future__ import annotations

import json
import os
from typing import NamedTuple, Optional

import numpy as np


def load_image(path: str, resize: Optional[tuple] = None) -> np.ndarray:
    from PIL import Image
    img = Image.open(path)
    if resize is not None:
        img = img.resize(resize)
    return np.asarray(img, dtype=np.float64).astype(np.float32) / 255.0


class NeRFDataset(NamedTuple):
    cam_to_worlds: np.ndarray   # [V, 3, 4], translations unit-normalized
    focal: float
    images: np.ndarray          # [V, H, W, 3]
    masks: np.ndarray           # [V, H, W]


def load_nerf_synthetic(directory: str, size: int,
                        split: str = "train") -> NeRFDataset:
    tfs = json.load(open(os.path.join(directory, f"transforms_{split}.json")))
    focal = 0.5 * size / np.tan(0.5 * float(tfs["camera_angle_x"]))
    images, masks, c2ws = [], [], []
    for frame in tfs["frames"]:
        img = load_image(os.path.join(directory, frame["file_path"] + ".png"),
                         resize=(size, size))
        images.append(img[..., :3])
        masks.append(np.ceil(img[..., 3] - 1e-5))
        mat = np.asarray(frame["transform_matrix"], np.float32)[:3, :4]
        # normalize camera distance to 1 (training_utils.py:591)
        mat[:3, 3] /= max(np.linalg.norm(mat[:3, 3]), 1e-6)
        c2ws.append(mat)
    return NeRFDataset(np.stack(c2ws), float(focal), np.stack(images),
                       np.stack(masks))


def decompose_projection(P: np.ndarray):
    """P [3,4] = K [R|t] -> (K [3,3], R [3,3], camera center c [3]).

    RQ decomposition of P[:, :3] with positive-diagonal normalization
    (equivalent to cv2.decomposeProjectionMatrix for our use).
    """
    M = P[:3, :3]
    # RQ via flipped QR
    flip = np.flipud(np.eye(3))
    q, r = np.linalg.qr((flip @ M).T)
    K = flip @ r.T @ flip
    R = flip @ q.T
    # force positive diagonal on K
    signs = np.sign(np.diag(K))
    signs[signs == 0] = 1.0
    S = np.diag(signs)
    K = K @ S
    R = S @ R
    if np.linalg.det(R) < 0:
        R = -R
    c = -np.linalg.inv(M) @ P[:3, 3]
    K = K / K[2, 2]
    return K, R, c


class DTUDataset(NamedTuple):
    poses: np.ndarray           # [V, 4, 4] camera-to-world
    intrinsics: np.ndarray      # [V, 4, 4]
    images: np.ndarray          # [V, H, W, 3]
    masks: np.ndarray           # [V, H, W]
    src_size: tuple             # source resolution (w, h)


def load_dtu(directory: str, size: int, image_dir: str = "image",
             mask_dir: str = "mask",
             src_size: tuple = (1600, 1200),
             normalize_dist: bool = True) -> DTUDataset:
    """``normalize_dist``: scale all camera centers by 1/max distance so
    the farthest camera sits on the unit sphere (reference dtu.py:87-89
    ``poses[:, :3, 3] /= max_dist`` — part of its DTU protocol; r1-r4
    runs of our stack omitted it, a parity gap found by the r5 duel)."""
    cams = np.load(os.path.join(directory, "cameras.npz"))
    img_files = sorted(os.listdir(os.path.join(directory, image_dir)))
    n = len(img_files)
    poses, intrinsics, images, masks = [], [], [], []
    for i in range(n):
        world_mat = cams[f"world_mat_{i}"]
        scale_mat = cams.get(f"scale_mat_{i}", np.eye(4))
        P = (world_mat @ scale_mat)[:3, :4]
        K, R, c = decompose_projection(P)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = R.T
        pose[:3, 3] = c
        intr = np.eye(4, dtype=np.float32)
        intr[:3, :3] = K
        poses.append(pose)
        intrinsics.append(intr)
        img = load_image(os.path.join(directory, image_dir, img_files[i]),
                         resize=(size, size))
        images.append(img[..., :3])
        mask_files = sorted(os.listdir(os.path.join(directory, mask_dir)))
        m = load_image(os.path.join(directory, mask_dir, mask_files[i]),
                       resize=(size, size))
        if m.ndim == 3:
            m = m[..., 0]
        masks.append((m > 0.5).astype(np.float32))
    poses = np.stack(poses)
    if normalize_dist:
        max_dist = max(float(np.linalg.norm(poses[:, :3, 3], axis=-1).max()),
                       1e-6)
        poses[:, :3, 3] /= max_dist
    return DTUDataset(poses, np.stack(intrinsics),
                      np.stack(images), np.stack(masks), src_size)


class NeRVDataset(NamedTuple):
    cam_to_worlds: np.ndarray   # [V, 3, 4]
    focal: float
    images: np.ndarray          # [V, H, W, 3]
    masks: np.ndarray           # [V, H, W]
    light_locs: np.ndarray      # [V, 3] (or [V, L, 3] multi-light)
    light_weights: Optional[np.ndarray]  # [V, L] or None


def load_nerv(directory: str, size: int, split: str = "train",
              point_dir: Optional[str] = None) -> NeRVDataset:
    sub = point_dir if point_dir is not None else f"{split}_point"
    tf_path = os.path.join(directory, sub, f"transforms_{split}.json")
    if not os.path.exists(tf_path):
        tf_path = os.path.join(directory, f"transforms_{split}.json")
    tfs = json.load(open(tf_path))
    focal = 0.5 * size / np.tan(0.5 * float(tfs["camera_angle_x"]))
    images, masks, c2ws, lights, weights = [], [], [], [], []
    base = os.path.dirname(tf_path)
    for frame in tfs["frames"]:
        img = load_image(os.path.join(base, frame["file_path"] + ".png"),
                         resize=(size, size))
        images.append(img[..., :3])
        masks.append(np.ceil(img[..., 3] - 1e-5)
                     if img.shape[-1] > 3 else np.ones(img.shape[:2],
                                                       np.float32))
        c2ws.append(np.asarray(frame["transform_matrix"], np.float32)[:3, :4])
        lights.append(np.asarray(frame.get("light_loc", [0.0, 0.0, 0.0]),
                                 np.float32))
        if "light_weights" in frame:
            weights.append(np.asarray(frame["light_weights"], np.float32))
    return NeRVDataset(np.stack(c2ws), float(focal), np.stack(images),
                       np.stack(masks), np.stack(lights),
                       np.stack(weights) if weights else None)


class ColocateDataset(NamedTuple):
    images: np.ndarray          # [V, H, W, 3]
    masks: np.ndarray           # [V, H, W]
    elevs: np.ndarray           # [V]
    azims: np.ndarray           # [V]
    dist: float


def load_colocate(directory: str, kind: str, size: int,
                  n_elev: int = 8, n_azim: int = 8,
                  min_elev: float = 0.0, max_elev: float = 45.0,
                  min_azim: float = -135.0, max_azim: float = 135.0,
                  dist: float = 1.0) -> ColocateDataset:
    """8x8 colocated cam/light grid renders ``{kind}_{i}_{j}.png``."""
    images, masks, elevs, azims = [], [], [], []
    for i, elev in enumerate(np.linspace(min_elev, max_elev, n_elev)):
        for j, azim in enumerate(np.linspace(min_azim, max_azim, n_azim)):
            img = load_image(os.path.join(directory, f"{kind}_{i}_{j}.png"),
                             resize=(size, size))
            images.append(img[..., :3])
            masks.append(np.ceil(img[..., 3] - 1e-5))
            elevs.append(elev)
            azims.append(azim)
    return ColocateDataset(np.stack(images), np.stack(masks),
                           np.asarray(elevs, np.float32),
                           np.asarray(azims, np.float32), dist)


def load_colocate_relight_grid(directory: str, kind: str, size: int,
                               n_cam: int = 4, n_light: int = 3):
    """Relight GT: ``gt_{kind}_{i}_{j}_{k}_{l}.png`` — (cam i,j, light k,l)."""
    out = {}
    for i in range(n_cam):
        for j in range(n_cam):
            for k in range(n_light):
                for l in range(n_light):
                    path = os.path.join(
                        directory, f"gt_{kind}_{i}_{j}_{k}_{l}.png")
                    if os.path.exists(path):
                        out[(i, j, k, l)] = load_image(path,
                                                       resize=(size, size))
    return out
