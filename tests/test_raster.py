"""Tests for the raster subpackage (csrc-parity mesh ops + rasterizers)."""

import math
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_raytracing_tpu.raster import (
    MeshRasterizer, PointsRasterizer, PulsarRenderer, RasterizationSettings,
    SphereFragments, SpheresRasterizer, alpha_composite, edge_point_distance,
    face_areas_normals, face_point_distance, gather_scatter, hard_rgb_blend,
    interp_face_attrs, norm_weighted_sum, packed_to_padded, padded_to_packed,
    point_edge_distance, point_face_distance, point_line_seg_dists,
    point_triangle_dists, rasterize_meshes, rasterize_points,
    rasterize_spheres, sigmoid_alpha_blend, softmax_rgb_blend, weighted_sum,
)
from neural_raytracing_tpu.cameras import (
    FoVPerspectiveCamera, look_at_view_transform,
)


# ---------------------------------------------------------------- mesh ops

def test_face_areas_normals():
    verts = jnp.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 0]])
    faces = jnp.array([[0, 1, 2], [0, 1, 3]])  # second is degenerate
    areas, normals = face_areas_normals(verts, faces)
    np.testing.assert_allclose(areas, [0.5, 0.0], atol=1e-6)
    np.testing.assert_allclose(normals[0], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(normals[1], [0, 0, 0], atol=1e-3)


def test_interp_face_attrs():
    attrs = jnp.arange(2 * 3 * 2, dtype=jnp.float32).reshape(2, 3, 2)
    p2f = jnp.array([[0, 1], [-1, 0]])
    bary = jnp.array([[[1.0, 0, 0], [0, 0.5, 0.5]],
                      [[0.3, 0.3, 0.4], [0, 1, 0]]])
    out = interp_face_attrs(p2f, bary, attrs)
    np.testing.assert_allclose(out[0, 0], attrs[0, 0])
    np.testing.assert_allclose(out[0, 1], 0.5 * (attrs[1, 1] + attrs[1, 2]))
    np.testing.assert_allclose(out[1, 0], [0, 0])        # -1 -> zeros
    np.testing.assert_allclose(out[1, 1], attrs[0, 1])


def test_packed_padded_roundtrip():
    packed = jnp.arange(7 * 2, dtype=jnp.float32).reshape(7, 2)
    first = jnp.array([0, 3, 3, 5])                      # sizes 3, 0, 2, 2
    padded = packed_to_padded(packed, first, 3)
    assert padded.shape == (4, 3, 2)
    np.testing.assert_allclose(padded[0], packed[:3])
    np.testing.assert_allclose(padded[1], 0.0)
    np.testing.assert_allclose(padded[2, :2], packed[3:5])
    np.testing.assert_allclose(padded[2, 2], 0.0)
    back = padded_to_packed(padded, first, 7)
    np.testing.assert_allclose(back, packed)


def test_packed_to_padded_1d():
    packed = jnp.arange(5, dtype=jnp.float32)
    first = jnp.array([0, 2])
    padded = packed_to_padded(packed, first, 3)
    np.testing.assert_allclose(padded, [[0, 1, 0], [2, 3, 4]])


def test_gather_scatter():
    x = jnp.array([[1.0], [2.0], [4.0]])
    edges = jnp.array([[0, 1], [1, 2]])
    out = gather_scatter(x, edges, directed=True)
    np.testing.assert_allclose(out, [[2.0], [4.0], [0.0]])
    out = gather_scatter(x, edges, directed=False)
    np.testing.assert_allclose(out, [[2.0], [5.0], [2.0]])


def test_point_line_seg_dists():
    pts = jnp.array([[0.0, 1, 0], [2, 0, 0], [-3, 0, 0]])
    a = jnp.array([[0.0, 0, 0]])
    b = jnp.array([[1.0, 0, 0]])
    d = point_line_seg_dists(pts, a, b)
    np.testing.assert_allclose(d[:, 0], [1.0, 1.0, 9.0], atol=1e-6)


def test_point_triangle_dists():
    tris = jnp.array([[[0.0, 0, 0], [2, 0, 0], [0, 2, 0]]])
    pts = jnp.array([
        [0.5, 0.5, 1.0],     # above interior -> plane dist 1
        [3.0, 0.0, 0.0],     # beyond vertex (2,0,0) -> dist 1
        [1.0, -2.0, 0.0],    # below edge ab -> dist 4
    ])
    d = point_triangle_dists(pts, tris)
    np.testing.assert_allclose(d[:, 0], [1.0, 1.0, 4.0], atol=1e-5)
    # differentiable
    g = jax.grad(lambda p: jnp.sum(point_triangle_dists(p, tris)))(pts)
    assert np.all(np.isfinite(g))


def test_point_face_distance_segments():
    tris = jnp.array([[[0.0, 0, 0], [1, 0, 0], [0, 1, 0]],
                      [[5.0, 0, 0], [6, 0, 0], [5, 1, 0]]])
    pts = jnp.array([[0.2, 0.2, 0.5], [5.2, 0.2, 2.0]])
    d, idx = point_face_distance(pts, tris)
    np.testing.assert_allclose(d, [0.25, 4.0], atol=1e-5)
    np.testing.assert_allclose(idx, [0, 1])
    # segment masks keep each point on its own mesh
    d2, idx2 = point_face_distance(pts, tris,
                                   points_seg=jnp.array([1, 0]),
                                   tris_seg=jnp.array([0, 1]))
    assert d2[0] > 1.0 and idx2[0] == 1
    dfp, _ = face_point_distance(pts, tris)
    np.testing.assert_allclose(dfp, [0.25, 4.0], atol=1e-5)


def test_point_edge_distance():
    a = jnp.array([[0.0, 0, 0], [5, 0, 0]])
    b = jnp.array([[1.0, 0, 0], [6, 0, 0]])
    pts = jnp.array([[0.5, 2, 0], [7.0, 0, 0]])
    d, idx = point_edge_distance(pts, a, b)
    np.testing.assert_allclose(d, [4.0, 1.0], atol=1e-5)
    np.testing.assert_allclose(idx, [0, 1])
    de, _ = edge_point_distance(pts, a, b)
    np.testing.assert_allclose(de, [4.0, 1.0], atol=1e-5)


# ------------------------------------------------------------- rasterizers

def test_rasterize_points_basic():
    # one point at NDC center, generous radius
    pts = jnp.array([[0.0, 0.0, 2.0]])
    frags = rasterize_points(pts, image_size=8, radius=0.3,
                             points_per_pixel=2)
    assert frags.idx.shape == (8, 8, 2)
    center = frags.idx[3:5, 3:5, 0]
    assert np.all(np.asarray(center) == 0)
    assert np.all(np.asarray(frags.idx[0, 0]) == -1)
    assert np.all(np.asarray(frags.zbuf[0, 0]) == -1.0)
    assert np.all(np.asarray(frags.dists[0, 0]) == -1.0)
    np.testing.assert_allclose(frags.zbuf[4, 4, 0], 2.0)


def test_rasterize_points_depth_order_and_culling():
    pts = jnp.array([
        [0.0, 0.0, 5.0],
        [0.0, 0.0, 1.0],      # closer -> slot 0
        [0.0, 0.0, -1.0],     # behind camera -> culled
    ])
    frags = rasterize_points(pts, image_size=4, radius=0.5,
                             points_per_pixel=3)
    ctr = np.asarray(frags.idx[2, 2])
    assert ctr[0] == 1 and ctr[1] == 0 and ctr[2] == -1
    z = np.asarray(frags.zbuf[2, 2])
    np.testing.assert_allclose(z[:2], [1.0, 5.0])


def test_rasterize_points_chunk_invariance():
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (37, 3), minval=-1.0, maxval=1.0)
    pts = pts.at[:, 2].set(jnp.abs(pts[:, 2]) + 0.5)
    a = rasterize_points(pts, 16, radius=0.4, points_per_pixel=4, chunk=8)
    b = rasterize_points(pts, 16, radius=0.4, points_per_pixel=4, chunk=64)
    np.testing.assert_allclose(a.zbuf, b.zbuf, atol=1e-6)
    np.testing.assert_allclose(a.dists, b.dists, atol=1e-6)


def test_rasterize_points_grads():
    pts = jnp.array([[0.1, 0.0, 2.0], [0.0, 0.2, 3.0]])

    def f(p):
        fr = rasterize_points(p, 8, radius=0.8, points_per_pixel=2)
        valid = fr.idx >= 0
        return (jnp.sum(jnp.where(valid, fr.zbuf, 0.0))
                + jnp.sum(jnp.where(valid, fr.dists, 0.0)))

    g = jax.grad(f)(pts)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.asarray(g) != 0)


def test_rasterize_spheres_radius_column():
    spheres = jnp.array([
        [0.0, 0.0, 2.0, 0.6],
        [0.0, 0.0, 1.0, 0.0],   # radius 0 -> skipped
    ])
    frags = rasterize_spheres(spheres, image_size=4, points_per_pixel=2)
    ctr = np.asarray(frags.idx[2, 2])
    assert ctr[0] == 0 and ctr[1] == -1


def test_rasterize_meshes_basic():
    # big triangle around the image center, at depth z = 2
    verts = jnp.array([[-2.0, -2.0, 2.0], [3.0, 0.0, 2.0], [0.0, 3.0, 2.0]])
    faces = jnp.array([[0, 1, 2]])
    frags = rasterize_meshes(verts, faces, image_size=8, faces_per_pixel=2)
    assert frags.idx[4, 4, 0] == 0
    assert frags.dists[4, 4, 0] < 0                       # inside: negative
    np.testing.assert_allclose(frags.zbuf[4, 4, 0], 2.0, atol=1e-5)
    bary = np.asarray(frags.bary[4, 4, 0])
    np.testing.assert_allclose(bary.sum(), 1.0, atol=1e-5)
    assert np.all(bary >= 0)
    assert frags.idx[4, 4, 1] == -1


def test_rasterize_meshes_zbuf_interpolates():
    # slanted triangle: z varies across the image
    verts = jnp.array([[-2.0, -2.0, 1.0], [3.0, 0.0, 3.0], [0.0, 3.0, 3.0]])
    faces = jnp.array([[0, 1, 2]])
    frags = rasterize_meshes(verts, faces, image_size=8, faces_per_pixel=1)
    b = np.asarray(frags.bary[4, 4, 0])
    expect = b[0] * 1.0 + b[1] * 3.0 + b[2] * 3.0
    np.testing.assert_allclose(frags.zbuf[4, 4, 0], expect, atol=1e-5)


def test_rasterize_meshes_depth_order():
    verts = jnp.array([
        [-2.0, -2.0, 5.0], [3.0, 0.0, 5.0], [0.0, 3.0, 5.0],
        [-2.0, -2.0, 1.0], [3.0, 0.0, 1.0], [0.0, 3.0, 1.0],
    ])
    faces = jnp.array([[0, 1, 2], [3, 4, 5]])
    frags = rasterize_meshes(verts, faces, image_size=4, faces_per_pixel=2)
    assert frags.idx[2, 2, 0] == 1 and frags.idx[2, 2, 1] == 0


def test_rasterize_meshes_blur_radius():
    verts = jnp.array([[0.05, -2.0, 2.0], [2.0, -2.0, 2.0],
                       [2.0, 2.0, 2.0]])
    faces = jnp.array([[0, 1, 2]])
    sharp = rasterize_meshes(verts, faces, 8, blur_radius=0.0,
                             faces_per_pixel=1)
    blurred = rasterize_meshes(verts, faces, 8, blur_radius=0.5,
                               faces_per_pixel=1)
    n_sharp = int(np.sum(np.asarray(sharp.idx[..., 0]) >= 0))
    n_blur = int(np.sum(np.asarray(blurred.idx[..., 0]) >= 0))
    assert n_blur > n_sharp
    # outside-but-covered pixels carry positive dists
    outside = (np.asarray(blurred.idx[..., 0]) >= 0) & \
        (np.asarray(sharp.idx[..., 0]) < 0)
    assert np.all(np.asarray(blurred.dists[..., 0])[outside] > 0)


def test_rasterize_meshes_grads():
    verts = jnp.array([[-2.0, -2.0, 2.0], [3.0, 0.0, 2.5],
                       [0.0, 3.0, 1.5]])
    faces = jnp.array([[0, 1, 2]])

    def f(v):
        fr = rasterize_meshes(v, faces, 8, faces_per_pixel=1)
        valid = fr.idx >= 0
        return jnp.sum(jnp.where(valid, fr.zbuf, 0.0))

    g = jax.grad(f)(verts)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.asarray(g) != 0)


# ---------------------------------------------------------------- blending

def _point_frags():
    pts = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 2.0]])
    return rasterize_points(pts, 4, radius=0.6, points_per_pixel=2)


def test_hard_rgb_blend():
    frags = _point_frags()
    colors = jnp.zeros((4, 4, 2, 3)).at[..., 0, :].set(
        jnp.array([1.0, 0.0, 0.0]))
    img = hard_rgb_blend(colors, frags, background=(0.0, 1.0, 0.0))
    np.testing.assert_allclose(img[2, 2], [1, 0, 0, 1])
    np.testing.assert_allclose(img[0, 0], [0, 1, 0, 0])


def test_sigmoid_alpha_blend():
    verts = jnp.array([[-2.0, -2.0, 2.0], [3.0, 0.0, 2.0], [0.0, 3.0, 2.0]])
    faces = jnp.array([[0, 1, 2]])
    frags = rasterize_meshes(verts, faces, 8, blur_radius=0.3,
                             faces_per_pixel=1)
    alpha = sigmoid_alpha_blend(frags, sigma=1e-2)
    a = np.asarray(alpha)
    assert np.all((a >= 0) & (a <= 1))
    assert a[4, 4] > 0.5                                  # inside
    assert a[4, 4] > a[0, 7]


def test_softmax_rgb_blend():
    verts = jnp.array([[-2.0, -2.0, 2.0], [3.0, 0.0, 2.0], [0.0, 3.0, 2.0]])
    faces = jnp.array([[0, 1, 2]])
    frags = rasterize_meshes(verts, faces, 8, faces_per_pixel=1)
    colors = jnp.ones((8, 8, 1, 3)) * jnp.array([1.0, 0.0, 0.0])
    img = softmax_rgb_blend(colors, frags, background=(0.0, 0.0, 1.0))
    assert img.shape == (8, 8, 4)
    np.testing.assert_allclose(img[4, 4, :3], [1, 0, 0], atol=1e-3)
    np.testing.assert_allclose(img[0, 7, :3], [0, 0, 1], atol=1e-3)


# ------------------------------------------------------------- compositing

def test_alpha_composite():
    frags = _point_frags()
    feats = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    alphas = jnp.full(frags.idx.shape, 0.5)
    img = alpha_composite(feats, alphas, frags.idx)
    # center: 0.5*f0 + 0.5*0.5*f1
    np.testing.assert_allclose(img[2, 2], [0.5, 0.25], atol=1e-6)
    np.testing.assert_allclose(img[0, 0], [0.0, 0.0])
    full = alpha_composite(feats, jnp.ones_like(alphas), frags.idx)
    np.testing.assert_allclose(full[2, 2], feats[0])      # opaque: nearest


def test_weighted_sums():
    frags = _point_frags()
    feats = jnp.array([[1.0], [3.0]])
    alphas = jnp.full(frags.idx.shape, 0.5)
    ws = weighted_sum(feats, alphas, frags.idx)
    np.testing.assert_allclose(ws[2, 2], [2.0], atol=1e-6)
    nws = norm_weighted_sum(feats, alphas, frags.idx)
    np.testing.assert_allclose(nws[2, 2], [2.0], atol=1e-6)
    np.testing.assert_allclose(nws[0, 0], [0.0])


# --------------------------------------------------------------- renderers

def _camera():
    r, t = look_at_view_transform(dist=3.0, elev=0.0, azim=0.0)
    return FoVPerspectiveCamera(R=r, T=t)


def test_spheres_rasterizer():
    cam = _camera()
    settings = RasterizationSettings(image_size=8, points_per_pixel=2)
    rast = SpheresRasterizer(cameras=cam, raster_settings=settings)
    frags = rast(jnp.array([[0.0, 0.0, 0.0]]), jnp.array([0.4]))
    assert isinstance(frags, SphereFragments)
    assert frags.idx[4, 4, 0] == 0
    np.testing.assert_allclose(frags.zbuf[4, 4, 0], 3.0, atol=1e-5)


def test_spheres_rasterizer_requires_camera():
    rast = SpheresRasterizer()
    with pytest.raises(ValueError):
        rast(jnp.zeros((1, 3)), jnp.ones((1,)))


def test_points_and_mesh_rasterizer():
    cam = _camera()
    settings = RasterizationSettings(image_size=8)
    pf = PointsRasterizer(cam, settings)(jnp.zeros((1, 3)), radius=0.3)
    assert pf.idx[4, 4, 0] == 0
    verts = jnp.array([[-1.0, -1.0, 0.0], [1.5, 0.0, 0.0],
                       [0.0, 1.5, 0.0]])
    mf = MeshRasterizer(cam, settings)(verts, jnp.array([[0, 1, 2]]))
    assert mf.idx[4, 4, 0] == 0
    np.testing.assert_allclose(mf.zbuf[4, 4, 0], 3.0, atol=1e-4)


def test_pulsar_renderer():
    renderer = PulsarRenderer(16, 16, spheres_per_pixel=4)
    pos = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, 4.0]])
    col = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    rad = jnp.array([0.5, 0.8])
    cam = jnp.array([0.0, 0, 0, 0, 0, 0, 1.0, 2.0])  # pos, rot, focal, sensor
    img = renderer(pos, col, rad, cam, gamma=1e-3, max_depth=10.0)
    assert img.shape == (16, 16, 3)
    c = np.asarray(img[8, 8])
    assert c[0] > 0.9 and c[1] < 0.1                      # nearest wins
    assert np.allclose(np.asarray(img[0, 0]), 0.0, atol=1e-3)


def test_pulsar_grads_and_opacity():
    renderer = PulsarRenderer(8, 8, spheres_per_pixel=2)
    pos = jnp.array([[0.0, 0.0, 2.0]])
    col = jnp.array([[1.0, 1.0, 1.0]])
    rad = jnp.array([0.5])
    cam = jnp.array([0.0, 0, 0, 0, 0, 0, 1.0, 2.0])

    def f(p, c, r):
        img = renderer(p, c, r, cam, gamma=0.1, max_depth=10.0,
                       opacity=jnp.array([0.7]))
        return jnp.sum(img)

    grads = jax.grad(f, argnums=(0, 1, 2))(pos, col, rad)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.asarray(grads[1]) != 0)


def test_face_areas_normals_degenerate_grads():
    # regression: jnp.linalg.norm has a NaN gradient at cross = 0; a
    # degenerate (zero-area) face must not poison the vertex gradients
    verts = jnp.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0],
                       [0.0, 1.0, 0.0], [1.0, 1.0, 0.0]])
    faces = jnp.array([[0, 1, 2], [3, 3, 3]])
    areas, normals = face_areas_normals(verts, faces)
    np.testing.assert_allclose(np.asarray(areas), [0.5, 0.0], atol=1e-7)
    np.testing.assert_allclose(np.asarray(normals[1]), 0.0, atol=1e-6)

    def f(v):
        a, n = face_areas_normals(v, faces)
        return jnp.sum(a) + jnp.sum(n)

    g = np.asarray(jax.grad(f)(verts))
    assert np.all(np.isfinite(g))
    assert np.any(g != 0)


def test_axis_angle_rotation_values_and_grads_at_zero():
    from neural_raytracing_tpu.raster.pulsar import _axis_angle_rotation

    # generic rvec: orthonormal, det 1, matches the normalized-axis form
    rvec = jnp.array([0.3, -0.5, 0.2])
    r = np.asarray(_axis_angle_rotation(rvec))
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-6)
    theta = float(np.linalg.norm(np.asarray(rvec)))
    k = np.asarray(rvec) / theta
    kx = np.array([[0.0, -k[2], k[1]], [k[2], 0.0, -k[0]],
                   [-k[1], k[0], 0.0]])
    expected = np.eye(3) + math.sin(theta) * kx \
        + (1.0 - math.cos(theta)) * (kx @ kx)
    np.testing.assert_allclose(r, expected, atol=1e-6)

    # regression: at rvec = 0 (identity rotation, the natural camera init)
    # the jacobian must be finite and equal the so(3) generators
    jac = np.asarray(jax.jacobian(_axis_angle_rotation)(jnp.zeros(3)))
    assert np.all(np.isfinite(jac))
    for i in range(3):
        e = np.zeros(3)
        e[i] = 1.0
        gen = np.array([[0.0, -e[2], e[1]], [e[2], 0.0, -e[0]],
                        [-e[1], e[0], 0.0]])
        np.testing.assert_allclose(jac[:, :, i], gen, atol=1e-6)


def test_pulsar_camera_grads_at_identity_rotation():
    # regression: camera grads were NaN at rotation (0,0,0) through the
    # 0/0 of d||rvec||/drvec surviving the where-mask
    renderer = PulsarRenderer(8, 8, spheres_per_pixel=2)
    pos = jnp.array([[0.3, -0.2, 2.0]])
    col = jnp.array([[1.0, 1.0, 1.0]])
    rad = jnp.array([0.5])
    cam = jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 2.0])

    def f(c):
        return jnp.sum(renderer(pos, col, rad, c, gamma=0.1, max_depth=10.0))

    g = np.asarray(jax.grad(f)(cam))
    assert np.all(np.isfinite(g))


def _random_mesh(key, n_faces, z_lo=0.5, z_hi=4.0, spread=1.2):
    """Random small triangles scattered over the NDC square."""
    kc, kd, kz = jax.random.split(key, 3)
    centers = jax.random.uniform(kc, (n_faces, 1, 2), minval=-spread,
                                 maxval=spread)
    deltas = jax.random.uniform(kd, (n_faces, 3, 2), minval=-0.3,
                                maxval=0.3)
    z = jax.random.uniform(kz, (n_faces, 3, 1), minval=z_lo, maxval=z_hi)
    verts = jnp.concatenate([centers + deltas, z], axis=-1).reshape(-1, 3)
    faces = jnp.arange(3 * n_faces, dtype=jnp.int32).reshape(-1, 3)
    return verts, faces


@pytest.mark.parametrize("blur,size,bin_size", [
    (0.0, 32, 8),      # divisible tiles
    (0.02, 32, 8),     # blur-region coverage crosses tile borders
    (0.0, 30, 8),      # non-divisible image: padded tiles cropped
    (0.01, 32, 16),
])
def test_rasterize_meshes_binned_matches_naive(blur, size, bin_size):
    verts, faces = _random_mesh(jax.random.PRNGKey(3), 40)
    naive = rasterize_meshes(verts, faces, size, blur_radius=blur,
                             faces_per_pixel=4)
    binned = rasterize_meshes(verts, faces, size, blur_radius=blur,
                              faces_per_pixel=4, bin_size=bin_size,
                              max_faces_per_bin=40)
    np.testing.assert_array_equal(np.asarray(naive.idx),
                                  np.asarray(binned.idx))
    np.testing.assert_allclose(np.asarray(naive.zbuf),
                               np.asarray(binned.zbuf), atol=1e-6)
    np.testing.assert_allclose(np.asarray(naive.dists),
                               np.asarray(binned.dists), atol=1e-6)
    np.testing.assert_allclose(np.asarray(naive.bary),
                               np.asarray(binned.bary), atol=1e-6)


def test_rasterize_meshes_binned_backface_cull_matches():
    verts, faces = _random_mesh(jax.random.PRNGKey(5), 24)
    kw = dict(image_size=16, faces_per_pixel=3, cull_backfaces=True)
    naive = rasterize_meshes(verts, faces, **kw)
    binned = rasterize_meshes(verts, faces, bin_size=8,
                              max_faces_per_bin=24, **kw)
    np.testing.assert_array_equal(np.asarray(naive.idx),
                                  np.asarray(binned.idx))


def test_rasterize_meshes_binned_overflow_drops_late_faces():
    # two co-located triangles; capacity 1 keeps only the FIRST face id
    # (reference bin-overflow semantics: later faces are dropped)
    verts = jnp.array([[-2.0, -2.0, 2.0], [3.0, 0.0, 2.0], [0.0, 3.0, 2.0],
                       [-2.0, -2.0, 1.0], [3.0, 0.0, 1.0], [0.0, 3.0, 1.0]])
    faces = jnp.array([[0, 1, 2], [3, 4, 5]])
    frags = rasterize_meshes(verts, faces, 8, faces_per_pixel=2,
                             bin_size=4, max_faces_per_bin=1)
    assert frags.idx[4, 4, 0] == 0          # face 1 (closer) was dropped
    assert frags.idx[4, 4, 1] == -1


def test_rasterize_meshes_binned_grads_match_naive():
    verts, faces = _random_mesh(jax.random.PRNGKey(7), 12)

    def total_z(v, **kw):
        fr = rasterize_meshes(v, faces, 16, faces_per_pixel=2, **kw)
        return jnp.sum(jnp.where(fr.idx >= 0, fr.zbuf, 0.0))

    g_naive = jax.grad(total_z)(verts)
    g_binned = jax.grad(lambda v: total_z(v, bin_size=8,
                                          max_faces_per_bin=12))(verts)
    np.testing.assert_allclose(np.asarray(g_naive), np.asarray(g_binned),
                               atol=1e-5)


def test_mesh_rasterizer_binned_settings_plumbed():
    verts, faces = _random_mesh(jax.random.PRNGKey(9), 10)
    r, t = look_at_view_transform(dist=3.0, elev=10.0, azim=20.0)
    cam = FoVPerspectiveCamera(R=r, T=t)
    world = verts * 0.2
    naive = MeshRasterizer(cam, RasterizationSettings(image_size=16))(
        world, faces)
    binned = MeshRasterizer(cam, RasterizationSettings(
        image_size=16, bin_size=8, max_faces_per_bin=10))(world, faces)
    np.testing.assert_array_equal(np.asarray(naive.idx),
                                  np.asarray(binned.idx))
