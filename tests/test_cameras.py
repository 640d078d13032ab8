"""Camera ray-generation tests against geometric invariants."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from neural_raytracing_tpu.cameras import (
    DTUCamera, FoVPerspectiveCamera, NeRFCamera, NeRFMMCamera, NeRVCamera,
    look_at_rotation, look_at_view_transform, spherical_positions,
)


def center_positions(size):
    c = (size - 1) / 2.0
    return jnp.asarray([[[c, c]]], jnp.float32).reshape(1, 1, 2)


class TestLookAt:
    def test_camera_center_distance(self):
        r, t = look_at_view_transform(dist=2.0, elev=30.0, azim=45.0)
        cam = FoVPerspectiveCamera(R=r, T=t)
        c = np.asarray(cam.camera_center())
        np.testing.assert_allclose(np.linalg.norm(c), 2.0, rtol=1e-5)

    def test_rotation_orthonormal(self):
        r = look_at_rotation(jnp.asarray([[1.0, 2.0, 3.0]]))
        eye = np.asarray(r[0] @ r[0].T)
        np.testing.assert_allclose(eye, np.eye(3), atol=1e-5)

    def test_world_to_view_maps_at_to_z_axis(self):
        # the look-at target must land on the view-space +z axis
        r, t = look_at_view_transform(dist=2.0, elev=20.0, azim=60.0,
                                      at=((0.3, 0.1, -0.2),))
        at = jnp.asarray([0.3, 0.1, -0.2])
        view = at @ r[0] + t[0]
        np.testing.assert_allclose(np.asarray(view[:2]), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(view[2]), 2.0, rtol=1e-5)

    def test_spherical_positions_grid(self):
        r, t = spherical_positions(n_elev=3, n_azim=4, dist=2.0)
        assert r.shape == (12, 3, 3) and t.shape == (12, 3)


class TestFoVCamera:
    def test_center_ray_through_origin(self):
        size = 64
        r, t = look_at_view_transform(dist=2.0, elev=10.0, azim=30.0)
        cam = FoVPerspectiveCamera(R=r, T=t)
        rays = cam.sample_positions(center_positions(size), size=size)
        r_o, r_d = np.asarray(rays[0, 0, 0, 0, :3]), np.asarray(
            rays[0, 0, 0, 0, 3:])
        # closest approach of the central ray to the origin ~ 0
        # (within the reference's far-plane normalization quirk ~ dist/zfar)
        tmin = -np.dot(r_o, r_d)
        closest = r_o + tmin * r_d
        assert np.linalg.norm(closest) < 0.05

    def test_directions_unit_norm(self):
        size = 32
        r, t = look_at_view_transform(dist=2.0, elev=0.0, azim=0.0)
        cam = FoVPerspectiveCamera(R=r, T=t)
        pos = jnp.stack(jnp.meshgrid(jnp.arange(size, dtype=jnp.float32),
                                     jnp.arange(size, dtype=jnp.float32)),
                        -1)
        rays = cam.sample_positions(pos, size=size, bundle_size=2)
        assert rays.shape == (1, size, size, 2, 6)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(rays[..., 3:]), axis=-1), 1.0,
            atol=1e-5)

    def test_fov_controls_spread(self):
        size = 64
        r, t = look_at_view_transform(dist=2.0)
        wide = FoVPerspectiveCamera(R=r, T=t, fov=90.0)
        narrow = FoVPerspectiveCamera(R=r, T=t, fov=30.0)
        pos = jnp.asarray([[[0.0, size / 2.0]]])  # edge pixel
        dw = wide.sample_positions(pos, size=size)[0, 0, 0, 0, 3:]
        dn = narrow.sample_positions(pos, size=size)[0, 0, 0, 0, 3:]
        center = jnp.asarray([0.0, 0.0, -1.0])
        assert float(jnp.dot(dw, center)) < float(jnp.dot(dn, center))


class TestNeRFCamera:
    def c2w(self, n=1):
        # identity rotation, camera at +z looking down -z (NeRF convention)
        m = np.zeros((n, 3, 4), np.float32)
        m[:, 0, 0] = m[:, 1, 1] = m[:, 2, 2] = 1.0
        m[:, 2, 3] = 2.0
        return jnp.asarray(m)

    def test_center_ray(self):
        size = 64
        cam = NeRFCamera(cam_to_world=self.c2w(), focal=64.0)
        rays = cam.sample_positions(center_positions(size), size=size)
        d = np.asarray(rays[0, 0, 0, 0, 3:])
        np.testing.assert_allclose(d, [0.0, 0.0, -1.0], atol=0.02)
        np.testing.assert_allclose(np.asarray(rays[0, 0, 0, 0, :3]),
                                   [0, 0, 2.0], atol=1e-6)

    def test_focal_controls_spread(self):
        size = 64
        pos = jnp.asarray([[[0.0, 32.0]]])
        d_short = NeRFCamera(cam_to_world=self.c2w(), focal=32.0)\
            .sample_positions(pos, size=size)[0, 0, 0, 0, 3:]
        d_long = NeRFCamera(cam_to_world=self.c2w(), focal=128.0)\
            .sample_positions(pos, size=size)[0, 0, 0, 0, 3:]
        fwd = jnp.asarray([0.0, 0.0, -1.0])
        assert float(jnp.dot(d_short, fwd)) < float(jnp.dot(d_long, fwd))

    def test_batched_views(self):
        cam = NeRFCamera(cam_to_world=self.c2w(3), focal=64.0)
        pos = jnp.zeros((4, 4, 2))
        rays = cam.sample_positions(pos, size=64)
        assert rays.shape == (3, 4, 4, 1, 6)


class TestNeRFMMCamera:
    def test_zero_rotation_matches_nerf(self):
        size = 64
        n = 1
        cam = NeRFMMCamera(
            t=jnp.asarray([[0.0, 0.0, 2.0]]),
            angle=jnp.asarray([[0.0]]),
            axis=jnp.asarray([[0.0, 0.0, 1.0]]),
            focals=jnp.asarray([[64.0, 64.0]]))
        rays = cam.sample_positions(center_positions(size), size=size)
        d = np.asarray(rays[0, 0, 0, 0, 3:])
        np.testing.assert_allclose(d, [0.0, 0.0, -1.0], atol=0.02)


class TestNeRVCamera:
    def test_shapes_and_origin(self):
        cam = NeRVCamera(world_to_cam=jnp.eye(3)[None],
                         loc=jnp.asarray([[0.0, 0.0, -2.0]]), focal=64.0)
        rays = cam.sample_positions(center_positions(64), size=64)
        assert rays.shape == (1, 1, 1, 1, 6)
        np.testing.assert_allclose(np.asarray(rays[0, 0, 0, 0, :3]),
                                   [0.0, 0.0, -2.0])


class TestDTUCamera:
    def test_pinhole_geometry(self):
        size = 64
        # camera at origin looking down +z with focal 100, principal (50,50)
        intr = np.eye(4, dtype=np.float32)
        intr[0, 0] = intr[1, 1] = 100.0
        intr[0, 2] = intr[1, 2] = 50.0
        pose = np.eye(4, dtype=np.float32)
        cam = DTUCamera(pose=jnp.asarray(pose[None]),
                        intrinsic=jnp.asarray(intr[None]),
                        src_size=jnp.asarray([100.0, 100.0]))
        # principal point pixel (scaled): positions*(100/64) = (50, 50)
        pos = jnp.asarray([[[32.0, 32.0]]])
        rays = cam.sample_positions(pos, size=size)
        d = np.asarray(rays[0, 0, 0, 0, 3:])
        np.testing.assert_allclose(d, [0.0, 0.0, 1.0], atol=1e-5)
