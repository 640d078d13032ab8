"""Triangle mesh intersection: JAX path vs native C++ path vs closed forms."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_raytracing_tpu.shapes.mesh import TriangleMesh, load_obj

# a unit right tetrahedron
VERTS = np.asarray([
    [0.0, 0.0, 0.0],
    [1.0, 0.0, 0.0],
    [0.0, 1.0, 0.0],
    [0.0, 0.0, 1.0],
], np.float32)
FACES = np.asarray([
    [0, 2, 1],
    [0, 1, 3],
    [0, 3, 2],
    [1, 2, 3],
], np.int32)


def native_available():
    from neural_raytracing_tpu import native
    return native.available()


class TestJaxMesh:
    def test_head_on_hit(self):
        mesh = TriangleMesh(VERTS, FACES, chunk=4)
        rays = jnp.asarray([[0.2, 0.2, 3.0, 0.0, 0.0, -1.0]])
        it, hit = mesh.intersect({}, rays)
        assert bool(hit[0])
        # first surface from above is the x+y+z=1 plane: z = 1-0.4 = 0.6
        np.testing.assert_allclose(it.t[0], 3.0 - 0.6, atol=1e-5)

    def test_miss(self):
        mesh = TriangleMesh(VERTS, FACES, chunk=4)
        rays = jnp.asarray([[3.0, 3.0, 3.0, 0.0, 0.0, -1.0]])
        _, hit = mesh.intersect({}, rays)
        assert not bool(hit[0])

    def test_shadow(self):
        mesh = TriangleMesh(VERTS, FACES, chunk=4)
        rays = jnp.asarray([
            [0.2, 0.2, 3.0, 0.0, 0.0, -1.0],
            [0.2, 0.2, 3.0, 0.0, 0.0, 1.0],
        ])
        nb = mesh.intersect_test({}, rays, max_t=10.0)
        assert not bool(nb[0]) and bool(nb[1])

    def test_chunk_padding(self):
        # chunk larger than face count exercises degenerate padding
        mesh = TriangleMesh(VERTS, FACES, chunk=256)
        rays = jnp.asarray([[0.2, 0.2, 3.0, 0.0, 0.0, -1.0]])
        it, hit = mesh.intersect({}, rays)
        assert bool(hit[0])
        np.testing.assert_allclose(it.t[0], 2.4, atol=1e-5)

    def test_normal_faces_origin(self):
        mesh = TriangleMesh(VERTS, FACES, chunk=4)
        rays = jnp.asarray([[0.2, 0.2, 3.0, 0.0, 0.0, -1.0]])
        it, hit = mesh.intersect({}, rays)
        assert float(it.n[0, 2]) > 0  # points back towards +z origin


@pytest.mark.skipif(not native_available(), reason="native lib unavailable")
class TestNativeMesh:
    def test_matches_jax_path(self):
        from neural_raytracing_tpu import native
        rng = np.random.default_rng(0)
        rays = np.concatenate([
            rng.uniform(-0.2, 1.0, (64, 3)).astype(np.float32) * 0
            + np.asarray([0.3, 0.3, 3.0], np.float32),
            np.tile(np.asarray([0.0, 0.0, -1.0], np.float32), (64, 1)),
        ], axis=-1)
        rays[:, 0] = rng.uniform(-0.5, 1.0, 64)
        rays[:, 1] = rng.uniform(-0.5, 1.0, 64)

        t_n, face_n, uv_n, n_n, hit_n = native.mesh_intersect(
            rays, VERTS, FACES)
        mesh = TriangleMesh(VERTS, FACES, chunk=4)
        it, hit_j = mesh.intersect({}, jnp.asarray(rays))
        np.testing.assert_array_equal(hit_n, np.asarray(hit_j))
        m = hit_n
        np.testing.assert_allclose(t_n[m], np.asarray(it.t)[m], atol=1e-4)

    def test_shadow_matches(self):
        from neural_raytracing_tpu import native
        rays = np.asarray([
            [0.2, 0.2, 3.0, 0.0, 0.0, -1.0],
            [0.2, 0.2, 3.0, 0.0, 0.0, 1.0],
        ], np.float32)
        nb = native.mesh_intersect_test(rays, VERTS, FACES,
                                        np.asarray([10.0, 10.0], np.float32))
        assert not nb[0] and nb[1]

    def test_knn(self):
        from neural_raytracing_tpu import native
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(200, 3)).astype(np.float32)
        q = rng.normal(size=(16, 3)).astype(np.float32)
        idx, d2 = native.knn(pts, q, k=4)
        # brute-force check
        full = ((pts[None] - q[:, None]) ** 2).sum(-1)
        expect = np.sort(full, axis=1)[:, :4]
        np.testing.assert_allclose(np.sort(d2, axis=1), expect, rtol=1e-4)

    def test_ray_point_min_dist(self):
        from neural_raytracing_tpu import native
        rays = np.asarray([[0.0, 0, 0, 1.0, 0, 0]], np.float32)
        pts = np.asarray([[2.0, 1.0, 0.0]], np.float32)
        d = native.ray_point_min_dist(rays, pts)
        np.testing.assert_allclose(d, [1.0], atol=1e-5)


class TestObjLoader:
    def test_roundtrip(self, tmp_path):
        path = os.path.join(tmp_path, "tet.obj")
        with open(path, "w") as f:
            f.write("# tet\n")
            for v in VERTS:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
            for face in FACES:
                f.write(f"f {face[0]+1} {face[1]+1} {face[2]+1}\n")
        verts, faces = load_obj(path)
        np.testing.assert_allclose(verts, VERTS)
        np.testing.assert_array_equal(faces, FACES)

    def test_quad_triangulation_and_slashes(self, tmp_path):
        path = os.path.join(tmp_path, "quad.obj")
        with open(path, "w") as f:
            f.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n")
            f.write("f 1/1/1 2/2/2 3/3/3 4/4/4\n")
        verts, faces = load_obj(path)
        assert faces.shape == (2, 3)
        np.testing.assert_array_equal(faces, [[0, 1, 2], [0, 2, 3]])
