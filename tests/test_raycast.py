"""BVH build + JAX traversal tests, checked against a brute-force oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from upsp_tpu.geometry.bvh import build_bvh
from upsp_tpu.ops.raycast import (
    bvh_any_hit_before,
    bvh_intersect,
    bvh_to_device,
    brute_force_intersect,
    moller_trumbore,
    node_visibility,
    oblique_cos_filter,
)


def make_quad_soup():
    """Two unit quads (4 tris): one at z=0, one at z=1 (half-size)."""
    verts = np.array(
        [
            [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],  # quad z=0
            [0.25, 0.25, 1], [0.75, 0.25, 1], [0.75, 0.75, 1], [0.25, 0.75, 1],
        ],
        np.float32,
    )
    tris = np.array(
        [[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], np.int32
    )
    return verts, tris


class TestMollerTrumbore:
    def test_simple_hit(self):
        v0 = jnp.array([[0.0, 0.0, 0.0]])
        e1 = jnp.array([[1.0, 0.0, 0.0]])
        e2 = jnp.array([[0.0, 1.0, 0.0]])
        t, valid = moller_trumbore(
            jnp.array([0.2, 0.2, -1.0]), jnp.array([0.0, 0.0, 1.0]), v0, e1, e2
        )
        assert bool(valid[0])
        assert float(t[0]) == pytest.approx(1.0)

    def test_miss(self):
        v0 = jnp.array([[0.0, 0.0, 0.0]])
        e1 = jnp.array([[1.0, 0.0, 0.0]])
        e2 = jnp.array([[0.0, 1.0, 0.0]])
        t, valid = moller_trumbore(
            jnp.array([2.0, 2.0, -1.0]), jnp.array([0.0, 0.0, 1.0]), v0, e1, e2
        )
        assert not bool(valid[0])


class TestBVH:
    def test_build_structure(self):
        verts, tris = make_quad_soup()
        bvh = build_bvh(verts, tris, leaf_size=2)
        assert bvh.n_tris == 4
        # all original ids present exactly once
        assert sorted(bvh.tri_id.tolist()) == [0, 1, 2, 3]
        # root bbox covers everything
        np.testing.assert_allclose(bvh.bbox_min[0], [0, 0, 0])
        np.testing.assert_allclose(bvh.bbox_max[0], [1, 1, 1])

    def test_closest_hit(self):
        verts, tris = make_quad_soup()
        bvh = bvh_to_device(build_bvh(verts, tris, leaf_size=2))
        origins = jnp.array([[0.5, 0.5, 2.0], [0.1, 0.1, 2.0], [2.0, 2.0, 2.0]])
        dirs = jnp.array([[0.0, 0.0, -1.0]] * 3)
        t, prim, hit = bvh_intersect(bvh, origins, dirs, max_leaf=2)
        # center ray hits top quad first (z=1 -> t=1)
        assert bool(hit[0]) and float(t[0]) == pytest.approx(1.0)
        # corner ray misses top quad, hits bottom (t=2)
        assert bool(hit[1]) and float(t[1]) == pytest.approx(2.0)
        # outside ray misses everything
        assert not bool(hit[2])

    def test_matches_brute_force_random(self):
        rng = np.random.default_rng(123)  # local: ties depend on geometry
        verts = rng.normal(size=(60, 3)).astype(np.float32)
        tris = rng.integers(0, 60, size=(80, 3)).astype(np.int32)
        # drop degenerate triangles
        ok = (
            (tris[:, 0] != tris[:, 1])
            & (tris[:, 1] != tris[:, 2])
            & (tris[:, 0] != tris[:, 2])
        )
        tris = tris[ok]
        flat = build_bvh(verts, tris, leaf_size=4)
        bvh = bvh_to_device(flat)
        origins = rng.normal(size=(300, 3)).astype(np.float32) * 3
        dirs = rng.normal(size=(300, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        t_b, prim_b, hit_b = bvh_intersect(bvh, origins, dirs, max_leaf=flat.max_leaf_count)
        # oracle over original triangle order
        v0 = jnp.asarray(verts[tris[:, 0]])
        e1 = jnp.asarray(verts[tris[:, 1]] - verts[tris[:, 0]])
        e2 = jnp.asarray(verts[tris[:, 2]] - verts[tris[:, 0]])
        t_o, prim_o, hit_o = brute_force_intersect(v0, e1, e2, origins, dirs)
        np.testing.assert_array_equal(np.array(hit_b), np.array(hit_o))
        np.testing.assert_allclose(
            np.array(t_b)[np.array(hit_b)], np.array(t_o)[np.array(hit_o)], rtol=2e-5
        )

    def test_fixture_grid_self_visibility(self, fml_model):
        """Rays from far away toward surface nodes must hit the surface."""
        m = fml_model
        flat = build_bvh(m.vertices, m.triangles, leaf_size=4)
        bvh = bvh_to_device(flat)
        cam = jnp.array([0.0, 0.0, -60.0], jnp.float32)
        nodes = jnp.arange(0, m.size, max(m.size // 256, 1), dtype=jnp.int32)[:256]
        visible, prim = node_visibility(
            bvh,
            jnp.asarray(m.triangles),
            jnp.asarray(m.vertices),
            nodes,
            cam,
            max_leaf=flat.max_leaf_count,
        )
        vis = np.array(visible)
        # from a distant viewpoint roughly half the surface faces the camera
        assert 0.1 < vis.mean() < 0.9


class TestObliqueFilter:
    def test_facing(self):
        # surface normal pointing back along the ray: fully facing -> keep at 70 deg
        normals = jnp.array([[0.0, 0.0, 1.0]])
        dirs = jnp.array([[0.0, 0.0, -1.0]])
        keep = oblique_cos_filter(normals, dirs, 70.0)
        assert bool(keep[0])

    def test_grazing(self):
        # normal perpendicular to ray: 90 deg angle < 110 deg threshold -> cull
        normals = jnp.array([[1.0, 0.0, 0.0]])
        dirs = jnp.array([[0.0, 0.0, -1.0]])
        keep = oblique_cos_filter(normals, dirs, 70.0)
        assert not bool(keep[0])

    def test_threshold_edge(self):
        # to get angle theta between n and d=(0,0,-1): n = [sin t, 0, -cos t]
        # 120 deg > 110 -> keep at oblique=70
        ang = np.deg2rad(120)
        normals = jnp.array([[np.sin(ang), 0.0, -np.cos(ang)]], jnp.float32)
        dirs = jnp.array([[0.0, 0.0, -1.0]])
        assert bool(oblique_cos_filter(normals, dirs, 70.0)[0])
        # 100 deg < 110 -> cull
        ang = np.deg2rad(100)
        normals = jnp.array([[np.sin(ang), 0.0, -np.cos(ang)]], jnp.float32)
        assert not bool(oblique_cos_filter(normals, dirs, 70.0)[0])


class TestOcclusion:
    def test_any_hit_before(self):
        verts, tris = make_quad_soup()
        flat = build_bvh(verts, tris, leaf_size=2)
        bvh = bvh_to_device(flat)
        # from below bottom quad toward up: bottom quad at t=1 occludes
        origins = jnp.array([[0.5, 0.5, -1.0]])
        dirs = jnp.array([[0.0, 0.0, 1.0]])
        assert bool(bvh_any_hit_before(bvh, origins, dirs, jnp.array([10.0]), max_leaf=2)[0])
        assert not bool(
            bvh_any_hit_before(bvh, origins, dirs, jnp.array([0.5]), max_leaf=2)[0]
        )


class TestVisibilityIncal:
    def test_visible_and_inside_incal(self):
        import jax.numpy as jnp

        from upsp_tpu.camera.model import make_camera_params, project_points
        from upsp_tpu.camera.visibility import VisibilityChecker
        from upsp_tpu.geometry.grids import from_struct_grid
        from upsp_tpu.pipeline.synthetic import make_plate_grid

        model = from_struct_grid(make_plate_grid(21, 17))
        vis = VisibilityChecker(model, 70.0)
        K = np.array([[200.0, 0, 64], [0, 200.0, 48], [0, 0, 1]])
        params = make_camera_params(
            np.diag([1.0, -1.0, -1.0]), [-5.0, 4.0, 20.0], K, np.zeros(5)
        )

        def project(pts):
            return np.array(project_points(params, jnp.asarray(pts)))

        cam_center = np.array([5.0, 4.0, 20.0])
        full = vis.is_visible(cam_center.reshape(3, 1), model.vertices, model.normals)
        small = vis.is_visible_and_inside_incal(
            cam_center.reshape(3, 1), model.vertices, model.normals,
            project, (96, 128),
        )
        # the incal-restricted set is a subset, and nonempty for this view
        assert set(small.tolist()) <= set(full.tolist())
        assert len(small) > 0
        # shrink to a tiny window -> fewer nodes
        tiny = vis.is_visible_and_inside_incal(
            cam_center.reshape(3, 1), model.vertices, model.normals,
            project, (20, 20),
        )
        assert len(tiny) < len(small)
