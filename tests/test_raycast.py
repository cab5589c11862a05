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

    @pytest.mark.slow
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


class TestWatertight:
    """Watertight Woop/Benthin/Wald intersector (reference pspRT.cpp:48-100
    behavior): a ray through an edge shared by two triangles must hit at
    least one of them — plain Moller-Trumbore can round both u/v tests the
    wrong way and miss in BOTH."""

    def _edge_rays(self, n=257):
        """Rays through the shared diagonal (0,0,0)-(1,1,0) of the unit
        quad, at parameters chosen to be non-representable in binary."""
        s = (np.arange(1, n + 1, dtype=np.float64) / (n + 1)) * (1 / 3) + 0.31
        pts = np.stack([s, s, np.zeros_like(s)], axis=1)
        # oblique directions so the shear path is exercised (not axis-aligned)
        origins = (pts + np.array([0.123, -0.071, -2.0])).astype(np.float32)
        dirs = (pts - origins).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        return origins.astype(np.float32), dirs

    def test_shared_edge_never_leaks(self):
        from upsp_tpu.ops.raycast import watertight_intersect

        verts, tris = make_quad_soup()
        v0 = verts[tris[:2, 0]]
        e1 = verts[tris[:2, 1]] - v0
        e2 = verts[tris[:2, 2]] - v0
        origins, dirs = self._edge_rays()
        for o, d in zip(jnp.asarray(origins), jnp.asarray(dirs)):
            _, valid = watertight_intersect(
                o, d, jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2)
            )
            assert bool(np.asarray(valid).any()), (o, d)

    def test_bvh_edge_rays_hit(self):
        """Through the BVH: every shared-edge ray lands a hit with the
        default (watertight) intersector."""
        verts, tris = make_quad_soup()
        bvh = bvh_to_device(build_bvh(verts, tris, leaf_size=2))
        origins, dirs = self._edge_rays()
        t, prim, hit = bvh_intersect(
            bvh, jnp.asarray(origins), jnp.asarray(dirs)
        )
        assert bool(np.asarray(hit).all())
        # the hits land on the z=0 quad's two triangles
        assert set(np.asarray(prim).tolist()) <= {0, 1}

    def test_matches_mt_off_edge(self):
        """Away from edges the two intersectors agree exactly (same hits,
        same t within f32 rounding)."""
        rng = np.random.default_rng(11)
        verts, tris = make_quad_soup()
        bvh = bvh_to_device(build_bvh(verts, tris, leaf_size=2))
        origins = rng.uniform(
            [0.05, 0.05, -2.0], [0.95, 0.95, -1.0], (128, 3)
        ).astype(np.float32)
        dirs = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (128, 1))
        t_w, p_w, h_w = bvh_intersect(
            bvh, jnp.asarray(origins), jnp.asarray(dirs),
            intersector="watertight",
        )
        t_m, p_m, h_m = bvh_intersect(
            bvh, jnp.asarray(origins), jnp.asarray(dirs), intersector="mt"
        )
        np.testing.assert_array_equal(np.asarray(h_w), np.asarray(h_m))
        np.testing.assert_array_equal(np.asarray(p_w), np.asarray(p_m))
        np.testing.assert_allclose(
            np.asarray(t_w)[np.asarray(h_w)],
            np.asarray(t_m)[np.asarray(h_m)], rtol=1e-5, atol=1e-5
        )

    @pytest.mark.slow
    def test_fixture_visibility_counts_stable(self, fml_model):
        """Switching the default intersector to watertight must not move
        fixture self-visibility beyond edge-grazing recoveries (watertight
        can only ADD hits on shared edges, not lose interior hits)."""
        m = fml_model
        flat = build_bvh(m.vertices, m.triangles, leaf_size=4)
        bvh = bvh_to_device(flat)
        nodes = jnp.arange(0, m.size, 37)
        cam = jnp.asarray(np.array([0.0, 0.0, 50.0], np.float32))
        vis_w, _ = node_visibility(
            bvh, jnp.asarray(m.triangles), jnp.asarray(m.vertices),
            nodes, cam,
        )
        n_w = int(np.asarray(vis_w).sum())
        assert n_w > 0
        # parity band: the watertight default sees at least as many nodes
        # as a plain-MT run minus nothing, and no more than a few extra
        import upsp_tpu.ops.raycast as rc

        t, prim, hit = bvh_intersect(
            bvh,
            jnp.broadcast_to(cam, (len(nodes), 3)),
            _unit(np.asarray(m.vertices)[np.asarray(nodes)] - np.asarray(cam)),
            intersector="mt",
        )
        tri_nodes = np.asarray(m.triangles)[np.maximum(np.asarray(prim), 0)]
        vis_m = np.asarray(hit) & (
            tri_nodes == np.asarray(nodes)[:, None]
        ).any(axis=1)
        # primary-pass watertight recoveries only ever add visibility
        assert n_w >= int(vis_m.sum())


def _unit(v):
    v = np.asarray(v, np.float32)
    return jnp.asarray(v / np.linalg.norm(v, axis=-1, keepdims=True))
