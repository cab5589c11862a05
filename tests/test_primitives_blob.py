"""Geometry primitives + blob detection tests."""

import numpy as np
import pytest

from upsp_tpu.geometry.primitives import (
    Plane,
    box_polyhedron,
    get_perpendicular,
    plane_from_points,
    points_in_polyhedron,
    ray_box_intersect,
    ray_plane_intersect,
    ray_polyhedron_intersect,
    ray_triangle_intersect,
)
from upsp_tpu.ops.blob import find_targets


class TestPrimitives:
    def test_ray_plane(self):
        p = Plane(normal=np.array([0.0, 0, 1]), point=np.array([0.0, 0, 2]))
        t = ray_plane_intersect([0, 0, 0], [0, 0, 1], p)
        assert t == pytest.approx(2.0)
        assert ray_plane_intersect([0, 0, 0], [1, 0, 0], p) == np.inf

    def test_plane_from_points(self):
        p = plane_from_points([0, 0, 1], [1, 0, 1], [0, 1, 1])
        np.testing.assert_allclose(np.abs(p.normal), [0, 0, 1])

    def test_ray_box(self):
        tn, tf = ray_box_intersect([0, 0, -5], [0, 0, 1], [-1, -1, -1], [1, 1, 1])
        assert tn == pytest.approx(4.0) and tf == pytest.approx(6.0)
        tn, tf = ray_box_intersect([5, 5, -5], [0, 0, 1], [-1, -1, -1], [1, 1, 1])
        assert tn > tf  # miss

    def test_ray_triangle(self):
        t = ray_triangle_intersect([0.2, 0.2, -1], [0, 0, 1],
                                   [0, 0, 0], [1, 0, 0], [0, 1, 0])
        assert t == pytest.approx(1.0)
        assert ray_triangle_intersect([2, 2, -1], [0, 0, 1],
                                      [0, 0, 0], [1, 0, 0], [0, 1, 0]) < 0

    def test_polyhedron(self):
        poly = box_polyhedron([-1, -1, -1], [1, 1, 1])
        inside = points_in_polyhedron(np.array([[0, 0, 0], [2, 0, 0]]), poly)
        assert inside[0] and not inside[1]
        t = ray_polyhedron_intersect([0, 0, -5], [0, 0, 1], poly)
        assert t == pytest.approx(4.0)
        assert ray_polyhedron_intersect([5, 5, -5], [0, 0, 1], poly) == np.inf

    def test_perpendicular(self, rng):
        for _ in range(10):
            v = rng.normal(size=3)
            p = get_perpendicular(v)
            assert abs(np.dot(v, p)) < 1e-10
            assert np.linalg.norm(p) == pytest.approx(1.0)


class TestBlob:
    def test_finds_dark_dots(self, rng):
        img = np.full((64, 96), 3000.0)
        for cx, cy in ((20, 30), (70, 40)):
            yy, xx = np.mgrid[0:64, 0:96]
            img[(xx - cx) ** 2 + (yy - cy) ** 2 < 9] = 500.0
        img += rng.normal(0, 10, img.shape)
        found = find_targets(img, min_diameter=3, max_diameter=12)
        assert len(found) == 2
        centers = sorted(tuple(np.round(f["center"])) for f in found)
        assert centers[0] == (20, 30) and centers[1] == (70, 40)

    def test_size_filters(self, rng):
        img = np.full((64, 96), 3000.0)
        yy, xx = np.mgrid[0:64, 0:96]
        img[(xx - 50) ** 2 + (yy - 30) ** 2 < 4] = 500.0  # d~4
        assert len(find_targets(img, min_diameter=8)) == 0
        assert len(find_targets(img, min_diameter=2)) == 1
