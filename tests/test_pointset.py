"""ICP / CPD / matching tests."""

import numpy as np
import pytest

from upsp_tpu.ops.pointset import (
    closest_point,
    closest_point_unique,
    coherent_point_drift,
    iterative_closest_point,
    unmatch_outliers,
)


def rigid(theta_deg, t):
    th = np.deg2rad(theta_deg)
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    return R, np.asarray(t, float)


class TestMatching:
    def test_closest_point(self):
        ref = np.array([[0.0, 0], [5, 5]])
        pts = np.array([[0.2, 0], [5, 5.3], [99, 99]])
        m = closest_point(ref, pts, max_dist=1.0)
        assert list(m) == [0, 1]

    def test_unique_no_repeats(self):
        ref = np.array([[0.0, 0], [0.4, 0]])
        pts = np.array([[0.1, 0.0]])
        m = closest_point_unique(ref, pts)
        assert sorted(m) == [-1, 0]
        assert m[0] == 0  # globally closest pair wins

    def test_unmatch_outliers(self):
        ref = np.array([[0.0, 0], [1, 0], [2, 0], [3, 0], [50, 0]])
        pts = ref + np.array([[0.01, 0]] * 4 + [[20, 0]])
        m = np.arange(5)
        out = unmatch_outliers(ref, pts, m, cutoff=1.5)
        assert out[4] == -1 and (out[:4] >= 0).all()


class TestICP:
    def test_recovers_rigid(self, rng):
        ref = rng.uniform(-5, 5, (60, 2))
        R, t = rigid(7.0, [0.4, -0.3])
        pts = (ref - t) @ R  # inverse transform of ref
        R_est, t_est, _ = iterative_closest_point(ref, pts)
        moved = pts @ R_est.T + t_est
        assert np.abs(moved - ref).max() < 1e-6


class TestCPD:
    def test_rigid_with_outliers(self, rng):
        ref = rng.uniform(-5, 5, (50, 2))
        R, t = rigid(4.0, [0.3, 0.2])
        pts = (ref @ R.T + t)[:45]  # missing points
        TY, B, t_est = coherent_point_drift(ref[:45], pts @ np.eye(2), mode="rigid")
        # CPD aligns pts onto ref: transformed points land near refs
        d = np.linalg.norm(TY - ref[:45], axis=1)
        assert np.median(d) < 0.4

    def test_affine(self, rng):
        ref = rng.uniform(-5, 5, (80, 2))
        A = np.array([[1.05, 0.08], [-0.06, 0.97]])
        t = np.array([0.5, -0.2])
        pts = np.linalg.solve(A, (ref - t).T).T
        TY, B, t_est = coherent_point_drift(ref, pts, mode="affine")
        assert np.median(np.linalg.norm(TY - ref, axis=1)) < 0.15
