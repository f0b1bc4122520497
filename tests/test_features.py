"""Sparse feature pipeline: Harris, HOG matching, essential-RANSAC, triangulation."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from stereovision_tpu.core import geometry as geom
from stereovision_tpu.mono.features import (
    harris_corners,
    hog_descriptors,
    match_descriptors,
    ransac_essential,
    recover_pose_and_triangulate,
    sparse_motion_depth,
)

RNG = np.random.default_rng(51)


def checker_scene(h=240, w=320, n_blobs=120):
    img = np.full((h, w), 80.0, np.float32)
    for _ in range(n_blobs):
        y, x = RNG.integers(10, h - 14), RNG.integers(10, w - 14)
        sz = RNG.integers(3, 9)
        img[y : y + sz, x : x + sz] = RNG.uniform(0, 255)
    return cv2.GaussianBlur(img, (3, 3), 0.8)


class TestHarris:
    def test_finds_checker_corners(self):
        img = np.full((120, 160), 50.0, np.float32)
        img[30:60, 40:80] = 200.0  # one bright square → 4 strong corners
        img = cv2.GaussianBlur(img, (3, 3), 0.8)
        pts, scores = harris_corners(jnp.asarray(img), max_corners=16)
        pts, scores = np.asarray(pts), np.asarray(scores)
        strong = pts[scores > 0][:8]
        true_corners = np.array([[40, 30], [79, 30], [40, 59], [79, 59]], np.float32)
        for tc in true_corners:
            assert np.min(np.linalg.norm(strong - tc, axis=1)) < 3.0


class TestMatching:
    def test_matches_under_translation(self):
        img = checker_scene()
        M = np.float32([[1, 0, 7], [0, 1, 4]])
        img2 = cv2.warpAffine(img, M, (img.shape[1], img.shape[0]))
        p1, s1 = harris_corners(jnp.asarray(img), 256)
        p2, s2 = harris_corners(jnp.asarray(img2), 256)
        d1 = hog_descriptors(jnp.asarray(img), p1)
        d2 = hog_descriptors(jnp.asarray(img2), p2)
        idx, valid = match_descriptors(d1, d2, s1, s2)
        p1n, q2n = np.asarray(p1), np.asarray(p2)[np.asarray(idx)]
        v = np.asarray(valid)
        assert v.sum() > 40, v.sum()
        dxy = (q2n - p1n)[v]
        assert abs(np.median(dxy[:, 0]) - 7) < 0.6
        assert abs(np.median(dxy[:, 1]) - 4) < 0.6


class TestTwoView:
    def synth_two_view(self, n=256, noise=5e-4):
        K = np.array([[500.0, 0, 160], [0, 500.0, 120], [0, 0, 1]])
        R = np.asarray(geom.rodrigues(jnp.asarray([0.03, -0.05, 0.01])))
        t = np.array([0.6, 0.1, 0.2])
        t = t / np.linalg.norm(t)
        X = RNG.uniform([-2, -1.5, 4], [2, 1.5, 10], (n, 3))
        x1 = X[:, :2] / X[:, 2:]
        Xc2 = X @ R.T + t
        x2 = Xc2[:, :2] / Xc2[:, 2:]
        x1 += RNG.normal(0, noise, x1.shape)
        x2 += RNG.normal(0, noise, x2.shape)
        return K, R, t, X, x1.astype(np.float32), x2.astype(np.float32)

    def test_essential_and_pose(self):
        K, R, t, X, x1, x2 = self.synth_two_view()
        valid = jnp.ones(len(x1), bool)
        E, inl = ransac_essential(jnp.asarray(x1), jnp.asarray(x2), valid, jax.random.PRNGKey(0))
        assert int(jnp.sum(inl)) > 200
        R_est, t_est, X_est, good = recover_pose_and_triangulate(E, jnp.asarray(x1), jnp.asarray(x2), inl)
        np.testing.assert_allclose(np.asarray(R_est), R, atol=5e-3)
        t_e = np.asarray(t_est)
        assert min(np.linalg.norm(t_e - t), np.linalg.norm(t_e + t)) < 2e-2
        # triangulated depths match ground truth up to global scale
        g = np.asarray(good)
        scale = np.median(np.asarray(X_est)[g, 2] / X[g, 2])
        rel = np.abs(np.asarray(X_est)[g, 2] / scale - X[g, 2]) / X[g, 2]
        assert np.median(rel) < 0.02, np.median(rel)

    def test_full_sparse_pipeline(self):
        """Two depth layers under camera translation → pose + depth ordering.

        (A single plane is degenerate for the essential matrix, so the scene
        needs at least two depths.)
        """
        img = checker_scene(240, 320)
        # background parallax 4 px; a textured foreground block moves 12 px
        M = np.float32([[1, 0, 4], [0, 1, 0]])
        img2 = cv2.warpAffine(img, M, (img.shape[1], img.shape[0]))
        fg = checker_scene(80, 100, n_blobs=60)
        img[80:160, 110:210] = fg
        img2[80:160, 122:222] = fg  # foreground shift 12 px
        K = jnp.asarray([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]])
        out = sparse_motion_depth(jnp.asarray(img), jnp.asarray(img2), K, jax.random.PRNGKey(1))
        v = np.asarray(out["valid"])
        assert v.sum() > 20, v.sum()
        t = np.asarray(out["t_unit"])
        assert abs(t[0]) > 0.9, t  # dominant motion along ±x
        # depth ordering: foreground points closer than background
        pts = np.asarray(out["pts_prev"])
        depth = np.asarray(out["depth"])
        in_fg = (pts[:, 1] > 90) & (pts[:, 1] < 150) & (pts[:, 0] > 120) & (pts[:, 0] < 200)
        fg_d = depth[v & in_fg]
        bg_d = depth[v & ~in_fg]
        if len(fg_d) > 5 and len(bg_d) > 5:
            assert np.median(fg_d) < np.median(bg_d)
