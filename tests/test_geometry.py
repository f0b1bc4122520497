"""Geometry core vs OpenCV golden values (projection, Rodrigues, rectification).

These are the parity anchors called for by SURVEY.md §4: every residual the
calibration solvers optimize must agree with cv2's model to float precision.
"""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from stereovision_tpu.core import geometry as geom

RNG = np.random.default_rng(0)


def random_rvec(scale=1.0):
    return (RNG.standard_normal(3) * scale).astype(np.float64)


class TestRodrigues:
    @pytest.mark.parametrize("scale", [1e-8, 0.1, 1.0, 3.0])
    def test_matches_cv2(self, scale):
        for _ in range(10):
            r = random_rvec(scale)
            R_cv, _ = cv2.Rodrigues(r)
            R_jax = np.asarray(geom.rodrigues(jnp.asarray(r)))
            np.testing.assert_allclose(R_jax, R_cv, atol=1e-10)

    def test_inverse_roundtrip(self):
        for scale in [1e-6, 0.5, 2.0, 3.1]:
            r = random_rvec(scale)
            R = geom.rodrigues(jnp.asarray(r))
            r2 = np.asarray(geom.inverse_rodrigues(R))
            R2 = np.asarray(geom.rodrigues(jnp.asarray(r2)))
            np.testing.assert_allclose(R2, np.asarray(R), atol=1e-8)

    def test_near_pi(self):
        axis = np.array([0.3, -0.5, 0.81])
        axis /= np.linalg.norm(axis)
        r = axis * (np.pi - 1e-9)
        R = geom.rodrigues(jnp.asarray(r))
        r2 = np.asarray(geom.inverse_rodrigues(R))
        R2 = np.asarray(geom.rodrigues(jnp.asarray(r2)))
        np.testing.assert_allclose(R2, np.asarray(R), atol=1e-6)


class TestProjection:
    def setup_method(self):
        self.K = np.array([[800.0, 0, 640], [0, 810.0, 360], [0, 0, 1]])
        self.dist = np.array([0.1, -0.05, 0.001, -0.002, 0.03])
        self.rvec = np.array([0.1, -0.2, 0.05])
        self.tvec = np.array([0.3, -0.1, 2.5])
        self.pts = RNG.uniform(-1, 1, size=(50, 3)) * np.array([0.5, 0.5, 0.2]) + np.array([0, 0, 0])

    def test_project_points_matches_cv2(self):
        proj_cv, _ = cv2.projectPoints(self.pts, self.rvec, self.tvec, self.K, self.dist)
        proj = np.asarray(
            geom.project_points(
                jnp.asarray(self.pts), jnp.asarray(self.rvec), jnp.asarray(self.tvec),
                jnp.asarray(self.K), jnp.asarray(self.dist),
            )
        )
        np.testing.assert_allclose(proj, proj_cv[:, 0, :], atol=1e-8)

    def test_undistort_points_matches_cv2(self):
        pix = RNG.uniform([100, 100], [1180, 620], size=(40, 2))
        und_cv = cv2.undistortPoints(pix.reshape(-1, 1, 2), self.K, self.dist)[:, 0, :]
        und = np.asarray(geom.undistort_points(jnp.asarray(pix), jnp.asarray(self.K), jnp.asarray(self.dist)))
        np.testing.assert_allclose(und, und_cv, atol=1e-6)

    def test_distort_undistort_roundtrip(self):
        xy = RNG.uniform(-0.4, 0.4, size=(30, 2))
        xyd = geom.distort(jnp.asarray(xy), jnp.asarray(self.dist))
        back = np.asarray(geom.undistort_normalized(xyd, jnp.asarray(self.dist), iters=20))
        np.testing.assert_allclose(back, xy, atol=1e-8)


class TestTwoView:
    def test_triangulate(self):
        K = np.array([[700.0, 0, 320], [0, 700.0, 240], [0, 0, 1]])
        R = cv2.Rodrigues(np.array([0.02, -0.04, 0.01]))[0]
        T = np.array([-0.1, 0.002, 0.003])
        P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
        P2 = K @ np.hstack([R, T[:, None]])
        X = RNG.uniform([-1, -1, 2], [1, 1, 6], size=(25, 3))
        x1 = (P1 @ np.hstack([X, np.ones((25, 1))]).T).T
        x1 = x1[:, :2] / x1[:, 2:]
        x2 = (P2 @ np.hstack([X, np.ones((25, 1))]).T).T
        x2 = x2[:, :2] / x2[:, 2:]
        Xr = np.asarray(geom.triangulate(jnp.asarray(P1), jnp.asarray(P2), jnp.asarray(x1), jnp.asarray(x2)))
        np.testing.assert_allclose(Xr, X, atol=1e-6)

    def test_homography_dlt_matches_cv2(self):
        H_true = np.array([[1.02, 0.01, 5.0], [-0.02, 0.98, -3.0], [1e-5, -2e-5, 1.0]])
        src = RNG.uniform(0, 640, size=(30, 2))
        dst = np.asarray(geom.apply_homography(jnp.asarray(H_true), jnp.asarray(src)))
        H_est = np.asarray(geom.homography_dlt(jnp.asarray(src), jnp.asarray(dst)))
        np.testing.assert_allclose(H_est, H_true, atol=1e-6)
        # and with exactly 4 points (the RANSAC minimal solver case)
        H4 = np.asarray(geom.homography_dlt(jnp.asarray(src[:4]), jnp.asarray(dst[:4])))
        np.testing.assert_allclose(H4, H_true, atol=1e-5)

    def test_batched_homography(self):
        H_true = np.array([[1.02, 0.01, 5.0], [-0.02, 0.98, -3.0], [1e-5, -2e-5, 1.0]])
        src = RNG.uniform(0, 640, size=(8, 4, 2))
        dst = np.asarray(geom.apply_homography(jnp.asarray(H_true), jnp.asarray(src)))
        H_est = np.asarray(geom.homography_dlt(jnp.asarray(src), jnp.asarray(dst)))
        assert H_est.shape == (8, 3, 3)
        for k in range(8):
            np.testing.assert_allclose(H_est[k], H_true, atol=1e-5)


class TestRectification:
    def setup_method(self):
        self.K1 = np.array([[820.0, 0, 650], [0, 825.0, 370], [0, 0, 1]])
        self.K2 = np.array([[815.0, 0, 630], [0, 818.0, 355], [0, 0, 1]])
        self.d1 = np.array([0.05, -0.02, 0.001, -0.001, 0.002])
        self.d2 = np.array([0.04, -0.015, -0.001, 0.0005, 0.001])
        self.R = cv2.Rodrigues(np.array([0.01, 0.03, -0.008]))[0]
        self.T = np.array([-6.5, 0.04, 0.12])  # cm, like the reference
        self.size = (1280, 720)

    def test_stereo_rectify_matches_cv2(self):
        R1c, R2c, P1c, P2c, Qc, *_ = cv2.stereoRectify(
            self.K1, self.d1, self.K2, self.d2, self.size, self.R, self.T.reshape(3, 1),
            flags=cv2.CALIB_ZERO_DISPARITY, alpha=0,
        )
        R1, R2, P1, P2, Q = geom.stereo_rectify(
            jnp.asarray(self.K1), jnp.asarray(self.d1), jnp.asarray(self.K2),
            jnp.asarray(self.d2), self.size, jnp.asarray(self.R), jnp.asarray(self.T),
            alpha=0.0,
        )
        np.testing.assert_allclose(np.asarray(R1), R1c, atol=1e-6)
        np.testing.assert_allclose(np.asarray(R2), R2c, atol=1e-6)
        np.testing.assert_allclose(np.asarray(P1), P1c, rtol=2e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(P2), P2c, rtol=2e-3, atol=2e-1)
        # Q's nonzero structure and baseline entry
        np.testing.assert_allclose(np.asarray(Q)[3, 2], Qc[3, 2], rtol=1e-6)

    def test_epipolar_alignment(self):
        """The functional contract: rectified corresponding points share a row."""
        R1, R2, P1, P2, Q = geom.stereo_rectify(
            jnp.asarray(self.K1), jnp.asarray(self.d1), jnp.asarray(self.K2),
            jnp.asarray(self.d2), self.size, jnp.asarray(self.R), jnp.asarray(self.T),
            alpha=0.0,
        )
        X = RNG.uniform([-20, -10, 40], [20, 10, 120], size=(40, 3))  # cm
        rv0 = jnp.zeros(3)
        x1 = geom.project_points(jnp.asarray(X), rv0, jnp.zeros(3), jnp.asarray(self.K1), jnp.asarray(self.d1))
        rvec = geom.inverse_rodrigues(jnp.asarray(self.R))
        x2 = geom.project_points(jnp.asarray(X), rvec, jnp.asarray(self.T), jnp.asarray(self.K2), jnp.asarray(self.d2))
        u1 = np.asarray(geom.undistort_points(x1, jnp.asarray(self.K1), jnp.asarray(self.d1), R=R1, P=P1))
        u2 = np.asarray(geom.undistort_points(x2, jnp.asarray(self.K2), jnp.asarray(self.d2), R=R2, P=P2))
        assert np.max(np.abs(u1[:, 1] - u2[:, 1])) < 0.05  # rows align to 0.05 px
        disp = u1[:, 0] - u2[:, 0]
        f = float(np.asarray(P1)[0, 0])
        B = -float(np.asarray(P2)[0, 3]) / f
        z_est = f * B / disp
        # depth from disparity must match the true Z in the rectified frame
        Xr = (np.asarray(geom.rodrigues(rv0 * 0)) @ X.T).T  # world == cam1 frame here
        z_true = (np.asarray(R1) @ Xr.T).T[:, 2]
        np.testing.assert_allclose(z_est, z_true, rtol=1e-3)

    def test_init_undistort_rectify_map_matches_cv2(self):
        R1c, R2c, P1c, P2c, Qc, *_ = cv2.stereoRectify(
            self.K1, self.d1, self.K2, self.d2, self.size, self.R, self.T.reshape(3, 1),
            flags=cv2.CALIB_ZERO_DISPARITY, alpha=0,
        )
        mx_cv, my_cv = cv2.initUndistortRectifyMap(
            self.K1, self.d1, R1c, P1c, self.size, cv2.CV_32FC1
        )
        mx, my = geom.init_undistort_rectify_map(
            jnp.asarray(self.K1), jnp.asarray(self.d1), jnp.asarray(R1c), jnp.asarray(P1c), self.size
        )
        np.testing.assert_allclose(np.asarray(mx), mx_cv, atol=2e-2)
        np.testing.assert_allclose(np.asarray(my), my_cv, atol=2e-2)

    def test_get_optimal_new_camera_matrix(self):
        for alpha in (0.0, 1.0):
            nk_cv, _roi = cv2.getOptimalNewCameraMatrix(self.K1, self.d1, self.size, alpha)
            nk, _ = geom.get_optimal_new_camera_matrix(
                jnp.asarray(self.K1), jnp.asarray(self.d1), self.size, alpha
            )
            np.testing.assert_allclose(np.asarray(nk), nk_cv, rtol=5e-3, atol=2.0)


class TestReproject3D:
    def test_matches_cv2_reproject(self):
        K1 = np.array([[820.0, 0, 650], [0, 825.0, 370], [0, 0, 1]])
        K2 = np.array([[815.0, 0, 630], [0, 818.0, 355], [0, 0, 1]])
        d0 = np.zeros(5)
        R = np.eye(3)
        T = np.array([-6.5, 0.0, 0.0]).reshape(3, 1)
        *_, Qc, _, _ = cv2.stereoRectify(K1, d0, K2, d0, (640, 480), R, T,
                                         flags=cv2.CALIB_ZERO_DISPARITY, alpha=0)
        disp = RNG.uniform(5, 60, (48, 64)).astype(np.float32)
        pts_cv = cv2.reprojectImageTo3D(disp, Qc)
        pts = np.asarray(geom.reproject_image_to_3d(jnp.asarray(disp), jnp.asarray(Qc)))
        np.testing.assert_allclose(pts, pts_cv, rtol=1e-4, atol=1e-3)
