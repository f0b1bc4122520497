"""Calibration solvers vs ground truth and cv2 golden values (SURVEY §4)."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from stereovision_tpu.calib import (
    CalibrationFlags,
    calibrate_camera,
    detect_chessboard,
    stereo_calibrate,
)
from stereovision_tpu.core import geometry as geom

RNG = np.random.default_rng(9)

BOARD_W, BOARD_H = 9, 6
SQUARE = 2.5  # cm, reference default (2camers.py:23)


def board_points():
    xs, ys = np.meshgrid(np.arange(BOARD_W), np.arange(BOARD_H))
    return np.stack([xs.ravel() * SQUARE, ys.ravel() * SQUARE, np.zeros(BOARD_W * BOARD_H)], -1)


def synth_views(K, dist, n_views=12, noise=0.05, seed=4):
    """Project the board under random poses; returns (obj, img_pts, rvecs, tvecs)."""
    rng = np.random.default_rng(seed)
    obj = board_points()
    imgs, rvecs, tvecs = [], [], []
    while len(imgs) < n_views:
        rvec = rng.uniform(-0.4, 0.4, 3)
        tvec = np.array([
            rng.uniform(-6, 6), rng.uniform(-4, 4), rng.uniform(28, 55)])
        tvec[:2] -= np.array([BOARD_W, BOARD_H]) * SQUARE / 2
        proj = np.asarray(geom.project_points(
            jnp.asarray(obj), jnp.asarray(rvec), jnp.asarray(tvec),
            jnp.asarray(K), jnp.asarray(dist)))
        if proj[:, 0].min() < 10 or proj[:, 0].max() > 1270 or proj[:, 1].min() < 10 or proj[:, 1].max() > 710:
            continue
        imgs.append(proj + rng.normal(0, noise, proj.shape))
        rvecs.append(rvec)
        tvecs.append(tvec)
    return obj, np.asarray(imgs), np.asarray(rvecs), np.asarray(tvecs)


class TestMonoCalibration:
    def setup_method(self):
        self.K = np.array([[800.0, 0, 640], [0, 805.0, 360], [0, 0, 1]])
        self.dist = np.array([0.08, -0.15, 0.001, -0.0005, 0.05])
        self.size = (1280, 720)

    def test_recovers_intrinsics(self):
        obj, img, _, _ = synth_views(self.K, self.dist)
        out = calibrate_camera(obj, img, self.size)
        assert out["reprojection_error"] < 0.1, out["reprojection_error"]
        np.testing.assert_allclose(out["camera_matrix"], self.K, rtol=2e-3)
        # distortion coefficients are mutually correlated; compare the
        # distortion *field* over the working area instead
        xy = RNG.uniform(-0.35, 0.35, size=(200, 2))
        true_f = np.asarray(geom.distort(jnp.asarray(xy), jnp.asarray(self.dist)))
        est_f = np.asarray(geom.distort(jnp.asarray(xy), jnp.asarray(out["distortion_coefficients"])))
        assert np.abs(true_f - est_f).max() < 5e-4, np.abs(true_f - est_f).max()

    def test_matches_cv2_rms(self):
        """Parity anchor: our RMS must match cv2.calibrateCamera's on the same
        data (the reference's quality gates are defined on this number,
        2camers.py:505-509)."""
        obj, img, _, _ = synth_views(self.K, self.dist, noise=0.3)
        ret_cv, K_cv, d_cv, _, _ = cv2.calibrateCamera(
            [obj.astype(np.float32)] * len(img),
            [i.astype(np.float32).reshape(-1, 1, 2) for i in img],
            self.size, None, None,
        )
        out = calibrate_camera(obj, img, self.size)
        assert out["reprojection_error"] <= ret_cv * 1.05, (out["reprojection_error"], ret_cv)
        np.testing.assert_allclose(out["camera_matrix"], K_cv, rtol=5e-3)

    def test_zero_noise_exact(self):
        obj, img, rv, tv = synth_views(self.K, self.dist, noise=0.0)
        out = calibrate_camera(obj, img, self.size)
        assert out["reprojection_error"] < 1e-4
        np.testing.assert_allclose(out["camera_matrix"], self.K, rtol=1e-5)
        np.testing.assert_allclose(out["distortion_coefficients"], self.dist, atol=1e-4)
        np.testing.assert_allclose(out["rotation_vectors"], rv, atol=1e-4)


class TestStereoCalibration:
    def setup_method(self):
        self.K1 = np.array([[790.0, 0, 645], [0, 792.0, 355], [0, 0, 1]])
        self.K2 = np.array([[810.0, 0, 635], [0, 808.0, 365], [0, 0, 1]])
        self.d1 = np.array([0.06, -0.1, 0.0, 0.0, 0.02])
        self.d2 = np.array([0.05, -0.08, 0.0, 0.0, 0.01])
        self.R = np.asarray(geom.rodrigues(jnp.asarray([0.01, 0.04, -0.005])))
        self.T = np.array([-6.2, 0.05, 0.1])  # cm
        self.size = (1280, 720)

    def views(self, noise=0.05, n=12):
        obj, imgL, rvecs, tvecs = synth_views(self.K1, self.d1, n_views=n, noise=noise, seed=21)
        imgR = []
        r_rel = np.asarray(geom.inverse_rodrigues(jnp.asarray(self.R)))
        for rv, tv in zip(rvecs, tvecs):
            rr, tr = geom.se3_compose(jnp.asarray(rv), jnp.asarray(tv), jnp.asarray(r_rel), jnp.asarray(self.T))
            proj = np.asarray(geom.project_points(
                jnp.asarray(obj), rr, tr, jnp.asarray(self.K2), jnp.asarray(self.d2)))
            imgR.append(proj + RNG.normal(0, noise, proj.shape))
        return obj, imgL, np.asarray(imgR)

    def test_fix_intrinsic_recovers_rt(self):
        obj, imL, imR = self.views()
        out = stereo_calibrate(
            obj, imL, imR, self.size, self.K1, self.d1, self.K2, self.d2,
            flags=CalibrationFlags(fix_intrinsic=True),
        )
        assert out["ret"] < 0.15, out["ret"]
        np.testing.assert_allclose(out["R"], self.R, atol=1e-3)
        np.testing.assert_allclose(out["T"].ravel(), self.T, atol=0.02)
        baseline = np.linalg.norm(out["T"])
        assert 1.0 < baseline < 50.0  # reference sanity window (stereo_calibration.py:258)

    def test_matches_cv2_stereo(self):
        obj, imL, imR = self.views(noise=0.2)
        ret_cv, *_rest = cv2.stereoCalibrate(
            [obj.astype(np.float32)] * len(imL),
            [i.astype(np.float32).reshape(-1, 1, 2) for i in imL],
            [i.astype(np.float32).reshape(-1, 1, 2) for i in imR],
            self.K1, self.d1, self.K2, self.d2, self.size,
            flags=cv2.CALIB_FIX_INTRINSIC,
            criteria=(cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 100, 1e-5),
        )
        R_cv, T_cv = _rest[4], _rest[5]
        out = stereo_calibrate(
            obj, imL, imR, self.size, self.K1, self.d1, self.K2, self.d2,
            flags=CalibrationFlags(fix_intrinsic=True),
        )
        assert out["ret"] <= ret_cv * 1.05, (out["ret"], ret_cv)
        np.testing.assert_allclose(out["R"], R_cv, atol=2e-4)
        np.testing.assert_allclose(out["T"].ravel(), T_cv.ravel(), atol=5e-3)

    def test_universal_joint_mode(self):
        """The one-shot mode: no prior intrinsics, reference flag set
        (universal_stereo_calibration.py:207-212)."""
        obj, imL, imR = self.views(noise=0.05, n=14)
        out = stereo_calibrate(
            obj, imL, imR, self.size, flags=CalibrationFlags.UNIVERSAL,
        )
        assert out["ret"] < 1.0, out["ret"]
        baseline = np.linalg.norm(out["T"])
        np.testing.assert_allclose(baseline, np.linalg.norm(self.T), rtol=0.05)
        # same-focal tie honored
        assert out["mtx_left"][0, 0] == out["mtx_right"][0, 0]
        # zero tangent dist honored
        assert np.all(out["dist_left"].ravel()[2:4] == 0)


class TestBoardDetection:
    def _render_board(self, Hmat, size=(640, 480), squares=(BOARD_W + 1, BOARD_H + 1), px=40):
        """Render a warped chessboard with cv2.warpPerspective."""
        bw, bh = squares[0] * px, squares[1] * px
        pattern = np.zeros((bh, bw), np.uint8)
        for yy in range(squares[1]):
            for xx in range(squares[0]):
                if (xx + yy) % 2 == 0:
                    pattern[yy * px : (yy + 1) * px, xx * px : (xx + 1) * px] = 255
        img = cv2.warpPerspective(
            pattern, Hmat, size, flags=cv2.INTER_LINEAR, borderValue=128
        )
        return cv2.GaussianBlur(img, (3, 3), 0.8)

    def test_detects_and_matches_cv2(self):
        Hmat = np.array([[0.9, 0.05, 80], [-0.04, 0.92, 60], [1e-5, 2e-5, 1.0]])
        img = self._render_board(Hmat)
        found, corners = detect_chessboard(img, (BOARD_W, BOARD_H))
        assert found
        found_cv, corners_cv = cv2.findChessboardCorners(img, (BOARD_W, BOARD_H))
        assert found_cv
        corners_cv = cv2.cornerSubPix(
            img, corners_cv.astype(np.float32), (11, 11), (-1, -1),
            (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 30, 0.001),
        ).reshape(-1, 2)
        # same set of points (order may be reversed) — match by nearest
        ours = corners
        d = np.linalg.norm(ours[None, :, :] - corners_cv[:, None, :], axis=-1)
        nearest = d.min(axis=1)
        assert np.median(nearest) < 0.5, np.median(nearest)
        assert nearest.max() < 2.0, nearest.max()

    def test_grid_order_is_rowmajor(self):
        Hmat = np.array([[1.0, 0.0, 60.0], [0.0, 1.0, 50.0], [0.0, 0.0, 1.0]])
        img = self._render_board(Hmat)
        found, corners = detect_chessboard(img, (BOARD_W, BOARD_H))
        assert found
        grid = corners.reshape(BOARD_H, BOARD_W, 2)
        # x increases along rows, y increases down columns (possibly reversed
        # overall; accept either consistent orientation)
        dx = np.diff(grid[..., 0], axis=1)
        dy = np.diff(grid[..., 1], axis=0)
        assert (dx > 0).all() or (dx < 0).all()
        assert (dy > 0).all() or (dy < 0).all()

    def test_rejects_featureless_image(self):
        img = np.full((240, 320), 127, np.uint8)
        found, _ = detect_chessboard(img, (BOARD_W, BOARD_H))
        assert not found

    def test_low_contrast_low_light_board(self):
        """The adaptive local-normalize fallback (reference
        stereo_calibration.py:147-158 ADAPTIVE_THRESH+NORMALIZE retry) must
        rescue a dim, vignetted board under a strong lighting gradient —
        a regime chosen so the PLAIN detection pass fails (the NMS threshold
        is relative to the brightest corner) and only the fallback succeeds."""
        from stereovision_tpu.calib import board as board_mod

        rng = np.random.default_rng(9)
        Hmat = np.array([[0.9, 0.05, 80], [-0.04, 0.92, 60], [1e-5, 2e-5, 1.0]])
        base = self._render_board(Hmat).astype(np.float32)
        yy, xx = np.mgrid[0 : base.shape[0], 0 : base.shape[1]].astype(np.float32)
        cx, cy = base.shape[1] / 2, base.shape[0] / 2
        vign = 1.0 - 0.4 * (((xx - cx) / cx) ** 2 + ((yy - cy) / cy) ** 2)
        noise = rng.normal(0, 0.6, base.shape)

        def degrade(gr):
            """~[22, 30] contrast, radial vignette, gr× lighting gradient."""
            img = (22.0 + base / 255.0 * 8.0) * vign * (1.0 + gr * xx / base.shape[1])
            return np.clip(img + noise, 0, 255)

        def plain_pass_fails(img):
            resp = np.asarray(board_mod.corner_response(jnp.asarray(img)))
            cands = board_mod._ring_filter(
                img, board_mod._nms_candidates(resp, BOARD_W * BOARD_H + 16)
            )
            return len(cands) < BOARD_W * BOARD_H or (
                board_mod._order_grid(cands, (BOARD_W, BOARD_H)) is None
            )

        # strengthen the gradient until the plain pass fails (the NMS
        # threshold is relative to the brightest corner, so a strong enough
        # gradient always defeats it) — the fallback must then still succeed
        img = next(
            (degrade(g) for g in (3.0, 4.0, 5.0, 6.0, 8.0, 12.0)
             if plain_pass_fails(degrade(g))),
            None,
        )
        assert img is not None, "could not construct a plain-pass failure"

        found, corners = detect_chessboard(img.astype(np.uint8), (BOARD_W, BOARD_H))
        assert found
        # corner positions must still be accurate: compare against the clean
        # render's cv2 detection
        clean = self._render_board(Hmat)
        ok_cv, corners_cv = cv2.findChessboardCorners(clean, (BOARD_W, BOARD_H))
        assert ok_cv
        d = np.linalg.norm(
            corners[None, :, :] - corners_cv.reshape(-1, 2)[:, None, :], axis=-1
        )
        assert np.median(d.min(axis=1)) < 1.0

    def test_strongly_tilted_board(self):
        """Heavy perspective tilt (grazing view) still detects and orders."""
        Hmat = np.array(
            [[0.55, 0.18, 110.0], [-0.12, 0.62, 90.0], [4e-4, 3e-4, 1.0]]
        )
        img = self._render_board(Hmat)
        found, corners = detect_chessboard(img, (BOARD_W, BOARD_H))
        assert found
        grid = corners.reshape(BOARD_H, BOARD_W, 2)
        dx = np.diff(grid[..., 0], axis=1)
        dy = np.diff(grid[..., 1], axis=0)
        assert (dx > 0).all() or (dx < 0).all()
        assert (dy > 0).all() or (dy < 0).all()
