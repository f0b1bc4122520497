"""End-to-end app-layer test: synthetic captures → calibrate CLI → depth CLI.

This is BASELINE config 3 (full stereo calibration + rectified disparity) as
an integration test, exercising the same flow a reference user runs via
2camers.py → stereo_calibration.py → depth_map.py.
"""

import numpy as np
import cv2
import imageio.v2 as iio
import jax.numpy as jnp
import pytest

from stereovision_tpu.core import geometry as geom

BOARD = (9, 6)
SQ = 2.5
W, H = 320, 240


def render_board_view(K, rvec, tvec, rng):
    """Render a chessboard via homography warp (distortion-free cameras)."""
    px = 30
    squares = (BOARD[0] + 1, BOARD[1] + 1)
    pattern = np.zeros((squares[1] * px, squares[0] * px), np.uint8)
    for yy in range(squares[1]):
        for xx in range(squares[0]):
            if (xx + yy) % 2 == 0:
                pattern[yy * px:(yy + 1) * px, xx * px:(xx + 1) * px] = 255
    bp = np.array([[0, 0], [(BOARD[0] - 1) * SQ, 0],
                   [(BOARD[0] - 1) * SQ, (BOARD[1] - 1) * SQ], [0, (BOARD[1] - 1) * SQ]])
    pp = np.array([[px, px], [BOARD[0] * px, px],
                   [BOARD[0] * px, BOARD[1] * px], [px, BOARD[1] * px]], np.float64)
    proj = np.asarray(geom.project_points(
        jnp.asarray(np.concatenate([bp, np.zeros((4, 1))], 1)),
        jnp.asarray(rvec), jnp.asarray(tvec), jnp.asarray(K), jnp.zeros(5)))
    if proj[:, 0].min() < 5 or proj[:, 0].max() > W - 5 or proj[:, 1].min() < 5 or proj[:, 1].max() > H - 5:
        return None
    Hm, _ = cv2.findHomography(pp, proj)
    img = cv2.warpPerspective(pattern, Hm, (W, H), borderValue=110)
    img = img.astype(np.float32) + rng.normal(0, 1.0, img.shape)
    return cv2.GaussianBlur(np.clip(img, 0, 255).astype(np.uint8), (3, 3), 0.7)


@pytest.fixture(scope="module")
def synthetic_captures(tmp_path_factory):
    root = tmp_path_factory.mktemp("captures")
    rng = np.random.default_rng(8)
    K1 = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]])
    K2 = np.array([[305.0, 0, 158], [0, 304.0, 122], [0, 0, 1]])
    R = np.asarray(geom.rodrigues(jnp.asarray([0.005, 0.02, -0.003])))
    T = np.array([-5.0, 0.02, 0.05])
    r_rel = np.asarray(geom.inverse_rodrigues(jnp.asarray(R)))
    n = 0
    while n < 12:
        rvec = rng.uniform(-0.2, 0.2, 3)
        tvec = np.array([rng.uniform(-2, 2) - 10, rng.uniform(-1.5, 1.5) - 6,
                         rng.uniform(28, 40)])
        li = render_board_view(K1, rvec, tvec, rng)
        rr_, tr_ = geom.se3_compose(jnp.asarray(rvec), jnp.asarray(tvec),
                                    jnp.asarray(r_rel), jnp.asarray(T))
        ri = render_board_view(K2, np.asarray(rr_), np.asarray(tr_), rng)
        if li is None or ri is None:
            continue
        iio.imwrite(root / f"left_{n:03d}.jpg", li)
        iio.imwrite(root / f"right_{n:03d}.jpg", ri)
        n += 1
    return root, (K1, K2, R, T)


class TestCalibrateCLI:
    def test_universal_then_depth(self, synthetic_captures, tmp_path):
        from stereovision_tpu.apps import calibrate as cal_app
        from stereovision_tpu.apps import depth as depth_app
        from stereovision_tpu.io.store import CalibrationStore

        captures, (K1, K2, R, T) = synthetic_captures
        out = tmp_path / "output"
        rc = cal_app.main([
            "universal", "--images", str(captures), "--board", "9x6",
            "--square-cm", str(SQ), "--out", str(out), "--reference-pkl",
        ])
        assert rc == 0
        store = CalibrationStore(out)
        cal = store.load("stereo_calibration_data")
        assert cal["ret"] < 1.0, cal["ret"]
        baseline = float(np.linalg.norm(cal["T"]))
        assert abs(baseline - np.linalg.norm(T)) / np.linalg.norm(T) < 0.05
        # reference pkl interchange round-trip
        pkl = store.load_reference_pkl(out / "stereo_calibration_data.pkl")
        assert set(pkl) >= {"R", "T", "Q", "mtx_left", "img_size"}
        np.testing.assert_allclose(pkl["R"], cal["R"])
        # txt sidecars written (stereo_calibration.py:305-309 parity)
        assert (out / "rotation_matrix.txt").exists()

        # depth CLI over the same captures (boards are flat targets — just
        # verify the pipeline runs and emits outputs)
        depth_out = tmp_path / "depth"
        rc = depth_app.main([
            "--calib", str(out), "--images", str(captures), "--out", str(depth_out),
            "--num-disparities", "48", "--save-npz",
        ])
        assert rc == 0
        outputs = sorted(depth_out.glob("depth_*.png"))
        assert len(outputs) == 12
        z = np.load(sorted(depth_out.glob("depth_*.npz"))[0])
        assert z["disparity"].shape == (H, W)


class TestStoreRoundtrip:
    def test_npz_schema_and_versioning(self, tmp_path):
        from stereovision_tpu.io.store import CalibrationStore

        store = CalibrationStore(tmp_path)
        data = {"camera_matrix": np.eye(3), "distortion_coefficients": np.zeros(5),
                "reprojection_error": 0.3}
        store.save("calibration_data_left", data)
        back = store.load("calibration_data_left")
        np.testing.assert_allclose(back["camera_matrix"], np.eye(3))
        assert back["_length_unit"] == "cm"
        assert store.exists("calibration_data_left")
        assert not store.exists("nope")


class TestMonoApps:
    def test_mono_motion_cli(self, tmp_path):
        from stereovision_tpu.apps import mono_motion

        rng = np.random.default_rng(1)
        frames = tmp_path / "frames"
        frames.mkdir()
        base = cv2.GaussianBlur(
            rng.uniform(0, 255, (96, 140)).astype(np.float32), (7, 7), 1.5)
        for i in range(4):
            M = np.float32([[1, 0, 2.0 * i], [0, 1, 0]])
            f = cv2.warpAffine(base, M, (128, 96))
            iio.imwrite(frames / f"f_{i:03d}.jpg", f.astype(np.uint8))
        out = tmp_path / "out"
        rc = mono_motion.main(["--images", str(frames), "--glob", "*.jpg", "--out", str(out)])
        assert rc == 0
        assert len(list(out.glob("motion_*.png"))) >= 1

    def test_mono_ai_cli_arch_selection(self, tmp_path, monkeypatch):
        """--arch reaches create_model (the reference demo's MiDaS_small vs
        DPT_Large selection, MONO/mono_depth_map_ai.py:24-69); the default
        'small' path runs end-to-end on a real frame."""
        from stereovision_tpu.apps import mono_ai

        rng = np.random.default_rng(2)
        frames = tmp_path / "frames"
        frames.mkdir()
        iio.imwrite(frames / "f_000.jpg",
                    rng.integers(0, 255, (96, 128, 3)).astype(np.uint8))
        out = tmp_path / "out"
        rc = mono_ai.main(["--images", str(frames), "--out", str(out)])
        assert rc == 0
        assert len(list(out.glob("depth_*.png"))) == 1

        # flag plumbing: every arch choice is forwarded verbatim
        import stereovision_tpu.mono.nn as nn

        seen = {}
        real = nn.create_model

        def spy(*a, **kw):
            seen.update(kw)
            return real()  # run the small net regardless — plumbing test

        monkeypatch.setattr(nn, "create_model", spy)
        rc = mono_ai.main(["--images", str(frames), "--out", str(out),
                           "--arch", "dpt_large"])
        assert rc == 0
        assert seen["arch"] == "dpt_large"
        assert seen["torch_state_dict"] is None


class TestFusedApp:
    def test_fused_pipeline_runs(self, synthetic_captures, tmp_path):
        """The full 3-method fusion CLI over the synthetic captures."""
        from stereovision_tpu.apps import calibrate as cal_app
        from stereovision_tpu.apps import fused as fused_app

        captures, _ = synthetic_captures
        out = tmp_path / "output"
        rc = cal_app.main([
            "universal", "--images", str(captures), "--board", "9x6",
            "--square-cm", str(SQ), "--out", str(out),
        ])
        assert rc == 0
        fused_out = tmp_path / "fused"
        rc = fused_app.main([
            "--calib", str(out), "--images", str(captures), "--out", str(fused_out),
            "--scale", "0.5", "--no-midas",
        ])
        assert rc == 0
        pngs = sorted(fused_out.glob("fused_*.png"))
        assert len(pngs) >= 10
        z = np.load(sorted(fused_out.glob("fused_*.npz"))[0])
        assert z["fused"].max() <= 255.0
        assert z["meters"].min() >= 0.05


class TestSfmApp:
    def test_sequence_sfm(self, tmp_path):
        """Translating camera over a textured 3-D scene → BA trajectory."""
        import imageio.v2 as iio

        rng = np.random.default_rng(71)
        frames_dir = tmp_path / "seq"
        frames_dir.mkdir()
        # two fronto-parallel textured planes at different depths rendered by
        # shifting each with its own parallax per frame
        far = cv2.GaussianBlur(rng.uniform(0, 255, (140, 260)).astype(np.float32), (5, 5), 1.0)
        near = cv2.GaussianBlur(rng.uniform(0, 255, (60, 80)).astype(np.float32), (5, 5), 1.0)
        for f in range(6):
            img = np.roll(far, -2 * f, axis=1)[:120, :200].copy()
            x0 = 60 - 5 * f
            img[35:95, x0 : x0 + 80] = near
            iio.imwrite(frames_dir / f"f_{f:03d}.jpg", img.astype(np.uint8))
        from stereovision_tpu.apps import sfm

        out = tmp_path / "sfm"
        rc = sfm.main([
            "--images", str(frames_dir), "--glob", "*.jpg",
            "--fx", "250", "--fy", "250", "--cx", "100", "--cy", "60",
            "--out", str(out), "--min-track-length", "3", "--ba-iters", "6",
        ])
        assert rc == 0
        z = np.load(out / "sfm_result.npz")
        assert z["poses"].shape[0] == 6
        assert z["rms"] < 3.0, z["rms"]
        # camera moves dominantly along x
        t = z["poses"][:, 3:]
        dx = np.diff(t[:, 0])
        assert np.abs(dx).sum() > np.abs(np.diff(t[:, 1])).sum()


class TestRectificationVerify:
    def test_epipolar_error_small_after_calibration(self, synthetic_captures, tmp_path):
        from stereovision_tpu.apps import calibrate as cal_app
        from stereovision_tpu.calib.verify import rectification_epipolar_error
        from stereovision_tpu.io.frames import PairedImageSource
        from stereovision_tpu.io.store import CalibrationStore

        captures, _ = synthetic_captures
        out = tmp_path / "out"
        assert cal_app.main([
            "universal", "--images", str(captures), "--board", "9x6",
            "--square-cm", str(SQ), "--out", str(out),
        ]) == 0
        cal = CalibrationStore(out).load("stereo_calibration_data")
        m = rectification_epipolar_error(cal, iter(PairedImageSource(captures)), BOARD)
        assert m["n_pairs"] >= 10
        assert m["mean_abs_dy"] < 0.3, m
        assert m["mean_disparity"] > 0  # left x > right x for positive depth


class TestDepthHierMode:
    def test_hier_mode_cli(self, synthetic_captures, tmp_path):
        from stereovision_tpu.apps import calibrate as cal_app
        from stereovision_tpu.apps import depth as depth_app

        captures, _ = synthetic_captures
        out = tmp_path / "out"
        assert cal_app.main([
            "universal", "--images", str(captures), "--board", "9x6",
            "--square-cm", str(SQ), "--out", str(out),
        ]) == 0
        depth_out = tmp_path / "d"
        rc = depth_app.main([
            "--calib", str(out), "--images", str(captures), "--out", str(depth_out),
            "--num-disparities", "192", "--mode", "hier", "--limit", "2",
        ])
        assert rc == 0
        assert len(list(depth_out.glob("depth_*.png"))) == 2

    def test_hier_small_range_falls_back_to_full(self):
        """num_disparities ≤ refine_range must not invert the window clip."""
        rng = np.random.default_rng(2)
        base = cv2.GaussianBlur(rng.uniform(0, 255, (64, 120)).astype(np.float32), (5, 5), 1.0)
        left, right = base[:, :112], base[:, 5:117]
        from stereovision_tpu.stereo import SGMParams, compute_disparity

        p = SGMParams(num_disparities=32, mode="hier")  # 32 < refine_range 128
        d, v = compute_disparity(jnp.asarray(left), jnp.asarray(right), p)
        d, v = np.asarray(d), np.asarray(v)
        good = d[10:-10, 40:-10][v[10:-10, 40:-10]]
        assert abs(np.median(good) - 5) < 1.0, np.median(good)


class TestVideoSource:
    def test_bogus_file_raises_cleanly(self, tmp_path):
        from stereovision_tpu.io import VideoSource

        bad = tmp_path / "not_a_video.mp4"
        bad.write_bytes(b"garbage")
        with pytest.raises(RuntimeError, match="video decoding unavailable"):
            list(VideoSource(bad))

    def test_step_validation(self, tmp_path):
        from stereovision_tpu.io import VideoSource

        with pytest.raises(ValueError, match="step"):
            list(VideoSource(tmp_path / "x.mp4", step=0))

    @staticmethod
    def _write_avi(path, frames):
        import cv2

        h, w = frames[0].shape[:2]
        vw = cv2.VideoWriter(
            str(path), cv2.VideoWriter_fourcc(*"MJPG"), 10, (w, h)
        )
        if not vw.isOpened():
            pytest.skip("cv2 has no MJPG encoder in this build")
        for f in frames:
            vw.write(np.ascontiguousarray(np.broadcast_to(
                f[:, :, None], f.shape + (3,)).astype(np.uint8)))
        vw.release()

    def test_mjpg_avi_decodes_via_cv2_fallback(self, tmp_path):
        from stereovision_tpu.io import VideoSource

        rng = np.random.default_rng(0)
        frames = [rng.integers(0, 255, (48, 64)).astype(np.uint8) for _ in range(6)]
        p = tmp_path / "seq.avi"
        self._write_avi(p, frames)
        out = list(VideoSource(p, step=2))
        assert len(out) == 3
        assert out[0].shape == (48, 64) and out[0].dtype == np.float32
        # MJPG is lossy; gray values should still be close
        assert np.abs(out[0] - frames[0]).mean() < 4.0

    def test_depth_cli_video_source(self, synthetic_captures, tmp_path):
        """--videos end-to-end: encode a rectified-ish stereo pair stream to
        MJPG AVIs and run the depth CLI on them."""
        import cv2

        from stereovision_tpu.apps import calibrate as cal_app
        from stereovision_tpu.apps import depth as depth_app

        captures, _ = synthetic_captures
        out = tmp_path / "out"
        assert cal_app.main([
            "universal", "--images", str(captures), "--board", "9x6",
            "--square-cm", str(SQ), "--out", str(out),
        ]) == 0
        # build left/right videos from the capture pairs
        lf = sorted(captures.glob("left_*.jpg"))[:3]
        rf = sorted(captures.glob("right_*.jpg"))[:3]
        lv, rv = tmp_path / "left.avi", tmp_path / "right.avi"
        self._write_avi(lv, [cv2.imread(str(p), 0) for p in lf])
        self._write_avi(rv, [cv2.imread(str(p), 0) for p in rf])
        depth_out = tmp_path / "dv"
        rc = depth_app.main([
            "--calib", str(out), "--videos", str(lv), str(rv),
            "--out", str(depth_out), "--num-disparities", "48",
            "--mode", "hier", "--limit", "2",
        ])
        assert rc == 0
        assert len(list(depth_out.glob("depth_*.png"))) == 2
