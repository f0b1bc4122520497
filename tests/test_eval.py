"""stereo.eval: metric definitions, PFM I/O, and the evaluation CLI."""

import numpy as np
import pytest

from stereovision_tpu.stereo.eval import evaluate_disparity, read_pfm, write_pfm


class TestPFM:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 300, (37, 53)).astype(np.float32)
        img[3, 4] = np.inf  # Middlebury unknown marker survives
        p = tmp_path / "d.pfm"
        write_pfm(str(p), img)
        back = read_pfm(str(p))
        np.testing.assert_array_equal(back, img)

    def test_rejects_color_pfm(self, tmp_path):
        p = tmp_path / "c.pfm"
        p.write_bytes(b"PF\n2 2\n-1.0\n" + b"\x00" * 48)
        with pytest.raises(ValueError):
            read_pfm(str(p))


class TestMetrics:
    def test_perfect_estimate(self):
        gt = np.full((20, 30), 7.0, np.float32)
        m = evaluate_disparity(gt.copy(), gt)
        assert m["epe"] == 0.0 and m["bad2"] == 0.0 and m["d1_all"] == 0.0
        assert m["coverage"] == 1.0

    def test_known_error_fractions(self):
        gt = np.full((10, 10), 10.0, np.float32)
        disp = gt.copy()
        disp[0, :5] = 13.5   # err 3.5 > 2 and > 3 but not > 0.05·10? 3.5 > 0.5 ✓ D1
        m = evaluate_disparity(disp, gt)
        assert abs(m["bad2"] - 0.05) < 1e-6
        assert abs(m["d1_all"] - 0.05) < 1e-6
        assert abs(m["epe"] - 3.5 * 5 / 100) < 1e-6

    def test_invalid_counted_as_error(self):
        gt = np.full((10, 10), 10.0, np.float32)
        disp = gt.copy()
        valid = np.ones_like(gt, bool)
        valid[0] = False  # estimator rejected one row
        m = evaluate_disparity(disp, gt, valid=valid)
        assert abs(m["bad2"] - 0.10) < 1e-6
        assert abs(m["coverage"] - 0.9) < 1e-6
        m2 = evaluate_disparity(disp, gt, valid=valid, count_invalid_as_error=False)
        assert m2["bad2"] == 0.0

    def test_gt_unknown_excluded(self):
        gt = np.full((10, 10), 10.0, np.float32)
        gt[5] = np.inf  # unknown
        disp = np.full_like(gt, 10.0)
        disp[5] = 999.0  # garbage where gt unknown — must not count
        m = evaluate_disparity(disp, gt)
        assert m["bad2"] == 0.0 and m["epe"] == 0.0


class TestEvalCLI:
    def test_cli_on_synthetic_pair(self, tmp_path, capsys):
        import imageio.v2 as iio

        from stereovision_tpu.apps.eval_disparity import main

        rng = np.random.default_rng(5)
        try:
            import cv2

            base = cv2.GaussianBlur(
                rng.uniform(0, 255, (96, 240)).astype(np.float32), (5, 5), 1.0
            )
        except Exception:
            base = rng.uniform(0, 255, (96, 240)).astype(np.float32)
        left = base[:, :200]
        right = base[:, 12:212]  # disparity 12
        iio.imwrite(tmp_path / "L.png", left.astype(np.uint8))
        iio.imwrite(tmp_path / "R.png", right.astype(np.uint8))
        write_pfm(str(tmp_path / "gt.pfm"), np.full((96, 200), 12.0, np.float32))
        rc = main([
            "--left", str(tmp_path / "L.png"), "--right", str(tmp_path / "R.png"),
            "--gt", str(tmp_path / "gt.pfm"), "--num-disparities", "32",
            "--mode", "full", "--json",
        ])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()[-1]
        import json

        m = json.loads(out)
        # uint8 quantization + borders: generous but meaningful gates
        assert m["epe"] < 0.5, m
        assert m["bad2"] < 0.25, m
