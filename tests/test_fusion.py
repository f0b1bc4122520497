"""Fusion engine: occlusion metrics, range calibration, fusion scenarios —
behavior contracts from fused_depth_map.py (SURVEY §2.6)."""

import numpy as np
import jax.numpy as jnp

from stereovision_tpu.fusion import (
    occlusion_scores,
    classify_occlusion,
    OcclusionHysteresis,
    calibrate_midas_to_stereo,
    normalize_to_stereo_range,
    FusionParams,
    fuse_depth_maps,
    fused_to_meters,
)

RNG = np.random.default_rng(23)


def textured(h=240, w=320, lo=0, hi=255):
    return RNG.uniform(lo, hi, size=(h, w)).astype(np.float32)


class TestOcclusion:
    def test_clear_pair_scores_low(self):
        left, right = textured(), textured()
        ls, rs = occlusion_scores(jnp.asarray(left), jnp.asarray(right))
        assert float(ls) < 0.45 and float(rs) < 0.45
        assert classify_occlusion(float(ls), float(rs)) == "none"

    def test_covered_left_camera(self):
        left = np.full((240, 320), 20.0, np.float32)  # lens covered: dark, flat
        right = textured()
        ls, rs = occlusion_scores(jnp.asarray(left), jnp.asarray(right))
        assert float(ls) > 0.45, float(ls)
        assert classify_occlusion(float(ls), float(rs)) == "left"

    def test_both_covered(self):
        left = np.full((240, 320), 30.0, np.float32)
        right = np.full((240, 320), 35.0, np.float32)
        ls, rs = occlusion_scores(jnp.asarray(left), jnp.asarray(right))
        assert classify_occlusion(float(ls), float(rs)) == "both"

    def test_hysteresis_needs_5_frames(self):
        h = OcclusionHysteresis()
        assert h.state == "none"
        for i in range(4):
            assert h.update("left") == "none"
        assert h.update("left") == "left"
        assert not h.stereo_enabled
        for i in range(4):
            assert h.update("none") == "left"
        assert h.update("none") == "none"
        assert h.stereo_enabled


class TestRangeCalibration:
    def test_robust_linear_fit_with_anchors(self):
        stereo = textured(120, 160, 10, 100)
        midas = stereo * 2.0 + 30.0 + RNG.normal(0, 0.5, stereo.shape).astype(np.float32)
        conf = np.ones_like(stereo)
        cal = np.asarray(calibrate_midas_to_stereo(jnp.asarray(midas), jnp.asarray(stereo), jnp.asarray(conf)))
        err = np.abs(cal - stereo)
        assert np.median(err) < 2.0, np.median(err)

    def test_fallback_minmax_without_anchors(self):
        stereo = textured(120, 160, 10, 100)
        midas = textured(120, 160, 0, 1)
        conf = np.zeros_like(stereo)  # no anchors
        cal = np.asarray(calibrate_midas_to_stereo(jnp.asarray(midas), jnp.asarray(stereo), jnp.asarray(conf)))
        # mapped into the stereo 5/95 range
        assert cal.min() > stereo.min() - 10
        assert cal.max() < stereo.max() + 10

    def test_normalize_to_stereo_range_inverts(self):
        stereo = textured(60, 80, 20, 120)
        depth = np.tile(np.linspace(0, 1, 80, dtype=np.float32), (60, 1))
        out = np.asarray(normalize_to_stereo_range(jnp.asarray(depth), jnp.asarray(stereo)))
        # inverted: larger input → smaller output
        assert out[0, 0] > out[0, -1]


class TestFusion:
    def test_stereo_base_weighting(self):
        stereo = np.full((60, 80), 100.0, np.float32)
        conf = np.ones((60, 80), np.float32)
        fused, fconf, mode = fuse_depth_maps(
            jnp.asarray(stereo), jnp.asarray(conf), jnp.asarray(stereo),
            jnp.asarray(conf), jnp.asarray(stereo), jnp.asarray(False),
        )
        assert int(mode) == 1
        # high-confidence everywhere → no fill; value = stereo × 0.8
        np.testing.assert_allclose(np.asarray(fused), 80.0, atol=1.0)

    def test_midas_fills_low_confidence(self):
        stereo = np.full((64, 64), 200.0, np.float32)
        conf = np.ones((64, 64), np.float32)
        conf[20:44, 20:44] = 0.0  # dead stereo region
        midas = np.full((64, 64), 120.0, np.float32)
        fused, fconf, mode = fuse_depth_maps(
            jnp.asarray(stereo), jnp.asarray(conf), jnp.asarray(midas),
            jnp.asarray(np.ones((64, 64), np.float32)), None,
            jnp.asarray(False), have_flow=False,
        )
        f = np.asarray(fused)
        center = f[30:34, 30:34].mean()
        border = f[:10, :10].mean()
        assert center < 150  # blended toward midas=120
        assert abs(border - 160.0) < 5  # untouched stereo×0.8
        assert np.asarray(fconf)[30:34, 30:34].min() >= 0.8

    def test_flow_fills_holes_only_when_moving(self):
        stereo = np.full((64, 64), 100.0, np.float32)
        stereo[10:20, 10:20] = 0.0  # hole
        conf = np.ones((64, 64), np.float32)
        flow = np.full((64, 64), 90.0, np.float32)
        for moving, expect_fill in ((True, True), (False, False)):
            fused, fconf, _ = fuse_depth_maps(
                jnp.asarray(stereo), jnp.asarray(conf), None, None,
                jnp.asarray(flow), jnp.asarray(moving), have_midas=False,
            )
            hole_val = np.asarray(fused)[12:18, 12:18].mean()
            if expect_fill:
                assert hole_val > 20, hole_val  # flow leaked in
            else:
                assert hole_val < 20, hole_val

    def test_flow_only_mode(self):
        flow = textured(48, 48, 50, 200)
        fused, conf, mode = fuse_depth_maps(
            None, None, None, None, jnp.asarray(flow), jnp.asarray(True),
            have_stereo=False, have_midas=False,
        )
        assert int(mode) == 3
        assert float(jnp.max(fused)) > 0

    def test_legend_meters(self):
        v = jnp.asarray(np.array([[255.0]], np.float32))
        d = np.asarray(fused_to_meters(v, focal_px=700.0, baseline_cm=8.0, num_disparities=128.0))
        # disp=128 px → depth = 700·0.08/128 ≈ 0.4375 m
        np.testing.assert_allclose(d[0, 0], 0.4375, rtol=1e-3)
        v0 = jnp.asarray(np.array([[0.0]], np.float32))
        d0 = np.asarray(fused_to_meters(v0, 700.0, 8.0))
        assert d0[0, 0] == 30.0  # clamp far
