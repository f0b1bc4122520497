"""Property/fuzz tests: the engine must not crash or emit NaNs across odd
shapes, parameter corners, and both implementations."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from stereovision_tpu.stereo import SGMParams, compute_disparity

RNG = np.random.default_rng(99)

CASES = [
    # (H, W, params) — deliberately awkward shapes and knob corners
    (37, 53, SGMParams(num_disparities=16, impl="xla")),
    (64, 41, SGMParams(num_disparities=16, impl="xla", median_ksize=3)),
    (48, 96, SGMParams(num_disparities=32, min_disparity=8, impl="xla")),
    (33, 130, SGMParams(num_disparities=16, impl="xla", subpixel=False,
                        uniqueness_ratio=0)),
    (50, 70, SGMParams(num_disparities=16, impl="xla", lr_max_diff=-1,
                       speckle_window_size=0)),
    (40, 128, SGMParams(num_disparities=48, mode="hier", coarse_scale=2,
                        refine_range=16, impl="xla")),
    (45, 77, SGMParams(num_disparities=16, impl="pallas_interpret")),
    (24, 32, SGMParams(num_disparities=16, census_ksize=3, census_wsize=3,
                       impl="xla", median_ksize=3)),
]


class TestFuzzShapesAndParams:
    @pytest.mark.parametrize("case", range(len(CASES)))
    def test_no_crash_no_nan(self, case):
        H, W, p = CASES[case]
        img = RNG.uniform(0, 255, (H, W + 6)).astype(np.float32)
        left, right = img[:, :W], img[:, 6 : 6 + W]
        disp, valid = compute_disparity(jnp.asarray(left), jnp.asarray(right), p)
        d = np.asarray(disp)
        assert d.shape == (H, W)
        assert not np.isnan(d).any()
        assert d.min() >= p.min_disparity - 1 - 1e-5
        assert d.max() < p.min_disparity + p.num_disparities

    def test_uint8_input(self):
        img = RNG.integers(0, 255, (40, 70), np.uint8)
        left = jnp.asarray(img[:, :64])
        right = jnp.asarray(img[:, 6:70])
        disp, valid = compute_disparity(left, right, SGMParams(num_disparities=16, impl="xla"))
        assert not np.isnan(np.asarray(disp)).any()

    def test_identical_images_zero_disparity(self):
        img = RNG.uniform(0, 255, (48, 80)).astype(np.float32)
        p = SGMParams(num_disparities=16, impl="xla")
        disp, valid = compute_disparity(jnp.asarray(img), jnp.asarray(img), p)
        d, v = np.asarray(disp), np.asarray(valid)
        assert abs(np.median(d[10:-10, 20:-10][v[10:-10, 20:-10]])) < 0.5

    def test_extreme_intensities(self):
        for val in (0.0, 255.0):
            img = np.full((32, 48), val, np.float32)
            p = SGMParams(num_disparities=16, impl="xla")
            disp, valid = compute_disparity(jnp.asarray(img), jnp.asarray(img), p)
            assert not np.isnan(np.asarray(disp)).any()
