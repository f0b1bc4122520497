"""Native C++ speckle filter vs cv2.filterSpeckles golden values."""

import cv2
import numpy as np
import pytest

from stereovision_tpu.ops import native

pytestmark = pytest.mark.skipif(not native.available(), reason="no native toolchain")

RNG = np.random.default_rng(41)


class TestFilterSpeckles:
    def test_matches_cv2(self):
        disp = np.full((80, 120), 20.0, np.float32)
        # speckles: small islands of wildly different disparity
        disp[10:13, 10:14] = 90.0
        disp[40:42, 60:61] = 5.0
        disp[50:75, 20:50] = 60.0  # big region — must survive
        ours, removed = native.filter_speckles(disp, -1.0, 100, 32.0)
        cv_d = (disp * 16).astype(np.int16)  # cv2 wants the SGBM int16 format
        cv2.filterSpeckles(cv_d, -16.0, 100, 32 * 16)
        np.testing.assert_allclose(ours, cv_d.astype(np.float32) / 16.0)
        assert removed > 0

    def test_random_field_matches_cv2(self):
        disp = (RNG.uniform(0, 64, (60, 90)) // 8 * 8).astype(np.float32)
        ours, _ = native.filter_speckles(disp, -1.0, 30, 4.0)
        cv_d = (disp * 16).astype(np.int16)
        cv2.filterSpeckles(cv_d, -16.0, 30, 4 * 16)
        np.testing.assert_allclose(ours, cv_d.astype(np.float32) / 16.0)

    def test_everything_similar_untouched(self):
        disp = np.full((40, 40), 7.0, np.float32)
        ours, removed = native.filter_speckles(disp, -1.0, 100, 1.0)
        assert removed == 0
        np.testing.assert_allclose(ours, disp)
