"""On-device exact speckle filter (stereo/speckle_ccl.py) vs the native C++
flood fill (native/speckle.cpp) — bit parity on random and adversarial
inputs, plus the DepthPipeline-facing postpass contract."""

import numpy as np
import pytest

from stereovision_tpu.ops import native
from stereovision_tpu.stereo.speckle_ccl import (component_sizes,
                                                 filter_speckles_exact,
                                                 label_components)


def _native_or_skip():
    if not native.available():
        pytest.skip("native speckle library unavailable")


def _ref(disp, new_val, max_size, max_diff):
    d = disp.copy()
    d2, removed = native.filter_speckles(d, new_val, max_size, max_diff)
    return d2, removed


class TestSpeckleCCL:
    def test_labels_are_canonical_component_mins(self):
        # hand-built map: two plateaus split by a >max_diff wall, one
        # single-pixel speckle
        d = np.zeros((6, 8), np.float32)
        d[:, 4:] = 100.0
        d[2, 2] = 50.0
        lab = np.asarray(label_components(d, 1.0))
        # left plateau minus the speckle: root = linear index 0
        assert lab[0, 0] == 0 and lab[5, 3] == 0
        assert lab[2, 2] == 2 * 8 + 2  # the speckle is its own component
        assert lab[0, 4] == 4 and lab[5, 7] == 4  # right plateau root
        sizes = np.asarray(component_sizes(label_components(d, 1.0)))
        assert sizes[2, 2] == 1
        assert sizes[0, 0] == 6 * 4 - 1
        assert sizes[0, 4] == 6 * 4

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_parity_with_native(self, seed):
        _native_or_skip()
        rng = np.random.default_rng(seed)
        # quantized random values make nontrivial chained components
        d = (rng.integers(0, 6, (48, 64)) * 3.0).astype(np.float32)
        for max_size, max_diff in ((8, 2.5), (25, 3.0), (3, 0.5)):
            want, removed_w = _ref(d, -1.0, max_size, max_diff)
            got, removed_g = filter_speckles_exact(d, -1.0, max_size,
                                                   max_diff)
            np.testing.assert_array_equal(np.asarray(got), want)
            assert int(removed_g) == removed_w

    def test_spiral_component_converges(self):
        _native_or_skip()
        # a spiral (worst case for alternating row/column propagation):
        # exactness must not depend on an iteration budget
        h = w = 31
        d = np.full((h, w), 100.0, np.float32)
        y = x = h // 2
        step = 1
        dy_dx = [(0, 1), (1, 0), (0, -1), (-1, 0)]
        pts = [(y, x)]
        di = 0
        while True:
            for _ in range(2):
                dy, dx = dy_dx[di % 4]
                for _ in range(step):
                    y, x = y + dy, x + dx
                    if not (0 <= y < h and 0 <= x < w):
                        break
                    pts.append((y, x))
                di += 1
            step += 1
            if not (0 <= y + 1 < h and 0 <= x + 1 < w):
                break
        for yy, xx in pts:
            d[yy, xx] = 0.0
        want, _ = _ref(d, -5.0, len(pts) + 1, 1.0)
        got, _ = filter_speckles_exact(d, -5.0, len(pts) + 1, 1.0)
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_gradual_ramp_chains_into_one_component(self):
        _native_or_skip()
        # chained similarity: each neighbor within max_diff but the ends far
        # apart — cv2 semantics keep it one component
        d = np.tile(np.arange(40, dtype=np.float32), (4, 1))
        got, removed = filter_speckles_exact(d, -1.0, 100, 1.0)
        want, removed_w = _ref(d, -1.0, 100, 1.0)
        np.testing.assert_array_equal(np.asarray(got), want)
        # 4×40 = 160 px chained into ONE component > 100 → survives whole
        assert int(removed) == removed_w == 0
        np.testing.assert_array_equal(np.asarray(got), d)
        # a stricter size gate kills all 160 at once
        got2, removed2 = filter_speckles_exact(d, -1.0, 160, 1.0)
        assert int(removed2) == 160 and float(np.asarray(got2).max()) == -1.0

    def test_postpass_device_matches_native(self):
        _native_or_skip()
        from stereovision_tpu.stereo import SGMParams
        from stereovision_tpu.stereo.sgm import exact_speckle_postpass

        rng = np.random.default_rng(7)
        d = (rng.integers(0, 5, (40, 52)) * 8.0).astype(np.float32)
        d[d < 8.0] = -1.0  # sentinel pixels form components too
        p = SGMParams(speckle_window_size=20, speckle_range=4.0)
        dd, vd = exact_speckle_postpass(d, p, impl="device")
        dn, vn = exact_speckle_postpass(d, p, impl="native")
        np.testing.assert_array_equal(np.asarray(dd), dn)
        np.testing.assert_array_equal(np.asarray(vd), vn)
