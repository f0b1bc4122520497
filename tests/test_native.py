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


class TestNativeLoader:
    def test_decode_matches_imageio(self, tmp_path):
        import imageio.v2 as iio
        from stereovision_tpu.io import native_loader

        if not native_loader.available():
            pytest.skip("no native toolchain")
        img = RNG.integers(0, 255, (48, 64), np.uint8)
        rgb = RNG.integers(0, 255, (32, 40, 3), np.uint8)
        iio.imwrite(tmp_path / "g.png", img)
        iio.imwrite(tmp_path / "c.png", rgb)
        iio.imwrite(tmp_path / "c.jpg", rgb, quality=95)
        # PNG is lossless — exact match
        out = native_loader.decode(tmp_path / "g.png", gray=True)
        np.testing.assert_allclose(out, img.astype(np.float32))
        outc = native_loader.decode(tmp_path / "c.png", gray=False)
        np.testing.assert_allclose(outc, rgb.astype(np.float32))
        # JPEG decoders agree closely
        outj = native_loader.decode(tmp_path / "c.jpg", gray=False)
        ref = iio.imread(tmp_path / "c.jpg").astype(np.float32)
        assert np.abs(outj - ref).mean() < 2.0

    def test_prefetching_loader_order_and_values(self, tmp_path):
        import imageio.v2 as iio
        from stereovision_tpu.io import native_loader

        if not native_loader.available():
            pytest.skip("no native toolchain")
        paths = []
        for i in range(12):
            img = np.full((16, 16), i * 10, np.uint8)
            p = tmp_path / f"f_{i:02d}.png"
            iio.imwrite(p, img)
            paths.append(p)
        with native_loader.PrefetchingLoader(paths, gray=True, window=4, threads=3) as ld:
            frames = list(ld)
        assert len(frames) == 12
        for i, f in enumerate(frames):
            assert f.shape == (16, 16)
            assert float(f.mean()) == i * 10

    def test_pnm_decode(self, tmp_path):
        from stereovision_tpu.io import native_loader

        if not native_loader.available():
            pytest.skip("no native toolchain")
        img = RNG.integers(0, 255, (20, 30), np.uint8)
        with open(tmp_path / "t.pgm", "wb") as f:
            f.write(b"P5 30 20 255\n")
            f.write(img.tobytes())
        out = native_loader.decode(tmp_path / "t.pgm", gray=True)
        np.testing.assert_allclose(out, img.astype(np.float32))
