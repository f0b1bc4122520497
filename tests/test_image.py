"""Image kernels vs OpenCV golden values."""

import cv2
import numpy as np
import jax.numpy as jnp

from stereovision_tpu.core import image as im

RNG = np.random.default_rng(1)


def _img(h=64, w=96):
    return RNG.uniform(0, 255, size=(h, w)).astype(np.float32)


class TestColorSampling:
    def test_grayscale_matches_cv2(self):
        bgr = RNG.integers(0, 255, size=(32, 48, 3)).astype(np.uint8)
        gray_cv = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY).astype(np.float32)
        gray = np.asarray(im.grayscale_bgr(jnp.asarray(bgr, jnp.float32)))
        np.testing.assert_allclose(gray, gray_cv, atol=0.51)  # cv2 rounds to uint8

    def test_remap_matches_cv2(self):
        img = _img()
        h, w = img.shape
        mx = (RNG.uniform(0, w - 1, size=(h, w))).astype(np.float32)
        my = (RNG.uniform(0, h - 1, size=(h, w))).astype(np.float32)
        out_cv = cv2.remap(img, mx, my, cv2.INTER_LINEAR)
        out = np.asarray(im.remap(jnp.asarray(img), jnp.asarray(mx), jnp.asarray(my)))
        np.testing.assert_allclose(out, out_cv, atol=1e-3)

    def test_remap_out_of_bounds_zero(self):
        img = _img(16, 16)
        mx = np.full((4, 4), -5.0, np.float32)
        my = np.full((4, 4), 2.0, np.float32)
        out = np.asarray(im.remap(jnp.asarray(img), jnp.asarray(mx), jnp.asarray(my)))
        assert np.all(out == 0.0)

    def test_resize_matches_cv2(self):
        img = _img(60, 90)
        out_cv = cv2.resize(img, (45, 30), interpolation=cv2.INTER_LINEAR)
        out = np.asarray(im.resize(jnp.asarray(img), (30, 45)))
        np.testing.assert_allclose(out, out_cv, atol=0.35)


class TestFilters:
    def test_gaussian_matches_cv2(self):
        img = _img()
        out_cv = cv2.GaussianBlur(img, (5, 5), 0, borderType=cv2.BORDER_REPLICATE)
        out = np.asarray(im.gaussian_blur(jnp.asarray(img), 5))
        np.testing.assert_allclose(out, out_cv, atol=1e-2)

    def test_median_matches_cv2_interior(self):
        img = RNG.integers(0, 255, size=(40, 56)).astype(np.uint8)
        out_cv = cv2.medianBlur(img, 5).astype(np.float32)
        out = np.asarray(im.median_blur(jnp.asarray(img, jnp.float32), 5))
        # borders differ (cv2 pads differently for medianBlur) — compare interior
        np.testing.assert_allclose(out[2:-2, 2:-2], out_cv[2:-2, 2:-2], atol=0)

    def test_bilateral_close_to_cv2(self):
        img = _img(48, 48)
        out_cv = cv2.bilateralFilter(img, 9, 75, 75, borderType=cv2.BORDER_REPLICATE)
        out = np.asarray(im.bilateral_filter(jnp.asarray(img), 9, 75.0, 75.0))
        # cv2 uses a slightly different spatial window; require strong agreement
        err = np.abs(out[5:-5, 5:-5] - out_cv[5:-5, 5:-5])
        assert np.median(err) < 1.5, np.median(err)

    def test_sobel_matches_cv2(self):
        img = _img()
        gx_cv = cv2.Sobel(img, cv2.CV_32F, 1, 0, ksize=3, borderType=cv2.BORDER_REPLICATE)
        gy_cv = cv2.Sobel(img, cv2.CV_32F, 0, 1, ksize=3, borderType=cv2.BORDER_REPLICATE)
        gx, gy = im.sobel(jnp.asarray(img))
        np.testing.assert_allclose(np.asarray(gx), gx_cv, atol=1e-2)
        np.testing.assert_allclose(np.asarray(gy), gy_cv, atol=1e-2)


class TestStats:
    def test_histogram_entropy(self):
        img = RNG.integers(0, 255, size=(64, 64)).astype(np.uint8)
        h_cv = cv2.calcHist([img], [0], None, [256], [0, 256]).ravel()
        h = np.asarray(im.histogram256(jnp.asarray(img, jnp.float32)))
        np.testing.assert_allclose(h, h_cv)
        # entropy formula from the reference occlusion detector
        p = h_cv / h_cv.sum()
        ent_ref = -np.sum(p[p > 0] * np.log2(p[p > 0]))
        ent = float(im.shannon_entropy(jnp.asarray(img, jnp.float32)))
        np.testing.assert_allclose(ent, ent_ref, rtol=1e-6)

    def test_block_std(self):
        img = _img(96, 96)
        bs = np.asarray(im.block_std(jnp.asarray(img), 48))
        assert bs.shape == (2, 2)
        np.testing.assert_allclose(bs[0, 0], img[:48, :48].std(), rtol=1e-5)
        np.testing.assert_allclose(bs[1, 1], img[48:, 48:].std(), rtol=1e-5)

    def test_minmax_normalize(self):
        img = _img()
        out = np.asarray(im.minmax_normalize(jnp.asarray(img)))
        assert abs(out.min()) < 1e-5 and abs(out.max() - 255) < 1e-3


class TestCensus:
    def test_census_hamming_identical_images(self):
        img = _img(32, 32)
        c = im.census_transform(jnp.asarray(img), 7, 5)
        assert c.shape == (32, 32, 2)  # 34 bits → 2 words
        d = np.asarray(im.hamming_words(c, c))
        assert np.all(d == 0)

    def test_census_shift_sensitivity(self):
        """A horizontal shift produces matching census codes at the shifted column."""
        img = _img(40, 64)
        shift = 6
        left = jnp.asarray(img)
        right = jnp.asarray(np.roll(img, -shift, axis=1))
        cl = im.census_transform(left, 7, 5)
        cr = im.census_transform(right, 7, 5)
        # cost at the true disparity (interior only, away from the wrap)
        cost_true = np.asarray(im.hamming_words(cl[:, 16:48], cr[:, 16 - shift : 48 - shift]))
        cost_false = np.asarray(im.hamming_words(cl[:, 16:48], cr[:, 16:48]))
        assert cost_true[4:-4].mean() < 0.5
        assert cost_false[4:-4].mean() > 3.0

    def test_hamming32_known_values(self):
        a = jnp.asarray(np.array([0b1011, 0, -1], np.int32))
        b = jnp.asarray(np.array([0b0001, 0, 0], np.int32))
        d = np.asarray(im.hamming32(a, b))
        np.testing.assert_array_equal(d, [2, 0, 32])


class TestColormap:
    def test_turbo_endpoints(self):
        img = jnp.asarray(np.array([[0, 255]], np.uint8))
        rgb = np.asarray(im.apply_colormap(img, "turbo", bgr=False))
        # turbo: dark blue at 0 → dark red at 1
        assert rgb[0, 0, 2] > rgb[0, 0, 0]  # blue end
        assert rgb[0, 1, 0] > rgb[0, 1, 2]  # red end

    def test_jet_endpoints(self):
        img = jnp.asarray(np.array([[0, 128, 255]], np.uint8))
        rgb = np.asarray(im.apply_colormap(img, "jet", bgr=False))
        assert rgb[0, 0, 2] > 100 and rgb[0, 0, 0] < 50
        assert rgb[0, 2, 0] > 100 and rgb[0, 2, 2] < 50


class TestRemapSeparable:
    def test_matches_exact_remap_on_rectification_like_maps(self):
        """The separable shift-gather remap must match the exact gather remap
        on smooth (rectification-like) maps: exactly where the vertical
        displacement is row-constant, and to well under a pixel's intensity
        step on smoothly varying maps; out-of-image samples zero identically."""
        import numpy as np
        import jax.numpy as jnp

        from stereovision_tpu.core import image as im

        rng = np.random.default_rng(31)
        H, W = 64, 200
        img = jnp.asarray(
            np.cumsum(rng.uniform(-3, 3, (H, W)), axis=1).astype(np.float32))
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)

        def run(mx, my):
            prep = im.prepare_separable_remap(np.asarray(mx), np.asarray(my))
            assert prep is not None
            my_adj, valid, rx, ry = prep
            got = im.remap_separable(img, mx, jnp.asarray(my_adj),
                                     jnp.asarray(valid), rx, ry,
                                     interpret=True)
            return np.asarray(got), np.asarray(im.remap(img, mx, my))

        # case 1: vertical displacement constant along x → exact equality
        mx = jnp.asarray(xx + 2.25)
        my = jnp.asarray(yy + 3.5 * np.sin(yy / 11.0)[:, :1] * np.ones((1, W)))
        got, want = run(mx, my)
        np.testing.assert_allclose(got, want, atol=1e-3)

        # case 2: a rectification-like map with LARGE horizontal
        # displacement + zoom and a genuinely 2-D vertical component — the
        # Catmull–Smith adjusted vertical map keeps the error at
        # O(cross-derivative · 1 px), independent of |dx|
        mx = jnp.asarray(1.12 * xx + 4.0 * np.sin(yy / 23.0) - 11.0)
        my = jnp.asarray(yy + 3.0 * np.cos(xx / 37.0) - 0.7)
        got, want = run(mx, my)
        inr = want != 0.0
        assert np.median(np.abs(got - want)[inr]) < 0.2
        # identical zero-masking of out-of-image samples
        np.testing.assert_array_equal(got == 0.0, want == 0.0)
