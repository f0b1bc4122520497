"""PLY point-cloud export: writer round-trip + metric geometry through the
calibration Q matrix."""

import numpy as np
import jax.numpy as jnp

from stereovision_tpu.core import geometry as geom
from stereovision_tpu.io.pointcloud import read_ply, write_ply

RNG = np.random.default_rng(9)


class TestWriter:
    def test_roundtrip_with_colors_and_mask(self, tmp_path):
        pts = RNG.uniform(-5, 5, (40, 3)).astype(np.float32)
        pts[3, 1] = np.nan  # dropped: non-finite
        cols = RNG.integers(0, 256, (40, 3)).astype(np.uint8)
        valid = np.ones(40, bool)
        valid[7] = False  # dropped: masked
        n = write_ply(tmp_path / "c.ply", pts, colors=cols, valid=valid)
        assert n == 38
        rpts, rcols = read_ply(tmp_path / "c.ply")
        keep = np.isfinite(pts).all(1) & valid
        np.testing.assert_allclose(rpts, pts[keep], atol=0)
        np.testing.assert_array_equal(rcols, cols[keep])

    def test_gray_colors_replicate(self, tmp_path):
        pts = RNG.uniform(0, 1, (5, 3)).astype(np.float32)
        gray = np.array([0, 50, 100, 200, 255], np.uint8)
        write_ply(tmp_path / "g.ply", pts, colors=gray)
        _, rcols = read_ply(tmp_path / "g.ply")
        np.testing.assert_array_equal(rcols[:, 0], gray)
        np.testing.assert_array_equal(rcols[:, 0], rcols[:, 2])

    def test_plain_points(self, tmp_path):
        pts = RNG.uniform(-1, 1, (7, 3)).astype(np.float32)
        write_ply(tmp_path / "p.ply", pts)
        rpts, rcols = read_ply(tmp_path / "p.ply")
        assert rcols is None
        np.testing.assert_allclose(rpts, pts, atol=0)


class TestMetricReprojection:
    def test_constant_disparity_plane_depth(self, tmp_path):
        """A fronto-parallel plane at constant disparity reprojects through Q
        to Z = f·B/d at every pixel."""
        W, H = 64, 48
        f, B_cm, d = 100.0, 5.0, 8.0
        K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
        d0 = np.zeros(5)
        _, _, P1, _, Q = geom.stereo_rectify(
            jnp.asarray(K), jnp.asarray(d0), jnp.asarray(K), jnp.asarray(d0),
            (W, H), jnp.asarray(np.eye(3)), jnp.asarray([-B_cm, 0.0, 0.0]),
            alpha=0.0)
        f_rect = float(np.asarray(P1)[0, 0])  # alpha=0 re-scales the focal
        disp = jnp.full((H, W), d, jnp.float32)
        pts = np.asarray(geom.reproject_image_to_3d(disp, Q))
        np.testing.assert_allclose(pts[..., 2], f_rect * B_cm / d, rtol=1e-4)
        n = write_ply(tmp_path / "plane.ply", pts / 100.0)
        rpts, _ = read_ply(tmp_path / "plane.ply")
        assert n == H * W
        np.testing.assert_allclose(rpts[:, 2], f_rect * B_cm / d / 100.0, rtol=1e-4)
