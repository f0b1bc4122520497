"""Streaming depth service (apps/serve.py): stdin JSON-lines protocol and
hot-folder watch mode over a synthetic calibrated rig."""

import io
import json

import numpy as np
import jax.numpy as jnp
import pytest

from stereovision_tpu.core import geometry as geom

RNG = np.random.default_rng(17)
W, H, DISP = 160, 120, 6


@pytest.fixture(scope="module")
def rig_store(tmp_path_factory):
    """Identity-ish rig saved to a CalibrationStore + one synthetic pair."""
    from stereovision_tpu.io.store import CalibrationStore

    root = tmp_path_factory.mktemp("serve_rig")
    K = np.array([[150.0, 0, W / 2], [0, 150.0, H / 2], [0, 0, 1]])
    R, T, d0 = np.eye(3), np.array([-5.0, 0.0, 0.0]), np.zeros(5)
    R1, R2, P1, P2, Q = geom.stereo_rectify(
        jnp.asarray(K), jnp.asarray(d0), jnp.asarray(K), jnp.asarray(d0),
        (W, H), jnp.asarray(R), jnp.asarray(T), alpha=0.0)
    store = CalibrationStore(root / "calib")
    store.save("stereo_calibration_data", {
        "ret": 0.1, "R": R, "T": T.reshape(3, 1), "E": np.eye(3), "F": np.eye(3),
        "R1": np.asarray(R1), "R2": np.asarray(R2), "P1": np.asarray(P1),
        "P2": np.asarray(P2), "Q": np.asarray(Q), "roi1": np.zeros(4),
        "roi2": np.zeros(4), "mtx_left": K, "dist_left": d0, "mtx_right": K,
        "dist_right": d0, "chessboard_size": np.array([9, 6]),
        "square_size": 2.5, "img_size": np.array([W, H]),
        "num_valid_pairs": 10,
    })
    from scipy.signal import convolve2d
    import imageio.v2 as iio

    k = np.ones((5, 5), np.float32) / 25.0
    base = RNG.uniform(0, 255, (H, W + DISP)).astype(np.float32)
    base = convolve2d(base, k, mode="same", boundary="symm")
    imgs = root / "frames"
    imgs.mkdir()
    iio.imwrite(imgs / "left_001.png", base[:, :-DISP].astype(np.uint8))
    iio.imwrite(imgs / "right_001.png", base[:, DISP:].astype(np.uint8))
    return root


def _run(argv, requests):
    from stereovision_tpu.apps import serve

    out = io.StringIO()
    rc = serve.main(argv, stdin=io.StringIO("\n".join(requests) + "\n"), stdout=out)
    assert rc == 0
    return [json.loads(x) for x in out.getvalue().splitlines()]


class TestStdinProtocol:
    def test_requests_ping_stats_shutdown(self, rig_store, tmp_path):
        l, r = rig_store / "frames/left_001.png", rig_store / "frames/right_001.png"
        reqs = [
            json.dumps({"cmd": "ping"}),
            json.dumps({"left": str(l), "right": str(r), "id": 1,
                        "out": str(tmp_path)}),
            json.dumps({"left": str(l), "right": str(r), "id": 2,
                        "out": str(tmp_path)}),
            json.dumps({"cmd": "stats"}),
            json.dumps({"cmd": "shutdown"}),
        ]
        resps = _run(["--calib", str(rig_store / "calib"), "--mode", "depth",
                      "--num-disparities", "32", "--save-npz"], reqs)
        assert resps[0]["pong"] is True
        frame = {x["id"]: x for x in resps if x.get("id")}
        assert frame[1]["ok"] and frame[2]["ok"]
        assert 0.0 < frame[1]["valid_frac"] <= 1.0
        z = np.load(frame[1]["out_npz"])
        good = z["disparity"][z["valid"]]
        assert good.size and abs(np.median(good) - DISP) < 1.0
        stats = resps[-1]
        assert stats["frames"] == 2 and stats["mean_ms"] > 0

    def test_bad_request_is_reported_not_fatal(self, rig_store, tmp_path):
        l, r = rig_store / "frames/left_001.png", rig_store / "frames/right_001.png"
        reqs = [
            "not json {",
            json.dumps({"left": "missing.png", "right": str(r), "id": 5}),
            json.dumps({"left": str(l), "right": str(r), "id": 6,
                        "out": str(tmp_path)}),
        ]
        resps = _run(["--calib", str(rig_store / "calib"),
                      "--num-disparities", "32"], reqs)
        assert resps[0]["ok"] is False and "bad json" in resps[0]["error"]
        assert resps[1]["ok"] is False and resps[1]["id"] == 5
        assert resps[2]["ok"] is True and resps[2]["id"] == 6
        assert resps[-1]["frames"] == 1


class TestWatchMode:
    def test_once_processes_all_pairs(self, rig_store, tmp_path):
        from stereovision_tpu.apps import serve

        out = io.StringIO()
        rc = serve.main([
            "--calib", str(rig_store / "calib"), "--num-disparities", "32",
            "--watch", str(rig_store / "frames"), "--once",
            "--out", str(tmp_path), "--save-npz", "--save-png",
        ], stdin=io.StringIO(""), stdout=out)
        assert rc == 0
        resps = [json.loads(x) for x in out.getvalue().splitlines()]
        assert resps[-1]["frames"] == 1
        assert resps[0]["ok"] and (tmp_path / "serve_001.npz").exists()
        assert (tmp_path / "serve_001.png").exists()
