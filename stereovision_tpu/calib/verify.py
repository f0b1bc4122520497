"""Calibration verification: the reference's manual epipolar check image
(stereo_calibration.py:316-338, green scanlines) as a measured quantity.

After rectification, corresponding chessboard corners must share a scanline;
the mean |Δy| over detected corner pairs is the rectification error in pixels.
"""

from __future__ import annotations

import numpy as np


def rectification_epipolar_error(cal: dict, pairs, pattern) -> dict:
    """cal: stereo calibration dict (R1/R2/P1/P2 + intrinsics); pairs:
    iterable of (left_gray, right_gray); pattern: chessboard (w, h).

    Returns {n_pairs, mean_abs_dy, max_abs_dy, mean_disparity}.
    """
    import jax.numpy as jnp

    from stereovision_tpu.calib.board import detect_chessboard
    from stereovision_tpu.core import geometry as geom

    dys, disps = [], []
    n = 0
    for left, right in pairs:
        fl, cl = detect_chessboard(left, pattern)
        fr, cr = detect_chessboard(right, pattern)
        if not (fl and fr):
            continue
        ul = np.asarray(geom.undistort_points(
            jnp.asarray(cl), jnp.asarray(cal["mtx_left"]),
            jnp.asarray(np.ravel(cal["dist_left"])),
            R=jnp.asarray(cal["R1"]), P=jnp.asarray(cal["P1"])))
        ur = np.asarray(geom.undistort_points(
            jnp.asarray(cr), jnp.asarray(cal["mtx_right"]),
            jnp.asarray(np.ravel(cal["dist_right"])),
            R=jnp.asarray(cal["R2"]), P=jnp.asarray(cal["P2"])))
        dys.append(ul[:, 1] - ur[:, 1])
        disps.append(ul[:, 0] - ur[:, 0])
        n += 1
    if not n:
        return {"n_pairs": 0}
    dy = np.concatenate(dys)
    return {
        "n_pairs": n,
        "mean_abs_dy": float(np.abs(dy).mean()),
        "max_abs_dy": float(np.abs(dy).max()),
        "mean_disparity": float(np.concatenate(disps).mean()),
    }
