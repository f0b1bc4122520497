"""Metric-depth conversion for the fused map (reference draw_depth_legend_meters
math, fused_depth_map.py:2021-2050).

The reference multiplies by an empirical fudge CALIBRATION_SCALE = 3.75
(:1964) and mixes cm/m units (SURVEY §2.9). Here metric depth is exact from
calibration — baseline is stored in the calibration's length unit (cm for the
reference's chessboard-square convention) and converted once — with
``compat_scale`` available to reproduce the reference's displayed numbers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def fused_to_meters(
    fused_u8,
    focal_px,
    baseline_cm,
    min_disparity: float = 0.0,
    num_disparities: float = 128.0,
    compat_scale: float = 1.0,
):
    """fused value v ∈ [0,255] → depth in meters.

    disp_px = min_d + v/255·num_d (:2021-2022); depth = f·B/d scaled by
    ``compat_scale`` (reference uses 3.75), clamped to [0.05, 30] m (:2047-2050).
    """
    disp = min_disparity + fused_u8.astype(jnp.float32) / 255.0 * num_disparities
    baseline_m = baseline_cm / 100.0
    depth = focal_px * baseline_m / (disp + 1e-6) * compat_scale
    return jnp.clip(depth, 0.05, 30.0)
