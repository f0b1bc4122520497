"""Cross-method range calibration (reference fused_depth_map.py:1169-1257 and
:1503-1554/2793-2811), jit-compatible via NaN-masked percentiles."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked_percentiles(vals, mask, qs):
    nan_vals = jnp.where(mask, vals, jnp.nan)
    return jnp.nanpercentile(nan_vals, jnp.asarray(qs))


@jax.jit
def calibrate_midas_to_stereo(midas_depth, stereo_disparity, stereo_confidence):
    """Map MiDaS relative depth into the stereo disparity range.

    Reference logic: with ≥100 stereo anchors (conf > 0.7) a robust linear fit
    through the 10/90 percentiles of the anchored sets; otherwise a 5/95
    percentile min-max mapping of the full maps.
    """
    midas = midas_depth.astype(jnp.float32)
    stereo = stereo_disparity.astype(jnp.float32)
    reliable = stereo_confidence > 0.7
    n_rel = jnp.sum(reliable)

    def robust(_):
        s10, s90 = _masked_percentiles(stereo, reliable, (10.0, 90.0))
        m10, m90 = _masked_percentiles(midas, reliable, (10.0, 90.0))
        scale = jnp.where(m90 - m10 < 1e-6, 1.0, (s90 - s10) / (m90 - m10 + 1e-8))
        offset = s10 - m10 * scale
        return midas * scale + offset

    def minmax(_):
        # one sort per array: a vector of quantiles shares the sorted copy
        m5, m95 = jnp.percentile(midas, jnp.asarray((5.0, 95.0)))
        s5, s95 = jnp.percentile(stereo, jnp.asarray((5.0, 95.0)))
        flat = jnp.full_like(midas, (s5 + s95) / 2.0)
        normalized = (midas - m5) / (m95 - m5 + 1e-8)
        mapped = s5 + normalized * (s95 - s5)
        return jnp.where(m95 - m5 < 1e-6, flat, mapped)

    return jax.lax.cond(n_rel >= 100, robust, minmax, None)


@jax.jit
def normalize_to_stereo_range(depth_map, stereo_disparity, invert: bool = True):
    """Map an arbitrary relative depth map into the stereo 5/95-percentile
    range; ``invert`` flips to the near=large convention first (the flow path
    does 255 − x before fusing, reference :2800-2811)."""
    d = depth_map.astype(jnp.float32)
    lo, hi = jnp.percentile(d, jnp.asarray((5.0, 95.0)))
    norm = jnp.clip((d - lo) / (hi - lo + 1e-8), 0.0, 1.0) * 255.0
    norm = jnp.where(invert, 255.0 - norm, norm)
    s5, s95 = jnp.percentile(
        stereo_disparity.astype(jnp.float32), jnp.asarray((5.0, 95.0))
    )
    return s5 + norm / 255.0 * (s95 - s5)
