"""Confidence-weighted depth fusion (reference fuse_depth_maps,
fused_depth_map.py:1560-1718) as one jitted kernel.

The reference's data-dependent branches (``np.any(mask)``) are pure
optimizations — blending with an empty mask is the identity — so the jit
version applies the masked blends unconditionally. Which *methods* participate
is static (the caller knows what it computed), so the scenario tree
(stereo-base / midas-base / flow-base) stays Python-level.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from stereovision_tpu.core import image as im


@dataclasses.dataclass(frozen=True)
class FusionParams:
    """Live-tunable fusion knobs (reference fusion_params :110-116 and the
    FUSION_* constant groups :81-100)."""

    stereo_weight: float = 0.8          # FUSION_WEIGHTS['stereo_base']
    midas_fill_weight: float = 0.9      # FUSION_WEIGHTS['midas_max_fill']
    flow_fill_weight: float = 0.5       # FUSION_WEIGHTS['flow_max_fill']
    stereo_conf_threshold: float = 0.5  # FUSION_THRESHOLDS['stereo_low_conf']
    flow_hole_threshold: float = 15.0   # FUSION_THRESHOLDS['flow_hole_threshold']
    midas_blend_radius: int = 15        # FUSION_SMOOTHING['midas_blend_radius']
    bilateral_d: int = 9
    bilateral_sigma: float = 75.0
    use_midas_fill: bool = True
    use_flow_fill: bool = True


@functools.partial(
    jax.jit, static_argnames=("params", "have_stereo", "have_midas", "have_flow")
)
def fuse_depth_maps(
    stereo_depth,
    stereo_conf,
    midas_calibrated,
    midas_conf,
    flow_normalized,
    camera_moving,
    params: FusionParams = FusionParams(),
    have_stereo: bool = True,
    have_midas: bool = True,
    have_flow: bool = True,
):
    """Returns (fused [0,255] float32, fused_conf [0,1], mode_code int32).

    mode codes: 0 none, 1 stereo-base, 2 midas-base, 3 flow-base (the
    reference's mode string is derived host-side from the code + params).
    Flow participates only while the camera is moving (a traced bool), matching
    ``valid_flow = … and camera_moving`` (:1604).
    """
    p = params
    if not (have_stereo or have_midas or have_flow):
        raise ValueError("fusion needs at least one method")

    shape = (
        stereo_depth.shape if have_stereo
        else (midas_calibrated.shape if have_midas else flow_normalized.shape)
    )
    zeros = jnp.zeros(shape, jnp.float32)
    flow_ok = jnp.asarray(camera_moving) if have_flow else jnp.asarray(False)

    if have_stereo:
        fused = stereo_depth.astype(jnp.float32) * p.stereo_weight
        conf = (stereo_conf if stereo_conf is not None else jnp.ones(shape)).astype(jnp.float32)
        mode = jnp.int32(1)
        if have_midas and p.use_midas_fill:
            low_conf = conf < p.stereo_conf_threshold
            fill_w = (1.0 - conf) * p.midas_fill_weight
            fill_w = jnp.clip(im.gaussian_blur(fill_w, p.midas_blend_radius), 0.0, 1.0)
            mask = low_conf & (fill_w > 0.1)
            fused = jnp.where(
                mask, fused * (1 - fill_w) + midas_calibrated * fill_w, fused
            )
            conf = jnp.where(mask, jnp.maximum(conf, 0.8), conf)
        if have_flow and p.use_flow_fill:
            holes = ((fused < p.flow_hole_threshold) | (fused == 0)) & flow_ok
            fw = p.flow_fill_weight
            fused = jnp.where(holes, fused * (1 - fw) + flow_normalized * fw, fused)
            conf = jnp.where(holes, jnp.maximum(conf, 0.6), conf)
    elif have_midas:
        fused = midas_calibrated.astype(jnp.float32)
        conf = (
            midas_conf if midas_conf is not None else jnp.full(shape, 0.8)
        ).astype(jnp.float32)
        mode = jnp.int32(2)
        if have_flow and p.use_flow_fill:
            holes = ((fused < p.flow_hole_threshold) | (fused == 0)) & flow_ok
            fw = p.flow_fill_weight
            fused = jnp.where(holes, fused * (1 - fw) + flow_normalized * fw, fused)
            conf = jnp.where(holes, jnp.maximum(conf, 0.7), conf)
    else:
        fused = jnp.where(flow_ok, flow_normalized.astype(jnp.float32), zeros)
        conf = jnp.full(shape, 0.7)
        mode = jnp.where(flow_ok, jnp.int32(3), jnp.int32(0))

    # final edge-preserving smooth when the map carries real signal (:1686-1693)
    smoothed = im.bilateral_filter(fused, p.bilateral_d, p.bilateral_sigma, p.bilateral_sigma)
    fused = jnp.where(jnp.max(fused) > 10.0, smoothed, fused)
    fused = jnp.clip(fused, 0.0, 255.0)
    return fused, conf, mode


def mode_text(mode_code: int, params: FusionParams, midas_filled=True, flow_filled=True) -> str:
    """Host-side HUD string matching the reference's mode annotation."""
    if mode_code == 1:
        parts = [f"Stereo×{params.stereo_weight:.1f}"]
        if midas_filled and params.use_midas_fill:
            parts.append(f"MiDaS_fill×{params.midas_fill_weight:.1f}")
        if flow_filled and params.use_flow_fill:
            parts.append(f"Flow_fill×{params.flow_fill_weight:.1f}")
        return " + ".join(parts)
    if mode_code == 2:
        return "MiDaS_base"
    if mode_code == 3:
        return "Flow_base"
    return "NO DATA"
