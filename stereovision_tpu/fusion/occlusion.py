"""Camera-occlusion detection — sensor-level fault detection for the fusion
engine (reference fused_depth_map.py:131-301, metric-for-metric).

Five image-quality metrics per camera, additive penalty scores, and the
none/left/right/both decision with the 0.6× asymmetry guard. The metric
computation is one jitted function; the tiny decision logic and the 5-frame
hysteresis (reference :2515-2571) are host-side.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from stereovision_tpu.core import image as im

# Reference absolute thresholds (fused_depth_map.py:247-252)
STD_THRESHOLD = 28.0
LOW_VAR_THRESHOLD = 0.55
CONTRAST_RATIO = 2.2
ENTROPY_RATIO = 1.6
BRIGHTNESS_DIFF = 45.0


def _metrics(gray):
    bs = im.block_std(gray, 48)
    avg_std = jnp.mean(bs)
    low_var_ratio = jnp.mean((bs < 12.0).astype(jnp.float32))
    contrast = jnp.std(gray)
    # reference entropy adds 1e-10 to every bin before normalizing (:232-235)
    hist = im.histogram256(gray) + 1e-10
    p = hist / jnp.sum(hist)
    entropy = -jnp.sum(p * jnp.log2(p + 1e-10))
    brightness = jnp.mean(gray)
    return avg_std, low_var_ratio, contrast, entropy, brightness


@jax.jit
def occlusion_scores(left_gray: jax.Array, right_gray: jax.Array):
    """(H, W) grayscale pair → (left_score, right_score) float scalars."""
    l_std, l_lvr, l_con, l_ent, l_bri = _metrics(left_gray.astype(jnp.float32))
    r_std, r_lvr, r_con, r_ent, r_bri = _metrics(right_gray.astype(jnp.float32))

    def score(std, lvr, con, ent, bri, o_con, o_ent, o_bri):
        s = jnp.float32(0.0)
        s += jnp.where(std < STD_THRESHOLD * 0.8, 0.35, 0.0)
        s += jnp.where(lvr > LOW_VAR_THRESHOLD, 0.35, 0.0)
        s += jnp.where((con < o_con / CONTRAST_RATIO) & (o_con > 15.0), 0.25, 0.0)
        s += jnp.where((ent < o_ent / ENTROPY_RATIO) & (o_ent > 5.0), 0.25, 0.0)
        s += jnp.where((jnp.abs(bri - o_bri) > BRIGHTNESS_DIFF) & (bri < 80.0), 0.2, 0.0)
        return s

    left = score(l_std, l_lvr, l_con, l_ent, l_bri, r_con, r_ent, r_bri)
    right = score(r_std, r_lvr, r_con, r_ent, r_bri, l_con, l_ent, l_bri)
    return left, right


# state codes shared by the traced decision/hysteresis (pipeline.stream's
# on-device form) and the host-side strings: 0 none, 1 left, 2 right, 3 both.
OCCLUSION_CODES = ("none", "left", "right", "both")


def classify_occlusion_code(left_score, right_score, threshold: float = 0.45):
    """Traced form of :func:`classify_occlusion` → int32 state code."""
    ls, rs = jnp.float32(left_score), jnp.float32(right_score)
    t = jnp.float32(threshold)
    left = (ls > t) & (rs < t * 0.6)
    right = (rs > t) & (ls < t * 0.6)
    both = (ls > t) & (rs > t)
    return jnp.where(left, 1, jnp.where(right, 2, jnp.where(both, 3, 0))).astype(jnp.int32)


def hysteresis_init(state_code: int = 0):
    """(state, pending, count) int32 carry for the traced hysteresis."""
    return (jnp.int32(state_code), jnp.int32(state_code), jnp.int32(0))


def hysteresis_update(carry, detected, confirm_frames: int = 5):
    """Traced twin of :meth:`OcclusionHysteresis.update` — bit-identical state
    machine over int32 codes, usable inside lax.scan."""
    state, pending, count = carry
    same = detected == state
    matches_pending = detected == pending
    new_pending = jnp.where(same, state, jnp.where(matches_pending, pending, detected))
    new_count = jnp.where(
        same, 0, jnp.where(matches_pending, count + 1, jnp.int32(1)))
    flip = new_count >= confirm_frames
    new_state = jnp.where(same, state, jnp.where(flip, new_pending, state))
    new_count = jnp.where(flip, 0, new_count)
    return (new_state.astype(jnp.int32), new_pending.astype(jnp.int32),
            new_count.astype(jnp.int32))


def classify_occlusion(left_score: float, right_score: float, threshold: float = 0.45) -> str:
    """'none' / 'left' / 'right' / 'both' (reference decision tree :287-299)."""
    if left_score > threshold and right_score < threshold * 0.6:
        return "left"
    if right_score > threshold and left_score < threshold * 0.6:
        return "right"
    if left_score > threshold and right_score > threshold:
        return "both"
    return "none"


class OcclusionHysteresis:
    """5-consecutive-frame confirmation before flipping the occlusion state
    (reference fused_depth_map.py:2529-2571) — the auto stereo-off/on guard."""

    def __init__(self, confirm_frames: int = 5):
        self.confirm_frames = confirm_frames
        self.state = "none"
        self._pending = "none"
        self._count = 0

    def update(self, detected: str) -> str:
        if detected == self.state:
            self._pending, self._count = self.state, 0
            return self.state
        if detected == self._pending:
            self._count += 1
        else:
            self._pending, self._count = detected, 1
        if self._count >= self.confirm_frames:
            self.state = self._pending
            self._count = 0
        return self.state

    @property
    def stereo_enabled(self) -> bool:
        return self.state == "none"
