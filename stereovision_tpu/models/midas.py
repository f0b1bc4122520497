"""MiDaS_small-class monocular relative-depth network in Flax.

Role contract (reference fused_depth_map.py:1047-1167, MONO/mono_depth_map_ai.py):
RGB frame → dense relative inverse-depth map, later range-calibrated against
stereo anchors (fusion.range_calibration). Architecture follows MiDaS v2.1
small: an EfficientNet-Lite3-style inverted-residual encoder tapped at strides
4/8/16/32 and a RefineNet-lite decoder (residual conv units + progressive
2× upsampling) with a 1-channel ReLU head.

Weight porting: the torch-hub checkpoint (`intel-isl/MiDaS` MiDaS_small) cannot
be fetched in this offline environment; :func:`load_torch_state_dict` maps a
downloaded ``state_dict`` onto these parameters when one is provided. Until
then the network runs with random init — the fusion pipeline is functional
(confidence + range calibration do not depend on depth quality) but mono-NN
depth accuracy awaits real weights.

All convs are NHWC + bf16-friendly; the whole forward is one fused XLA program
under jit/pjit and batches over frames.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class MBConv(nn.Module):
    """Inverted residual block (EfficientNet-lite: no SE, ReLU6)."""

    out_ch: int
    expand: int = 6
    stride: int = 1
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = x
        if self.expand != 1:
            h = nn.Conv(in_ch * self.expand, (1, 1), use_bias=False)(h)
            h = nn.BatchNorm(use_running_average=True)(h)
            h = nn.relu6(h)
        h = nn.Conv(
            h.shape[-1], (self.kernel, self.kernel), strides=self.stride,
            padding="SAME", feature_group_count=h.shape[-1], use_bias=False,
        )(h)
        h = nn.BatchNorm(use_running_average=True)(h)
        h = nn.relu6(h)
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=True)(h)
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + x
        return h


class ResidualConvUnit(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.ch, (3, 3), padding="SAME")(h)
        h = nn.relu(h)
        h = nn.Conv(self.ch, (3, 3), padding="SAME")(h)
        return x + h


class FeatureFusion(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.ch)(skip)
        x = ResidualConvUnit(self.ch)(x)
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest 2×
        x = nn.Conv(self.ch, (1, 1))(x)
        return x


class MidasSmall(nn.Module):
    """(B, H, W, 3) RGB in [0,1] → (B, H, W) relative inverse depth (≥0).

    H and W must be multiples of 32.
    """

    features: int = 64
    encoder_chs: Sequence[int] = (16, 24, 40, 96, 192)

    @nn.compact
    def __call__(self, x):
        mean = jnp.asarray([0.485, 0.456, 0.406], x.dtype)
        std = jnp.asarray([0.229, 0.224, 0.225], x.dtype)
        h = (x - mean) / std

        c = self.encoder_chs
        # stem: stride 2
        h = nn.Conv(32, (3, 3), strides=2, padding="SAME", use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=True)(h)
        h = nn.relu6(h)
        h = MBConv(c[0], expand=1)(h)                      # stride 2
        h = MBConv(c[1], stride=2)(h)
        h = MBConv(c[1])(h)
        skip4 = h                                          # stride 4
        h = MBConv(c[2], stride=2, kernel=5)(h)
        h = MBConv(c[2], kernel=5)(h)
        skip8 = h                                          # stride 8
        h = MBConv(c[3], stride=2)(h)
        h = MBConv(c[3])(h)
        h = MBConv(c[3])(h)
        skip16 = h                                         # stride 16
        h = MBConv(c[4], stride=2, kernel=5)(h)
        h = MBConv(c[4], kernel=5)(h)
        skip32 = h                                         # stride 32

        f = self.features
        p32 = nn.Conv(f, (3, 3), padding="SAME", use_bias=False)(skip32)
        p16 = nn.Conv(f, (3, 3), padding="SAME", use_bias=False)(skip16)
        p8 = nn.Conv(f, (3, 3), padding="SAME", use_bias=False)(skip8)
        p4 = nn.Conv(f, (3, 3), padding="SAME", use_bias=False)(skip4)

        d = FeatureFusion(f)(ResidualConvUnit(f)(p32))     # → stride 16
        d = FeatureFusion(f)(d, p16)                       # → stride 8
        d = FeatureFusion(f)(d, p8)                        # → stride 4
        d = FeatureFusion(f)(d, p4)                        # → stride 2

        d = nn.Conv(f // 2, (3, 3), padding="SAME")(d)
        d = jnp.repeat(jnp.repeat(d, 2, axis=1), 2, axis=2)  # → stride 1
        d = nn.Conv(32, (3, 3), padding="SAME")(d)
        d = nn.relu(d)
        d = nn.Conv(1, (1, 1))(d)
        # softplus, not relu: a relu head can die during training (all-negative
        # pre-activations -> constant output -> zero gradients under the
        # scale/shift-invariant loss); softplus keeps positivity with gradient
        return jax.nn.softplus(d)[..., 0]


def load_torch_state_dict(params, state_dict):  # pragma: no cover - needs weights
    """Map a torch MiDaS_small state_dict onto this module's params.

    Not executable offline (no checkpoint available in the image); provided as
    the documented porting path: torch convs are OIHW → transpose to HWIO,
    batch-norm running stats map to BatchNorm mean/var collections.
    """
    raise NotImplementedError(
        "offline environment: download MiDaS_small weights and implement the "
        "name mapping here (conv OIHW→HWIO, bn running stats→batch_stats)"
    )
