"""MiDaS_small-class monocular relative-depth network in Flax.

Role contract (reference fused_depth_map.py:1047-1167, MONO/mono_depth_map_ai.py):
RGB frame → dense relative inverse-depth map, later range-calibrated against
stereo anchors (fusion.range_calibration). Architecture follows MiDaS v2.1
small: an EfficientNet-Lite3-style inverted-residual encoder tapped at strides
4/8/16/32 and a RefineNet-lite decoder (residual conv units + progressive
2× upsampling) with a 1-channel ReLU head.

Weight porting: the torch-hub checkpoint (`intel-isl/MiDaS` MiDaS_small)
cannot be fetched in this offline environment; :func:`load_torch_state_dict`
implements the porting path — an order/shape structural mapping (conv
OIHW→HWIO, bn running stats→batch_stats), round-trip tested against a
synthetic torch-layout checkpoint. Until real weights are supplied the
network ships with bundled synthetic-pretrained weights
(models/pretrained, trained on procedural scenes by models/train_synthetic).

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


def _walk_ordered(tree, path=()):
    """Yield (path, leaf) in the tree's own insertion order — for flax
    variables this is module-creation order (dicts are insertion-ordered),
    which is what a torch state_dict's layer order corresponds to."""
    items = tree.items() if hasattr(tree, "items") else None
    if items is None:
        yield path, tree
        return
    for k, v in items:
        yield from _walk_ordered(v, path + (k,))


def load_torch_state_dict(variables, state_dict):
    """Map a torch checkpoint with an isomorphic module sequence onto this
    model's flax ``variables`` ({'params', 'batch_stats'}).

    Structural (order + shape) mapping, since torch layer names differ from
    flax auto-names: tensors are consumed from the state_dict in insertion
    order and paired per kind — 4-D ``.weight`` → conv kernels (OIHW→HWIO;
    depthwise (C,1,kh,kw)→(kh,kw,1,C) falls out of the same transpose),
    1-D ``.weight``/``.bias``/``running_mean``/``running_var`` of batch-norm
    modules → BatchNorm scale/bias and batch_stats mean/var, remaining
    ``.bias`` → conv biases. Every assignment is shape-checked; a structure
    mismatch raises with both paths named. Returns new variables.
    """
    import numpy as np

    # classify torch tensors in insertion order
    by_prefix = {}
    order = []
    for name, t in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        prefix, leaf = name.rsplit(".", 1) if "." in name else ("", name)
        by_prefix.setdefault(prefix, {})[leaf] = np.asarray(t)
        if prefix not in order:
            order.append(prefix)
    conv_w, conv_b, bn = [], [], []
    for prefix in order:
        mod = by_prefix[prefix]
        w = mod.get("weight")
        if w is not None and w.ndim == 4:
            conv_w.append((prefix, w))
            if "bias" in mod:
                conv_b.append((prefix, mod["bias"]))
        elif "running_mean" in mod:
            bn.append((prefix, mod))
        elif "bias" in mod and w is None:
            conv_b.append((prefix, mod["bias"]))

    from flax.core import unfreeze

    params = unfreeze(jax.device_get(variables["params"]))
    stats = unfreeze(jax.device_get(variables.get("batch_stats", {})))

    def set_in(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node[k]
        node[path[-1]] = value

    def check(name, path, got, want):
        if tuple(got.shape) != tuple(want.shape):
            raise ValueError(
                f"shape mismatch mapping torch '{name}' -> {'/'.join(path)}: "
                f"{got.shape} vs {want.shape}"
            )

    # conv kernels/biases and bn scale/bias walk params in creation order;
    # each flax BatchNorm module binds to the next torch bn module the first
    # time any of its leaves appears (leaf order within a module is free)
    bn_assign: dict = {}

    def bn_for(path):
        mp = path[:-1]
        if mp not in bn_assign:
            if len(bn_assign) >= len(bn):
                raise ValueError(f"torch checkpoint has too few batch norms at {'/'.join(path)}")
            bn_assign[mp] = len(bn_assign)
        return bn[bn_assign[mp]]

    for path, leaf in _walk_ordered(params):
        mod = path[-2] if len(path) >= 2 else ""
        if leaf.ndim == 4 and path[-1] == "kernel":
            if not conv_w:
                raise ValueError(f"torch checkpoint ran out of conv weights at {'/'.join(path)}")
            name, w = conv_w.pop(0)
            wt = np.transpose(w, (2, 3, 1, 0))  # OIHW → HWIO
            check(name, path, wt, leaf)
            set_in(params, path, jnp.asarray(wt, leaf.dtype))
        elif path[-1] == "bias" and mod.startswith("Conv"):
            if not conv_b:
                raise ValueError(f"torch checkpoint ran out of conv biases at {'/'.join(path)}")
            name, b = conv_b.pop(0)
            check(name, path, b, leaf)
            set_in(params, path, jnp.asarray(b, leaf.dtype))
        elif path[-1] in ("scale", "bias") and mod.startswith("BatchNorm"):
            name, modt = bn_for(path)
            src = modt["weight"] if path[-1] == "scale" else modt["bias"]
            check(name, path, src, leaf)
            set_in(params, path, jnp.asarray(src, leaf.dtype))
    # running stats walk batch_stats; module order matches the params walk
    bn_assign.clear()
    for path, leaf in _walk_ordered(stats):
        if path[-1] in ("mean", "var"):
            name, modt = bn_for(path)
            src = modt["running_mean" if path[-1] == "mean" else "running_var"]
            check(name, path, src, leaf)
            set_in(stats, path, jnp.asarray(src, leaf.dtype))
    if conv_w:
        raise ValueError(f"{len(conv_w)} torch conv weights left unmapped")
    out = dict(variables)
    out["params"] = params
    if stats:
        out["batch_stats"] = stats
    return out
