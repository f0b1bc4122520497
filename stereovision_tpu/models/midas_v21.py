"""MiDaS v2.1 small — the EXACT torch-hub architecture, in Flax.

The reference loads ``torch.hub.load("intel-isl/MiDaS", "MiDaS_small")``
(fused_depth_map.py:1091-1098): an EfficientNet-Lite3 encoder (gen-efficientnet
``tf_efficientnet_lite3``: width 1.2, depth 1.4, no SE, ReLU6, TF-SAME
padding, BN eps 1e-3) tapped at strides 4/8/16/32, with the MidasNet_small
RefineNet decoder (features=64, ``expand=True`` → scratch channels
64/128/256/512, FeatureFusionBlock_custom with bilinear align_corners=True
2× upsampling, non-negative ReLU head).

This module reproduces that network 1:1 so the real checkpoint drops in with
zero code changes the day network access exists:

- every Flax submodule is named after its torch state_dict prefix ("." → "__"),
  so :func:`load_v21_state_dict` maps by NAME, not layer order;
- :func:`expected_manifest` emits the ordered (torch key, shape) list this
  architecture implies; the vendored copy (``midas_v21_small_manifest.json``)
  is what incoming checkpoints are validated against — a mismatch names the
  offending keys instead of failing deep inside a shape check;
- tests/test_midas_v21.py builds an independent torch replica of the same
  architecture and checks (a) its state_dict equals the manifest exactly and
  (b) random torch weights loaded through this path produce numerically
  identical forwards (TF-SAME padding and align-corners upsampling included).

The compact ``models.midas.MidasSmall`` (with bundled synthetic weights)
remains the runtime default; select this one via
``mono.nn.create_model(arch="midas_v21_small", torch_state_dict=...)``.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
from flax import linen as nn

# EfficientNet-Lite3 stage table (gen-efficientnet arch_def, width 1.2 /
# depth 1.4, fix_first_last): (n_blocks, kernel, first_stride, expand_ratio,
# in_ch, out_ch). Stage 0 is the depthwise-separable block (no expansion).
LITE3_STAGES = (
    (1, 3, 1, 1, 32, 24),
    (3, 3, 2, 6, 24, 32),
    (3, 5, 2, 6, 32, 48),
    (5, 3, 2, 6, 48, 96),
    (5, 5, 1, 6, 96, 136),
    (6, 5, 2, 6, 136, 232),
    (1, 3, 1, 6, 232, 384),
)
# MidasNet_small layer split (midas/backbones-style _make_efficientnet_backbone):
# layer1 = stem + stages 0-1, layer2 = stage 2, layer3 = stages 3-4,
# layer4 = stages 5-6 → taps at 32/48/136/384 channels, strides 4/8/16/32.
LAYER_STAGES = ((0, 1), (2,), (3, 4), (5, 6))
FEATURES = 64  # MidasNet_small(features=64, expand=True)
RN_IN = (32, 48, 136, 384)
RN_OUT = (FEATURES, FEATURES * 2, FEATURES * 4, FEATURES * 8)
BN_EPS = 1e-3  # tf_ variants use TF default batch-norm epsilon

_MANIFEST_PATH = Path(__file__).resolve().parent / "midas_v21_small_manifest.json"


def _stage_prefixes():
    """torch sequential prefix for every encoder block:
    (stage, block) → "pretrained.layerL.I.J"."""
    out = {}
    for li, stages in enumerate(LAYER_STAGES):
        base = 3 if li == 0 else 0  # layer1: 0=conv_stem, 1=bn1, 2=act1
        for si, stage in enumerate(stages):
            for b in range(LITE3_STAGES[stage][0]):
                out[(stage, b)] = f"pretrained.layer{li + 1}.{base + si}.{b}"
    return out


def expected_manifest():
    """Ordered (torch state_dict key, shape) list for the real MiDaS_small
    checkpoint (conv weights OIHW; num_batches_tracked omitted)."""
    entries = []

    def conv(name, o, i, k):
        entries.append((f"{name}.weight", (o, i, k, k)))

    def conv_b(name, o, i, k):
        conv(name, o, i, k)
        entries.append((f"{name}.bias", (o,)))

    def bn(name, c):
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            entries.append((f"{name}.{leaf}", (c,)))

    conv("pretrained.layer1.0", 32, 3, 3)  # conv_stem
    bn("pretrained.layer1.1", 32)
    pref = _stage_prefixes()
    for s, (n, k, stride, e, cin, cout) in enumerate(LITE3_STAGES):
        for b in range(n):
            p = pref[(s, b)]
            ci = cin if b == 0 else cout
            if e == 1:  # depthwise-separable block: conv_dw, bn1, conv_pw, bn2
                conv(f"{p}.conv_dw", ci, 1, k)
                bn(f"{p}.bn1", ci)
                conv(f"{p}.conv_pw", cout, ci, 1)
                bn(f"{p}.bn2", cout)
            else:  # inverted residual: conv_pw, bn1, conv_dw, bn2, conv_pwl, bn3
                h = ci * e
                conv(f"{p}.conv_pw", h, ci, 1)
                bn(f"{p}.bn1", h)
                conv(f"{p}.conv_dw", h, 1, k)
                bn(f"{p}.bn2", h)
                conv(f"{p}.conv_pwl", cout, h, 1)
                bn(f"{p}.bn3", cout)
    for i in range(4):  # scratch.layerX_rn: 3x3, bias=False
        conv(f"scratch.layer{i + 1}_rn", RN_OUT[i], RN_IN[i], 3)
    for i in (4, 3, 2, 1):  # refinenet registration order in MidasNet_small
        f = RN_OUT[i - 1]
        out_f = f // 2 if i > 1 else f  # expand=True on refinenet2-4 only
        conv_b(f"scratch.refinenet{i}.out_conv", out_f, f, 1)
        for rcu in (1, 2):
            conv_b(f"scratch.refinenet{i}.resConfUnit{rcu}.conv1", f, f, 3)
            conv_b(f"scratch.refinenet{i}.resConfUnit{rcu}.conv2", f, f, 3)
    # output head: Sequential(conv3x3 64→32, Interpolate, conv3x3 32→32,
    # ReLU, conv1x1 32→1, ReLU, Identity)
    conv_b("scratch.output_conv.0", FEATURES // 2, FEATURES, 3)
    conv_b("scratch.output_conv.2", 32, FEATURES // 2, 3)
    conv_b("scratch.output_conv.4", 1, 32, 1)
    return entries


def load_manifest():
    with open(_MANIFEST_PATH) as f:
        return [(k, tuple(s)) for k, s in json.load(f)]


def _mn(prefix: str) -> str:
    """torch prefix → flax module name."""
    return prefix.replace(".", "__")


def upsample2x_align_corners(x):
    """Bilinear 2× upsampling with align_corners=True (torch
    ``F.interpolate(..., mode="bilinear", align_corners=True)``), as two
    dense interpolation matmuls — MXU-friendly, exact to the torch formula."""

    def mat(n_in):
        n_out = 2 * n_in
        if n_in == 1:
            return jnp.ones((n_out, 1), jnp.float32)
        pos = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
        i0 = jnp.floor(pos).astype(jnp.int32)
        f = pos - i0
        i1 = jnp.minimum(i0 + 1, n_in - 1)
        m = jnp.zeros((n_out, n_in), jnp.float32)
        m = m.at[jnp.arange(n_out), i0].add(1.0 - f)
        m = m.at[jnp.arange(n_out), i1].add(f)
        return m

    x = jnp.einsum("ph,bhwc->bpwc", mat(x.shape[1]), x)
    x = jnp.einsum("qw,bpwc->bpqc", mat(x.shape[2]), x)
    return x


class MidasV21Small(nn.Module):
    """(B, H, W, 3) RGB, ImageNet-normalized like the hub small_transform
    (done in __call__) → (B, H, W) non-negative relative inverse depth.
    H and W must be multiples of 32."""

    @nn.compact
    def __call__(self, x):
        mean = jnp.asarray([0.485, 0.456, 0.406], x.dtype)
        std = jnp.asarray([0.229, 0.224, 0.225], x.dtype)
        h = (x - mean) / std

        def conv(prefix, o, k, stride=1, groups=1, bias=False):
            return nn.Conv(
                o, (k, k), strides=stride, padding="SAME",
                feature_group_count=groups, use_bias=bias, name=_mn(prefix),
            )

        def bn(prefix, v):
            return nn.BatchNorm(
                use_running_average=True, epsilon=BN_EPS, name=_mn(prefix)
            )(v)

        h = conv("pretrained.layer1.0", 32, 3, stride=2)(h)
        h = nn.relu6(bn("pretrained.layer1.1", h))
        taps = {}
        pref = _stage_prefixes()
        for s, (n, k, stride, e, cin, cout) in enumerate(LITE3_STAGES):
            for b in range(n):
                p = pref[(s, b)]
                ci = h.shape[-1]
                st = stride if b == 0 else 1
                if e == 1:
                    v = conv(f"{p}.conv_dw", ci, k, stride=st, groups=ci)(h)
                    v = nn.relu6(bn(f"{p}.bn1", v))
                    v = conv(f"{p}.conv_pw", cout, 1)(v)
                    v = bn(f"{p}.bn2", v)
                else:
                    v = conv(f"{p}.conv_pw", ci * e, 1)(h)
                    v = nn.relu6(bn(f"{p}.bn1", v))
                    v = conv(f"{p}.conv_dw", ci * e, k, stride=st, groups=ci * e)(v)
                    v = nn.relu6(bn(f"{p}.bn2", v))
                    v = conv(f"{p}.conv_pwl", cout, 1)(v)
                    v = bn(f"{p}.bn3", v)
                h = h + v if (st == 1 and ci == cout) else v
            taps[s] = h
        layers = [taps[stages[-1]] for stages in LAYER_STAGES]

        rn = [
            conv(f"scratch.layer{i + 1}_rn", RN_OUT[i], 3)(layers[i])
            for i in range(4)
        ]

        def rcu(prefix, v):
            f = v.shape[-1]
            o = nn.relu(v)
            o = conv(f"{prefix}.conv1", f, 3, bias=True)(o)
            o = nn.relu(o)
            o = conv(f"{prefix}.conv2", f, 3, bias=True)(o)
            return v + o

        def fusion(i, v, skip=None):
            p = f"scratch.refinenet{i}"
            if skip is not None:
                v = v + rcu(f"{p}.resConfUnit1", skip)
            else:
                # refinenet4 takes a single input, but the torch module still
                # REGISTERS resConfUnit1 (FeatureFusionBlock_custom creates
                # both RCUs unconditionally) — create the matching params so
                # the checkpoint maps 1:1; XLA dead-code-eliminates the math
                rcu(f"{p}.resConfUnit1", jnp.zeros_like(v))
            v = rcu(f"{p}.resConfUnit2", v)
            v = upsample2x_align_corners(v)
            out_f = v.shape[-1] // 2 if i > 1 else v.shape[-1]
            return conv(f"{p}.out_conv", out_f, 1, bias=True)(v)

        path = fusion(4, rn[3])
        path = fusion(3, path, rn[2])
        path = fusion(2, path, rn[1])
        path = fusion(1, path, rn[0])

        d = conv("scratch.output_conv.0", FEATURES // 2, 3, bias=True)(path)
        d = upsample2x_align_corners(d)
        d = conv("scratch.output_conv.2", 32, 3, bias=True)(d)
        d = nn.relu(d)
        d = conv("scratch.output_conv.4", 1, 1, bias=True)(d)
        return nn.relu(d)[..., 0]


def create_v21(seed: int = 0, net_hw=(256, 256)):
    model = MidasV21Small()
    variables = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, *net_hw, 3), jnp.float32)
    )
    return model, variables


def validate_state_dict(state_dict) -> None:
    """Check an incoming torch state_dict against the vendored manifest;
    raises with the exact key/shape differences on mismatch."""
    import numpy as np

    want = load_manifest()
    got = [
        (k, tuple(np.asarray(v).shape))
        for k, v in state_dict.items()
        if not k.endswith("num_batches_tracked")
    ]
    if got == want:
        return
    got_d, want_d = dict(got), dict(want)
    missing = [k for k, _ in want if k not in got_d]
    extra = [k for k, _ in got if k not in want_d]
    badshape = [
        f"{k}: got {got_d[k]} want {want_d[k]}"
        for k in want_d
        if k in got_d and got_d[k] != want_d[k]
    ]
    msgs = []
    if missing:
        msgs.append(f"missing keys ({len(missing)}): {missing[:8]}")
    if extra:
        msgs.append(f"unexpected keys ({len(extra)}): {extra[:8]}")
    if badshape:
        msgs.append(f"shape mismatches ({len(badshape)}): {badshape[:8]}")
    if not msgs:  # same set, different order — name-driven load still works
        return
    raise ValueError("state_dict does not match MiDaS_small v2.1: " + "; ".join(msgs))


def load_v21_state_dict(variables, state_dict):
    """Map the real (or manifest-shaped) torch checkpoint onto
    :class:`MidasV21Small` variables BY NAME (module names mirror the torch
    prefixes), validating against the vendored manifest first.
    Returns new variables."""
    import numpy as np

    from flax.core import unfreeze

    validate_state_dict(state_dict)
    params = unfreeze(jax.device_get(variables["params"]))
    stats = unfreeze(jax.device_get(variables.get("batch_stats", {})))

    def assign(tree, module, leaf, value):
        if module not in tree:
            raise ValueError(f"flax model has no module '{module}'")
        node = tree[module]
        if leaf not in node:
            raise ValueError(f"flax module '{module}' has no leaf '{leaf}'")
        want = node[leaf]
        if tuple(want.shape) != tuple(value.shape):
            raise ValueError(
                f"shape mismatch at {module}/{leaf}: torch {value.shape} "
                f"vs flax {want.shape}"
            )
        node[leaf] = jnp.asarray(value, want.dtype)

    for key, t in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        prefix, leaf = key.rsplit(".", 1)
        w = np.asarray(t)
        module = _mn(prefix)
        if leaf == "weight" and w.ndim == 4:
            assign(params, module, "kernel", np.transpose(w, (2, 3, 1, 0)))
        elif leaf == "running_mean":
            assign(stats, module, "mean", w)
        elif leaf == "running_var":
            assign(stats, module, "var", w)
        elif leaf == "weight":  # batch-norm gamma
            assign(params, module, "scale", w)
        elif leaf == "bias":
            assign(params, module, "bias", w)
        else:
            raise ValueError(f"unrecognized torch leaf '{key}'")
    out = dict(variables)
    out["params"] = params
    if stats:
        out["batch_stats"] = stats
    return out
