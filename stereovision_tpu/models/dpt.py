"""DPT_Large (MiDaS 3.0) — the EXACT torch-hub architecture, in Flax.

The reference's mono demo selects between ``MiDaS_small`` and ``DPT_Large``
(``torch.hub.load("intel-isl/MiDaS", model_type)``,
/root/reference/MONO/mono_depth_map_ai.py:24-69; the code comment :30-31
quotes ~3 FPS GPU for DPT_Large vs ~20 for small). DPT_Large is
``midas.dpt_depth.DPTDepthModel(backbone="vitl16_384", non_negative=True)``:

- a timm ``vit_large_patch16_384`` encoder (patch 16, embed 1024, 24
  pre-norm blocks, 16 heads, MLP ratio 4, LayerNorm eps 1e-6) with forward
  hooks on blocks 5/11/17/23;
- per hook an ``act_postprocess`` stack: "project" readout (cls token
  concatenated to every patch token → Linear 2C→C → GELU), reshape to the
  patch grid, 1×1 conv to (256, 512, 1024, 1024) channels, then resample
  to strides (4, 8, 16, 32): 4×4/4 and 2×2/2 transposed convs, identity,
  3×3/2 conv;
- the DPT scratch: 3×3 no-bias ``layerN_rn`` convs to 256 features, four
  ``FeatureFusionBlock_custom`` refinenets (bn=False, expand=False,
  align_corners=True), and the 256→128→32→1 output head with a 2× bilinear
  upsample and non-negative ReLU.

Port contract (same scheme as :mod:`models.midas_v21`):
- every Flax param path mirrors its torch state_dict key ("." → "__"), so
  :func:`load_dpt_state_dict` maps by NAME;
- :func:`expected_manifest` emits the ordered (key, shape) list the real
  ``dpt_large-midas-2f21e586.pt`` checkpoint must match; the vendored copy
  (``dpt_large_manifest.json``) validates incoming checkpoints with exact
  key/shape diffs. The timm classification head/final norm are part of the
  hub checkpoint (strict ``load_state_dict`` round-trips through them), so
  they exist here too — their outputs are dead code XLA eliminates;
- tests/test_dpt.py builds an independent torch replica (tiny config) and
  checks state_dict agreement plus numerically identical forwards, and
  checks the full-size manifest on a meta-device replica.

The architecture is config-parameterized only so the parity test can run a
small instance on CPU; :data:`DPT_LARGE` is the shipping configuration.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import jax
import jax.numpy as jnp
from flax import linen as nn

from stereovision_tpu.models.midas_v21 import upsample2x_align_corners

_MANIFEST_PATH = Path(__file__).resolve().parent / "dpt_large_manifest.json"


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: int = 4
    patch_size: int = 16
    img_size: int = 384  # the pos_embed's native grid is img_size/patch
    hooks: tuple = (5, 11, 17, 23)
    post_channels: tuple = (256, 512, 1024, 1024)
    features: int = 256
    num_classes: int = 1000  # timm head (in the checkpoint; unused by DPT)


DPT_LARGE = DPTConfig()
# small instance for CPU parity tests (structure identical, sizes tiny)
DPT_TINY = DPTConfig(embed_dim=32, depth=4, num_heads=4, mlp_ratio=2,
                     patch_size=16, img_size=64, hooks=(0, 1, 2, 3),
                     post_channels=(8, 12, 16, 16), features=16,
                     num_classes=10)


def _mn(prefix: str) -> str:
    return prefix.replace(".", "__")


class _ConvTransposeExact(nn.Module):
    """torch ``ConvTranspose2d(k, stride=k, padding=0)`` with the torch
    (in, out, kh, kw) weight layout kept verbatim (name-driven load): for
    stride == kernel this is one einsum + pixel interleave — exact, and the
    einsum contraction runs on the MXU."""

    out_ch: int
    k: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param(
            "weight", nn.initializers.lecun_normal(),
            (cin, self.out_ch, self.k, self.k))
        b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        B, H, W, _ = x.shape
        y = jnp.einsum("bhwc,coij->bhiwjo", x, w)
        return y.reshape(B, H * self.k, W * self.k, self.out_ch) + b


def resize_pos_embed(pos_embed, grid_hw, native_grid):
    """MiDaS ``_resize_pos_embed``: keep the cls token, bilinearly resize
    the patch-grid part (align_corners=False — jax.image half-pixel
    semantics match torch's default)."""
    gh, gw = grid_hw
    if (gh, gw) == (native_grid, native_grid):
        return pos_embed
    cls_pe, grid_pe = pos_embed[:, :1], pos_embed[:, 1:]
    C = pos_embed.shape[-1]
    grid_pe = grid_pe.reshape(1, native_grid, native_grid, C)
    grid_pe = jax.image.resize(grid_pe, (1, gh, gw, C), "bilinear")
    return jnp.concatenate([cls_pe, grid_pe.reshape(1, gh * gw, C)], axis=1)


class DPTDepth(nn.Module):
    """(B, H, W, 3) RGB in [0, 1] → (B, H, W) non-negative relative inverse
    depth. H, W must be multiples of 2·patch_size (the stride-4 path
    upsamples the grid 4×; the head doubles once more). The hub transform's
    mean/std 0.5 normalization is applied here."""

    cfg: DPTConfig = DPT_LARGE

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        C = cfg.embed_dim
        P = cfg.patch_size
        B, H, W, _ = x.shape
        gh, gw = H // P, W // P
        h = (x - 0.5) / 0.5

        # --- timm vit_large_patch16_384 ---
        h = nn.Conv(C, (P, P), strides=P, padding="VALID",
                    name=_mn("pretrained.model.patch_embed.proj"))(h)
        tokens = h.reshape(B, gh * gw, C)
        cls_token = self.param(
            _mn("pretrained.model.cls_token"), nn.initializers.zeros,
            (1, 1, C))
        pos_embed = self.param(
            _mn("pretrained.model.pos_embed"),
            nn.initializers.normal(0.02),
            (1, 1 + (cfg.img_size // P) ** 2, C))
        h = jnp.concatenate([jnp.broadcast_to(cls_token, (B, 1, C)), tokens],
                            axis=1)
        h = h + resize_pos_embed(pos_embed, (gh, gw), cfg.img_size // P)

        def ln(prefix, v):
            return nn.LayerNorm(epsilon=1e-6, name=_mn(prefix))(v)

        hooks_out = {}
        hd = C // cfg.num_heads
        for i in range(cfg.depth):
            p = f"pretrained.model.blocks.{i}"
            v = ln(f"{p}.norm1", h)
            qkv = nn.Dense(3 * C, name=_mn(f"{p}.attn.qkv"))(v)
            q, k, vv = jnp.split(
                qkv.reshape(B, -1, 3, cfg.num_heads, hd), 3, axis=2)
            q, k, vv = (t[:, :, 0].transpose(0, 2, 1, 3) for t in (q, k, vv))
            att = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (hd ** -0.5)
            att = jax.nn.softmax(att, axis=-1)
            v = jnp.einsum("bhnm,bhmd->bhnd", att, vv)
            v = v.transpose(0, 2, 1, 3).reshape(B, -1, C)
            v = nn.Dense(C, name=_mn(f"{p}.attn.proj"))(v)
            h = h + v
            v = ln(f"{p}.norm2", h)
            v = nn.Dense(cfg.mlp_ratio * C, name=_mn(f"{p}.mlp.fc1"))(v)
            v = jax.nn.gelu(v, approximate=False)
            v = nn.Dense(C, name=_mn(f"{p}.mlp.fc2"))(v)
            h = h + v
            if i in cfg.hooks:
                hooks_out[i] = h
        # final norm + classification head: registered so the checkpoint
        # maps 1:1; their outputs are unused (dead code under XLA)
        dead = ln("pretrained.model.norm", h)
        nn.Dense(cfg.num_classes, name=_mn("pretrained.model.head"))(
            dead[:, 0])

        # --- act_postprocess: project readout → grid → channel/stride map ---
        layers = []
        for idx, hook in enumerate(cfg.hooks):
            a = hooks_out[hook]
            p = f"pretrained.act_postprocess{idx + 1}"
            readout = jnp.broadcast_to(a[:, :1], a[:, 1:].shape)
            v = jnp.concatenate([a[:, 1:], readout], axis=-1)
            v = nn.Dense(C, name=_mn(f"{p}.0.project.0"))(v)
            v = jax.nn.gelu(v, approximate=False)
            v = v.reshape(B, gh, gw, C)
            v = nn.Conv(cfg.post_channels[idx], (1, 1),
                        name=_mn(f"{p}.3"))(v)
            if idx == 0:
                v = _ConvTransposeExact(cfg.post_channels[idx], 4,
                                        name=_mn(f"{p}.4"))(v)
            elif idx == 1:
                v = _ConvTransposeExact(cfg.post_channels[idx], 2,
                                        name=_mn(f"{p}.4"))(v)
            elif idx == 3:
                v = nn.Conv(cfg.post_channels[idx], (3, 3), strides=2,
                            padding=((1, 1), (1, 1)), name=_mn(f"{p}.4"))(v)
            layers.append(v)

        # --- DPT scratch (RefineNet fusion, bn=False, expand=False) ---
        F = cfg.features

        def conv(prefix, o, k, bias=True, stride=1):
            pad = ((k // 2, k // 2), (k // 2, k // 2))
            return nn.Conv(o, (k, k), strides=stride, padding=pad,
                           use_bias=bias, name=_mn(prefix))

        rn = [conv(f"scratch.layer{i + 1}_rn", F, 3, bias=False)(layers[i])
              for i in range(4)]

        def rcu(prefix, v):
            o = nn.relu(v)
            o = conv(f"{prefix}.conv1", F, 3)(o)
            o = nn.relu(o)
            o = conv(f"{prefix}.conv2", F, 3)(o)
            return v + o

        def fusion(i, v, skip=None):
            p = f"scratch.refinenet{i}"
            if skip is not None:
                v = v + rcu(f"{p}.resConfUnit1", skip)
            else:
                # FeatureFusionBlock_custom registers resConfUnit1 even for
                # the single-input refinenet4 — create matching params
                rcu(f"{p}.resConfUnit1", jnp.zeros_like(v))
            v = rcu(f"{p}.resConfUnit2", v)
            v = upsample2x_align_corners(v)
            return conv(f"{p}.out_conv", F, 1)(v)

        path = fusion(4, rn[3])
        path = fusion(3, path, rn[2])
        path = fusion(2, path, rn[1])
        path = fusion(1, path, rn[0])

        d = conv("scratch.output_conv.0", F // 2, 3)(path)
        d = upsample2x_align_corners(d)
        d = conv("scratch.output_conv.2", 32, 3)(d)
        d = nn.relu(d)
        d = conv("scratch.output_conv.4", 1, 1)(d)
        return nn.relu(d)[..., 0]


def expected_manifest(cfg: DPTConfig = DPT_LARGE):
    """Ordered (torch state_dict key, shape) list for the hub DPT_Large
    checkpoint (conv weights OIHW, ConvTranspose weights IOHW, Linear
    weights (out, in))."""
    C = cfg.embed_dim
    gs = cfg.img_size // cfg.patch_size
    entries = []

    def add(name, shape):
        entries.append((name, tuple(shape)))

    def linear(name, o, i):
        add(f"{name}.weight", (o, i))
        add(f"{name}.bias", (o,))

    def conv(name, o, i, k, bias=True):
        add(f"{name}.weight", (o, i, k, k))
        if bias:
            add(f"{name}.bias", (o,))

    def lnorm(name):
        add(f"{name}.weight", (C,))
        add(f"{name}.bias", (C,))

    # torch state_dict order: a module's direct parameters come before its
    # submodules regardless of assignment order
    add("pretrained.model.cls_token", (1, 1, C))
    add("pretrained.model.pos_embed", (1, 1 + gs * gs, C))
    conv("pretrained.model.patch_embed.proj", C, 3, cfg.patch_size)
    for i in range(cfg.depth):
        p = f"pretrained.model.blocks.{i}"
        lnorm(f"{p}.norm1")
        linear(f"{p}.attn.qkv", 3 * C, C)
        linear(f"{p}.attn.proj", C, C)
        lnorm(f"{p}.norm2")
        linear(f"{p}.mlp.fc1", cfg.mlp_ratio * C, C)
        linear(f"{p}.mlp.fc2", C, cfg.mlp_ratio * C)
    lnorm("pretrained.model.norm")
    linear("pretrained.model.head", cfg.num_classes, C)
    for idx in range(4):
        p = f"pretrained.act_postprocess{idx + 1}"
        o = cfg.post_channels[idx]
        linear(f"{p}.0.project.0", C, 2 * C)
        conv(f"{p}.3", o, C, 1)
        if idx == 0:
            add(f"{p}.4.weight", (o, o, 4, 4))
            add(f"{p}.4.bias", (o,))
        elif idx == 1:
            add(f"{p}.4.weight", (o, o, 2, 2))
            add(f"{p}.4.bias", (o,))
        elif idx == 3:
            conv(f"{p}.4", o, o, 3)
    F = cfg.features
    for i in range(4):
        conv(f"scratch.layer{i + 1}_rn", F, cfg.post_channels[i], 3,
             bias=False)
    for i in (1, 2, 3, 4):  # DPT registers refinenets in ascending order
        p = f"scratch.refinenet{i}"
        conv(f"{p}.out_conv", F, F, 1)
        for rcu in (1, 2):
            conv(f"{p}.resConfUnit{rcu}.conv1", F, F, 3)
            conv(f"{p}.resConfUnit{rcu}.conv2", F, F, 3)
    conv("scratch.output_conv.0", F // 2, F, 3)
    conv("scratch.output_conv.2", 32, F // 2, 3)
    conv("scratch.output_conv.4", 1, 32, 1)
    return entries


def load_manifest():
    with open(_MANIFEST_PATH) as f:
        return [(k, tuple(s)) for k, s in json.load(f)]


def validate_state_dict(state_dict, cfg: DPTConfig = DPT_LARGE) -> None:
    """Check an incoming torch state_dict against the manifest (the
    vendored one for DPT_LARGE, the computed one otherwise); raises with
    exact key/shape differences. ``num_batches_tracked`` and any
    ``attn_mask``-style buffers are ignored."""
    import numpy as np

    want = load_manifest() if cfg == DPT_LARGE else expected_manifest(cfg)
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
        for k in want_d if k in got_d and got_d[k] != want_d[k]
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
    raise ValueError("state_dict does not match DPT_Large: " + "; ".join(msgs))


def load_dpt_state_dict(variables, state_dict, cfg: DPTConfig = DPT_LARGE):
    """Map the torch DPT_Large checkpoint onto :class:`DPTDepth` variables
    BY NAME, validating against the manifest first. Returns new variables."""
    import numpy as np

    from flax.core import unfreeze

    validate_state_dict(state_dict, cfg)
    params = unfreeze(jax.device_get(variables["params"]))

    def assign(module, leaf, value):
        if module not in params:
            raise ValueError(f"flax model has no module '{module}'")
        node = params[module]
        if leaf not in node:
            raise ValueError(f"flax module '{module}' has no leaf '{leaf}'")
        want = node[leaf]
        if tuple(want.shape) != tuple(value.shape):
            raise ValueError(
                f"shape mismatch at {module}/{leaf}: torch {value.shape} "
                f"vs flax {want.shape}")
        node[leaf] = jnp.asarray(value, want.dtype)

    for key, t in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        w = np.asarray(t)
        if key in ("pretrained.model.cls_token", "pretrained.model.pos_embed"):
            name = _mn(key)
            want = params[name]
            if tuple(want.shape) != w.shape:
                raise ValueError(f"shape mismatch at {name}: {w.shape} "
                                 f"vs {want.shape}")
            params[name] = jnp.asarray(w, want.dtype)
            continue
        prefix, leaf = key.rsplit(".", 1)
        module = _mn(prefix)
        node = params.get(module, {})
        if leaf == "weight" and "weight" in node:
            assign(module, "weight", w)  # _ConvTransposeExact: torch layout
        elif leaf == "weight" and w.ndim == 4:
            assign(module, "kernel", np.transpose(w, (2, 3, 1, 0)))
        elif leaf == "weight" and w.ndim == 2:
            assign(module, "kernel", np.transpose(w, (1, 0)))
        elif leaf == "weight":  # LayerNorm gamma
            assign(module, "scale", w)
        elif leaf == "bias":
            assign(module, "bias", w)
        else:
            raise ValueError(f"unrecognized torch leaf '{key}'")
    out = dict(variables)
    out["params"] = params
    return out


def create_dpt(seed: int = 0, net_hw=(384, 384), cfg: DPTConfig = DPT_LARGE):
    model = DPTDepth(cfg)
    variables = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, *net_hw, 3), jnp.float32))
    return model, variables
