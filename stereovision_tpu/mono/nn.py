"""Neural mono-depth estimator: the ``DepthEstimatorMidas`` equivalent.

Pre/post contract from the reference (fused_depth_map.py:1102-1167):
- input BGR frame → RGB, resized to the network size
- forward pass → relative inverse depth
- bicubic-class resize back to frame size (bilinear here; the ¼-px difference
  is far below the fusion quantization)
- min-max normalize to [0, 255]                                (:1144-1151)
- confidence = normalized |gray − GaussianBlur(gray, 5)| local contrast
                                                               (:1153-1158)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from stereovision_tpu.core import image as im
from stereovision_tpu.models.midas import MidasSmall


def create_model(seed: int = 0, net_hw=(256, 256), pretrained: bool = True,
                 arch: str = "small", torch_state_dict=None, dpt_cfg=None):
    """Build the model; load the bundled synthetic-pretrained weights when
    available (``models/pretrained/midas_synthetic.msgpack``, trained offline by
    ``models.train_synthetic`` — the torch-hub download the reference performs
    at runtime is unavailable in this deployment).

    ``arch``:
    - "small" (default): the compact MidasSmall-class net with bundled
      synthetic weights.
    - "midas_v21_small": the EXACT MiDaS v2.1 small architecture
      (models.midas_v21); pass the real hub checkpoint via
      ``torch_state_dict`` (a state_dict mapping or a .pt path) and it is
      validated against the vendored manifest and loaded by name — the
      drop-in path for the day network access exists
      (reference fused_depth_map.py:1091-1098).
    - "dpt_large": the EXACT DPT_Large architecture (models.dpt) — the
      reference mono demo's second model option
      (MONO/mono_depth_map_ai.py:24-69); same manifest-validated
      ``torch_state_dict`` drop-in path. ``dpt_cfg`` overrides the
      architecture config (tests use models.dpt.DPT_TINY).
    """
    from pathlib import Path

    def _commit(model, variables):
        # Pin the variables device-side ONCE. Checkpoint/port paths hand back
        # host numpy leaves, and jit re-uploads those every call — measured
        # 194 ms/frame over the axon tunnel for a 2.4 ms forward (r3's
        # midas_ms=260 artifact). device_put makes the steady-state call
        # weight-transfer-free.
        return model, jax.device_put(variables)

    def _load_sd(sd):
        if isinstance(sd, (str, Path)):
            import torch

            raw = torch.load(sd, map_location="cpu")
            return raw.get("state_dict", raw) if isinstance(raw, dict) else raw
        return sd

    if arch == "dpt_large":
        from stereovision_tpu.models.dpt import (DPT_LARGE, create_dpt,
                                                 load_dpt_state_dict)

        cfg = DPT_LARGE if dpt_cfg is None else dpt_cfg
        model, variables = create_dpt(seed, net_hw, cfg)
        if torch_state_dict is not None:
            variables = load_dpt_state_dict(
                variables, _load_sd(torch_state_dict), cfg)
        return _commit(model, variables)
    if arch == "midas_v21_small":
        from stereovision_tpu.models.midas_v21 import create_v21, load_v21_state_dict

        model, variables = create_v21(seed, net_hw)
        if torch_state_dict is not None:
            if isinstance(torch_state_dict, (str, Path)):
                import torch

                sd = torch.load(torch_state_dict, map_location="cpu")
                torch_state_dict = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
            variables = load_v21_state_dict(variables, torch_state_dict)
        return _commit(model, variables)
    if arch != "small":
        raise ValueError(f"unknown mono-depth arch '{arch}'")
    model = MidasSmall()
    rng = jax.random.PRNGKey(seed)
    variables = model.init(rng, jnp.zeros((1, *net_hw, 3), jnp.float32))
    if pretrained:
        path = Path(__file__).resolve().parents[1] / "models" / "pretrained" / "midas_synthetic.msgpack"
        if path.exists():
            from stereovision_tpu.models.checkpoint import load_variables

            variables = load_variables(path, variables)
    return _commit(model, variables)


@functools.partial(jax.jit, static_argnames=("model", "net_hw"))
def estimate_depth(model, variables, frame_bgr, net_hw=(256, 256)):
    """(H, W, 3) BGR uint8/float → (depth_norm [0,255] (H, W), conf [0,1]).

    jit-compatible; batch by vmapping over a leading axis.
    """
    frame = frame_bgr.astype(jnp.float32)
    rgb = frame[..., ::-1] / 255.0
    H, W = frame.shape[0], frame.shape[1]
    small = im.resize(rgb, net_hw)
    pred = model.apply(variables, small[None])[0]
    depth = im.resize(pred, (H, W))
    depth_norm = im.minmax_normalize(depth, 0.0, 255.0)
    gray = im.grayscale_bgr(frame)
    contrast = jnp.abs(gray - im.gaussian_blur(gray, 5))
    conf = im.minmax_normalize(contrast, 0.0, 1.0)
    return depth_norm, conf
