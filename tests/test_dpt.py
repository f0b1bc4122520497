"""DPT_Large exact-architecture port (models/dpt.py).

An INDEPENDENT torch replica of the hub DPT_Large (timm vit_large_patch16_384
encoder + DPT scratch, built here from the MiDaS repo's module structure)
cross-checks the manifest, and random torch weights loaded through
load_dpt_state_dict must reproduce the torch forward numerically — project
readout, exact GELU, align-corners fusion upsampling, stride-matched
transposed convs and all. The full-size manifest is checked against a
meta-device replica (no weight memory). If this passes, the real
``dpt_large-midas-2f21e586.pt`` drops in unchanged.

Reference behavior anchor: /root/reference/MONO/mono_depth_map_ai.py:24-69
(model_type "DPT_Large" hub load)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
tnn = torch.nn
F = torch.nn.functional

from stereovision_tpu.models import dpt as jdpt


class _Attention(tnn.Module):
    def __init__(self, C, heads):
        super().__init__()
        self.heads = heads
        self.qkv = tnn.Linear(C, 3 * C, bias=True)
        self.proj = tnn.Linear(C, C)

    def forward(self, x):
        B, N, C = x.shape
        hd = C // self.heads
        qkv = self.qkv(x).reshape(B, N, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = (q @ k.transpose(-2, -1)) * hd ** -0.5
        x = (att.softmax(dim=-1) @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class _Mlp(tnn.Module):
    def __init__(self, C, ratio):
        super().__init__()
        self.fc1 = tnn.Linear(C, ratio * C)
        self.fc2 = tnn.Linear(ratio * C, C)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class _Block(tnn.Module):
    def __init__(self, C, heads, ratio):
        super().__init__()
        self.norm1 = tnn.LayerNorm(C, eps=1e-6)
        self.attn = _Attention(C, heads)
        self.norm2 = tnn.LayerNorm(C, eps=1e-6)
        self.mlp = _Mlp(C, ratio)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class _PatchEmbed(tnn.Module):
    def __init__(self, C, P):
        super().__init__()
        self.proj = tnn.Conv2d(3, C, P, P)


class _ViT(tnn.Module):
    """timm vit_*_patch16 structure (only what the checkpoint serializes)."""

    def __init__(self, cfg):
        super().__init__()
        C, gs = cfg.embed_dim, cfg.img_size // cfg.patch_size
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, C))
        self.pos_embed = tnn.Parameter(torch.randn(1, 1 + gs * gs, C) * 0.02)
        self.patch_embed = _PatchEmbed(C, cfg.patch_size)
        self.blocks = tnn.ModuleList(
            [_Block(C, cfg.num_heads, cfg.mlp_ratio) for _ in range(cfg.depth)])
        self.norm = tnn.LayerNorm(C, eps=1e-6)
        self.head = tnn.Linear(C, cfg.num_classes)


class _ProjectReadout(tnn.Module):
    def __init__(self, C):
        super().__init__()
        self.project = tnn.Sequential(tnn.Linear(2 * C, C), tnn.GELU())

    def forward(self, x):
        readout = x[:, 0].unsqueeze(1).expand_as(x[:, 1:])
        return self.project(torch.cat((x[:, 1:], readout), -1))


class _RCU(tnn.Module):
    def __init__(self, f):
        super().__init__()
        self.conv1 = tnn.Conv2d(f, f, 3, 1, 1, bias=True)
        self.conv2 = tnn.Conv2d(f, f, 3, 1, 1, bias=True)

    def forward(self, x):
        return x + self.conv2(F.relu(self.conv1(F.relu(x))))


class _Fusion(tnn.Module):
    def __init__(self, f):
        super().__init__()
        self.out_conv = tnn.Conv2d(f, f, 1, bias=True)
        self.resConfUnit1 = _RCU(f)
        self.resConfUnit2 = _RCU(f)

    def forward(self, x, skip=None):
        if skip is not None:
            x = x + self.resConfUnit1(skip)
        x = self.resConfUnit2(x)
        x = F.interpolate(x, scale_factor=2, mode="bilinear",
                          align_corners=True)
        return self.out_conv(x)


class _TorchDPT(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        C, Fch = cfg.embed_dim, cfg.features
        self.cfg = cfg
        self.pretrained = tnn.Module()
        self.pretrained.model = _ViT(cfg)
        po = cfg.post_channels

        def post(idx):
            mods = [_ProjectReadout(C), tnn.Identity(), tnn.Identity(),
                    tnn.Conv2d(C, po[idx], 1)]
            if idx == 0:
                mods.append(tnn.ConvTranspose2d(po[0], po[0], 4, 4))
            elif idx == 1:
                mods.append(tnn.ConvTranspose2d(po[1], po[1], 2, 2))
            elif idx == 3:
                mods.append(tnn.Conv2d(po[3], po[3], 3, 2, 1))
            return tnn.Sequential(*mods)

        self.pretrained.act_postprocess1 = post(0)
        self.pretrained.act_postprocess2 = post(1)
        self.pretrained.act_postprocess3 = post(2)
        self.pretrained.act_postprocess4 = post(3)
        self.scratch = tnn.Module()
        for i in range(4):
            setattr(self.scratch, f"layer{i + 1}_rn",
                    tnn.Conv2d(po[i], Fch, 3, 1, 1, bias=False))
        for i in (1, 2, 3, 4):
            setattr(self.scratch, f"refinenet{i}", _Fusion(Fch))
        self.scratch.output_conv = tnn.Sequential(
            tnn.Conv2d(Fch, Fch // 2, 3, 1, 1), tnn.Identity(),
            tnn.Conv2d(Fch // 2, 32, 3, 1, 1), tnn.ReLU(),
            tnn.Conv2d(32, 1, 1), tnn.ReLU(), tnn.Identity())

    def forward(self, x):
        cfg = self.cfg
        x = (x - 0.5) / 0.5
        B, _, H, W = x.shape
        P = cfg.patch_size
        gh, gw = H // P, W // P
        m = self.pretrained.model
        t = m.patch_embed.proj(x).flatten(2).transpose(1, 2)
        t = torch.cat((m.cls_token.expand(B, -1, -1), t), dim=1)
        gs = cfg.img_size // P
        pe = m.pos_embed
        if (gh, gw) != (gs, gs):  # MiDaS _resize_pos_embed
            grid = pe[:, 1:].reshape(1, gs, gs, -1).permute(0, 3, 1, 2)
            grid = F.interpolate(grid, size=(gh, gw), mode="bilinear",
                                 align_corners=False)
            grid = grid.permute(0, 2, 3, 1).reshape(1, gh * gw, -1)
            pe = torch.cat([pe[:, :1], grid], dim=1)
        t = t + pe
        acts = {}
        for i, blk in enumerate(m.blocks):
            t = blk(t)
            if i in cfg.hooks:
                acts[i] = t
        layers = []
        for idx, hook in enumerate(cfg.hooks):
            seq = getattr(self.pretrained, f"act_postprocess{idx + 1}")
            v = seq[0](acts[hook])  # ProjectReadout
            v = v.transpose(1, 2).reshape(B, -1, gh, gw)
            for mod in list(seq)[3:]:
                v = mod(v)
            layers.append(v)
        s = self.scratch
        rn = [getattr(s, f"layer{i + 1}_rn")(layers[i]) for i in range(4)]
        path = s.refinenet4(rn[3])
        path = s.refinenet3(path, rn[2])
        path = s.refinenet2(path, rn[1])
        path = s.refinenet1(path, rn[0])
        d = s.output_conv[0](path)
        d = F.interpolate(d, scale_factor=2, mode="bilinear",
                          align_corners=True)
        for mod in list(s.output_conv)[2:]:
            d = mod(d)
        return d[:, 0]


class TestDPT:
    def test_full_manifest_matches_meta_replica(self):
        """The vendored full-size manifest equals a meta-device torch
        replica's state_dict (keys, order, shapes) — zero weight memory."""
        with torch.device("meta"):
            model = _TorchDPT(jdpt.DPT_LARGE)
        got = [(k, tuple(v.shape)) for k, v in model.state_dict().items()]
        assert got == jdpt.load_manifest()

    def test_manifest_param_count_is_dpt_large(self):
        n = sum(int(np.prod(s)) for _, s in jdpt.load_manifest())
        # ~345M params (ViT-L/16 + DPT scratch + classification head)
        assert 330e6 < n < 360e6, n

    def test_random_torch_weights_reproduce_forward(self):
        cfg = jdpt.DPT_TINY
        torch.manual_seed(0)
        model = _TorchDPT(cfg).eval()
        sd = model.state_dict()
        assert [(k, tuple(v.shape)) for k, v in sd.items()] == \
            jdpt.expected_manifest(cfg)
        jm, variables = jdpt.create_dpt(0, (cfg.img_size, cfg.img_size), cfg)
        variables = jdpt.load_dpt_state_dict(variables, sd, cfg)
        rng = np.random.default_rng(0)
        for hw in ((cfg.img_size, cfg.img_size),
                   (cfg.img_size + 2 * cfg.patch_size, cfg.img_size)):
            x = rng.uniform(0, 1, (1, *hw, 3)).astype(np.float32)
            with torch.no_grad():
                want = model(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
            got = np.asarray(jm.apply(variables, x))
            np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_validate_rejects_wrong_checkpoint(self):
        cfg = jdpt.DPT_TINY
        sd = _TorchDPT(cfg).state_dict()
        bad = {k: v for k, v in sd.items()
               if k != "scratch.output_conv.4.bias"}
        with pytest.raises(ValueError, match="missing"):
            jdpt.validate_state_dict(bad, cfg)

    def test_create_model_arch_dpt(self):
        """mono.nn.create_model exposes the DPT_Large port path (tiny cfg
        injected for test speed)."""
        from stereovision_tpu.mono.nn import create_model

        model, variables = create_model(arch="dpt_large", net_hw=(64, 64),
                                        dpt_cfg=jdpt.DPT_TINY)
        out = model.apply(variables, np.zeros((1, 64, 64, 3), np.float32))
        assert out.shape == (1, 64, 64)
