"""MiDaS v2.1 small exact-architecture port (models/midas_v21.py).

An INDEPENDENT torch replica of the hub model (gen-efficientnet
tf_efficientnet_lite3 + MidasNet_small decoder, built here from the MiDaS
repo's module structure) cross-checks the vendored manifest, and random torch
weights loaded through load_v21_state_dict must reproduce the torch forward
numerically — TF-SAME padding, BN eps 1e-3, align-corners upsampling and all.
If this passes, the real checkpoint drops in unchanged."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
tnn = torch.nn
F = torch.nn.functional


def _tf_pad(x, k, s):
    ih, iw = x.shape[-2:]
    ph = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
    pw = max((math.ceil(iw / s) - 1) * s + k - iw, 0)
    return F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])


class Conv2dSame(tnn.Conv2d):
    """TF-SAME padded conv (what the tf_ gen-efficientnet variants use)."""

    def forward(self, x):
        return self._conv_forward(
            _tf_pad(x, self.kernel_size[0], self.stride[0]), self.weight, self.bias
        )


class _DS(tnn.Module):
    """gen-efficientnet DepthwiseSeparableConv (lite: no SE, no pw act)."""

    def __init__(self, cin, cout, k):
        super().__init__()
        self.conv_dw = Conv2dSame(cin, cin, k, 1, groups=cin, bias=False)
        self.bn1 = tnn.BatchNorm2d(cin, eps=1e-3)
        self.conv_pw = tnn.Conv2d(cin, cout, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        h = F.relu6(self.bn1(self.conv_dw(x)))
        return self.bn2(self.conv_pw(h))


class _IR(tnn.Module):
    """gen-efficientnet InvertedResidual (lite: no SE, ReLU6)."""

    def __init__(self, cin, cout, k, stride, e):
        super().__init__()
        h = cin * e
        self.has_res = stride == 1 and cin == cout
        self.conv_pw = tnn.Conv2d(cin, h, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(h, eps=1e-3)
        self.conv_dw = Conv2dSame(h, h, k, stride, groups=h, bias=False)
        self.bn2 = tnn.BatchNorm2d(h, eps=1e-3)
        self.conv_pwl = tnn.Conv2d(h, cout, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        h = F.relu6(self.bn1(self.conv_pw(x)))
        h = F.relu6(self.bn2(self.conv_dw(h)))
        h = self.bn3(self.conv_pwl(h))
        return x + h if self.has_res else h


class _RCU(tnn.Module):
    def __init__(self, f):
        super().__init__()
        self.conv1 = tnn.Conv2d(f, f, 3, 1, 1, bias=True)
        self.conv2 = tnn.Conv2d(f, f, 3, 1, 1, bias=True)

    def forward(self, x):
        out = self.conv2(F.relu(self.conv1(F.relu(x))))
        return out + x


class _Fusion(tnn.Module):
    """FeatureFusionBlock_custom(deconv=False, bn=False, align_corners=True).
    Registration order (out_conv first) matters for the manifest."""

    def __init__(self, f, expand):
        super().__init__()
        self.out_conv = tnn.Conv2d(f, f // 2 if expand else f, 1, bias=True)
        self.resConfUnit1 = _RCU(f)
        self.resConfUnit2 = _RCU(f)

    def forward(self, x, skip=None):
        if skip is not None:
            x = x + self.resConfUnit1(skip)
        x = self.resConfUnit2(x)
        x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
        return self.out_conv(x)


class _Interpolate(tnn.Module):
    def forward(self, x):
        return F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)


def build_torch_replica():
    from stereovision_tpu.models.midas_v21 import FEATURES, LITE3_STAGES, RN_IN, RN_OUT

    stages = []
    for (n, k, stride, e, cin, cout) in LITE3_STAGES:
        blocks = []
        for b in range(n):
            ci = cin if b == 0 else cout
            st = stride if b == 0 else 1
            blocks.append(_DS(ci, cout, k) if e == 1 else _IR(ci, cout, k, st, e))
        stages.append(tnn.Sequential(*blocks))

    model = tnn.Module()
    pretrained = tnn.Module()
    pretrained.layer1 = tnn.Sequential(
        Conv2dSame(3, 32, 3, 2, bias=False), tnn.BatchNorm2d(32, eps=1e-3),
        tnn.ReLU6(), stages[0], stages[1],
    )
    pretrained.layer2 = tnn.Sequential(stages[2])
    pretrained.layer3 = tnn.Sequential(stages[3], stages[4])
    pretrained.layer4 = tnn.Sequential(stages[5], stages[6])
    scratch = tnn.Module()
    for i in range(4):
        setattr(scratch, f"layer{i + 1}_rn",
                tnn.Conv2d(RN_IN[i], RN_OUT[i], 3, 1, 1, bias=False))
    scratch.refinenet4 = _Fusion(RN_OUT[3], expand=True)
    scratch.refinenet3 = _Fusion(RN_OUT[2], expand=True)
    scratch.refinenet2 = _Fusion(RN_OUT[1], expand=True)
    scratch.refinenet1 = _Fusion(RN_OUT[0], expand=False)
    scratch.output_conv = tnn.Sequential(
        tnn.Conv2d(FEATURES, FEATURES // 2, 3, 1, 1), _Interpolate(),
        tnn.Conv2d(FEATURES // 2, 32, 3, 1, 1), tnn.ReLU(),
        tnn.Conv2d(32, 1, 1), tnn.ReLU(), tnn.Identity(),
    )
    model.pretrained = pretrained
    model.scratch = scratch

    def forward(x):
        l1 = pretrained.layer1(x)
        l2 = pretrained.layer2(l1)
        l3 = pretrained.layer3(l2)
        l4 = pretrained.layer4(l3)
        r1, r2 = scratch.layer1_rn(l1), scratch.layer2_rn(l2)
        r3, r4 = scratch.layer3_rn(l3), scratch.layer4_rn(l4)
        p = scratch.refinenet4(r4)
        p = scratch.refinenet3(p, r3)
        p = scratch.refinenet2(p, r2)
        p = scratch.refinenet1(p, r1)
        return scratch.output_conv(p).squeeze(1)

    model.forward = forward
    return model


class TestManifest:
    def test_torch_replica_matches_vendored_manifest(self):
        """Two independent reconstructions of the checkpoint layout (the
        manifest generator and this torch module tree) must agree exactly —
        ordered names AND shapes."""
        from stereovision_tpu.models.midas_v21 import expected_manifest, load_manifest

        model = build_torch_replica()
        got = [
            (k, tuple(v.shape))
            for k, v in model.state_dict().items()
            if not k.endswith("num_batches_tracked")
        ]
        assert got == expected_manifest()
        assert got == load_manifest()  # the vendored JSON is in sync

    def test_param_count_is_midas_small(self):
        """21.3M parameters — the published MiDaS_small size."""
        from stereovision_tpu.models.midas_v21 import expected_manifest

        n = sum(
            int(np.prod(s)) for k, s in expected_manifest() if "running" not in k
        )
        assert 21.0e6 < n < 21.7e6, n


class TestWeightPort:
    def test_random_torch_weights_reproduce_forward(self):
        """Load a random (real-layout) torch checkpoint into the flax model
        and require numerically matching forwards — validates conv layout
        transposes, TF-SAME padding, BN eps, align-corners upsampling."""
        import jax.numpy as jnp

        from stereovision_tpu.models.midas_v21 import (
            create_v21, load_v21_state_dict,
        )

        torch.manual_seed(0)
        replica = build_torch_replica()
        # batch-norm running stats must be non-trivial for a real test
        sd = replica.state_dict()
        for k, v in sd.items():
            if k.endswith("running_mean"):
                sd[k] = torch.randn_like(v) * 0.05
            elif k.endswith("running_var"):
                sd[k] = torch.rand_like(v) * 0.5 + 0.75
        replica.load_state_dict(sd)
        for m in replica.modules():
            m.eval()

        model, variables = create_v21(net_hw=(64, 96))
        variables = load_v21_state_dict(variables, replica.state_dict())

        rng = np.random.default_rng(7)
        x = rng.uniform(0, 1, (1, 64, 96, 3)).astype(np.float32)
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        xt = torch.from_numpy(((x - mean) / std).transpose(0, 3, 1, 2).copy())
        with torch.no_grad():
            want = replica.forward(xt).numpy()
        got = np.asarray(model.apply(variables, jnp.asarray(x)))
        assert got.shape == want.shape == (1, 64, 96)
        scale = max(1.0, float(np.abs(want).max()))
        assert np.max(np.abs(got - want)) / scale < 2e-4, (
            np.max(np.abs(got - want)), scale
        )

    def test_validate_rejects_wrong_checkpoint(self):
        from stereovision_tpu.models.midas_v21 import validate_state_dict

        with pytest.raises(ValueError, match="missing keys"):
            validate_state_dict({"pretrained.layer1.0.weight": np.zeros((32, 3, 3, 3))})
