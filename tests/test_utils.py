"""Utils: logging/StageTimer, annotation, model checkpointing."""

import numpy as np
import jax.numpy as jnp

from stereovision_tpu.utils import StageTimer
from stereovision_tpu.utils.annotate import depth_legend, draw_text, status_panel


class TestStageTimer:
    def test_accumulates_and_reports(self):
        t = StageTimer(report_every=2)
        for _ in range(2):
            with t.stage("stereo"):
                pass
            with t.stage("flow"):
                pass
            t.frame_done(0.01)
        rep = t._last_report
        assert rep is not None
        assert "stereo" in rep and "flow" in rep
        assert rep["fps"] == 100.0


class TestAnnotate:
    def test_draw_text_modifies_pixels(self):
        img = np.zeros((60, 200, 3), np.uint8)
        out = draw_text(img, ["hello", "world"])
        assert out.shape == img.shape
        assert out.sum() > 0
        assert img.sum() == 0  # original untouched

    def test_status_panel_and_legend(self):
        p = status_panel({"occlusion": "none", "stereo_weight": 0.8})
        assert p.shape == (280, 450, 3)
        leg = depth_legend()
        assert leg.shape == (200, 60, 3)
        # legend spans the colormap (top ≠ bottom)
        assert not np.array_equal(leg[0], leg[-1])


class TestModelCheckpoint:
    def test_roundtrip(self, tmp_path):
        from stereovision_tpu.models.checkpoint import load_variables, save_variables
        from stereovision_tpu.mono.nn import create_model, estimate_depth

        model, variables = create_model(net_hw=(64, 64))
        path = save_variables(tmp_path / "midas.msgpack", variables)
        _, fresh = create_model(seed=123, net_hw=(64, 64))
        restored = load_variables(path, fresh)
        frame = jnp.zeros((64, 64, 3), jnp.float32)
        a, _ = estimate_depth(model, variables, frame, net_hw=(64, 64))
        b, _ = estimate_depth(model, restored, frame, net_hw=(64, 64))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestBackendGate:
    def test_axon_platform_counts_as_tpu(self, monkeypatch):
        """The environment's TPU registers as the "axon" platform — every
        backend gate must treat it as TPU (VERDICT r4: a bare == "tpu" check
        in mono/flow.py kept the fused pipeline on the 10x-slower gather
        warp for a whole round)."""
        import jax

        from stereovision_tpu.utils import backend

        for name, want in (("tpu", True), ("axon", True), ("cpu", False)):
            monkeypatch.setattr(jax, "default_backend", lambda n=name: n)
            assert backend.is_tpu_backend() == want, name

    def test_no_bare_tpu_string_compares(self):
        """No module may compare default_backend() against "tpu" directly —
        grep-level guard so the axon alias can't regress site by site."""
        import pathlib

        root = pathlib.Path(__file__).resolve().parents[1]
        offenders = []
        for py in (root / "stereovision_tpu").rglob("*.py"):
            if py.name == "backend.py":
                continue
            text = py.read_text()
            if "default_backend" in text and (
                '== "tpu"' in text or "== 'tpu'" in text
                or 'in ("tpu",' in text or "('tpu'," in text
            ):
                offenders.append(str(py))
        assert not offenders, offenders
