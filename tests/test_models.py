"""Neural mono-depth model: shapes, jit, and the estimator contract."""

import numpy as np
import jax
import jax.numpy as jnp

from stereovision_tpu.mono.nn import create_model, estimate_depth


class TestMidasSmall:
    def test_forward_shapes_and_contract(self):
        model, variables = create_model(net_hw=(128, 128))
        frame = np.random.default_rng(0).uniform(0, 255, (96, 120, 3)).astype(np.float32)
        depth, conf = estimate_depth(model, variables, jnp.asarray(frame), net_hw=(128, 128))
        assert depth.shape == (96, 120)
        assert conf.shape == (96, 120)
        d = np.asarray(depth)
        assert d.min() >= 0.0 and d.max() <= 255.0 + 1e-3
        assert abs(d.max() - 255.0) < 1e-2  # minmax-normalized
        c = np.asarray(conf)
        assert c.min() >= 0.0 and c.max() <= 1.0 + 1e-5

    def test_batched_vmap(self):
        model, variables = create_model(net_hw=(64, 64))
        frames = jnp.zeros((2, 64, 64, 3), jnp.float32)
        f = jax.vmap(lambda fr: estimate_depth(model, variables, fr, net_hw=(64, 64)))
        depth, conf = f(frames)
        assert depth.shape == (2, 64, 64)

    def test_param_count_is_midas_small_class(self):
        model, variables = create_model(net_hw=(64, 64))
        n = sum(x.size for x in jax.tree.leaves(variables["params"]))
        # MiDaS_small is ~21M params; this lite variant should be 1M–30M
        assert 1e6 < n < 3e7, n


class TestPretrainedWeights:
    def test_bundled_weights_order_depth(self):
        """The bundled synthetic-pretrained weights must rank depths far better
        than chance on held-out procedural scenes (spearman ≥ 0.5)."""
        from pathlib import Path

        import stereovision_tpu

        wpath = Path(stereovision_tpu.__file__).parent / "models" / "pretrained" / "midas_synthetic.msgpack"
        if not wpath.exists():
            import pytest

            pytest.skip("no bundled weights")
        from scipy.stats import spearmanr

        from stereovision_tpu.models.synthetic_scenes import make_scene
        from stereovision_tpu.mono.nn import create_model, estimate_depth

        model, variables = create_model(net_hw=(128, 128), pretrained=True)
        rng = np.random.default_rng(55555)
        cors = []
        for _ in range(4):
            img, invd = make_scene(rng, 128)
            d, _ = estimate_depth(model, variables, jnp.asarray(img[..., ::-1]), net_hw=(128, 128))
            cors.append(spearmanr(np.asarray(d).ravel()[::11], invd.ravel()[::11]).statistic)
        assert np.mean(cors) > 0.5, cors


class TestTorchStateDictPort:
    def _fake_state_dict(self, variables):
        """Build a torch-layout state_dict from flax variables: conv kernels
        HWIO→OIHW, bn (weight, bias, running_mean, running_var) per module —
        with fresh random values so slot alignment is actually exercised."""
        from stereovision_tpu.models.midas import _walk_ordered

        rng = np.random.default_rng(7)
        sd = {}
        i = 0
        bn_mods = {}
        for path, leaf in _walk_ordered(jax.device_get(variables["params"])):
            mod = path[-2] if len(path) >= 2 else ""
            if leaf.ndim == 4 and path[-1] == "kernel":
                sd[f"layers.{i}.weight"] = rng.normal(
                    size=np.transpose(leaf, (3, 2, 0, 1)).shape
                ).astype(np.float32)
                i += 1
            elif path[-1] == "bias" and mod.startswith("Conv"):
                # torch keeps the conv bias beside its weight; emitting it
                # under the previous layer index preserves stream order
                sd[f"layers.{i - 1}.bias"] = rng.normal(size=leaf.shape).astype(np.float32)
            elif mod.startswith("BatchNorm"):
                mp = path[:-1]
                if mp not in bn_mods:
                    bn_mods[mp] = i
                    n = leaf.shape[0]
                    sd[f"layers.{i}.weight"] = rng.normal(size=n).astype(np.float32)
                    sd[f"layers.{i}.bias"] = rng.normal(size=n).astype(np.float32)
                    sd[f"layers.{i}.running_mean"] = rng.normal(size=n).astype(np.float32)
                    sd[f"layers.{i}.running_var"] = rng.uniform(0.5, 2, size=n).astype(np.float32)
                    sd[f"layers.{i}.num_batches_tracked"] = np.asarray(1)
                    i += 1
        return sd

    def test_roundtrip_and_forward(self):
        from stereovision_tpu.models.midas import _walk_ordered, load_torch_state_dict

        model, variables = create_model(net_hw=(64, 64))
        sd = self._fake_state_dict(variables)
        loaded = load_torch_state_dict(variables, sd)
        # every conv kernel / bn leaf must carry the state_dict's values
        conv_w = [v for k, v in sd.items() if k.endswith("weight") and v.ndim == 4]
        got_w = [
            np.asarray(leaf)
            for path, leaf in _walk_ordered(jax.device_get(loaded["params"]))
            if getattr(leaf, "ndim", 0) == 4 and path[-1] == "kernel"
        ]
        assert len(conv_w) == len(got_w)
        for w_t, w_f in zip(conv_w, got_w):
            np.testing.assert_array_equal(np.transpose(w_t, (2, 3, 1, 0)), w_f)
        bn_means = [v for k, v in sd.items() if k.endswith("running_mean")]
        got_means = [
            np.asarray(leaf)
            for path, leaf in _walk_ordered(jax.device_get(loaded["batch_stats"]))
            if path[-1] == "mean"
        ]
        assert len(bn_means) == len(got_means)
        for m_t, m_f in zip(bn_means, got_means):
            np.testing.assert_array_equal(m_t, m_f)
        # and the loaded model still runs
        out = model.apply(loaded, jnp.zeros((1, 64, 64, 3), jnp.float32))
        assert out.shape == (1, 64, 64) and bool(jnp.all(jnp.isfinite(out)))

    def test_shape_mismatch_raises(self):
        from stereovision_tpu.models.midas import load_torch_state_dict

        model, variables = create_model(net_hw=(64, 64))
        sd = self._fake_state_dict(variables)
        first_w = next(k for k, v in sd.items() if v.ndim == 4)
        sd[first_w] = np.zeros((7, 7, 7, 7), np.float32)
        import pytest

        with pytest.raises(ValueError, match="shape mismatch|ran out"):
            load_torch_state_dict(variables, sd)
