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
