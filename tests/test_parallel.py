"""Multi-device tests on the virtual 8-CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from stereovision_tpu.parallel import make_mesh, sharded_disparity
from stereovision_tpu.stereo import SGMParams, compute_disparity

RNG = np.random.default_rng(5)


def pair_batch(b=8, h=48, w=96, shift=5):
    base = RNG.uniform(0, 255, size=(b, h, w + shift)).astype(np.float32)
    return base[:, :, :w], base[:, :, shift : shift + w]


class TestShardedDisparity:
    def test_frame_parallel_matches_single(self):
        left, right = pair_batch()
        p = SGMParams(num_disparities=16, impl="xla")
        mesh = make_mesh(frame=8, tile=1)
        disp, valid = sharded_disparity(jnp.asarray(left), jnp.asarray(right), p, mesh)
        d_ref, v_ref = compute_disparity(jnp.asarray(left[3]), jnp.asarray(right[3]), p)
        np.testing.assert_allclose(np.asarray(disp[3]), np.asarray(d_ref), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(valid[3]), np.asarray(v_ref))

    def test_tile_parallel_close_to_single(self):
        """Row-tiled solve matches the single-device result away from tile seams."""
        left, right = pair_batch(b=2, h=96, w=96)
        p = SGMParams(num_disparities=16, impl="xla", speckle_window_size=0)
        mesh = make_mesh(frame=2, tile=4)
        disp, valid = sharded_disparity(jnp.asarray(left), jnp.asarray(right), p, mesh)
        d_ref, v_ref = compute_disparity(jnp.asarray(left[0]), jnp.asarray(right[0]), p)
        d, v = np.asarray(disp[0]), np.asarray(valid[0])
        both = v & np.asarray(v_ref)
        agree = np.abs(d - np.asarray(d_ref))[both]
        assert (agree < 1.0).mean() > 0.95, (agree < 1.0).mean()


class TestShardedHier:
    def test_hier_mode_through_sharding(self):
        """Hierarchical engine under frame+tile sharding (erosion/warp are
        row-local, so tiling rows is safe)."""
        left, right = pair_batch(b=2, h=128, w=96, shift=5)
        p = SGMParams(num_disparities=40, mode="hier", coarse_scale=2,
                      refine_range=16, impl="xla", speckle_window_size=0)
        import jax

        mesh = make_mesh(frame=2, tile=2, devices=jax.devices()[:4])
        disp, valid = sharded_disparity(jnp.asarray(left), jnp.asarray(right), p, mesh)
        d, v = np.asarray(disp[0]), np.asarray(valid[0])
        good = d[20:-20, 30:-10][v[20:-20, 30:-10]]
        assert good.size > 500
        assert abs(np.median(good) - 5) < 1.0, np.median(good)


class TestBatchAPI:
    def test_compute_disparity_batch(self):
        from stereovision_tpu.stereo import compute_disparity_batch

        left, right = pair_batch(b=3, h=48, w=96, shift=5)
        p = SGMParams(num_disparities=16, impl="xla")
        disp, valid = compute_disparity_batch(jnp.asarray(left), jnp.asarray(right), p)
        assert disp.shape == (3, 48, 96)
        ref, _ = compute_disparity(jnp.asarray(left[1]), jnp.asarray(right[1]), p)
        np.testing.assert_allclose(np.asarray(disp[1]), np.asarray(ref), atol=1e-5)


class TestExactTileParallel:
    def test_bit_exact_vs_single_device(self):
        """The chained vertical aggregation must reproduce the single-device
        result exactly (not just near the seams like the halo approximation)."""
        import jax

        from stereovision_tpu.parallel.disparity_exact import sharded_disparity_exact

        left, right = pair_batch(b=2, h=96, w=96, shift=5)
        p = SGMParams(num_disparities=16, impl="xla")
        mesh = make_mesh(frame=2, tile=4)
        disp, valid = sharded_disparity_exact(left, right, p, mesh)
        for b in range(2):
            d_ref, v_ref = compute_disparity(jnp.asarray(left[b]), jnp.asarray(right[b]), p)
            np.testing.assert_allclose(np.asarray(disp[b]), np.asarray(d_ref), atol=0)
            np.testing.assert_array_equal(np.asarray(valid[b]), np.asarray(v_ref))

    def test_exact_with_speckle_off_and_no_lr(self):
        from stereovision_tpu.parallel.disparity_exact import sharded_disparity_exact

        left, right = pair_batch(b=2, h=64, w=80, shift=4)
        p = SGMParams(num_disparities=16, impl="xla", lr_max_diff=-1,
                      speckle_window_size=0, median_ksize=3)
        import jax

        mesh = make_mesh(frame=2, tile=2, devices=jax.devices()[:4])
        disp, valid = sharded_disparity_exact(left, right, p, mesh)
        d_ref, v_ref = compute_disparity(jnp.asarray(left[0]), jnp.asarray(right[0]), p)
        np.testing.assert_allclose(np.asarray(disp[0]), np.asarray(d_ref), atol=0)


class TestSeededDualKernel:
    def test_chain_reproduces_full_scan(self):
        """aggregate_dual's boundary-carry mode: splitting the scan into two
        seeded calls (boundary = predecessor's final carry) must reproduce the
        unseeded full-array scan bit-for-bit, including with a non-multiple
        row count (asymmetric fwd/bwd padding) and a zero boundary ≡ fresh."""
        from stereovision_tpu.ops.sgm_pallas import aggregate_dual

        rng = np.random.default_rng(3)
        S, X, D = 25, 96, 128
        cost = jnp.asarray(rng.integers(0, 40, (S, X, D)).astype(np.float32))
        lf_ref, lb_ref = aggregate_dual(cost, 8.0, 32.0, axis=0,
                                        out_dtype=jnp.int16, interpret=True)
        z = jnp.zeros((X, D), jnp.float32)
        lf, lb, ff, fb = aggregate_dual(
            cost, 8.0, 32.0, axis=0, out_dtype=jnp.int16,
            boundary=(z, z), return_final=True, interpret=True)
        np.testing.assert_array_equal(np.asarray(lf), np.asarray(lf_ref))
        np.testing.assert_array_equal(np.asarray(lb), np.asarray(lb_ref))
        s0 = 10
        _, _, ff0, _ = aggregate_dual(
            cost[:s0], 8.0, 32.0, axis=0, out_dtype=jnp.int16,
            boundary=(z, z), return_final=True, interpret=True)
        lf1, _, _, fb1 = aggregate_dual(
            cost[s0:], 8.0, 32.0, axis=0, out_dtype=jnp.int16,
            boundary=(ff0, z), return_final=True, interpret=True)
        lf0, lb0, _, _ = aggregate_dual(
            cost[:s0], 8.0, 32.0, axis=0, out_dtype=jnp.int16,
            boundary=(z, fb1), return_final=True, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(jnp.concatenate([lf0, lf1])), np.asarray(lf_ref))
        np.testing.assert_array_equal(
            np.asarray(jnp.concatenate([lb0, lb_ref[s0:]])), np.asarray(lb_ref))


class TestExactPallasTileParallel:
    def test_sweep_pallas_kernels_bit_exact(self):
        """The ntiles-sweep exact chain on the production Pallas kernels must
        match the single-device Pallas engine bit-for-bit."""
        from stereovision_tpu.parallel.disparity_exact import sharded_disparity_exact

        left, right = pair_batch(b=2, h=96, w=96, shift=5)
        p = SGMParams(num_disparities=16, impl="pallas_interpret")
        mesh = make_mesh(frame=2, tile=4)
        disp, valid = sharded_disparity_exact(left, right, p, mesh)
        for b in range(2):
            d_ref, v_ref = compute_disparity(jnp.asarray(left[b]), jnp.asarray(right[b]), p)
            np.testing.assert_allclose(np.asarray(disp[b]), np.asarray(d_ref), atol=0)
            np.testing.assert_array_equal(np.asarray(valid[b]), np.asarray(v_ref))


class TestPipelinedExact:
    def test_pipelined_bit_exact_vs_single_device(self):
        """The software-pipelined vertical chain (one boundary ppermute per
        pipeline step, B+T−1 steps for B frames) must reproduce the
        single-device result exactly, like the sweep formulation."""
        from stereovision_tpu.parallel.disparity_exact import (
            sharded_disparity_exact_pipelined,
        )

        left, right = pair_batch(b=6, h=96, w=96, shift=5)
        p = SGMParams(num_disparities=16, impl="xla")
        mesh = make_mesh(frame=2, tile=4)
        disp, valid = sharded_disparity_exact_pipelined(left, right, p, mesh)
        for b in range(6):
            d_ref, v_ref = compute_disparity(jnp.asarray(left[b]), jnp.asarray(right[b]), p)
            np.testing.assert_allclose(np.asarray(disp[b]), np.asarray(d_ref), atol=0)
            np.testing.assert_array_equal(np.asarray(valid[b]), np.asarray(v_ref))

    def test_pipelined_pallas_kernels_bit_exact(self):
        """The pipelined chain on the production Pallas kernels (seeded
        dual-direction sweeps, separate backward-cost frame) must match the
        single-device Pallas engine bit-for-bit."""
        from stereovision_tpu.parallel.disparity_exact import (
            sharded_disparity_exact_pipelined,
        )

        left, right = pair_batch(b=4, h=96, w=96, shift=5)
        p = SGMParams(num_disparities=16, impl="pallas_interpret")
        mesh = make_mesh(frame=2, tile=4)
        disp, valid = sharded_disparity_exact_pipelined(left, right, p, mesh)
        for b in range(4):
            d_ref, v_ref = compute_disparity(jnp.asarray(left[b]), jnp.asarray(right[b]), p)
            np.testing.assert_allclose(np.asarray(disp[b]), np.asarray(d_ref), atol=0)
            np.testing.assert_array_equal(np.asarray(valid[b]), np.asarray(v_ref))

    def test_pipelined_single_frame_per_shard(self):
        """Degenerate pipeline (Bl=1) still exact — pure fill/drain."""
        from stereovision_tpu.parallel.disparity_exact import (
            sharded_disparity_exact_pipelined,
        )

        left, right = pair_batch(b=1, h=64, w=80, shift=4)
        p = SGMParams(num_disparities=16, impl="xla", lr_max_diff=-1,
                      speckle_window_size=0, median_ksize=3)
        import jax

        mesh = make_mesh(frame=1, tile=4, devices=jax.devices()[:4])
        disp, valid = sharded_disparity_exact_pipelined(left, right, p, mesh)
        d_ref, v_ref = compute_disparity(jnp.asarray(left[0]), jnp.asarray(right[0]), p)
        np.testing.assert_allclose(np.asarray(disp[0]), np.asarray(d_ref), atol=0)
        np.testing.assert_array_equal(np.asarray(valid[0]), np.asarray(v_ref))
