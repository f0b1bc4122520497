"""Distributed Schur-complement BA on the virtual 8-device mesh."""

import numpy as np
import jax.numpy as jnp

from stereovision_tpu.core import geometry as geom
from stereovision_tpu.parallel import make_mesh
from stereovision_tpu.parallel.ba import distributed_mono_ba, mono_ba_init

RNG = np.random.default_rng(31)


def synth(n_views=16, noise=0.05):
    K = np.array([[650.0, 0, 320], [0, 655.0, 240], [0, 0, 1]])
    dist = np.array([0.05, -0.08, 0.0005, -0.0005, 0.01])
    xs, ys = np.meshgrid(np.arange(9), np.arange(6))
    obj = np.stack([xs.ravel() * 2.5, ys.ravel() * 2.5, np.zeros(54)], -1)
    imgs = []
    while len(imgs) < n_views:
        rvec = RNG.uniform(-0.35, 0.35, 3)
        tvec = np.array([RNG.uniform(-4, 4) - 10, RNG.uniform(-3, 3) - 6.25, RNG.uniform(25, 45)])
        proj = np.asarray(geom.project_points(
            jnp.asarray(obj), jnp.asarray(rvec), jnp.asarray(tvec),
            jnp.asarray(K), jnp.asarray(dist)))
        if proj[:, 0].min() < 5 or proj[:, 0].max() > 635 or proj[:, 1].min() < 5 or proj[:, 1].max() > 475:
            continue
        imgs.append(proj + RNG.normal(0, noise, proj.shape))
    return obj, np.asarray(imgs), K, dist


class TestDistributedBA:
    def test_matches_single_device_solver(self):
        from stereovision_tpu.calib import calibrate_camera

        obj, img, K, dist = synth()
        mesh = make_mesh(frame=8, tile=1)
        intr0, poses0 = mono_ba_init(obj, img, (640, 480))
        g, poses, rms = distributed_mono_ba(
            jnp.asarray(obj), jnp.asarray(img), jnp.asarray(intr0),
            jnp.asarray(poses0), mesh, iters=30,
        )
        single = calibrate_camera(obj, img, (640, 480))
        assert float(rms) < 0.12, float(rms)
        assert float(rms) <= single["reprojection_error"] * 1.1
        K_est = np.array([[g[0], 0, g[2]], [0, g[1], g[3]], [0, 0, 1]])
        np.testing.assert_allclose(K_est, K, rtol=3e-3)

    def test_fixed_intrinsics_pose_refinement(self):
        """The pose-only mode (multi-frame pose refinement over a sequence)."""
        obj, img, K, dist = synth(n_views=8, noise=0.02)
        mesh = make_mesh(frame=8, tile=1)
        intr_true = jnp.asarray(
            np.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2], *dist]))
        _, poses0 = mono_ba_init(obj, img, (640, 480))
        # perturb the poses; BA must pull them back
        poses_noisy = poses0 + RNG.normal(0, 0.01, poses0.shape)
        g, poses, rms = distributed_mono_ba(
            jnp.asarray(obj), jnp.asarray(img), intr_true,
            jnp.asarray(poses_noisy), mesh, iters=20, optimize_intrinsics=False,
        )
        assert float(rms) < 0.05, float(rms)
        np.testing.assert_allclose(np.asarray(g), np.asarray(intr_true))  # untouched
