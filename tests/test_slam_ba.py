"""Distributed SfM bundle adjustment (poses + landmarks, Schur + CG)."""

import numpy as np
import jax.numpy as jnp

from stereovision_tpu.core import geometry as geom
from stereovision_tpu.parallel import make_mesh
from stereovision_tpu.parallel.ba_landmarks import distributed_slam_ba

RNG = np.random.default_rng(61)


def synth_sequence(F=8, L=120, M=80, noise=0.2):
    """Camera translating through a 3-D point cloud."""
    intr = np.array([500.0, 500.0, 320.0, 240.0])
    landmarks = RNG.uniform([-6, -4, 8], [6, 4, 20], (L, 3))
    poses = []
    for f in range(F):
        rvec = RNG.normal(0, 0.01, 3)
        tvec = np.array([-0.4 * f, 0.02 * f, 0.05 * f]) + RNG.normal(0, 0.01, 3)
        poses.append(np.concatenate([rvec, tvec]))
    poses = np.asarray(poses)
    obs_uv = np.zeros((F, M, 2))
    obs_lid = np.zeros((F, M), np.int32)
    obs_mask = np.zeros((F, M), bool)
    for f in range(F):
        R = np.asarray(geom.rodrigues(jnp.asarray(poses[f, :3])))
        cam = landmarks @ R.T + poses[f, 3:]
        uv = cam[:, :2] / cam[:, 2:] * intr[:2] + intr[2:]
        vis = (
            (cam[:, 2] > 1) & (uv[:, 0] > 0) & (uv[:, 0] < 640)
            & (uv[:, 1] > 0) & (uv[:, 1] < 480)
        )
        ids = np.nonzero(vis)[0][:M]
        obs_uv[f, : len(ids)] = uv[ids] + RNG.normal(0, noise, (len(ids), 2))
        obs_lid[f, : len(ids)] = ids
        obs_mask[f, : len(ids)] = True
    return intr, poses, landmarks, obs_uv, obs_lid, obs_mask


class TestSlamBA:
    def test_refines_noisy_initialization(self):
        intr, poses, landmarks, uv, lid, mask = synth_sequence()
        mesh = make_mesh(frame=8, tile=1)
        poses0 = poses + RNG.normal(0, 0.01, poses.shape)
        poses0[0] = poses[0]  # gauge anchor stays exact
        lms0 = landmarks + RNG.normal(0, 0.1, landmarks.shape)
        p_out, l_out, rms = distributed_slam_ba(
            jnp.asarray(uv), jnp.asarray(lid), jnp.asarray(mask),
            jnp.asarray(intr), jnp.asarray(poses0), jnp.asarray(lms0),
            mesh, iters=12,
        )
        rms = float(rms)
        assert rms < 0.5, rms  # ~observation noise level
        # poses recovered (up to the remaining gauge of scale drift)
        err_t = np.linalg.norm(np.asarray(p_out)[:, 3:] - poses[:, 3:], axis=1)
        assert np.median(err_t) < 0.05, np.median(err_t)

    def test_reduces_initial_cost(self):
        intr, poses, landmarks, uv, lid, mask = synth_sequence(F=8, noise=0.1)
        mesh = make_mesh(frame=8, tile=1)
        poses0 = poses + RNG.normal(0, 0.02, poses.shape)
        poses0[0] = poses[0]
        lms0 = landmarks + RNG.normal(0, 0.2, landmarks.shape)

        def rms_of(p, l):
            tot, n = 0.0, 0
            for f in range(len(p)):
                R = np.asarray(geom.rodrigues(jnp.asarray(np.asarray(p)[f, :3])))
                cam = np.asarray(l) @ R.T + np.asarray(p)[f, 3:]
                pr = cam[:, :2] / cam[:, 2:] * intr[:2] + intr[2:]
                e = (pr[lid[f]] - uv[f]) * mask[f][:, None]
                tot += (e**2).sum()
                n += mask[f].sum()
            return np.sqrt(tot / n)

        before = rms_of(poses0, lms0)
        _, _, rms = distributed_slam_ba(
            jnp.asarray(uv), jnp.asarray(lid), jnp.asarray(mask),
            jnp.asarray(intr), jnp.asarray(poses0), jnp.asarray(lms0),
            mesh, iters=12,
        )
        assert float(rms) < before * 0.2, (float(rms), before)
