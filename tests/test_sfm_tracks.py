"""Vectorized SfM track linking (apps/sfm.build_tracks) — long-sequence
behavior and bit-equality with the scalar reference linker it replaced
(VERDICT r3 #7: the one remaining O(frames·corners) host loop)."""

import time

import numpy as np
import pytest


def _make_sequence(n_frames, h=72, w=96, shift_per_frame=0.5, seed=3):
    rng = np.random.default_rng(seed)
    big = rng.uniform(0, 255, (h, w + int(n_frames * shift_per_frame) + 8))
    import scipy.ndimage as ndi

    big = ndi.gaussian_filter(big, 1.0).astype(np.float32)
    return [
        big[:, int(f * shift_per_frame): int(f * shift_per_frame) + w]
        for f in range(n_frames)
    ]


def _scalar_link(idx_all, valid_all, n_frames, max_corners):
    """The original per-corner linking loop (reference semantics)."""
    track_of = [np.full(max_corners, -1, np.int64) for _ in range(n_frames)]
    n_tracks = 0
    for f in range(n_frames - 1):
        idx, valid = idx_all[f], valid_all[f]
        for i in np.nonzero(valid)[0]:
            t = track_of[f][i]
            if t < 0:
                t = n_tracks
                n_tracks += 1
                track_of[f][i] = t
            track_of[f + 1][idx[i]] = t
    return np.stack(track_of), n_tracks


class TestBuildTracks:
    def test_hundred_frame_sequence_links_and_scales(self):
        from stereovision_tpu.apps.sfm import build_tracks

        frames = _make_sequence(100)
        K = np.eye(3)
        t0 = time.perf_counter()
        kp, track_of, n_tracks, matches = build_tracks(
            frames, K, max_corners=128)
        dt = time.perf_counter() - t0
        assert kp.shape == (100, 128, 2)
        assert track_of.shape == (100, 128)
        assert n_tracks > 20
        # the shifting texture must produce long-lived tracks
        counts = np.bincount(track_of[track_of >= 0],
                             minlength=max(n_tracks, 1))
        assert counts.max() >= 30, counts.max()
        # linking itself is vector numpy: the whole 100-frame build (incl.
        # detection) must stay far under the old per-corner loop's cost
        assert dt < 120, dt

    def test_linking_bit_equals_scalar_reference(self):
        import jax

        from stereovision_tpu.apps.sfm import build_tracks
        from stereovision_tpu.mono.features import (harris_corners,
                                                    hog_descriptors,
                                                    match_descriptors)
        import jax.numpy as jnp

        frames = _make_sequence(12, shift_per_frame=1.0)
        C = 64
        kp, track_of, n_tracks, matches = build_tracks(
            frames, np.eye(3), max_corners=C)
        stack = jnp.asarray(np.stack(frames))
        pts, scores = jax.vmap(lambda f: harris_corners(f, C))(stack)
        descs = jax.vmap(hog_descriptors)(stack, pts)
        idx_all, valid_all = jax.vmap(match_descriptors)(
            descs[:-1], descs[1:], scores[:-1], scores[1:])
        want_track, want_n = _scalar_link(
            np.asarray(idx_all), np.asarray(valid_all), len(frames), C)
        assert n_tracks == want_n
        np.testing.assert_array_equal(track_of, want_track)
        for f, (idx, valid) in enumerate(matches):
            np.testing.assert_array_equal(idx, np.asarray(idx_all[f]))
            np.testing.assert_array_equal(valid, np.asarray(valid_all[f]))
