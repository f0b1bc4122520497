"""Sequence SfM CLI — multi-frame pose refinement over an image sequence
(BASELINE config 5's single-host path; the same distributed BA scales over a
pod with a larger 'frame' mesh axis).

Pipeline: Harris+HOG feature tracks across consecutive frames → two-view
essential-matrix initialization of relative poses → track linking into
landmarks → triangulation → distributed Schur+CG bundle adjustment over the
device mesh → trajectory + sparse point cloud.

    python -m stereovision_tpu.apps.sfm --images frames/ --fx 700 --fy 700 \
        --cx 640 --cy 360 --out sfm_out
"""

from __future__ import annotations

import argparse
import fnmatch
import json
import sys
from pathlib import Path

import numpy as np


def build_tracks(frames, K, max_corners=512, seed=0):
    """Match consecutive frames; link matches into tracks (landmark ids)."""
    import jax
    import jax.numpy as jnp

    from stereovision_tpu.mono.features import (
        harris_corners, hog_descriptors, match_descriptors,
    )

    keys = jax.random.split(jax.random.PRNGKey(seed), len(frames))
    kp, desc, score = [], [], []
    for f in frames:
        p, s = harris_corners(jnp.asarray(f), max_corners)
        d = hog_descriptors(jnp.asarray(f), p)
        kp.append(np.asarray(p))
        desc.append(d)
        score.append(s)
    del keys
    # link: track id per (frame, corner); -1 = unassigned
    track_of = [np.full(max_corners, -1, np.int64) for _ in frames]
    n_tracks = 0
    for f in range(len(frames) - 1):
        idx, valid = match_descriptors(desc[f], desc[f + 1], score[f], score[f + 1])
        idx, valid = np.asarray(idx), np.asarray(valid)
        for i in np.nonzero(valid)[0]:
            t = track_of[f][i]
            if t < 0:
                t = n_tracks
                n_tracks += 1
                track_of[f][i] = t
            track_of[f + 1][idx[i]] = t
    return kp, track_of, n_tracks


def main(argv=None):
    ap = argparse.ArgumentParser(prog="stereovision_tpu.apps.sfm")
    ap.add_argument("--images", required=True)
    ap.add_argument("--glob", default="*.jpg")
    ap.add_argument("--fx", type=float, required=True)
    ap.add_argument("--fy", type=float, required=True)
    ap.add_argument("--cx", type=float, required=True)
    ap.add_argument("--cy", type=float, required=True)
    ap.add_argument("--out", default="sfm_out")
    ap.add_argument("--max-frames", type=int, default=64)
    ap.add_argument("--ba-iters", type=int, default=10)
    ap.add_argument("--ba-checkpoint-every", type=int, default=5,
                    help="save BA state every N LM iterations (resume point)")
    ap.add_argument("--resume", action="store_true",
                    help="resume the BA from <out>/ba_checkpoint.npz")
    ap.add_argument("--min-track-length", type=int, default=3)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from stereovision_tpu.core import geometry as geom
    from stereovision_tpu.io.frames import _imread_gray
    from stereovision_tpu.mono.features import ransac_essential, recover_pose_and_triangulate
    from stereovision_tpu.parallel import make_mesh
    from stereovision_tpu.parallel.ba_landmarks import distributed_slam_ba

    files = sorted(
        p for p in Path(args.images).iterdir() if fnmatch.fnmatch(p.name, args.glob)
    )[: args.max_frames]
    if len(files) < 3:
        raise SystemExit("need at least 3 frames")
    frames = [_imread_gray(p) for p in files]
    K = np.array([[args.fx, 0, args.cx], [0, args.fy, args.cy], [0, 0, 1]])
    print(f"[sfm] {len(frames)} frames; tracking…")
    kp, track_of, n_tracks = build_tracks(frames, K)

    # keep tracks observed in ≥ min_track_length frames
    counts = np.zeros(n_tracks, np.int64)
    for t in track_of:
        counts[t[t >= 0]] += 1
    keep = np.nonzero(counts >= args.min_track_length)[0]
    remap = {t: i for i, t in enumerate(keep)}
    L = len(keep)
    print(f"[sfm] {n_tracks} raw tracks → {L} with length ≥ {args.min_track_length}")
    if L < 20:
        raise SystemExit("too few stable tracks — more texture or frames needed")

    # incremental pose init from consecutive essential matrices
    F = len(frames)
    poses = np.zeros((F, 6))
    key = jax.random.PRNGKey(1)
    for f in range(F - 1):
        m1, m2 = [], []
        for i in np.nonzero(track_of[f] >= 0)[0]:
            t = track_of[f][i]
            j = np.nonzero(track_of[f + 1] == t)[0]
            if len(j):
                m1.append(kp[f][i])
                m2.append(kp[f + 1][j[0]])
        m1, m2 = np.asarray(m1), np.asarray(m2)
        if len(m1) < 16:
            poses[f + 1] = poses[f]
            continue
        x1n = (m1 - [K[0, 2], K[1, 2]]) / [K[0, 0], K[1, 1]]
        x2n = (m2 - [K[0, 2], K[1, 2]]) / [K[0, 0], K[1, 1]]
        key, sub = jax.random.split(key)
        E, inl = ransac_essential(
            jnp.asarray(x1n), jnp.asarray(x2n), jnp.ones(len(x1n), bool), sub
        )
        R_rel, t_rel, _, _ = recover_pose_and_triangulate(
            E, jnp.asarray(x1n), jnp.asarray(x2n), inl
        )
        r_rel = np.asarray(geom.inverse_rodrigues(R_rel))
        rf, tf = geom.se3_compose(
            jnp.asarray(poses[f, :3]), jnp.asarray(poses[f, 3:]),
            jnp.asarray(r_rel), jnp.asarray(np.asarray(t_rel)),
        )
        poses[f + 1] = np.concatenate([np.asarray(rf), np.asarray(tf)])

    # observation tensors (fixed M slots per frame)
    M = max(int((np.asarray([np.sum(np.isin(t, keep)) for t in track_of])).max()), 8)
    obs_uv = np.zeros((F, M, 2))
    obs_lid = np.zeros((F, M), np.int32)
    obs_mask = np.zeros((F, M), bool)
    for f in range(F):
        slot = 0
        for i in np.nonzero(track_of[f] >= 0)[0]:
            t = track_of[f][i]
            if t in remap:
                obs_uv[f, slot] = kp[f][i]
                obs_lid[f, slot] = remap[t]
                obs_mask[f, slot] = True
                slot += 1

    # landmark init: midpoint triangulation from the first two observations
    landmarks = np.zeros((L, 3))
    eye34 = np.hstack([np.eye(3), np.zeros((3, 1))])
    for l in range(L):
        fs = [f for f in range(F) if (obs_mask[f] & (obs_lid[f] == l)).any()]
        if len(fs) < 2:
            landmarks[l] = [0, 0, 10]
            continue
        f1, f2 = fs[0], fs[-1]

        def pmat(f):
            R = np.asarray(geom.rodrigues(jnp.asarray(poses[f, :3])))
            return K @ np.hstack([R, poses[f, 3:][:, None]])

        uv1 = obs_uv[f1][obs_lid[f1] == l][0]
        uv2 = obs_uv[f2][obs_lid[f2] == l][0]
        X = np.asarray(geom.triangulate(
            jnp.asarray(pmat(f1)), jnp.asarray(pmat(f2)),
            jnp.asarray(uv1), jnp.asarray(uv2)))
        landmarks[l] = np.clip(X, -100, 100)
    del eye34

    n_dev = len(jax.devices())
    frame_axis = 1
    for n in range(min(n_dev, F), 0, -1):
        if F % n == 0:
            frame_axis = n
            break
    mesh = make_mesh(frame=frame_axis, tile=1, devices=jax.devices()[:frame_axis])
    print(f"[sfm] BA over {frame_axis}-device mesh: {F} poses, {L} landmarks…")
    intr = jnp.asarray([K[0, 0], K[1, 1], K[0, 2], K[1, 2]])
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    ckpt = out_dir / "ba_checkpoint.npz"
    done = 0
    if args.resume and ckpt.exists():
        z = np.load(ckpt)
        poses, landmarks, done = z["poses"], z["landmarks"], int(z["iters_done"])
        print(f"[sfm] resumed BA checkpoint at iteration {done}")
    # run the jitted LM loop in chunks; each chunk boundary is a resume point
    # (the long-solve checkpointing SURVEY §5 calls for)
    p_out, l_out, rms = jnp.asarray(poses), jnp.asarray(landmarks), jnp.asarray(np.inf)
    while done < args.ba_iters:
        chunk = min(args.ba_checkpoint_every, args.ba_iters - done)
        p_out, l_out, rms = distributed_slam_ba(
            jnp.asarray(obs_uv), jnp.asarray(obs_lid), jnp.asarray(obs_mask),
            intr, p_out, l_out, mesh, iters=chunk,
        )
        done += chunk
        np.savez(ckpt, poses=np.asarray(p_out), landmarks=np.asarray(l_out),
                 iters_done=done)
        print(f"[sfm] BA {done}/{args.ba_iters} iterations, rms={float(rms):.3f}")
    np.savez(
        out_dir / "sfm_result.npz",
        poses=np.asarray(p_out), landmarks=np.asarray(l_out),
        rms=float(rms), files=[f.name for f in files],
    )
    print(json.dumps({"frames": F, "landmarks": L, "ba_rms_px": round(float(rms), 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
