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
    """Match consecutive frames; link matches into tracks (landmark ids).

    Fully batched: corner detection/description runs as ONE vmapped device
    call over the frame stack, consecutive-pair matching as one vmapped call
    over the (F−1) pairs, and the sequential link stage is O(F) numpy
    VECTOR steps (mutual-nearest matches are injective, so the per-corner
    Python loop this replaces — r3's one remaining O(frames·corners) host
    loop — was pure overhead).

    Returns (kp (F, C, 2) np, track_of (F, C) np int64 with −1 = no track,
    n_tracks, matches [(idx2_for_1, valid)] per consecutive pair).
    """
    import jax
    import jax.numpy as jnp

    from stereovision_tpu.mono.features import (
        harris_corners, hog_descriptors, match_descriptors,
    )

    stack = jnp.asarray(np.stack(frames))
    pts, scores = jax.vmap(lambda f: harris_corners(f, max_corners))(stack)
    descs = jax.vmap(hog_descriptors)(stack, pts)
    idx_all, valid_all = jax.vmap(match_descriptors)(
        descs[:-1], descs[1:], scores[:-1], scores[1:]
    )
    kp = np.asarray(pts)
    idx_all = np.asarray(idx_all)
    valid_all = np.asarray(valid_all)

    F = len(frames)
    track_of = np.full((F, max_corners), -1, np.int64)
    n_tracks = 0
    for f in range(F - 1):
        idx, valid = idx_all[f], valid_all[f]
        new = valid & (track_of[f] < 0)
        n_new = int(new.sum())
        # new ids in ascending corner order (the exact order the scalar
        # loop assigned them — outputs are bit-identical)
        track_of[f][new] = n_tracks + np.arange(n_new)
        n_tracks += n_new
        track_of[f + 1][idx[valid]] = track_of[f][valid]
    matches = [(idx_all[f], valid_all[f]) for f in range(F - 1)]
    return kp, track_of, n_tracks, matches


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
    kp, track_of, n_tracks, matches = build_tracks(frames, K)

    # keep tracks observed in ≥ min_track_length frames
    counts = np.bincount(track_of[track_of >= 0], minlength=max(n_tracks, 1))
    keep = np.nonzero(counts >= args.min_track_length)[0]
    remap_arr = np.full(max(n_tracks, 1), -1, np.int64)
    remap_arr[keep] = np.arange(len(keep))
    L = len(keep)
    print(f"[sfm] {n_tracks} raw tracks → {L} with length ≥ {args.min_track_length}")
    if L < 20:
        raise SystemExit("too few stable tracks — more texture or frames needed")

    # incremental pose init from consecutive essential matrices. The matched
    # pairs come straight from build_tracks' mutual matches (the old code
    # re-derived them by scanning track ids per corner — O(F·C²) host work);
    # per-pair RANSAC+pose still runs sequentially because each relative pose
    # chains onto the previous absolute pose.
    F = len(frames)
    poses = np.zeros((F, 6))
    key = jax.random.PRNGKey(1)
    for f in range(F - 1):
        idx, valid = matches[f]
        m1, m2 = kp[f][valid], kp[f + 1][idx[valid]]
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

    # observation tensors (fixed M slots per frame) — vector ops per frame:
    # corners with a kept track pack into ascending-corner slot order (the
    # order the scalar fill produced)
    lid_of = np.where(track_of >= 0, remap_arr[np.clip(track_of, 0, None)], -1)
    sel = lid_of >= 0  # (F, C)
    M = max(int(sel.sum(axis=1).max()), 8)
    obs_uv = np.zeros((F, M, 2))
    obs_lid = np.zeros((F, M), np.int32)
    obs_mask = np.zeros((F, M), bool)
    for f in range(F):
        ii = np.nonzero(sel[f])[0]
        obs_uv[f, : len(ii)] = kp[f][ii]
        obs_lid[f, : len(ii)] = lid_of[f][ii]
        obs_mask[f, : len(ii)] = True

    # landmark init: triangulate every landmark from its first and last
    # observation in ONE batched call (the old per-landmark loop dispatched
    # a jitted triangulation per landmark)
    fgrid = np.broadcast_to(np.arange(F)[:, None], (F, M))
    mm = obs_mask.reshape(-1)
    lids = obs_lid.reshape(-1)[mm]
    fs_m = fgrid.reshape(-1)[mm]
    flat_uv = obs_uv.reshape(-1, 2)[mm]
    order = np.argsort(fs_m, kind="stable")
    first_f = np.full(L, -1, np.int64)
    first_uv = np.zeros((L, 2))
    last_f = np.full(L, -1, np.int64)
    last_uv = np.zeros((L, 2))
    # fancy-index assignment keeps the LAST write per landmark: descending
    # frame order makes the smallest frame win for "first", ascending for
    # "last"
    o = order[::-1]
    first_f[lids[o]] = fs_m[o]
    first_uv[lids[o]] = flat_uv[o]
    o = order
    last_f[lids[o]] = fs_m[o]
    last_uv[lids[o]] = flat_uv[o]
    two_obs = (first_f >= 0) & (last_f > first_f)
    Rs = np.asarray(jax.vmap(geom.rodrigues)(jnp.asarray(poses[:, :3])))
    pmats = np.einsum("ij,fjk->fik", K,
                      np.concatenate([Rs, poses[:, 3:, None]], axis=2))
    f1 = np.clip(first_f, 0, None)
    f2 = np.clip(last_f, 0, None)
    X = np.asarray(jax.vmap(geom.triangulate)(
        jnp.asarray(pmats[f1]), jnp.asarray(pmats[f2]),
        jnp.asarray(first_uv), jnp.asarray(last_uv)))
    landmarks = np.where(two_obs[:, None], np.clip(X, -100, 100),
                         np.array([0.0, 0.0, 10.0]))

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
