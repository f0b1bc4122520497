"""High-level streaming pipelines — the framework's production API.

The apps/ CLIs orchestrate files; these classes are the embeddable equivalent:
construct once from a calibration (maps + params become compiled constants),
then call per frame pair. Everything device-side happens in one jitted program
per call; host↔device traffic is the input frames and the outputs you ask for.

    from stereovision_tpu.pipeline import DepthPipeline
    pipe = DepthPipeline.from_store("output", num_disparities=320, mode="hier")
    result = pipe(left_gray, right_gray)     # DepthResult
    result.depth_m, result.disparity, result.valid

    fused = FusedPipeline.from_store("output", scale=0.33)
    out = fused(left_gray, right_gray, t_now=timestamp)
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from stereovision_tpu.core import geometry as geom
from stereovision_tpu.core import image as im
from stereovision_tpu.stereo import SGMParams, disparity_with_confidence


@dataclasses.dataclass
class DepthResult:
    disparity: jax.Array   # (H, W) float px
    confidence: jax.Array  # (H, W) 0/1 (reference contract)
    depth_m: jax.Array     # (H, W) meters, 0 where invalid


def _rect_remap(img, mx, my, ranges, aux):
    """Rectification remap: the exact per-element gather (ranges=None — CPU,
    or the separable decomposition does not apply), or the Catmull–Smith
    separable shift-gather form with STATIC roll bounds (TPU;
    core.image.remap_separable). ``aux`` = (map_y_adj, valid) from
    core.image.prepare_separable_remap."""
    if ranges is None or aux is None:
        return im.remap(img, mx, my)
    my_adj, valid = aux
    return im.remap_separable(img, mx, my_adj, valid, ranges[0], ranges[1])


class DepthPipeline:
    """Rectification + disparity + metric depth as one jitted call."""

    def __init__(self, cal: dict, params: SGMParams, min_depth=0.2, max_depth=4.0,
                 proc_scale: float = 1.0, exact_speckle: bool = False):
        # exact_speckle: replace the on-device windowed speckle approximation
        # with the exact connected-component filter (native/speckle.cpp,
        # cv2.filterSpeckles semantics). Host-side + blocking — for CPU/offline
        # pipelines where exact cv2 parity matters more than async streaming.
        self._exact_speckle = exact_speckle and params.speckle_window_size > 0
        self._speckle_params = params
        if self._exact_speckle:
            params = dataclasses.replace(params, speckle_window_size=0)
        from stereovision_tpu.stereo.autotune import tune_stats_impl

        params = tune_stats_impl(params)  # resolve stats_impl="auto" on-chip
        size = tuple(int(v) for v in cal["img_size"])
        self.size = size
        if proc_scale != 1.0:
            size, cal = _rescale_calibration(cal, proc_scale)
        self.proc_size = size
        mx1, my1 = geom.init_undistort_rectify_map(
            jnp.asarray(cal["mtx_left"]), jnp.asarray(np.ravel(cal["dist_left"])),
            jnp.asarray(cal["R1"]), jnp.asarray(cal["P1"]), size)
        mx2, my2 = geom.init_undistort_rectify_map(
            jnp.asarray(cal["mtx_right"]), jnp.asarray(np.ravel(cal["dist_right"])),
            jnp.asarray(cal["R2"]), jnp.asarray(cal["P2"]), size)
        self._maps = (mx1, my1, mx2, my2)
        # static displacement bounds for the separable remap (TPU): the
        # per-element 2-D gather costs ~13 ms per 422×633 call on-chip while
        # the two 1-D shift-gather passes cost ~1 ms; huge displacements
        # (pathological calibrations) fall back to the exact gather
        from stereovision_tpu.utils.backend import is_tpu_backend

        self._remap_ranges = None
        self._remap_aux = None
        if is_tpu_backend():
            p1 = im.prepare_separable_remap(np.asarray(mx1), np.asarray(my1))
            p2 = im.prepare_separable_remap(np.asarray(mx2), np.asarray(my2))
            if p1 is not None and p2 is not None:
                self._remap_ranges = (max(p1[2], p2[2]), max(p1[3], p2[3]))
                self._remap_aux = (
                    (jnp.asarray(p1[0]), jnp.asarray(p1[1])),
                    (jnp.asarray(p2[0]), jnp.asarray(p2[1])),
                )
        self.focal = float(np.asarray(cal["P1"])[0, 0])
        self.baseline_m = abs(float(np.asarray(cal["T"]).ravel()[0])) / 100.0
        self.params = params
        self.min_depth = min_depth
        self.max_depth = max_depth

        @functools.partial(jax.jit, static_argnames=())
        def _run(left, right, mx1, my1, mx2, my2, min_d, max_d):
            # min/max depth are TRACED operands: the reference adjusts them
            # live in 0.1 m steps (depth_map.py:1245-1256) — runtime changes
            # via set_depth_range cost no recompilation
            h, w = self.proc_size[1], self.proc_size[0]
            if left.shape != (h, w):
                left = im.resize(left, (h, w))
                right = im.resize(right, (h, w))
            aux = self._remap_aux or (None, None)
            lr = _rect_remap(left, mx1, my1, self._remap_ranges, aux[0])
            rr = _rect_remap(right, mx2, my2, self._remap_ranges, aux[1])
            disp, conf = disparity_with_confidence(lr, rr, params)
            depth = geom.disparity_to_depth(disp, self.focal, self.baseline_m)
            depth = jnp.clip(depth, min_d, max_d)
            depth = jnp.where(conf > 0, depth, 0.0)
            return disp, conf, depth

        self._run = _run

        @jax.jit
        def _run_batch(lefts, rights, mx1, my1, mx2, my2, min_d, max_d):
            # sequential on-device over the batch (lax.map) — same rationale
            # as stereo.compute_disparity_batch: one frame's volumes live at
            # a time, per-dispatch overhead amortized across the batch
            return jax.lax.map(
                lambda p: _run(p[0], p[1], mx1, my1, mx2, my2, min_d, max_d),
                (lefts, rights),
            )

        self._run_batch = _run_batch

    @classmethod
    def from_store(cls, calib_dir, num_disparities=320, mode="full",
                   refine_range=32, **kw):
        from stereovision_tpu.io.store import CalibrationStore

        cal = CalibrationStore(calib_dir).load("stereo_calibration_data")
        if mode == "prod":  # the tuned headline configuration
            from stereovision_tpu.stereo import production_preset

            params = dataclasses.replace(
                production_preset(), num_disparities=num_disparities)
        else:
            params = SGMParams(num_disparities=num_disparities, mode=mode,
                               refine_range=refine_range)
        return cls(cal, params, **kw)

    def __call__(self, left, right) -> DepthResult:
        disp, conf, depth = self._run(
            jnp.asarray(left, jnp.float32), jnp.asarray(right, jnp.float32),
            *self._maps, jnp.float32(self.min_depth), jnp.float32(self.max_depth)
        )
        if self._exact_speckle:
            from stereovision_tpu.stereo.sgm import exact_speckle_postpass

            d, valid = exact_speckle_postpass(disp, self._speckle_params)
            disp = jnp.asarray(d)
            conf = jnp.where(jnp.asarray(valid), conf, 0.0)
            depth = jnp.where(jnp.asarray(valid), depth, 0.0)
        return DepthResult(disp, conf, depth)

    def batch(self, lefts, rights) -> DepthResult:
        """Throughput form: (B, H, W) stacks → batched DepthResult (leading
        frame axis on every field). One dispatch for the whole batch."""
        disp, conf, depth = self._run_batch(
            jnp.asarray(lefts, jnp.float32), jnp.asarray(rights, jnp.float32),
            *self._maps, jnp.float32(self.min_depth), jnp.float32(self.max_depth)
        )
        return DepthResult(disp, conf, depth)

    def set_depth_range(self, min_depth=None, max_depth=None):
        """Live-tune the metric clip window (reference depth_map.py:1245-1256);
        traced operands — no recompilation."""
        if min_depth is not None:
            self.min_depth = float(min_depth)
        if max_depth is not None:
            self.max_depth = float(max_depth)
        return self.min_depth, self.max_depth

    def point_cloud(self, result: DepthResult, Q) -> jax.Array:
        return geom.reproject_image_to_3d(result.disparity, jnp.asarray(Q))


def _rescale_calibration(cal: dict, scale: float):
    """Reference load_stereo_calibration_with_scaling behavior
    (fused_depth_map.py:307-442): rescale K and image size, re-rectify."""
    size = tuple(int(v) for v in cal["img_size"])
    proc = (max(32, int(size[0] * scale)) // 2 * 2, max(32, int(size[1] * scale)) // 2 * 2)
    K1 = np.asarray(cal["mtx_left"], np.float64).copy()
    K2 = np.asarray(cal["mtx_right"], np.float64).copy()
    for K in (K1, K2):
        K[0] *= proc[0] / size[0]
        K[1] *= proc[1] / size[1]
    R1, R2, P1, P2, Q = geom.stereo_rectify(
        jnp.asarray(K1), jnp.asarray(np.ravel(cal["dist_left"])),
        jnp.asarray(K2), jnp.asarray(np.ravel(cal["dist_right"])),
        proc, jnp.asarray(cal["R"]), jnp.asarray(np.ravel(cal["T"])), alpha=0.0,
    )
    out = dict(cal)
    out.update(
        mtx_left=K1, mtx_right=K2, R1=np.asarray(R1), R2=np.asarray(R2),
        P1=np.asarray(P1), P2=np.asarray(P2), Q=np.asarray(Q),
        img_size=np.asarray(proc),
    )
    return proc, out


@functools.partial(
    jax.jit,
    static_argnames=(
        "proc", "sgm", "fusion_params", "flow_params", "model",
        "stereo_on", "use_midas", "use_flow", "flow_src_right",
        "remap_ranges",
    ),
)
def _fused_step(
    left, right, mx1, my1, mx2, my2, variables, flow_state, t_now,
    focal, baseline_cm, remap_aux=None, *, proc, sgm, fusion_params,
    flow_params, model,
    stereo_on, use_midas, use_flow, flow_src_right, remap_ranges=None,
):
    """One fused frame as ONE compiled program: resize → rectify → occlusion
    metrics → stereo + NN + flow depth → fusion → meters.

    The reference overlaps SGBM and MiDaS with a 2-worker executor
    (fused_depth_map.py:2591-2624); on TPU the same overlap is XLA scheduling
    inside a single program — and folding the frame into one dispatch removes
    the ~1.3 ms-per-op tunnel overhead that made the eager-op form ~20× the
    stage sum (r3 VERDICT). Method participation and the occlusion routing are
    static args: each (stereo_on, occlusion-side) combination compiles once
    and is cached.
    """
    from stereovision_tpu.fusion import (
        calibrate_midas_to_stereo, fuse_depth_maps, fused_to_meters,
        normalize_to_stereo_range, occlusion_scores,
    )
    from stereovision_tpu.mono import flow_depth_step

    h, w = proc[1], proc[0]
    aux1, aux2 = remap_aux if remap_aux is not None else (None, None)
    lr = _rect_remap(im.resize(left.astype(jnp.float32), (h, w)), mx1, my1,
                     remap_ranges, aux1)
    rr = _rect_remap(im.resize(right.astype(jnp.float32), (h, w)), mx2, my2,
                     remap_ranges, aux2)
    ls, rs = occlusion_scores(lr, rr)

    stereo_norm = stereo_conf = None
    if stereo_on:
        disp, stereo_conf = disparity_with_confidence(lr, rr, sgm)
        stereo_norm = jnp.clip(disp / sgm.num_disparities * 255.0, 0, 255)

    midas_cal = midas_conf = None
    if use_midas:
        from stereovision_tpu.mono.nn import estimate_depth

        frame_bgr = jnp.stack([lr] * 3, axis=-1)
        md, midas_conf = estimate_depth(model, variables, frame_bgr)
        midas_cal = (
            calibrate_midas_to_stereo(md, stereo_norm, stereo_conf)
            if stereo_norm is not None else md
        )

    flow_norm = None
    moving = jnp.asarray(False)
    new_flow_state = flow_state
    if use_flow:
        src_img = rr if flow_src_right else lr
        new_flow_state, fd, has, mv = flow_depth_step(
            flow_state, src_img, t_now, flow_params
        )
        ref = stereo_norm if stereo_norm is not None else fd
        flow_norm = normalize_to_stereo_range(fd, ref)
        moving = mv & has

    have = (stereo_norm is not None, midas_cal is not None, flow_norm is not None)
    if not any(have):
        return None, new_flow_state, (ls, rs)
    fused, conf, mode = fuse_depth_maps(
        stereo_norm, stereo_conf, midas_cal, midas_conf, flow_norm,
        moving, fusion_params,
        have_stereo=have[0], have_midas=have[1], have_flow=have[2],
    )
    meters = fused_to_meters(
        fused, focal, baseline_cm, num_disparities=float(sgm.num_disparities)
    )
    out = {
        "fused": fused, "confidence": conf, "meters": meters,
        "mode": mode, "camera_moving": moving,
    }
    return out, new_flow_state, (ls, rs)


@functools.partial(
    jax.jit,
    static_argnames=(
        "proc", "sgm", "fusion_params", "flow_params", "model",
        "use_midas", "use_flow", "remap_ranges",
    ),
)
def _fused_stream(
    lefts, rights, ts, mx1, my1, mx2, my2, variables, flow_state, hyst,
    focal, baseline_cm, remap_aux=None, *, proc, sgm, fusion_params,
    flow_params, model,
    use_midas, use_flow, remap_ranges=None,
):
    """A chunk of frames as ONE program: lax.scan of the fused step over the
    frame axis, with the occlusion hysteresis run on-device (traced int32
    state machine — fusion.hysteresis_update, bit-identical to the host
    OcclusionHysteresis).

    This is the TPU-native throughput form: one host→device transfer and one
    dispatch per chunk instead of per frame. Unlike the per-frame form (where
    occlusion routing is a static recompile-cached branch), stereo is computed
    every frame and its *participation* is a traced lax.cond — output
    semantics identical, idle FLOPs only while a camera is occluded.
    """
    from stereovision_tpu.fusion import (
        calibrate_midas_to_stereo, classify_occlusion_code, fuse_depth_maps,
        fused_to_meters, hysteresis_update, normalize_to_stereo_range,
        occlusion_scores,
    )
    from stereovision_tpu.mono import flow_depth_step
    from stereovision_tpu.mono.nn import estimate_depth

    h, w = proc[1], proc[0]

    def step(carry, inp):
        flow_st, hy = carry
        left, right, t_now = inp
        aux1, aux2 = remap_aux if remap_aux is not None else (None, None)
        lr = _rect_remap(im.resize(left.astype(jnp.float32), (h, w)), mx1,
                         my1, remap_ranges, aux1)
        rr = _rect_remap(im.resize(right.astype(jnp.float32), (h, w)), mx2,
                         my2, remap_ranges, aux2)
        ls, rs = occlusion_scores(lr, rr)
        hy = hysteresis_update(hy, classify_occlusion_code(ls, rs))
        state = hy[0]

        disp, sconf = disparity_with_confidence(lr, rr, sgm)
        stereo_norm = jnp.clip(disp / sgm.num_disparities * 255.0, 0, 255)

        md = midas_conf = None
        if use_midas:
            md, midas_conf = estimate_depth(
                model, variables, jnp.stack([lr] * 3, axis=-1))

        fd = None
        moving = jnp.asarray(False)
        if use_flow:
            src = jnp.where(state == 1, rr, lr)  # left occluded → flow on right
            flow_st, fd, has, mv = flow_depth_step(flow_st, src, t_now, flow_params)
            moving = mv & has

        def with_stereo(_):
            md_cal = (calibrate_midas_to_stereo(md, stereo_norm, sconf)
                      if use_midas else None)
            fl = (normalize_to_stereo_range(fd, stereo_norm)
                  if use_flow else None)
            return fuse_depth_maps(
                stereo_norm, sconf, md_cal, midas_conf, fl, moving,
                fusion_params, have_stereo=True, have_midas=use_midas,
                have_flow=use_flow)

        def without_stereo(_):
            if not (use_midas or use_flow):
                z = jnp.zeros((h, w), jnp.float32)
                return z, z, jnp.int32(0)
            ref = md if use_midas else fd
            fl = normalize_to_stereo_range(fd, ref) if use_flow else None
            return fuse_depth_maps(
                None, None, md, midas_conf, fl, moving, fusion_params,
                have_stereo=False, have_midas=use_midas, have_flow=use_flow)

        fused, conf, mode = jax.lax.cond(state == 0, with_stereo, without_stereo, None)
        meters = fused_to_meters(
            fused, focal, baseline_cm, num_disparities=float(sgm.num_disparities))
        out = {"fused": fused, "confidence": conf, "meters": meters,
               "mode": mode, "occlusion_code": state, "camera_moving": moving}
        return (flow_st, hy), out

    (flow_state, hyst), outs = jax.lax.scan(
        step, (flow_state, hyst), (lefts, rights, ts))
    return outs, flow_state, hyst


class FusedPipeline:
    """The three-method fusion engine as a stateful streaming object
    (stereo + neural + motion depth, occlusion fallback) — the embeddable form
    of apps/fused.py."""

    def __init__(self, cal: dict, scale: float = 0.33, use_stereo=True,
                 use_midas=True, use_flow=True, fusion_params=None,
                 midas_arch: str = "small", midas_checkpoint=None):
        # midas_arch="midas_v21_small" + midas_checkpoint=<hub .pt path> runs
        # the exact reference network with real weights (models.midas_v21)
        from stereovision_tpu.fusion import FusionParams, OcclusionHysteresis
        from stereovision_tpu.mono import FlowDepthParams, flow_depth_init
        from stereovision_tpu.mono.nn import create_model

        self.proc, self.cal = _rescale_calibration(cal, scale)
        num_disp = max(16, int(320 * scale) // 16 * 16)
        # hierarchical engine, not the default full search: at the 0.33 proc
        # scale the full 96-disparity unpacked solve measured 19.7 ms/frame
        # (chained) vs ~4 for the packed hier refine — the fused pipeline's
        # largest single stage by far (r5). Window geometry (coarse 1/2,
        # R=32, paths=2, pack=4) matches the proven full-res hier config.
        self.sgm = SGMParams(num_disparities=num_disp, mode="hier",
                             coarse_scale=2, refine_range=32, paths=2)
        self.depth_pipe = DepthPipeline(self.cal, self.sgm)
        self.fusion_params = fusion_params or FusionParams()
        self.hysteresis = OcclusionHysteresis()
        self.use_stereo = use_stereo
        self.use_midas = use_midas
        self.use_flow = use_flow
        self.model = self.variables = None
        if use_midas:
            self.model, self.variables = create_model(
                arch=midas_arch, torch_state_dict=midas_checkpoint
            )
        self.flow_state = (
            flow_depth_init((self.proc[1], self.proc[0])) if use_flow else None
        )
        self.flow_params = FlowDepthParams()
        self._frame = 0
        # occlusion scores are dispatched on one occlusion frame and consumed
        # on the NEXT (the readback is then already materialized — no blocking
        # sync in the steady-state loop; the 5-frame hysteresis tolerates the
        # one-cycle decision lag)
        self._pending_scores = None

    @classmethod
    def from_store(cls, calib_dir, **kw):
        from stereovision_tpu.io.store import CalibrationStore

        cal = CalibrationStore(calib_dir).load("stereo_calibration_data")
        return cls(cal, **kw)

    def set_params(self, **kw):
        """Live-tune any FusionParams field (the daemon's {"cmd": "set"} and
        the reference's fusion hotkeys, fused_depth_map.py:3158-3290).
        FusionParams is a static jit argument, so an unseen combination
        compiles once and is then cached."""
        self.fusion_params = dataclasses.replace(self.fusion_params, **kw)
        return self.fusion_params

    def __call__(self, left, right, t_now: float):
        from stereovision_tpu.fusion import classify_occlusion

        if self._frame % 2 == 0 and self._pending_scores is not None:
            # consume the PREVIOUS frame's occlusion scores (that program has
            # long finished — the float() does not block the steady state)
            ls, rs = self._pending_scores
            self.hysteresis.update(classify_occlusion(float(ls), float(rs)))
        state = self.hysteresis.state
        self._frame += 1
        stereo_on = self.use_stereo and self.hysteresis.stereo_enabled

        out, new_flow_state, scores = _fused_step(
            jnp.asarray(left), jnp.asarray(right),
            *self.depth_pipe._maps,
            self.variables, self.flow_state, jnp.float32(t_now),
            jnp.float32(self.depth_pipe.focal),
            jnp.float32(self.depth_pipe.baseline_m * 100.0),
            self.depth_pipe._remap_aux,
            proc=self.proc, sgm=self.sgm, fusion_params=self.fusion_params,
            flow_params=self.flow_params, model=self.model,
            stereo_on=stereo_on, use_midas=self.use_midas,
            use_flow=self.flow_state is not None,
            flow_src_right=state == "left",
            remap_ranges=self.depth_pipe._remap_ranges,
        )
        if self.flow_state is not None:
            self.flow_state = new_flow_state
        if self._frame % 2 == 1:  # this frame's scores, consumed next time
            self._pending_scores = scores
        if out is None:
            return None
        # "mode"/"camera_moving" are DEVICE scalars: reading them costs a sync,
        # so consumers coerce (int()/bool()) only where they actually display
        # or serialize — the steady-state loop itself never blocks.
        out["occlusion"] = state
        return out

    def stream(self, lefts, rights, t0: float = 0.0, dt: float = 1.0 / 30.0):
        """Throughput form: process a CHUNK of frames as one host→device
        transfer + one compiled program (lax.scan over the frame axis,
        occlusion hysteresis on-device). Returns a dict of frame-stacked
        outputs; flow/hysteresis state carries across chunks.

        Pass uint8 stacks: the cast happens on device, so the host link moves
        ¼ the bytes of float32 (the per-frame form's dominant cost on
        bandwidth-constrained hosts)."""
        from stereovision_tpu.fusion import OCCLUSION_CODES

        def _as_dev(x):  # device arrays pass through (no host round-trip)
            return x if isinstance(x, jax.Array) else jnp.asarray(np.ascontiguousarray(x))

        lefts = _as_dev(lefts)
        rights = _as_dev(rights)
        n = lefts.shape[0]
        ts = jnp.asarray(t0 + dt * np.arange(n, dtype=np.float32))
        hy = self.hysteresis
        hyst0 = tuple(
            jnp.int32(v) for v in (
                OCCLUSION_CODES.index(hy.state),
                OCCLUSION_CODES.index(hy._pending), hy._count))
        use_flow = self.flow_state is not None
        outs, flow_state, hyst = _fused_stream(
            lefts, rights, ts, *self.depth_pipe._maps,
            self.variables, self.flow_state, hyst0,
            jnp.float32(self.depth_pipe.focal),
            jnp.float32(self.depth_pipe.baseline_m * 100.0),
            self.depth_pipe._remap_aux,
            proc=self.proc, sgm=self.sgm, fusion_params=self.fusion_params,
            flow_params=self.flow_params, model=self.model,
            use_midas=self.use_midas, use_flow=use_flow,
            remap_ranges=self.depth_pipe._remap_ranges,
        )
        if use_flow:
            self.flow_state = flow_state
        self._frame += n
        # sync the tiny hysteresis carry back into the host state machine
        # (one 3-int readback per chunk)
        st, pend, cnt = (int(v) for v in jax.device_get(hyst))
        self.hysteresis.state = OCCLUSION_CODES[st]
        self.hysteresis._pending = OCCLUSION_CODES[pend]
        self.hysteresis._count = cnt
        return outs
