"""Motion-parallax depth: the functional port of the reference's
``OpticalFlowDepthEstimator`` (fused_depth_map.py:1263-1499 and its original in
MONO/mono_depth_map_with_motion.py).

State is an explicit pytree (prev frame, EMA depth, last-motion timestamp) and
the per-frame update is one jitted function — the TPU-native shape of the
reference's stateful class. Behavior contract preserved:

- depth = 1 / (|flow − ego_flow| + 0.5)                        (:1390-1392)
- EMA α = 0.9 while moving, 0.99 static                         (:1394-1400)
- bilateral 9/75/75 smoothing                                   (:1402-1403)
- motion timeout: camera considered moving for ``motion_timeout`` seconds
  after the last valid ego-motion                               (:1363-1367)
- returns (depth, has_depth): has_depth=False replaces the reference's None
  (first frame, static scene with no accumulated depth).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import chex

from stereovision_tpu.core import image as im
from stereovision_tpu.mono.flow import dense_flow
from stereovision_tpu.mono.ego import estimate_ego_motion


@dataclasses.dataclass(frozen=True)
class FlowDepthParams:
    min_inliers: int = 15
    motion_timeout: float = 1.5
    flow_levels: int = 3
    flow_win: int = 15
    flow_iters: int = 3
    grid_step: int = 16
    ransac_threshold: float = 3.0
    alpha_moving: float = 0.9
    alpha_static: float = 0.99
    warp_impl: str = "auto"  # dense_flow warp: auto/gather/shift/shift_interpret


@chex.dataclass
class FlowDepthState:
    prev_gray: jax.Array        # (H, W)
    stable_depth: jax.Array     # (H, W)
    has_prev: jax.Array         # bool scalar
    has_stable: jax.Array      # bool scalar
    last_move_time: jax.Array   # float scalar (seconds)
    rng: jax.Array              # PRNG key for RANSAC sampling


def flow_depth_init(shape, seed: int = 0) -> FlowDepthState:
    h, w = shape
    return FlowDepthState(
        prev_gray=jnp.zeros((h, w), jnp.float32),
        stable_depth=jnp.zeros((h, w), jnp.float32),
        has_prev=jnp.asarray(False),
        has_stable=jnp.asarray(False),
        last_move_time=jnp.asarray(-1e9, jnp.float32),
        rng=jax.random.PRNGKey(seed),
    )


@functools.partial(jax.jit, static_argnames=("params",))
def flow_depth_step(
    state: FlowDepthState,
    gray: jax.Array,
    t_now: jax.Array,
    params: FlowDepthParams = FlowDepthParams(),
):
    """One frame update. gray: (H, W); t_now: seconds (float scalar).

    Returns (new_state, depth (H, W), has_depth bool, camera_moving bool).
    """
    gray = gray.astype(jnp.float32)
    p = params
    key, sub = jax.random.split(state.rng)

    flow = dense_flow(state.prev_gray, gray, p.flow_levels, p.flow_win,
                      p.flow_iters, warp_impl=p.warp_impl)
    ego_valid, expected = estimate_ego_motion(
        flow, sub, step=p.grid_step, threshold=p.ransac_threshold,
        min_inliers=p.min_inliers,
    )
    ego_valid = ego_valid & state.has_prev

    residual = jnp.hypot(flow[..., 0] - expected[..., 0], flow[..., 1] - expected[..., 1])
    current_depth = 1.0 / (residual + 0.5)

    moving_before = (t_now - state.last_move_time) < p.motion_timeout
    camera_moving = ego_valid | moving_before
    alpha = jnp.where(camera_moving, p.alpha_moving, p.alpha_static)
    stable = jnp.where(
        state.has_stable,
        alpha * state.stable_depth + (1 - alpha) * current_depth,
        current_depth,
    )
    # when ego-motion fails, the EMA holds its previous value
    stable = jnp.where(ego_valid, stable, state.stable_depth)
    has_stable = state.has_stable | ego_valid

    # select-then-filter ≡ filter-then-select for a scalar predicate, and
    # runs the 81-tap bilateral once instead of twice
    depth_out = im.bilateral_filter(
        jnp.where(ego_valid, current_depth, state.stable_depth), 9, 75.0, 75.0
    )
    has_depth = ego_valid | (camera_moving & state.has_stable)

    new_state = FlowDepthState(
        prev_gray=gray,
        stable_depth=stable,
        has_prev=jnp.asarray(True),
        has_stable=has_stable,
        last_move_time=jnp.where(ego_valid, t_now, state.last_move_time).astype(jnp.float32),
        rng=key,
    )
    return new_state, depth_out, has_depth, camera_moving
