"""Session autotuning of formulation choices that depend on chip state.

The paths=2 WTA-statistics stage has two bit-identical formulations (see
SGMParams.stats_impl): a one-pass Pallas lane-reduction kernel and a
transpose-first XLA streaming form. Which is faster depends on the shared
TPU host's state: quiet, the Pallas kernel's single volume read wins;
under HBM contention its per-group masked 32-lane reductions degrade ~20×
while the XLA form degrades only mildly (measured 30 vs 4.4 ms at the
720p refine shapes inside one loaded window — full pipeline 32.7 vs
4.9 ms/frame). There is no way to know at trace time, so production
entry points probe once per session.

CPU and interpret runs skip the probe (the distinction is TPU-only).
"""

from __future__ import annotations

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp

from stereovision_tpu.utils.backend import is_tpu_backend

__all__ = ["tune_stats_impl", "timed_best"]


@functools.lru_cache(maxsize=None)
def _probe_stats_impl() -> str:
    """Time the two stats formulations on a reduced refine-shaped problem
    (1/2-width 720p pack=4 refine: the pathology is throughput-bound and
    shows at any volume size ≫ launch overhead). Returns "pallas" or
    "xla". Never raises — any failure falls back to "xla" (the form that
    degrades gracefully)."""
    if not is_tpu_backend():
        return "pallas"  # CPU tests: keep the interpret-parity default
    try:
        from stereovision_tpu.ops import sgm_pallas

        W, Hh, dg, groups = 640, 184, 32, 4
        key = jax.random.PRNGKey(0)
        hf = jax.random.randint(key, (W, Hh, 128), 0, 100, jnp.int8)
        hb = jax.random.randint(key, (W, Hh, 128), 0, 100, jnp.int8)

        f_pallas = jax.jit(lambda a, b: sgm_pallas.wta_stats_from_duals(
            a, b, d_valid=dg, groups=groups)[0])
        f_xla = jax.jit(lambda a, b: sgm_pallas.sum_wta(
            (a, b), d_valid=dg, groups=groups, emit_transposed=True)[1])

        def run(f, n=8):
            out = f(hf, hb)
            float(jnp.sum(out[:1, :1]))  # forced readback: block_until_ready
            t0 = time.perf_counter()     # is unreliable over the axon tunnel
            for _ in range(n):
                out = f(hf, hb)
            float(jnp.sum(out[:1, :1]))
            return time.perf_counter() - t0

        # interleave twice so one load swing cannot decide the session
        tp = run(f_pallas) + run(f_pallas, 4)
        tx = run(f_xla) + run(f_xla, 4)
        tp = min(tp, run(f_pallas, 4) * 3)
        tx = min(tx, run(f_xla, 4) * 3)
        return "pallas" if tp <= tx else "xla"
    except Exception:
        return "xla"


def tune_stats_impl(params):
    """Resolve ``params.stats_impl`` for this session: 'auto' probes the
    chip once (cached) and returns params pinned to the winning
    formulation; explicit values pass through unchanged."""
    if getattr(params, "stats_impl", None) != "auto":
        return params
    if params.paths != 2:
        return dataclasses.replace(params, stats_impl="pallas")
    return dataclasses.replace(params, stats_impl=_probe_stats_impl())


def timed_best(fns: dict, args: tuple, rounds: int = 2, inner: int = 4):
    """Generic interleaved best-of picker: jit-callable map name→fn, all
    called with ``args``; returns (best_name, {name: best_seconds}).
    Forces readback (axon tunnel: block_until_ready is unreliable)."""
    times = {n: float("inf") for n in fns}
    outs = {n: f(*args) for n, f in fns.items()}
    for n, o in outs.items():
        leaf = jax.tree_util.tree_leaves(o)[0]
        float(jnp.sum(leaf[..., :1].astype(jnp.float32)))
    for _ in range(rounds):
        for n, f in fns.items():
            t0 = time.perf_counter()
            for _ in range(inner):
                out = f(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(jnp.sum(leaf[..., :1].astype(jnp.float32)))
            times[n] = min(times[n], (time.perf_counter() - t0) / inner)
    best = min(times, key=times.get)
    return best, times
