"""stereo.autotune: session formulation tuning (CPU-side semantics).

The on-chip probe itself is TPU-only (scripts/verify_tpu.py exercises it);
these tests pin the CPU/jit-visible contract: explicit values pass through,
'auto' resolves deterministically off-chip, and the resolved params produce
bit-identical disparities across stats formulations.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from stereovision_tpu.stereo import (SGMParams, compute_disparity,
                                     production_preset, reference_preset)
from stereovision_tpu.stereo.autotune import timed_best, tune_stats_impl


def test_explicit_stats_impl_passes_through():
    p = dataclasses.replace(production_preset(), stats_impl="xla")
    assert tune_stats_impl(p) is p
    p = dataclasses.replace(production_preset(), stats_impl="pallas")
    assert tune_stats_impl(p) is p


def test_auto_resolves_off_chip():
    p = tune_stats_impl(dataclasses.replace(production_preset(),
                                            stats_impl="auto"))
    assert p.stats_impl in ("pallas", "xla")
    # paths != 2 has no xla-vs-pallas stats split: pinned to the parity default
    p4 = dataclasses.replace(reference_preset("hier"), paths=4,
                             stats_impl="auto")
    assert tune_stats_impl(p4).stats_impl == "pallas"


def test_stats_formulations_bit_identical():
    rng = np.random.default_rng(3)
    base = rng.uniform(0, 255, size=(64, 96 + 8)).astype(np.float32)
    left = jnp.asarray(base[:, :96])
    right = jnp.asarray(base[:, 8:104])
    # pallas_interpret + pack: the packed paths=2 core is where the two
    # stats formulations diverge (impl="xla" has a single formulation)
    common = dict(num_disparities=16, census_ksize=5, census_wsize=5,
                  paths=2, pack=4, uniqueness_ratio=10, lr_max_diff=1,
                  speckle_window_size=0, impl="pallas_interpret")
    dx, vx = compute_disparity(left, right,
                               SGMParams(stats_impl="xla", **common))
    dp, vp = compute_disparity(left, right,
                               SGMParams(stats_impl="pallas", **common))
    np.testing.assert_array_equal(np.asarray(dx), np.asarray(dp))
    np.testing.assert_array_equal(np.asarray(vx), np.asarray(vp))


def test_timed_best_returns_winner():
    fns = {
        "a": lambda x: x + 1,
        "b": lambda x: x * 2,
    }
    best, times = timed_best(fns, (jnp.ones((8, 128)),), rounds=1, inner=2)
    assert best in fns and set(times) == set(fns)
    assert all(t >= 0 for t in times.values())
