"""stereovision_tpu — a TPU-native stereo depth + structure-from-motion engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of the
AlexGr5/StereoVision reference pipeline (surveyed in SURVEY.md):

- ``core``     pure-jnp camera geometry and image kernels
- ``ops``      Pallas/XLA compute kernels (cost volume, SGM aggregation, filters)
- ``calib``    chessboard detection + Levenberg–Marquardt bundle-adjustment
               calibration (mono / stereo / universal) + rectification
- ``stereo``   the disparity engine (census cost volume + semi-global aggregation)
- ``mono``     motion-parallax depth (flow + RANSAC ego-motion) and neural depth
- ``models``   Flax network definitions (MiDaS-small-class mono-depth CNN)
- ``fusion``   occlusion scoring, cross-method range calibration,
               confidence-weighted depth fusion
- ``parallel`` device-mesh utilities, sharded disparity, distributed
               Schur-complement bundle adjustment
- ``io``       frame sources, calibration store (versioned), reference pkl import
- ``apps``     CLI entry points mirroring the reference's five interactive apps
"""

__version__ = "0.1.0"

# headline API at the package root (submodules hold the full surface)
from stereovision_tpu.stereo import (  # noqa: E402,F401
    SGMParams,
    compute_disparity,
    compute_disparity_batch,
    disparity_with_confidence,
    reference_preset,
)


def __getattr__(name):  # lazy: pipelines pull optional heavy deps
    if name in ("DepthPipeline", "FusedPipeline", "DepthResult"):
        from stereovision_tpu import pipeline

        return getattr(pipeline, name)
    raise AttributeError(name)
