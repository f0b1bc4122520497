from stereovision_tpu.stereo.sgm import (  # noqa: F401
    SGMParams,
    compute_disparity,
    disparity_with_confidence,
    reference_preset,
)
