from stereovision_tpu.stereo.sgm import SGMParams, compute_disparity, disparity_with_confidence  # noqa: F401
