from stereovision_tpu.core import geometry, image  # noqa: F401
