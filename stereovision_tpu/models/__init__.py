from stereovision_tpu.models.midas import MidasSmall  # noqa: F401
