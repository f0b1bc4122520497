from stereovision_tpu.utils.logging import get_logger, StageTimer  # noqa: F401
