from stereovision_tpu.utils.backend import is_tpu_backend  # noqa: F401
from stereovision_tpu.utils.logging import get_logger, StageTimer  # noqa: F401
