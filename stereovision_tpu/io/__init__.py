from stereovision_tpu.io.store import CalibrationStore  # noqa: F401
from stereovision_tpu.io.frames import (  # noqa: F401
    PairedImageSource,
    SyntheticStereoSource,
    VideoSource,
)
