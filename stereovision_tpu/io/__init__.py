from stereovision_tpu.io.store import CalibrationStore  # noqa: F401
from stereovision_tpu.io.frames import PairedImageSource, SyntheticStereoSource  # noqa: F401
