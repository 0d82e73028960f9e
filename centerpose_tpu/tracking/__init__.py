from centerpose_tpu.tracking.kalman import KeypointKalman  # noqa: F401
from centerpose_tpu.tracking.tracker import Tracker  # noqa: F401
