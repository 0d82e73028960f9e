from centerpose_tpu.inference.detector import Detector  # noqa: F401
