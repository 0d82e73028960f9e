from centerpose_tpu.evaluation.iou3d import OrientedBox, box_iou_3d  # noqa: F401
from centerpose_tpu.evaluation.metrics import AveragePrecision, HitMiss  # noqa: F401
