from centerpose_tpu.training.losses import CenterPoseLossConfig, centerpose_loss  # noqa: F401
from centerpose_tpu.training.trainer import TrainState, make_train_step  # noqa: F401
