from f_lite_tpu.train.loss import flow_matching_loss
from f_lite_tpu.train.optim import build_lr_schedule, build_optimizer

__all__ = ["flow_matching_loss", "build_lr_schedule", "build_optimizer"]
