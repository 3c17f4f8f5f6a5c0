from fastdepth_tpu.train.trainer import Trainer, TrainState, sgd_init, train_step  # noqa: F401
from fastdepth_tpu.train.loss import l1_loss, masked_l1_loss  # noqa: F401
