"""Training engine: loss, optimizer, LR schedules, sharded train step.

Reference subsystem: accessory/main_pretrain.py / main_finetune.py /
engine_*.py + util/{lr_sched,clip_grad,param_group,misc(loss scaler)}.py.

TPU re-design: instead of FSDP wrappers + FairScale TP + a grad-scaler class,
the train step is ONE jitted function over a GSPMD mesh — params and
optimizer state sharded by the same logical-axis rules as inference (fsdp ×
tp), gradients averaged by XLA along the data axes, global-norm clipping a
few lines of optax. bf16 training needs no loss scaler (the reference's
fp16 ShardedGradScaler path, misc.py:295-321, is GPU-specific).
"""

from accessory_tpu.train.loss import cross_entropy_loss  # noqa: F401
from accessory_tpu.train.lr_sched import (  # noqa: F401
    adjust_learning_rate,
    adjust_learning_rate_epoch,
    cosine_lr,
)
from accessory_tpu.train.optim import make_optimizer, param_label_fn  # noqa: F401
from accessory_tpu.train.train_step import TrainState, make_train_step  # noqa: F401
