from magicdance_tpu.train.trainer import (
    TrainState,
    Trainer,
    make_lr_schedule,
    partition_params,
    trainable_predicate,
)
