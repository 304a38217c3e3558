from d3feat_tpu.train.optim import learning_rate, make_optimizer  # noqa: F401
from d3feat_tpu.train.step import (  # noqa: F401
    StepMetrics,
    TrainState,
    init_train_state,
    make_eval_step,
    make_extract_step,
    make_train_step,
)
