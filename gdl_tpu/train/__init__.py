from gdl_tpu.train.optim import make_optimizer, lr_for_epoch  # noqa: F401
from gdl_tpu.train.dgl import (  # noqa: F401
    TrainState,
    create_train_state,
    dgl_loss_fn,
    make_dgl_train_step,
    make_eval_step,
)
