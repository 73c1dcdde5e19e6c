from stemgnn_tpu.train.engine import (  # noqa: F401
    inference,
    make_eval_step,
    make_train_step,
    test,
    train,
    validate,
)
