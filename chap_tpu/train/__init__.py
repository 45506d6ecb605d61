from chap_tpu.train.state import TrainState, create_train_state, make_lr_schedule  # noqa: F401
