from spalign_tpu.train.losses import (softmax_cross_entropy,
                                      soft_label_cross_entropy,
                                      mean_squared_error, get_loss_fn)
from spalign_tpu.train.trainer import (TrainState, Trainer,
                                       create_train_state, make_train_step)
