from onet_tpu.train.optim import adam_init, adam_update, step_decay, cosine_warm_restarts
from onet_tpu.train.steps import make_train_step, make_eval_step
