from .trainer import TrainConfig, TrainState, train_ddpm, build_train_epoch, make_optimizer, multistep_lr, restore_train_state
from .ema import EmaState, ema_init, ema_update
from .init import torch_style_init
