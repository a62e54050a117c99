from .torch_import import ddpm_from_torch, unet_params_from_torch, load_torch_state_dict, sequential_mlp_from_torch
from .torch_export import ddpm_to_torch, unet_params_to_torch
from .checkpoint import save_checkpoint, load_checkpoint
from .metrics import MetricsLogger, write_csv
