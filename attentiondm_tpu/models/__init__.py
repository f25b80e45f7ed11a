from .unet import UNetConfig, unet_init, unet_apply, count_params, get_timestep_embedding
from .ema import ema_init, ema_update, ema_params
from .torch_convert import convert_ddim_state_dict, params_to_torch_names

__all__ = [
    "UNetConfig",
    "unet_init",
    "unet_apply",
    "count_params",
    "get_timestep_embedding",
    "ema_init",
    "ema_update",
    "ema_params",
    "convert_ddim_state_dict",
    "params_to_torch_names",
]
