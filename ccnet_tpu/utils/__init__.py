from ccnet_tpu.utils.logging import get_logger
from ccnet_tpu.utils.checkpoint import (
    variables_to_torch_state_dict,
    torch_state_dict_to_variables,
    save_pth,
    load_pth,
    save_checkpoint,
    restore_checkpoint,
    latest_checkpoint_step,
)

__all__ = [
    "get_logger",
    "variables_to_torch_state_dict",
    "torch_state_dict_to_variables",
    "save_pth",
    "load_pth",
    "save_checkpoint",
    "restore_checkpoint",
    "latest_checkpoint_step",
]
