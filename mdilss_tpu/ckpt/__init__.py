from .pth_converter import (
    convert_state_dict,
    export_state_dict,
    load_pth_tar,
)
from .surgery import extend_for_new_task, graft_shared_encoder, load_imagenet_encoder

__all__ = [
    "convert_state_dict",
    "export_state_dict",
    "load_pth_tar",
    "extend_for_new_task",
    "graft_shared_encoder",
    "load_imagenet_encoder",
]
