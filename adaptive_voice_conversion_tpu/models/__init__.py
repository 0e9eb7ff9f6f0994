from .modules import (
    init_speaker_encoder,
    init_content_encoder,
    init_decoder,
    speaker_encoder_apply,
    content_encoder_apply,
    decoder_apply,
)
from .ae import (
    init_ae,
    ae_forward,
    ae_inference,
    get_speaker_embedding,
    count_params,
)
from .torch_import import torch_state_dict_to_params, load_torch_checkpoint
from .torch_export import params_to_torch_state_dict, save_torch_checkpoint

__all__ = [
    "init_speaker_encoder",
    "init_content_encoder",
    "init_decoder",
    "speaker_encoder_apply",
    "content_encoder_apply",
    "decoder_apply",
    "init_ae",
    "ae_forward",
    "ae_inference",
    "get_speaker_embedding",
    "count_params",
    "torch_state_dict_to_params",
    "load_torch_checkpoint",
    "params_to_torch_state_dict",
    "save_torch_checkpoint",
]
