"""JAX param-pytree -> PyTorch state_dict exporter (inverse of
torch_import). Lets models trained here be loaded by the reference
implementation's ``AE.load_state_dict`` (model.py:373-395, solver.py:51-55)
— key names and weight layouts match the reference module tree exactly.
"""

from __future__ import annotations

import numpy as np

from ..core.config import AEConfig


def _conv_out(sd: dict, name: str, p: dict) -> None:
    sd[f"{name}.weight"] = np.asarray(p["w"]).transpose(2, 1, 0).copy()
    sd[f"{name}.bias"] = np.asarray(p["b"]).copy()


def _dense_out(sd: dict, name: str, p: dict) -> None:
    sd[f"{name}.weight"] = np.ascontiguousarray(np.asarray(p["w"]).T)
    sd[f"{name}.bias"] = np.asarray(p["b"]).copy()


def params_to_torch_state_dict(params: dict, cfg: AEConfig) -> dict:
    """Returns {reference key: numpy array}; pass through
    ``{k: torch.from_numpy(v) for ...}`` + torch.save for a loadable ckpt."""
    sd: dict = {}
    se_cfg, ce_cfg, de_cfg = cfg.speaker_encoder, cfg.content_encoder, cfg.decoder

    se = params["speaker_encoder"]
    for i, p in enumerate(se["conv_bank"]):
        _conv_out(sd, f"speaker_encoder.conv_bank.{i}", p)
    _conv_out(sd, "speaker_encoder.in_conv_layer", se["in_conv"])
    for l, blk in enumerate(se["conv_blocks"]):
        _conv_out(sd, f"speaker_encoder.first_conv_layers.{l}", blk["first"])
        _conv_out(sd, f"speaker_encoder.second_conv_layers.{l}", blk["second"])
    for l, blk in enumerate(se["dense_blocks"]):
        _dense_out(sd, f"speaker_encoder.first_dense_layers.{l}", blk["first"])
        _dense_out(sd, f"speaker_encoder.second_dense_layers.{l}", blk["second"])
    _dense_out(sd, "speaker_encoder.output_layer", se["output"])

    ce = params["content_encoder"]
    for i, p in enumerate(ce["conv_bank"]):
        _conv_out(sd, f"content_encoder.conv_bank.{i}", p)
    _conv_out(sd, "content_encoder.in_conv_layer", ce["in_conv"])
    for l, blk in enumerate(ce["conv_blocks"]):
        _conv_out(sd, f"content_encoder.first_conv_layers.{l}", blk["first"])
        _conv_out(sd, f"content_encoder.second_conv_layers.{l}", blk["second"])
    _conv_out(sd, "content_encoder.mean_layer", ce["mean"])
    _conv_out(sd, "content_encoder.std_layer", ce["std"])

    de = params["decoder"]
    _conv_out(sd, "decoder.in_conv_layer", de["in_conv"])
    for l, blk in enumerate(de["conv_blocks"]):
        _conv_out(sd, f"decoder.first_conv_layers.{l}", blk["first"])
        _conv_out(sd, f"decoder.second_conv_layers.{l}", blk["second"])
        _dense_out(sd, f"decoder.conv_affine_layers.{2 * l}", blk["affine1"])
        _dense_out(sd, f"decoder.conv_affine_layers.{2 * l + 1}", blk["affine2"])
    _conv_out(sd, "decoder.out_conv_layer", de["out_conv"])
    return sd


def save_torch_checkpoint(params: dict, cfg: AEConfig, path: str) -> None:
    import torch

    sd = params_to_torch_state_dict(params, cfg)
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)
