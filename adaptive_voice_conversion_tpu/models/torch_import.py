"""PyTorch checkpoint -> JAX param-pytree converter.

The reference ships a pretrained ``vctk_model.ckpt`` (a torch
``state_dict``, README.md:4, saved by solver.py:41). This module maps its
key names (model.py:209-371 module attributes) onto our param tree and
transposes weight layouts:

- Conv1d weight (C_out, C_in, K) -> (K, C_in, C_out)
- Linear weight (C_out, C_in)   -> (C_in, C_out)

Used by the mel-allclose parity gate (converted mels vs the reference
checkpoint) and by tests that compare against torch activations.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.config import AEConfig


def _np(t):
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module scope. COPY: .numpy()
    # returns a view sharing the tensor's buffer, and jax's CPU backend can
    # alias numpy arrays zero-copy — a live torch module mutating its
    # tensors in place (e.g. spectral_norm's power-iteration buffer u,
    # updated every training forward) would silently mutate our params.
    return t.detach().cpu().numpy().copy()


def _raw_weight(sd, name):
    """Layer weight, handling torch spectral_norm's rename: sn-wrapped
    layers store ``weight_orig`` + power-iteration buffer ``weight_u``
    (reference model.py:334 wraps every decoder layer when sn=True)."""
    if f"{name}.weight" in sd:
        return _np(sd[f"{name}.weight"]), None
    return _np(sd[f"{name}.weight_orig"]), _np(sd[f"{name}.weight_u"])


def _conv(sd, name):
    w, u = _raw_weight(sd, name)
    b = _np(sd[f"{name}.bias"])
    out = {"w": jnp.asarray(w.transpose(2, 1, 0)), "b": jnp.asarray(b)}
    if u is not None:
        out["u"] = jnp.asarray(u)
    return out


def _dense(sd, name):
    w, u = _raw_weight(sd, name)
    b = _np(sd[f"{name}.bias"])
    out = {"w": jnp.asarray(w.T), "b": jnp.asarray(b)}
    if u is not None:
        out["u"] = jnp.asarray(u)
    return out


def torch_state_dict_to_params(sd: dict, cfg: AEConfig) -> dict:
    """Convert a reference AE state_dict into our param pytree."""
    se, ce, dec = cfg.speaker_encoder, cfg.content_encoder, cfg.decoder
    n_bank_se = len(range(se.bank_scale, se.bank_size + 1, se.bank_scale))
    n_bank_ce = len(range(ce.bank_scale, ce.bank_size + 1, ce.bank_scale))

    speaker = {
        "conv_bank": [
            _conv(sd, f"speaker_encoder.conv_bank.{i}") for i in range(n_bank_se)
        ],
        "in_conv": _conv(sd, "speaker_encoder.in_conv_layer"),
        "conv_blocks": [
            {
                "first": _conv(sd, f"speaker_encoder.first_conv_layers.{l}"),
                "second": _conv(sd, f"speaker_encoder.second_conv_layers.{l}"),
            }
            for l in range(se.n_conv_blocks)
        ],
        "dense_blocks": [
            {
                "first": _dense(sd, f"speaker_encoder.first_dense_layers.{l}"),
                "second": _dense(sd, f"speaker_encoder.second_dense_layers.{l}"),
            }
            for l in range(se.n_dense_blocks)
        ],
        "output": _dense(sd, "speaker_encoder.output_layer"),
    }
    content = {
        "conv_bank": [
            _conv(sd, f"content_encoder.conv_bank.{i}") for i in range(n_bank_ce)
        ],
        "in_conv": _conv(sd, "content_encoder.in_conv_layer"),
        "conv_blocks": [
            {
                "first": _conv(sd, f"content_encoder.first_conv_layers.{l}"),
                "second": _conv(sd, f"content_encoder.second_conv_layers.{l}"),
            }
            for l in range(ce.n_conv_blocks)
        ],
        "mean": _conv(sd, "content_encoder.mean_layer"),
        "std": _conv(sd, "content_encoder.std_layer"),
    }
    decoder = {
        "in_conv": _conv(sd, "decoder.in_conv_layer"),
        "conv_blocks": [
            {
                "first": _conv(sd, f"decoder.first_conv_layers.{l}"),
                "second": _conv(sd, f"decoder.second_conv_layers.{l}"),
                "affine1": _dense(sd, f"decoder.conv_affine_layers.{2 * l}"),
                "affine2": _dense(sd, f"decoder.conv_affine_layers.{2 * l + 1}"),
            }
            for l in range(dec.n_conv_blocks)
        ],
        "out_conv": _conv(sd, "decoder.out_conv_layer"),
    }
    return {
        "speaker_encoder": speaker,
        "content_encoder": content,
        "decoder": decoder,
    }


def load_torch_checkpoint(path: str, cfg: AEConfig) -> dict:
    """Load a reference ``.ckpt`` file (torch.save'd state_dict) as a pytree."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return torch_state_dict_to_params(sd, cfg)
