"""North-star parity gate artifact generator.

Runs the converted-mel parity gate against the ACTUAL reference
implementation (/root/reference/model.py:373-395, inference path
inference.py:62-93) at the full shipped config and writes a JSON artifact
with per-module max-abs activation diffs.

Weights: ``--ckpt vctk_model.ckpt`` if the pretrained checkpoint is
available (README.md:4); otherwise a seeded random init of the reference's
own model class — exercising the identical code and weight-conversion path.

Usage:  python -m adaptive_voice_conversion_tpu.tools.parity_gate \
            [--ckpt path] [--out PARITY.json]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def run_gate(ckpt: str | None = None, seed: int = 7, atol: float = 1e-4) -> dict:
    import torch
    import jax.numpy as jnp

    from ..core.config import config_from_dict
    from ..models.ae import ae_inference, count_params
    from ..models.modules import (
        content_encoder_apply,
        decoder_apply,
        speaker_encoder_apply,
    )
    from ..models.reference_oracle import build_reference_ae
    from ..models.torch_import import torch_state_dict_to_params

    ae, raw = build_reference_ae(seed=seed, ckpt_path=ckpt)
    cfg = config_from_dict(raw).model
    params = torch_state_dict_to_params(ae.state_dict(), cfg)

    def mk(seed_, b, t):
        rng = np.random.RandomState(seed_)
        x = rng.randn(b, 512, t).astype(np.float32)
        return torch.from_numpy(x), jnp.asarray(x.transpose(0, 2, 1))

    diffs: dict[str, float] = {}

    xt, xj = mk(1, 2, 128)
    with torch.no_grad():
        ref = ae.speaker_encoder(xt).numpy()
    got = np.asarray(
        speaker_encoder_apply(params["speaker_encoder"], cfg.speaker_encoder, xj)
    )
    diffs["speaker_encoder_max_abs"] = float(np.abs(got - ref).max())

    xt, xj = mk(2, 2, 128)
    with torch.no_grad():
        mu_t, ls_t = ae.content_encoder(xt)
    mu, ls = content_encoder_apply(params["content_encoder"], cfg.content_encoder, xj)
    diffs["content_mu_max_abs"] = float(
        np.abs(np.asarray(mu).transpose(0, 2, 1) - mu_t.numpy()).max()
    )
    diffs["content_log_sigma_max_abs"] = float(
        np.abs(np.asarray(ls).transpose(0, 2, 1) - ls_t.numpy()).max()
    )

    rng = np.random.RandomState(3)
    z = rng.randn(2, 128, 16).astype(np.float32)
    cond = rng.randn(2, 128).astype(np.float32)
    with torch.no_grad():
        ref = ae.decoder(torch.from_numpy(z), torch.from_numpy(cond)).numpy()
    got = decoder_apply(
        params["decoder"], cfg.decoder,
        jnp.asarray(z.transpose(0, 2, 1)), jnp.asarray(cond),
    )
    diffs["decoder_max_abs"] = float(
        np.abs(np.asarray(got).transpose(0, 2, 1) - ref).max()
    )

    # Converted-mel gates: training shape and full-utterance shape.
    for name, (bs, ts, tt_len) in {
        "mel_seg128": (2, 128, 128),
        "mel_utterance": (1, 435, 289),
    }.items():
        st, sj = mk(40 + len(name), bs, ts)
        tt, tj = mk(50 + len(name), bs, tt_len)
        with torch.no_grad():
            ref = ae.inference(st, tt).numpy()
        got = np.asarray(ae_inference(params, cfg, sj, tj)).transpose(0, 2, 1)
        diffs[f"{name}_max_abs"] = float(np.abs(got - ref).max())
        diffs[f"{name}_mae"] = float(np.abs(got - ref).mean())

    # Realistic mel-statistics inputs (z-normalized structured segments):
    # with TRAINED weights this drives the saturated INs / AdaIN affines
    # through their operating range, which random-normal probes do not.
    from .loss_trajectory import synthetic_segments

    pool = synthetic_segments(4, 200, 512, seed=11)
    pool = (pool - pool.mean()) / max(pool.std(), 1e-6)
    with torch.no_grad():
        ref = ae.inference(
            torch.from_numpy(pool[:2].transpose(0, 2, 1)),
            torch.from_numpy(pool[2:].transpose(0, 2, 1)),
        ).numpy()
    got = np.asarray(
        ae_inference(params, cfg, jnp.asarray(pool[:2]), jnp.asarray(pool[2:]))
    ).transpose(0, 2, 1)
    diffs["mel_realistic_max_abs"] = float(np.abs(got - ref).max())
    diffs["mel_realistic_mae"] = float(np.abs(got - ref).mean())

    return {
        "gate": "converted-mel allclose vs actual reference model.py",
        "weights": ckpt if ckpt else f"reference-default-init(seed={seed})",
        "config": "full shipped config.yaml (512 mel, c_h=128, 6 blocks)",
        "param_count": count_params(params),
        "atol_target": atol,
        "diffs": diffs,
        "pass": bool(max(diffs.values()) <= atol),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", default=None, help="path to vctk_model.ckpt")
    p.add_argument("--out", default="PARITY.json")
    p.add_argument("--seed", type=int, default=7)
    p.add_argument(
        "--platform",
        default="cpu",
        help="JAX platform for the gate. The parity harness is CPU per "
        "BASELINE.md: on TPU, float32 matmuls/convs default to bfloat16 "
        "passes, which measures hardware precision, not implementation "
        "parity. Pass 'tpu' to record the TPU-default-precision diffs.",
    )
    args = p.parse_args(argv)
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_default_matmul_precision", "highest")
    result = run_gate(ckpt=args.ckpt, seed=args.seed)
    result["platform"] = args.platform or "default"
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
