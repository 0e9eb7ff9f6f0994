"""Loss-trajectory comparison: the REFERENCE trainer vs this framework.

Behavioral-parity evidence beyond one-step oracles: train the reference's
own code (model.py + the exact ae_step arithmetic of solver.py:81-118,
torch CPU) and this framework's jitted train step on IDENTICAL synthetic
data from IDENTICAL initial weights (exported through torch_import), and
record both loss curves.

The two trainers draw reparameterization noise from different RNGs
(reference model.py:383 uses torch.randn; ours uses jax.random), so the
curves are compared statistically: smoothed loss_rec/loss_kl trajectories
must track within a small relative band, and both must show the same
monotone improvement. Optimizer semantics (Adam amsgrad + L2-style weight
decay, clip 5) are separately pinned bit-exactly in tests/test_train.py.

Writes LOSS_TRAJ_r02.json:
    {"steps": N, "batch": B,
     "reference": {"loss_rec": [...], "loss_kl": [...]},
     "ours":      {"loss_rec": [...], "loss_kl": [...]},
     "smoothed_rel_gap_rec": g, "pass": bool}

Usage:  python -m adaptive_voice_conversion_tpu.tools.loss_trajectory \
            [--steps 300] [--batch 8] [--out LOSS_TRAJ_r02.json]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def synthetic_segments(n: int, t: int, n_mels: int, seed: int) -> np.ndarray:
    """Structured mel-like segments ((0,1]-normalized): smooth spectral
    envelopes with harmonic ridges + noise, so the AE has real structure
    to learn and loss actually falls."""
    rng = np.random.default_rng(seed)
    mels = np.zeros((n, t, n_mels), np.float32)
    bins = np.arange(n_mels)[None, None, :]
    tt = np.arange(t)[None, :, None]
    for i in range(n):
        f0 = rng.uniform(10, 60)
        drift = rng.uniform(-0.1, 0.1)
        width = rng.uniform(3, 12)
        env = 0.5 + 0.3 * np.sin(2 * np.pi * tt / rng.uniform(20, 70))
        for h in range(1, 5):
            c = f0 * h + drift * tt
            mels[i] += (env * np.exp(-((bins - c) ** 2) / (2 * width**2)))[0]
        mels[i] += 0.05 * rng.standard_normal((t, n_mels))
    return np.clip(mels / max(mels.max(), 1e-6), 1e-8, 1.0).astype(np.float32)


def main(argv=None) -> dict:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--pool", type=int, default=256)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--out", default="LOSS_TRAJ_r02.json")
    args = p.parse_args(argv)

    import torch

    from ..core.config import TrainConfig
    from ..models.reference_oracle import build_reference_ae
    from ..models.torch_import import torch_state_dict_to_params
    from ..train.optim import kl_lambda
    from ..train.step import make_train_step

    cfg = TrainConfig()  # full shipped config; f32 for torch comparability
    seg = cfg.data_loader.segment_size
    n_mels = cfg.model.content_encoder.c_in

    pool = synthetic_segments(args.pool, seg, n_mels, seed=args.seed)
    order_rng = np.random.default_rng(args.seed + 1)
    picks = order_rng.integers(0, args.pool, size=(args.steps, args.batch))

    # ---- identical init: reference torch init -> exported to our params ----
    ref_ae, raw = build_reference_ae(seed=args.seed)
    ref_ae.train()
    sd = ref_ae.state_dict()
    params = torch_state_dict_to_params(sd, cfg.model)

    # ---- reference trainer: exact solver.py:70-97 arithmetic ----
    opt_cfg = raw["optimizer"]
    opt = torch.optim.Adam(
        ref_ae.parameters(),
        lr=opt_cfg["lr"],
        betas=(opt_cfg["beta1"], opt_cfg["beta2"]),
        amsgrad=opt_cfg["amsgrad"],
        weight_decay=opt_cfg["weight_decay"],
    )
    lam_kl_max = raw["lambda"]["lambda_kl"]
    lam_rec = raw["lambda"]["lambda_rec"]
    anneal = raw["annealing_iters"]
    torch.manual_seed(args.seed + 2)
    torch.set_num_threads(2)

    ref_rec, ref_kl = [], []
    t0 = time.time()
    crit = torch.nn.L1Loss()
    for it in range(args.steps):
        x = torch.from_numpy(
            np.ascontiguousarray(pool[picks[it]].transpose(0, 2, 1))
        )  # (B, n_mels, T) channels-first
        lam = lam_kl_max * min(1.0, (it + 1) / anneal)
        mu, log_sigma, emb, dec = ref_ae(x)
        loss_rec = crit(dec, x)
        loss_kl = 0.5 * torch.mean(
            torch.exp(log_sigma) + mu**2 - 1 - log_sigma
        )
        loss = lam_rec * loss_rec + lam * loss_kl
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(
            ref_ae.parameters(), max_norm=opt_cfg["grad_norm"]
        )
        opt.step()
        ref_rec.append(float(loss_rec))
        ref_kl.append(float(loss_kl))
        if it % 25 == 0:
            print(
                f"ref [{it}/{args.steps}] rec={ref_rec[-1]:.4f} "
                f"({time.time() - t0:.0f}s)",
                flush=True,
            )
    t_ref = time.time() - t0

    # ---- our trainer: the production jitted step (f32) ----
    import jax
    import jax.numpy as jnp

    init_fn, step = make_train_step(cfg)
    opt_state = init_fn(params)
    base_key = jax.random.PRNGKey(args.seed + 3)
    our_rec, our_kl = [], []
    t0 = time.time()
    for it in range(args.steps):
        x = jnp.asarray(pool[picks[it]])  # (B, T, n_mels) channels-last
        lam = kl_lambda(it, lam_kl_max, anneal)
        params, opt_state, m = step(
            params, opt_state, x, jax.random.fold_in(base_key, it),
            jnp.float32(lam),
        )
        our_rec.append(float(m["loss_rec"]))
        our_kl.append(float(m["loss_kl"]))
        if it % 25 == 0:
            print(
                f"ours [{it}/{args.steps}] rec={our_rec[-1]:.4f} "
                f"({time.time() - t0:.0f}s)",
                flush=True,
            )
    t_ours = time.time() - t0

    # ---- compare smoothed trajectories ----
    def smooth(v, k=25):
        v = np.asarray(v)
        kern = np.ones(k) / k
        return np.convolve(v, kern, mode="valid")

    s_ref, s_our = smooth(ref_rec), smooth(our_rec)
    rel_gap_rec = float(np.max(np.abs(s_ref - s_our) / np.maximum(s_ref, 1e-8)))
    sk_ref, sk_our = smooth(ref_kl), smooth(our_kl)
    rel_gap_kl = float(
        np.max(np.abs(sk_ref - sk_our) / np.maximum(np.abs(sk_ref), 1e-3))
    )
    both_improve = (
        s_ref[-1] < s_ref[0] * 0.9 and s_our[-1] < s_our[0] * 0.9
    )
    out = {
        "steps": args.steps,
        "batch": args.batch,
        "config": "full shipped config.yaml, f32, identical torch init",
        "reference": {"loss_rec": ref_rec, "loss_kl": ref_kl,
                      "seconds": round(t_ref, 1)},
        "ours": {"loss_rec": our_rec, "loss_kl": our_kl,
                 "seconds": round(t_ours, 1)},
        "smoothed_rel_gap_rec": round(rel_gap_rec, 4),
        "smoothed_rel_gap_kl": round(rel_gap_kl, 4),
        "both_improve_10pct": bool(both_improve),
        "pass": bool(rel_gap_rec < 0.10 and both_improve),
        "backend_ours": jax.default_backend(),
    }
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(
        json.dumps({k: v for k, v in out.items() if k not in ("reference", "ours")})
    )
    return out


if __name__ == "__main__":
    main()
