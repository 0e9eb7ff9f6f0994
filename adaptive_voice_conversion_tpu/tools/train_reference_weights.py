"""Train the ACTUAL reference torch model to produce trained-weight fixtures.

The parity/quality gates in rounds 2-4 ran on seeded default-init weights —
legitimate (the pretrained vctk_model.ckpt of reference README.md:4 cannot
be downloaded here), but trained weights have very different activation
statistics (saturated instance norms, large AdaIN affines, non-unit
spectral-norm sigma), which is exactly where bf16/eps/edge semantics can
bite. This tool closes that gap: it trains the reference's own ``AE``
(/root/reference/model.py:373-395) with the exact ``ae_step`` arithmetic of
/root/reference/solver.py:81-97 (Adam amsgrad + L2 wd, clip 5, KL anneal)
on synthetic mel segments, then saves the torch ``state_dict`` — a drop-in
for every ``--ckpt`` consumer (``tools.parity_gate``, ``bench_serving``,
``tests/test_reference_parity.py``).

The checkpoint (~36 MB) is NOT committed to git; it is deterministic given
(torch version, seed, threads) and regenerates with:

    python -m adaptive_voice_conversion_tpu.tools.train_reference_weights \
        --steps 2500 --batch 8 --out tests/golden/trained_reference.ckpt

A small committed metadata JSON records provenance + final losses so the
artifact consumers can verify they hold the right fixture.
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=2500)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--pool", type=int, default=512)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--annealing_iters", type=int, default=1000)
    p.add_argument("--out", default="tests/golden/trained_reference.ckpt")
    p.add_argument("--meta_out", default="tests/golden/trained_reference.json")
    args = p.parse_args(argv)

    import numpy as np
    import torch

    from ..models.reference_oracle import build_reference_ae
    from .loss_trajectory import synthetic_segments

    torch.set_num_threads(2)
    ae, raw = build_reference_ae(seed=args.seed)
    ae.train()

    seg = raw["data_loader"]["segment_size"]
    n_mels = raw["SpeakerEncoder"]["c_in"]
    pool = synthetic_segments(args.pool, seg, n_mels, seed=args.seed)
    order_rng = np.random.default_rng(args.seed + 1)
    picks = order_rng.integers(0, args.pool, size=(args.steps, args.batch))

    opt_cfg = raw["optimizer"]
    opt = torch.optim.Adam(
        ae.parameters(),
        lr=opt_cfg["lr"],
        betas=(opt_cfg["beta1"], opt_cfg["beta2"]),
        amsgrad=opt_cfg["amsgrad"],
        weight_decay=opt_cfg["weight_decay"],
    )
    lam_kl_max = raw["lambda"]["lambda_kl"]
    lam_rec = raw["lambda"]["lambda_rec"]
    torch.manual_seed(args.seed + 2)
    crit = torch.nn.L1Loss()

    t0 = time.time()
    rec_hist, kl_hist = [], []
    for it in range(args.steps):
        x = torch.from_numpy(
            np.ascontiguousarray(pool[picks[it]].transpose(0, 2, 1))
        )
        lam = lam_kl_max * min(1.0, (it + 1) / args.annealing_iters)
        mu, log_sigma, emb, dec = ae(x)
        loss_rec = crit(dec, x)
        loss_kl = 0.5 * torch.mean(torch.exp(log_sigma) + mu**2 - 1 - log_sigma)
        loss = lam_rec * loss_rec + lam * loss_kl
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(ae.parameters(), max_norm=opt_cfg["grad_norm"])
        opt.step()
        rec_hist.append(float(loss_rec.detach()))
        kl_hist.append(float(loss_kl.detach()))
        if it % 100 == 0:
            print(
                f"[{it}/{args.steps}] rec={rec_hist[-1]:.4f} "
                f"kl={kl_hist[-1]:.4f} ({time.time() - t0:.0f}s)",
                flush=True,
            )

    ae.eval()
    torch.save(ae.state_dict(), args.out)

    # Trained-statistics summary: evidence the weights left the init regime.
    with torch.no_grad():
        sd = ae.state_dict()
        adain_w_max = max(
            float(v.abs().max()) for k, v in sd.items()
            if "conv_affine_layers" in k
        )
        param_rms = float(
            torch.cat([v.flatten() for v in sd.values()]).pow(2).mean().sqrt()
        )
    meta = {
        "tool": "adaptive_voice_conversion_tpu.tools.train_reference_weights",
        "trains": "/root/reference/model.py AE via solver.py:81-97 arithmetic",
        "torch_version": torch.__version__,
        "seed": args.seed,
        "steps": args.steps,
        "batch": args.batch,
        "pool": args.pool,
        "annealing_iters": args.annealing_iters,
        "seconds": round(time.time() - t0, 1),
        "final_window_rec": round(float(np.mean(rec_hist[-args.steps // 3:])), 5),
        "final_window_kl": round(float(np.mean(kl_hist[-args.steps // 3:])), 5),
        "init_window_rec": round(float(np.mean(rec_hist[:20])), 5),
        "adain_affine_abs_max": round(adain_w_max, 4),
        "param_rms": round(param_rms, 5),
        "ckpt": args.out,
    }
    with open(args.meta_out, "w") as f:
        json.dump(meta, f, indent=2)
    print(json.dumps(meta))
    return meta


if __name__ == "__main__":
    main()
