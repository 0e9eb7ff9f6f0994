"""Batched cross-conversion CLI — the serving configuration as a command.

The reference ships only a single-pair CLI (reference: inference.py:95-109);
this additive command converts EVERY source against EVERY target in one
padded batch through the model and one batched TPU Griffin-Lim call
(infer/inferencer.py convert_grid — length-masked, so mixed-length wavs
convert exactly as one-at-a-time conversion would).

    python -m adaptive_voice_conversion_tpu.cli.convert_grid \
        -a attr.pkl -c config.yaml -m vctk_model.ckpt \
        -s src1.wav src2.wav -t tgtA.wav tgtB.wav -o out_dir

Outputs ``out_dir/<source-stem>__to__<target-stem>.wav`` per pair.
``-m`` accepts either a reference torch ``.ckpt`` file or a path whose
``<path>.orbax`` directory holds our checkpoints.
"""

import os
from argparse import ArgumentParser


def build_parser() -> ArgumentParser:
    parser = ArgumentParser()
    parser.add_argument("-attr", "-a", help="attr file path", required=True)
    parser.add_argument("-config", "-c", help="config file path", required=True)
    parser.add_argument("-model", "-m", help="model path", required=True)
    parser.add_argument("-sources", "-s", nargs="+", required=True,
                        help="source wav paths (content)")
    parser.add_argument("-targets", "-t", nargs="+", required=True,
                        help="target wav paths (speaker)")
    parser.add_argument("-output_dir", "-o", required=True)
    parser.add_argument("--gl_method", default="exact",
                        choices=["exact", "pallas"],
                        help="Griffin-Lim impl: per-sample-exact masked "
                        "iterations, or the fused Pallas kernel hybrid with "
                        "masked warm/polish (~4x faster vocode; "
                        "KERNELS_r04.json)")
    parser.add_argument("--gl_iters", type=int, default=None,
                        help="Griffin-Lim iterations (default: config n_iter)")
    parser.add_argument("--len_bucket", type=int, default=1,
                        help="round padded shapes up to this many frames so "
                        "repeated calls with varying lengths reuse compiled "
                        "programs (results unchanged — the masked path is "
                        "exact under any padding)")
    parser.add_argument("--precision", default=None,
                        choices=["default", "high", "highest"],
                        help="matmul/conv precision for the serving "
                        "programs: default = one bf16 MXU pass (fast); "
                        "highest = full-f32 results matching the "
                        "reference's implicit f32 serving, at a measured "
                        "throughput cost (SERVING_r05.json)")
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    from ..core.config import load_config
    from ..dsp.audio import save_wav
    from ..dsp.features import get_spectrograms
    from ..infer.inferencer import Inferencer

    config = load_config(args.config)
    if os.path.isdir(f"{args.model}.orbax"):
        inferencer = Inferencer.from_orbax(
            config, args.model, args.attr, gl_method=args.gl_method,
            precision=args.precision,
        )
    else:
        inferencer = Inferencer.from_torch_checkpoint(
            config, args.model, args.attr, gl_method=args.gl_method,
            precision=args.precision,
        )

    def featurize(paths):
        mels = []
        for p in paths:
            mel, _ = get_spectrograms(p, config.signal)
            mels.append(inferencer.normalize(mel))
        return mels

    src_mels = featurize(args.sources)
    tar_mels = featurize(args.targets)
    wavs = inferencer.convert_grid(
        src_mels, tar_mels, gl_iters=args.gl_iters,
        len_bucket=args.len_bucket,
    )
    os.makedirs(args.output_dir, exist_ok=True)
    stem = lambda p: os.path.splitext(os.path.basename(p))[0]
    n_t = len(args.targets)
    written = []
    for i, sp in enumerate(args.sources):
        for j, tp in enumerate(args.targets):
            out = os.path.join(
                args.output_dir, f"{stem(sp)}__to__{stem(tp)}.wav"
            )
            save_wav(out, wavs[i * n_t + j], config.signal.sr)
            written.append(out)
    print(f"wrote {len(written)} conversions to {args.output_dir}",
          flush=True)


if __name__ == "__main__":
    main()
