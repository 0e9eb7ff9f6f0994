"""One-shot conversion CLI (reference: inference.py:95-109, same flags).

    python -m adaptive_voice_conversion_tpu.cli.inference \
        -a attr.pkl -c config.yaml -m vctk_model.ckpt \
        -s source.wav -t target.wav -o output.wav

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
    parser.add_argument("-source", "-s", help="source wav path", required=True)
    parser.add_argument("-target", "-t", help="target wav path", required=True)
    parser.add_argument("-output", "-o", help="output wav path", required=True)
    parser.add_argument("-sample_rate", "-sr", default=24000, type=int)
    parser.add_argument("--cpu_vocoder", action="store_true",
                        help="use the numpy Griffin-Lim instead of TPU")
    parser.add_argument("--gl_method", default="exact",
                        choices=["exact", "pallas"],
                        help="Griffin-Lim impl: exact XLA-FFT loop, or the "
                        "fused Pallas hybrid (~3.4x faster at spectral "
                        "convergence at or below the exact path's; see "
                        "KERNELS_r04.json)")
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
    from ..infer.inferencer import Inferencer

    config = load_config(args.config)
    if os.path.isdir(f"{args.model}.orbax"):
        inferencer = Inferencer.from_orbax(
            config, args.model, args.attr,
            use_tpu_vocoder=not args.cpu_vocoder, gl_method=args.gl_method,
            precision=args.precision,
        )
    else:
        inferencer = Inferencer.from_torch_checkpoint(
            config, args.model, args.attr,
            use_tpu_vocoder=not args.cpu_vocoder, gl_method=args.gl_method,
            precision=args.precision,
        )
    inferencer.inference_from_path(args.source, args.target, args.output)


if __name__ == "__main__":
    main()
