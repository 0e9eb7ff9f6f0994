#!/bin/sh
# Canonical VCTK training run (reference: train.sh — 500k iters, batch 128,
# 128-frame segments from train_samples_128.json).
data_dir=${1:-/data/feat/vctk/sr_24000_mel_norm}
store=${2:-/data/model/adaptive_vc_tpu/model}
python3 -m adaptive_voice_conversion_tpu.cli.train \
    -c "$(dirname "$0")/config.yaml" \
    -d "$data_dir" \
    -train_set train_128 \
    -train_index_file train_samples_128.json \
    -store_model_path "$store" \
    -t vctk_model \
    -iters 500000 \
    -summary_steps 500 \
    -eval_set in_test \
    -eval_steps 5000 \
    --compute_dtype bfloat16
# -eval_steps: held-out eval + one converted audio sample in TB every 5k
# steps (the reference produced in_test/out_test splits but never consumed
# them — SURVEY.md §4)
