#!/bin/sh
# VCTK preprocessing stages 0-3 (reference: preprocess/preprocess_vctk.sh
# with the parameters of preprocess/vctk.config).
raw=${1:-/data/raw/VCTK-Corpus}
out=${2:-/data/feat/vctk/sr_24000_mel_norm}
python3 -m adaptive_voice_conversion_tpu.tools.preprocess_pipeline vctk \
    --raw_data_dir "$raw" \
    --data_dir "$out" \
    --segment_size 128 \
    --n_out_speakers 20 \
    --test_prop 0.1 \
    --sample_rate 24000 \
    --training_samples 10000000 \
    --testing_samples 10000 \
    --n_utts_attr 5000
