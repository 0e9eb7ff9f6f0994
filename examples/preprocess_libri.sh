#!/bin/sh
# LibriTTS preprocessing stages 0-3 (reference: preprocess/preprocess_libri.sh
# with preprocess/libri.config; the reference's stage-1 crash is fixed here).
# --tpu runs the featurizer batched on the TPU chip.
raw=${1:-/data/raw/LibriTTS}
out=${2:-/data/feat/LibriTTS/sr_24000_mel_norm}
python3 -m adaptive_voice_conversion_tpu.tools.preprocess_pipeline libri \
    --raw_data_dir "$raw" \
    --data_dir "$out" \
    --segment_size 128 \
    --dev_prop 0.05 \
    --training_samples 10000000 \
    --testing_samples 10000 \
    --n_utts_attr 5000 \
    --train_set train-clean-100 \
    --test_set dev-clean \
    --tpu
