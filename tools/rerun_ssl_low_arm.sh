#!/bin/bash
# Regenerate ONLY the low-label SSL arm of the VALIDATION.md study
# (tools/validation_study.sh with LOW_LABEL=3000), after the original
# workdir was reclaimed.  Corpora and pretrain are seeded, so this
# reproduces the exact protocol of the committed rows: UNLABELED=120000
# PRE_EPOCHS=15 LABELED=12000 TEST=3000 WORDS=400 FT_EPOCHS=60,
# LOW_LABEL=3000 -> LL_EPOCHS=240 (equal-step budget, 5 520 steps).
set -ex
D=${1:-/tmp/ssl_study_low}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}
cd "$(dirname "$0")/.."

python tools/gen_synth.py "$D/corpusA" --easy --test_pool shared \
  --train 120000 --labeled 100 --test 100 --train_words 1500 \
  --test_words 10 --max_word_len 6 --seed 3
python tools/gen_synth.py "$D/corpusB" --easy --test_pool shared \
  --train 100 --labeled 12000 --test 3000 --train_words 400 \
  --test_words 10 --max_word_len 6 --seed 5

timeout 7200 python -m dig_tpu.cli.run_pretrain \
  --model pretrain_simmim_moco_ori_vit_tiny_patch4_32x128 \
  --image_alone_path "$D/corpusA/train" --batch_size 128 --epochs 15 \
  --warmup_steps 300 --device_aug --num_workers 8 \
  --output_dir "$D/pre" --save_ckpt_freq 1000 --eval_freq 0
CK="$D/pre/$(ls "$D/pre" | grep -E '^checkpoint-[0-9]+$' | sort -t- -k2 -n | tail -1)"

timeout 14000 python -m dig_tpu.cli.run_finetune \
  --model vit_tiny_patch4_32x128 --decoder_name small_tf_decoder \
  --data_path "$D/corpusB/labeled" --eval_data_path "$D/corpusB/test" \
  --num_samples 3000 \
  --batch_size 128 --epochs 240 \
  --warmup_epochs 8 --num_workers 8 \
  --lr 8e-4 --finetune "$CK" --no_save_ckpt \
  --output_dir "$D/ft_ssl_low" --save_ckpt_freq 100000 --eval_freq 0

echo "=== result ==="
grep -o 'max accuracy: [0-9.]*' "$D/ft_ssl_low/screen.txt" | tail -1
