#!/bin/bash
# SSL-transfer validation study (VALIDATION.md) — fully regenerable.
#
# Question: does DiG-style self-supervised pre-training (MoCo+MIM)
# transfer to recognition the way the reference claims (README.md:44-79),
# measured by WORD ACCURACY on a held-out test set?
#
# Protocol (single v5e chip, ~2.5 h total):
#   corpus A  — 40k unlabeled rendered words, 1500-word pool, easy regime
#   corpus B  — 8k labeled + 3k test, 300-word pool, SHARED test pool
#               (test words come from the training vocabulary on fresh
#               renders — the regime of the real STR benchmarks, whose
#               lexicons overlap the training corpora; a disjoint pool
#               pins word accuracy to ~0 at this budget, see VALIDATION.md)
#   pretrain  — ViT-tiny MoCo+MIM, 12 epochs on corpus A (unlabeled)
#   arm 1     — finetune from scratch on corpus B, 60 epochs
#   arm 2     — identical recipe, --finetune <pretrain ckpt>
#
# Usage: tools/validation_study.sh [WORKDIR]   (default /tmp/ssl_study)
set -ex
D=${1:-/tmp/ssl_study}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}
cd "$(dirname "$0")/.."

python tools/gen_synth.py "$D/corpusA" --easy --test_pool shared \
  --train 40000 --labeled 100 --test 100 --train_words 1500 \
  --test_words 10 --max_word_len 6 --seed 3
python tools/gen_synth.py "$D/corpusB" --easy --test_pool shared \
  --train 100 --labeled 8000 --test 3000 --train_words 300 \
  --test_words 10 --max_word_len 6 --seed 5

timeout 7200 python -m dig_tpu.cli.run_pretrain \
  --model pretrain_simmim_moco_ori_vit_tiny_patch4_32x128 \
  --image_alone_path "$D/corpusA/train" --batch_size 128 --epochs 12 \
  --warmup_steps 300 --device_aug --num_workers 8 \
  --output_dir "$D/pre" --save_ckpt_freq 1000 --eval_freq 0
CK="$D/pre/$(ls "$D/pre" | grep -E '^checkpoint-[0-9]+$' | sort -t- -k2 -n | tail -1)"

for ARM in scratch ssl; do
  EXTRA=""
  [ "$ARM" = ssl ] && EXTRA="--finetune $CK"
  timeout 9000 python -m dig_tpu.cli.run_finetune \
    --model vit_tiny_patch4_32x128 --decoder_name small_tf_decoder \
    --data_path "$D/corpusB/labeled" --eval_data_path "$D/corpusB/test" \
    --batch_size 128 --epochs 60 --warmup_epochs 2 --num_workers 8 \
    --lr 8e-4 $EXTRA \
    --output_dir "$D/ft_$ARM" --save_ckpt_freq 1000 --eval_freq 0
done

echo "=== results (best test word accuracy per arm) ==="
for ARM in scratch ssl; do
  echo "$ARM: $(grep -o 'max accuracy: [0-9.]*' "$D/ft_$ARM/screen.txt" | tail -1)"
done
