#!/bin/bash
# SSL-transfer validation study (VALIDATION.md) — fully regenerable.
#
# Question: does DiG-style self-supervised pre-training (MoCo+MIM)
# transfer to recognition the way the reference claims (README.md:44-79),
# measured by WORD ACCURACY on a held-out test set?
#
# Protocol (single v5e chip; ~2.5 h at the default scale):
#   corpus A  — unlabeled rendered words, large word pool, easy regime
#   corpus B  — labeled + test split, small word pool, SHARED test pool
#               (test words come from the training vocabulary on fresh
#               renders — the regime of the real STR benchmarks, whose
#               lexicons overlap the training corpora; a disjoint pool
#               pins word accuracy to ~0 at this budget, see VALIDATION.md)
#   pretrain  — ViT-tiny MoCo+MIM on corpus A (unlabeled)
#   arm 1     — finetune from scratch on corpus B
#   arm 2     — identical recipe, --finetune <pretrain ckpt>
#
# Scale knobs (env vars; defaults = the full protocol):
#   UNLABELED=40000 PRE_EPOCHS=12 LABELED=8000 TEST=3000 WORDS=300
#   FT_EPOCHS=60
# Model knobs (default = ViT-tiny for speed; the FLAGSHIP reference
# recipe, README.md:53-79, is PRE_MODEL=pretrain_simmim_moco_ori_vit_small_patch4_32x128
# FT_MODEL=vit_small_patch4_32x128):
#   PRE_MODEL / FT_MODEL / DECODER (default small_tf_decoder)
# BEAM_WIDTH=5 adds a final greedy-vs-beam eval pair on the SSL arm's
# final checkpoint (that arm then saves its last epoch; best-ckpt saves
# stay off via --no_save_best — slow D2H on this box, VALIDATION.md).
# A ~25-min scaled run that still lands both arms at measurable word
# accuracy: UNLABELED=24000 PRE_EPOCHS=10 LABELED=4000 TEST=1500
#           WORDS=350 FT_EPOCHS=40 tools/validation_study.sh /tmp/s
#
# Usage: tools/validation_study.sh [WORKDIR]   (default /tmp/ssl_study)
set -ex
D=${1:-/tmp/ssl_study}
UNLABELED=${UNLABELED:-40000}
PRE_EPOCHS=${PRE_EPOCHS:-12}
LABELED=${LABELED:-8000}
TEST=${TEST:-3000}
WORDS=${WORDS:-300}
FT_EPOCHS=${FT_EPOCHS:-60}
PRE_MODEL=${PRE_MODEL:-pretrain_simmim_moco_ori_vit_tiny_patch4_32x128}
FT_MODEL=${FT_MODEL:-vit_tiny_patch4_32x128}
DECODER=${DECODER:-small_tf_decoder}
BEAM_WIDTH=${BEAM_WIDTH:-}
# 8e-4 is right for ViT-tiny; ViT-SMALL collapses at that peak on this
# corpus scale (train loss flatlines ~10.3 for 40+ epochs, acc ~0 —
# measured round 5) and needs FT_LR=2e-4 with ~2x the epochs instead
FT_LR=${FT_LR:-8e-4}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}
cd "$(dirname "$0")/.."

python tools/gen_synth.py "$D/corpusA" --easy --test_pool shared \
  --train "$UNLABELED" --labeled 100 --test 100 --train_words 1500 \
  --test_words 10 --max_word_len 6 --seed 3
python tools/gen_synth.py "$D/corpusB" --easy --test_pool shared \
  --train 100 --labeled "$LABELED" --test "$TEST" --train_words "$WORDS" \
  --test_words 10 --max_word_len 6 --seed 5

timeout 10800 python -m dig_tpu.cli.run_pretrain \
  --model "$PRE_MODEL" \
  --image_alone_path "$D/corpusA/train" --batch_size 128 --epochs "$PRE_EPOCHS" \
  --warmup_steps 300 --device_aug --num_workers 8 \
  --output_dir "$D/pre" --save_ckpt_freq 1000 --eval_freq 0
CK="$D/pre/$(ls "$D/pre" | grep -E '^checkpoint-[0-9]+$' | sort -t- -k2 -n | tail -1)"

# Finetune arms skip checkpoint writes (--no_save_ckpt): this box's
# device->host tunnel runs ~3 MB/s, and per-epoch best-ckpt saves would
# dominate wall time without affecting the reported max accuracy.
for ARM in scratch ssl; do
  EXTRA=""
  [ "$ARM" = ssl ] && EXTRA="--finetune $CK"
  SAVE="--no_save_ckpt"
  # keep the SSL arm's final epoch when a beam arm follows (single save)
  [ "$ARM" = ssl ] && [ -n "$BEAM_WIDTH" ] && SAVE="--no_save_best --save_ckpt_freq 100000"
  timeout 14000 python -m dig_tpu.cli.run_finetune \
    --model "$FT_MODEL" --decoder_name "$DECODER" \
    --data_path "$D/corpusB/labeled" --eval_data_path "$D/corpusB/test" \
    --batch_size 128 --epochs "$FT_EPOCHS" --warmup_epochs 2 --num_workers 8 \
    --lr "$FT_LR" $EXTRA $SAVE \
    --output_dir "$D/ft_$ARM" --eval_freq 0
done

# Greedy-vs-beam eval pair on the identical final-epoch weights
if [ -n "$BEAM_WIDTH" ]; then
  FINAL="$D/ft_ssl/$(ls "$D/ft_ssl" | grep -E '^checkpoint-[0-9]+$' | sort -t- -k2 -n | tail -1)"
  for MODE in greedy beam; do
    BW=0; [ "$MODE" = beam ] && BW="$BEAM_WIDTH"
    timeout 3600 python -m dig_tpu.cli.run_finetune \
      --model "$FT_MODEL" --decoder_name "$DECODER" \
      --data_path "$D/corpusB/labeled" --eval_data_path "$D/corpusB/test" \
      --batch_size 128 --eval --resume "$FINAL" --beam_width "$BW" \
      --num_workers 8 --no_save_ckpt --output_dir "$D/eval_$MODE"
  done
fi

# Optional low-label contrast pair: LOW_LABEL=3000 adds two arms trained
# on a LOW_LABEL-sample subset of corpus B at an equal-STEP budget
# (epochs scaled by LABELED/LOW_LABEL so both regimes see the same number
# of optimizer steps; at equal EPOCHS both arms stay floored — see
# VALIDATION.md).  Warmup scales with the longer schedule.
if [ -n "${LOW_LABEL:-}" ]; then
  LL_EPOCHS=$((FT_EPOCHS * LABELED / LOW_LABEL))
  for ARM in scratch ssl; do
    EXTRA=""
    [ "$ARM" = ssl ] && EXTRA="--finetune $CK"
    timeout 14000 python -m dig_tpu.cli.run_finetune \
      --model vit_tiny_patch4_32x128 --decoder_name small_tf_decoder \
      --data_path "$D/corpusB/labeled" --eval_data_path "$D/corpusB/test" \
      --num_samples "$LOW_LABEL" \
      --batch_size 128 --epochs "$LL_EPOCHS" \
      --warmup_epochs $((LL_EPOCHS / 30)) --num_workers 8 \
      --lr "$FT_LR" $EXTRA --no_save_ckpt \
      --output_dir "$D/ft_${ARM}_low" --save_ckpt_freq 100000 --eval_freq 0
  done
fi

echo "=== results (best test word accuracy per arm) ==="
for FT in "$D"/ft_*; do
  echo "$(basename "$FT"): $(grep -o 'max accuracy: [0-9.]*' "$FT/screen.txt" | tail -1)"
done
