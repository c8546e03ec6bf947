#!/usr/bin/env bash
# The reference's full published protocol, end to end, as ONE command —
# runnable as soon as the licensed assets exist locally:
#
#   $DATA_ROOT/raw_datasets/AMASS/<corpora>/...      (AMASS npz bodies)
#   $DATA_ROOT/raw_datasets/DIP_IMU/s_XX/*.pkl      (DIP-IMU raw)
#   $DATA_ROOT/raw_datasets/TotalCapture/...        (DIP-recalculated pkl)
#   $SMPL_PKL                                        (official male SMPL)
#
# Mirrors the reference flow exactly (ref: README.MD:27-40, preprocess.py,
# train_a3gc_tp.py, evaluate_a3gc_tp.py:191-192): AMASS synthesis with CDA
# -> pretrain (--norm --cda, lr 1e-3) -> DIP-IMU finetune (--norm --cda
# -f, lr 1e-4) -> evaluate on the DIP-IMU test split and TotalCapture
# (--norm --cda), writing the same txt reports. Hidden sizes 256/64/128.
#
# Usage:
#   DATA_ROOT=/data SMPL_PKL=/data/smpl/SMPL_MALE.pkl \
#     MODEL=a3gc bash scripts/run_reference_protocol.sh
#
# The published protocol is the default. For a bounded smoke run (e.g. on
# the synthetic raw tree from scripts/make_synthetic_raw_assets.py):
#   EXTRA_FLAGS  — appended to BOTH train and evaluate (model geometry,
#                  e.g. "--hu1 32 --hu2 16 --hu3 32")
#   EXTRA_TRAIN_FLAGS — appended to train only (e.g. "--epochs 2")
set -euo pipefail
cd "$(dirname "$0")/.."

DATA_ROOT=${DATA_ROOT:?set DATA_ROOT to the directory holding raw_datasets/}
SMPL_PKL=${SMPL_PKL:?set SMPL_PKL to the official SMPL pickle}
MODEL=${MODEL:-a3gc}
BATCH=${BATCH:-16}            # ref: README.MD training commands use -b 16
OUT=${OUT:-protocol_run}
CLI="python -m a3gc_tpu.cli"
COMMON=(--smpl "$SMPL_PKL" --data_root "$DATA_ROOT")
# shellcheck disable=SC2206  # word-splitting of the extra flags is intended
EXTRA=(${EXTRA_FLAGS:-})
# shellcheck disable=SC2206
EXTRA_TRAIN=(${EXTRA_TRAIN_FLAGS:-})

mkdir -p "$OUT"

echo "== 1/4 offline data factory (AMASS+CDA, DIP-IMU sym, TotalCapture)"
$CLI preprocess "${COMMON[@]}" --dataset amass --split train --cda \
    --output "$OUT/amass_train.npz"
$CLI preprocess "${COMMON[@]}" --dataset amass --split valid --cda \
    --output "$OUT/amass_valid.npz"
$CLI preprocess "${COMMON[@]}" --dataset dipimu --split train --cda \
    --output "$OUT/dip_train.npz"
$CLI preprocess "${COMMON[@]}" --dataset dipimu --split valid --cda \
    --output "$OUT/dip_valid.npz"
$CLI preprocess "${COMMON[@]}" --dataset dipimu --split test \
    --output "$OUT/dip_test.npz"
$CLI preprocess "${COMMON[@]}" --dataset totalcapture --split test \
    --output "$OUT/tc_test.npz"
# write the sym stats WHERE --norm --cda resolves them: the framework
# loads $DATA_ROOT/stats/all_sym_train_stats.npz (config.paths), falling
# back to the shipped reference stats only if this file is absent
mkdir -p "$DATA_ROOT/stats"
$CLI stats --inputs "$OUT/amass_train.npz" \
    --output "$DATA_ROOT/stats/all_sym_train_stats.npz"

echo "== 2/4 pretrain on synthetic AMASS (ref: train_${MODEL}_tp.py, lr 1e-3)"
$CLI train "${COMMON[@]}" --model "$MODEL" -b "$BATCH" --lr 1e-3 \
    --norm --cda --name "${MODEL}_protocol" --save_root "$OUT/models" \
    --train_data "$OUT/amass_train.npz" --valid_data "$OUT/amass_valid.npz" \
    "${EXTRA[@]}" "${EXTRA_TRAIN[@]}"

echo "== 3/4 finetune on DIP-IMU (ref fine command: lr 1e-4 --norm --cda -f)"
$CLI train "${COMMON[@]}" --model "$MODEL" -b "$BATCH" --lr 1e-4 \
    --norm --cda -f --name "${MODEL}_protocol" --save_root "$OUT/models" \
    --resume "$OUT/models/${MODEL}_protocol" \
    --train_data "$OUT/dip_train.npz" --valid_data "$OUT/dip_valid.npz" \
    "${EXTRA[@]}" "${EXTRA_TRAIN[@]}"

echo "== 4/4 evaluate (DIP-IMU test + TotalCapture; ref: --norm --cda)"
$CLI evaluate "${COMMON[@]}" --model "$MODEL" --norm --cda \
    --path "$OUT/models/${MODEL}_protocol" --type finetuning \
    --datasets "$OUT/dip_test.npz" "$OUT/tc_test.npz" "${EXTRA[@]}"

echo "reports in evaluation_results/; compare SIP/angular/positional rows"
echo "against the paper's table (BASELINE.md) and the torch reference run."
