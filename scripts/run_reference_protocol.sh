#!/usr/bin/env bash
# The reference's full published protocol, end to end, as ONE command —
# runnable as soon as the licensed assets exist locally:
#
#   $DATA_ROOT/raw_datasets/AMASS/<corpora>/...      (AMASS npz bodies)
#   $DATA_ROOT/raw_datasets/DIP_IMU/s_XX/*.pkl      (DIP-IMU raw)
#   $DATA_ROOT/raw_datasets/TotalCapture/...        (DIP-recalculated pkl)
#   $SMPL_PKL                                        (official male SMPL)
#
# Mirrors the reference flow (ref: README.MD:27-37, preprocess.py,
# train_a3gc_tp.py, evaluate_a3gc_tp.py:191-192): AMASS synthesis with CDA
# -> pretrain 3 stages -> DIP-IMU finetune -> evaluate on the DIP-IMU test
# split and TotalCapture, writing the same txt reports. Defaults match the
# reference's hyperparameters (batch 32, lr 1e-3, gamma 0.8, patience,
# hidden 256/64/128, --norm --cda).
#
# Usage:
#   DATA_ROOT=/data SMPL_PKL=/data/smpl/SMPL_MALE.pkl \
#     MODEL=a3gc bash scripts/run_reference_protocol.sh
set -euo pipefail
cd "$(dirname "$0")/.."

DATA_ROOT=${DATA_ROOT:?set DATA_ROOT to the directory holding raw_datasets/}
SMPL_PKL=${SMPL_PKL:?set SMPL_PKL to the official SMPL pickle}
MODEL=${MODEL:-a3gc}
OUT=${OUT:-protocol_run}
CLI="python -m a3gc_tpu.cli"
COMMON=(--smpl "$SMPL_PKL" --data_root "$DATA_ROOT")

mkdir -p "$OUT"

echo "== 1/4 offline data factory (AMASS+CDA, DIP-IMU, TotalCapture)"
$CLI preprocess "${COMMON[@]}" --dataset amass --split train --cda \
    --output "$OUT/amass_train.npz"
$CLI preprocess "${COMMON[@]}" --dataset amass --split valid --cda \
    --output "$OUT/amass_valid.npz"
$CLI preprocess "${COMMON[@]}" --dataset dipimu --split train \
    --output "$OUT/dip_train.npz"
$CLI preprocess "${COMMON[@]}" --dataset dipimu --split valid \
    --output "$OUT/dip_valid.npz"
$CLI preprocess "${COMMON[@]}" --dataset dipimu --split test \
    --output "$OUT/dip_test.npz"
$CLI preprocess "${COMMON[@]}" --dataset totalcapture --split test \
    --output "$OUT/tc_test.npz"
$CLI stats --inputs "$OUT/amass_train.npz" --output "$OUT/stats.npz"

echo "== 2/4 pretrain on synthetic AMASS (ref: train_${MODEL}_tp.py)"
$CLI train "${COMMON[@]}" --model "$MODEL" -b 32 --norm --cda \
    --name "${MODEL}_protocol" --save_root "$OUT/models" \
    --train_data "$OUT/amass_train.npz" --valid_data "$OUT/amass_valid.npz"

echo "== 3/4 finetune on DIP-IMU"
$CLI train "${COMMON[@]}" --model "$MODEL" -b 32 --norm -f \
    --name "${MODEL}_protocol" --save_root "$OUT/models" \
    --resume "$OUT/models/${MODEL}_protocol" \
    --train_data "$OUT/dip_train.npz" --valid_data "$OUT/dip_valid.npz"

echo "== 4/4 evaluate (DIP-IMU test + TotalCapture; ref protocol reports)"
$CLI evaluate "${COMMON[@]}" --model "$MODEL" --norm \
    --path "$OUT/models/${MODEL}_protocol" --type finetuning \
    --datasets "$OUT/dip_test.npz" "$OUT/tc_test.npz"

echo "reports in evaluation_results/; compare SIP/angular/positional rows"
echo "against the paper's table (BASELINE.md) and the torch reference run."
