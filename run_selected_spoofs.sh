#!/bin/bash
# Batch-run spoof-attack reconstructions.
# Reference: run_selected_spoofs.sh (one training process per attack id).
# On TPU pods the first argument selects the chip/host via
# TPU_VISIBLE_DEVICES instead of CUDA_VISIBLE_DEVICES.
#
# Usage: ./run_selected_spoofs.sh <DEVICE_ID> <attack_ids,comma,separated>

DEVICE_ID=$1
ATTACK_IDS=$2
CONFIG_DIR="all_configs"
OUTPUT_BASE="eval_output/opv2v_reconstruction"
PYTHON_SCRIPT="train.py"

if [ -z "$DEVICE_ID" ] || [ -z "$ATTACK_IDS" ]; then
    echo "usage: ./run_selected_spoofs.sh <DEVICE_ID> <attack_ids (comma separated)>"
    echo "example: ./run_selected_spoofs.sh 0 23,56,78,99"
    exit 1
fi

IFS=',' read -ra IDS <<< "$ATTACK_IDS"

for ATTACK_ID in "${IDS[@]}"; do
    CONFIG_FILE="${CONFIG_DIR}/opv2v_spoof_attack_${ATTACK_ID}.yaml"
    OUTPUT_PATH="${OUTPUT_BASE}/spoof_${ATTACK_ID}"

    if [ ! -f "$CONFIG_FILE" ]; then
        echo "config not found: $CONFIG_FILE, skipping."
        continue
    fi

    echo "running attack_id=${ATTACK_ID} on device ${DEVICE_ID}..."
    TPU_VISIBLE_DEVICES=$DEVICE_ID python $PYTHON_SCRIPT \
        --config "$CONFIG_FILE" model_path="$OUTPUT_PATH"
done

echo "all runs complete."
