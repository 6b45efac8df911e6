#!/bin/bash
# Train recipe — pins config, seed and device count
# (capability of the reference's egs/model_base/cascaded/train.sh).
set -e
cd "$(dirname "$0")/../../.."
python3 run_task.py TrainKWClip_GeneralTransformer \
    --config configs/base/spchclp_c.yaml \
    --devices 2 \
    --seed 7122 \
    --train "$@"
