#!/bin/bash
# Train recipe — pins config, seed and device count
# (capability of the reference's egs/model_large/flickr/cascaded/train.sh).
set -e
cd "$(dirname "$0")/../../../.."
python3 run_task.py TrainKWClip_GeneralTransformer \
    --config configs/large_flickr/spchclp_c.yaml \
    --devices 4 \
    --seed 7122 \
    --train "$@"
