#!/bin/bash
# Train recipe — pins config, seed and device count
# (capability of the reference's egs/model_large/flickr/parallel/train.sh).
set -e
cd "$(dirname "$0")/../../../.."
python3 run_task.py TrainKWClip_GeneralTransformer \
    --config configs/large_flickr/spchclp_p.yaml \
    --devices 4 \
    --seed 7122 \
    --train "$@"
