#!/bin/bash
# Test recipe: evaluate a checkpoint
# (capability of the reference's egs/model_large/flickr/cascaded/test.sh).
# usage: test.sh <checkpoint_dir_or_reference.ckpt>
set -e
CKPT=${1:?usage: test.sh <ckpt>}
shift
cd "$(dirname "$0")/../../../.."
python3 run_task.py TrainKWClip_GeneralTransformer \
    --config configs/large_flickr/spchclp_c.yaml \
    --seed 7122 \
    --resume "$CKPT" \
    --test "$@"
