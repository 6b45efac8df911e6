#!/bin/bash
# Serving recipe, jit backend: checkpoint -> warmed HTTP service with NO
# export step — the three encoder surfaces are jitted at startup with
# params as call arguments (EncoderService.from_checkpoint). This is the
# production-dims path on platforms whose compilers reject giant
# weight-constant artifacts, and the operating point measured at 180.5
# utt/s on one TPU chip (docs/SERVING.md, docs/DESIGN_NOTES.md).
#
#   bash egs/serving/serve_from_ckpt.sh exp/myrun/ckpts/last [PORT]
set -e
cd "$(dirname "$0")/../.."
CKPT=${1:?usage: serve_from_ckpt.sh <ckpt_dir_or_reference.ckpt> [port]}
PORT=${2:-8787}

exec python3 -m speechclip_tpu.serving --ckpt "$CKPT" \
    --wav-samples 51200 102400 --batch 64 --dtype bf16 --compact-wav \
    --max-wait-ms 60 --warmup --port "$PORT" \
    --gallery "exp_gallery_$(basename "$CKPT").npz"
