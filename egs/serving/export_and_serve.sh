#!/bin/bash
# Serving recipe: checkpoint -> bucketed StableHLO artifacts -> HTTP
# service with dynamic batching (beyond-reference surface; the reference
# serves nothing — docs/SERVING.md).
#
#   bash egs/serving/export_and_serve.sh exp/myrun/ckpts/last [PORT]
set -e
cd "$(dirname "$0")/../.."
CKPT=${1:?usage: export_and_serve.sh <ckpt_dir_or_reference.ckpt> [port]}
PORT=${2:-8787}
OUT=exports/$(basename "$CKPT")

python3 -m speechclip_tpu.export --ckpt "$CKPT" --out "$OUT" \
    --batch 8 --wav-samples 48000 102400 --dtype bf16

exec python3 -m speechclip_tpu.serving --artifacts "$OUT" \
    --port "$PORT" --warmup
