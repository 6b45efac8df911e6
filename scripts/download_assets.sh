#!/bin/bash
# Fetch the pretrained tower weights + vocab assets the shipped configs
# reference (capability of the reference's download_ckpts.sh /
# download_dataset.sh; runs only in network-enabled environments).
#
# Towers (converted on load by speechclip_tpu.convert):
#   HuBERT  — the fairseq checkpoints the reference uses
#             (avssl/module/speech_encoder_plus.py:327-331)
#   CLIP    — the OpenAI TorchScript archives clip.load fetches
set -e
cd "$(dirname "$0")/.."
mkdir -p assets/hubert assets/clip

# fetch <path> <url>: skip only NON-EMPTY files (a failed wget -O leaves a
# zero-byte file behind, which must not mask the retry on the next run),
# download to .part and move into place so partial transfers never count.
fetch() {
  [ -s "$1" ] && return 0
  rm -f "$1"
  if wget -O "$1.part" "$2"; then
    mv "$1.part" "$1"
  else
    rm -f "$1.part"
    return 1
  fi
}

# CLIP BPE merges (tokenizer)
fetch assets/bpe_simple_vocab_16e6.txt.gz \
    https://github.com/openai/CLIP/raw/main/clip/bpe_simple_vocab_16e6.txt.gz

# HuBERT
fetch assets/hubert/hubert_base_ls960.pt \
    https://dl.fbaipublicfiles.com/hubert/hubert_base_ls960.pt
fetch assets/hubert/hubert_large_ll60k.pt \
    https://dl.fbaipublicfiles.com/hubert/hubert_large_ll60k.pt

# CLIP towers
fetch assets/clip/ViT-B-32.pt \
    "https://openaipublic.azureedge.net/clip/models/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt"
fetch assets/clip/ViT-L-14.pt \
    "https://openaipublic.azureedge.net/clip/models/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt"

# RN* towers (pass --rn; none of the shipped configs use them, but the
# reference's ClipModel accepts all eight names, clip_official.py:14-23).
# URLs are the published openai/CLIP clip._MODELS entries.
if [ "${1:-}" = "--rn" ]; then
  declare -A RN_URLS=(
    [RN50]="https://openaipublic.azureedge.net/clip/models/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt"
    [RN101]="https://openaipublic.azureedge.net/clip/models/8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599/RN101.pt"
    [RN50x4]="https://openaipublic.azureedge.net/clip/models/7e526bd135e493cef0776de27d5f42653e6b4c8bf9e0f653bb11773263205fdd/RN50x4.pt"
    [RN50x16]="https://openaipublic.azureedge.net/clip/models/52378b407f34354e150460fe41077663dd5b39c54cd0bfd2b27167a4a06ec9aa/RN50x16.pt"
    [RN50x64]="https://openaipublic.azureedge.net/clip/models/be1cfb55d75a9666199fb2206c106743da0f6468c9d327f3e0d0a543a9919d9c/RN50x64.pt"
  )
  for name in "${!RN_URLS[@]}"; do
    fetch "assets/clip/${name}.pt" "${RN_URLS[$name]}"
  done
fi

echo "assets ready. Generate reduced-vocab tables with:"
echo "  python -m speechclip_tpu.data.vocab_stats --dataset flickr \\"
echo "      --dataset_root data/flickr --output_dir assets/flickr_stat"
