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

# CLIP BPE merges (tokenizer)
[ -f assets/bpe_simple_vocab_16e6.txt.gz ] || \
  wget -O assets/bpe_simple_vocab_16e6.txt.gz \
    https://github.com/openai/CLIP/raw/main/clip/bpe_simple_vocab_16e6.txt.gz

# HuBERT
[ -f assets/hubert/hubert_base_ls960.pt ] || \
  wget -O assets/hubert/hubert_base_ls960.pt \
    https://dl.fbaipublicfiles.com/hubert/hubert_base_ls960.pt
[ -f assets/hubert/hubert_large_ll60k.pt ] || \
  wget -O assets/hubert/hubert_large_ll60k.pt \
    https://dl.fbaipublicfiles.com/hubert/hubert_large_ll60k.pt

# CLIP towers
[ -f assets/clip/ViT-B-32.pt ] || \
  wget -O assets/clip/ViT-B-32.pt \
    "https://openaipublic.azureedge.net/clip/models/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt"
[ -f assets/clip/ViT-L-14.pt ] || \
  wget -O assets/clip/ViT-L-14.pt \
    "https://openaipublic.azureedge.net/clip/models/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt"

echo "assets ready. Generate reduced-vocab tables with:"
echo "  python -m speechclip_tpu.data.vocab_stats --dataset flickr \\"
echo "      --dataset_root data/flickr --output_dir assets/flickr_stat"
