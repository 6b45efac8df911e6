#!/bin/bash
# Fetch Flickr8k (images + audio captions) and SpokenCOCO into data/
# (capability of the reference's download_dataset.sh; runs only in
# network-enabled environments). Layout contract: see
# speechclip_tpu/data/datasets.py.
set -e
cd "$(dirname "$0")/.."
mkdir -p data/flickr data/coco

echo ">>> Flickr8k"
# images + split lists + captions (academic mirror)
[ -d data/flickr/Images ] || {
  wget -O data/flickr/Flickr8k_Dataset.zip \
    "https://github.com/jbrownlee/Datasets/releases/download/Flickr8k/Flickr8k_Dataset.zip"
  wget -O data/flickr/Flickr8k_text.zip \
    "https://github.com/jbrownlee/Datasets/releases/download/Flickr8k/Flickr8k_text.zip"
  (cd data/flickr && unzip -q Flickr8k_Dataset.zip && mv Flicker8k_Dataset Images \
    && unzip -q Flickr8k_text.zip)
}
# spoken captions (Harwath & Glass)
[ -d data/flickr/flickr_audio ] || {
  wget -O data/flickr/flickr_audio.tar.gz \
    "https://groups.csail.mit.edu/sls/downloads/flickraudio/downloads/flickr_audio.tar.gz"
  (cd data/flickr && tar xzf flickr_audio.tar.gz)
}

echo ">>> SpokenCOCO"
[ -d data/coco/SpokenCOCO ] || {
  wget -O data/coco/SpokenCOCO.tar.gz \
    "https://data.csail.mit.edu/placesaudio/SpokenCOCO.tar.gz"
  (cd data/coco && tar xzf SpokenCOCO.tar.gz)
}
echo "NOTE: mscoco images go to data/coco/mscoco_img (train2014+val2014)."
echo "NOTE: the karpathy-split json (SpokenCOCO_ksplit_*.json) follows the"
echo "      reference's ksplit release; place them under data/coco/SpokenCOCO/."
