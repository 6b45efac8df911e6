"""Data layer: host ingest + static-shape bucketed batching (SURVEY.md §2.4)."""

from .audio import random_crop_max_length, read_wav, resample, wav_num_samples
from .datasets import DATASETS, FlickrDataset, PairedDataset, SpokenCOCODataset, build_dataset
from .image import (
    CLIP_IMAGE_MEAN,
    CLIP_IMAGE_STD,
    clip_preprocess_pil,
    device_clip_preprocess,
    load_image,
    load_image_raw,
    simple_image_transform,
)
from .loader import BucketedLoader, bucket_for, make_buckets

__all__ = [
    "random_crop_max_length",
    "read_wav",
    "resample",
    "wav_num_samples",
    "DATASETS",
    "FlickrDataset",
    "PairedDataset",
    "SpokenCOCODataset",
    "build_dataset",
    "CLIP_IMAGE_MEAN",
    "CLIP_IMAGE_STD",
    "clip_preprocess_pil",
    "device_clip_preprocess",
    "load_image",
    "load_image_raw",
    "simple_image_transform",
    "BucketedLoader",
    "bucket_for",
    "make_buckets",
]
