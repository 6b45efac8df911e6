"""Image preprocessing tests: host PIL path vs batched on-device path."""

import numpy as np

import jax.numpy as jnp

from speechclip_tpu.data import (
    CLIP_IMAGE_MEAN,
    CLIP_IMAGE_STD,
    clip_preprocess_pil,
    device_clip_preprocess,
    load_image_raw,
    simple_image_transform,
)
from tests.test_data import write_jpg


def test_pil_preprocess_shape_and_normalization(tmp_path):
    write_jpg(tmp_path / "a.jpg", size=300, seed=0)
    from PIL import Image

    with Image.open(tmp_path / "a.jpg") as img:
        out = clip_preprocess_pil(img, 224)
    assert out.shape == (224, 224, 3)
    # un-normalize must land in [0, 1]
    restored = out * CLIP_IMAGE_STD + CLIP_IMAGE_MEAN
    assert restored.min() >= -1e-4 and restored.max() <= 1 + 1e-4


def test_non_square_center_crop(tmp_path):
    from PIL import Image

    arr = np.zeros((100, 200, 3), np.uint8)
    arr[:, 75:125] = 255  # white band at the horizontal center
    img = Image.fromarray(arr)
    out = clip_preprocess_pil(img, 64)
    assert out.shape == (64, 64, 3)
    restored = out * CLIP_IMAGE_STD + CLIP_IMAGE_MEAN
    # center column comes from the white band
    assert restored[32, 32].mean() > 0.9


def test_device_preprocess_close_to_pil(tmp_path):
    """The on-device batched resize must approximate the PIL path (bicubic
    details differ slightly; retrieval tolerates it)."""
    write_jpg(tmp_path / "b.jpg", size=256, seed=1)
    raw = load_image_raw(str(tmp_path / "b.jpg"), decode_size=256)
    assert raw.shape == (256, 256, 3) and raw.dtype == np.uint8
    dev = np.asarray(device_clip_preprocess(jnp.asarray(raw[None]), 224))[0]

    from PIL import Image

    with Image.open(tmp_path / "b.jpg") as img:
        host = clip_preprocess_pil(img, 224)
    assert dev.shape == host.shape
    # mean abs difference small (different bicubic kernels)
    assert np.abs(dev - host).mean() < 0.15


def test_simple_image_transform(tmp_path):
    write_jpg(tmp_path / "c.jpg", size=100, seed=2)
    from PIL import Image

    with Image.open(tmp_path / "c.jpg") as img:
        out = simple_image_transform(img, 50, 80)
    assert out.shape == (50, 80, 3)
    assert 0 <= out.min() and out.max() <= 1
