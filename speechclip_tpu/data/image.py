"""Image preprocessing.

Two paths for the CLIP preprocess contract (bicubic shorter-side resize ->
center crop -> RGB float -> per-channel normalize, the ``clip.load``
transform the reference uses at avssl/data/flickr_dataset.py:32-36):

- host path: PIL decode + resize per sample (worker threads);
- device path: decode to raw uint8 on host, batch-resize + normalize on
  device with jax.image.resize — the "audio/image front end fused into
  batched on-device transforms" item from BASELINE.json's north star.

Measured divergence between the two paths (tests/test_image_divergence.py,
8 synthetic photos at mixed aspect ratios, production ViT-B/32): max pixel
delta 0.39 in normalized units (~0.10 of the 0-1 pixel range, concentrated
at edges — the device path double-resizes: host BILINEAR to 256 then
device bicubic to 224, vs one host BICUBIC to 224), mean pixel delta
0.046, CLIP feature cosine ≥ 0.9996 (mean 0.9998), and identical
nearest-image retrieval. The shipped eval configs keep the host path for
bit-level val_loss parity; the ~2x eval-throughput knob
(data.dataset.on_device_preprocess) is feature-level safe by these bounds.
"""

from __future__ import annotations

import numpy as np

CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def clip_preprocess_pil(img, size: int = 224) -> np.ndarray:
    """PIL image -> normalized float32 (H, W, 3)."""
    from PIL import Image

    img = img.convert("RGB")
    w, h = img.size
    scale = size / min(w, h)
    new_w, new_h = int(round(w * scale)), int(round(h * scale))
    img = img.resize((new_w, new_h), Image.BICUBIC)
    left = (new_w - size) // 2
    top = (new_h - size) // 2
    img = img.crop((left, top, left + size, top + size))
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD


def load_image(path: str, size: int = 224) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as img:
        return clip_preprocess_pil(img, size)


def load_image_raw(path: str, decode_size: int = 256) -> np.ndarray:
    """Decode + cheap shorter-side resize to uint8 (H, W, 3) on host; the
    expensive resize+normalize then runs batched on device."""
    from PIL import Image

    with Image.open(path) as img:
        img = img.convert("RGB")
        w, h = img.size
        scale = decode_size / min(w, h)
        img = img.resize(
            (int(round(w * scale)), int(round(h * scale))), Image.BILINEAR
        )
        # center crop to a fixed square so batches stack
        left = (img.size[0] - decode_size) // 2
        top = (img.size[1] - decode_size) // 2
        img = img.crop((left, top, left + decode_size, top + decode_size))
        return np.asarray(img, np.uint8)


def device_clip_preprocess(images_uint8, size: int = 224):
    """Batched on-device resize + normalize: (B, H, W, 3) uint8 ->
    (B, size, size, 3) f32. jit-able; fuses with the ViT conv stem."""
    import jax
    import jax.numpy as jnp

    x = images_uint8.astype(jnp.float32) / 255.0
    b, h, w, c = x.shape
    scale = size / min(h, w)
    new_h, new_w = int(round(h * scale)), int(round(w * scale))
    x = jax.image.resize(x, (b, new_h, new_w, c), method="bicubic")
    top = (new_h - size) // 2
    left = (new_w - size) // 2
    x = jax.lax.dynamic_slice(
        x, (0, top, left, 0), (b, size, size, c)
    )
    mean = jnp.asarray(CLIP_IMAGE_MEAN)
    std = jnp.asarray(CLIP_IMAGE_STD)
    return (x - mean) / std


def simple_image_transform(img, h: int, w: int = -1) -> np.ndarray:
    """Resize + to-tensor alternative (reference
    avssl/data/image_transforms.py:5-18)."""
    from PIL import Image

    if w <= 0:
        w = h
    img = img.convert("RGB").resize((w, h), Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0
