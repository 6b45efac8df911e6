"""Quantifies the host-PIL vs on-device image-preprocess divergence.

``data.dataset.on_device_preprocess`` (loader ships uint8, device does
resize+normalize) changes the resize pipeline vs the CLIP-official host
path: host = single PIL BICUBIC shorter-side resize to 224 + crop;
device = host BILINEAR decode-resize to 256 + crop, then jax.image bicubic
256 -> 224 on device. The shipped eval configs keep the host path for
val_loss/R@k parity; this test BOUNDS the divergence (VERDICT r2 weak #5)
so the throughput knob's safety is measured, not folklore:

  - max |pixel| delta between the two preprocessed tensors,
  - CLIP feature cosine through a production-dims ViT-B/32,
  - retrieval agreement: device-path features must retrieve the same
    nearest host-path image (identity match on a small gallery).

Measured values are recorded in the data/image.py module docstring; the
assertions here carry headroom so only a real pipeline break trips them.
Reference baseline for the host path: CLIP's own preprocess
(clip_official.py:160-164).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechclip_tpu.data import image as image_mod

pytestmark = pytest.mark.slow

N_IMAGES = 8


def make_images(rng):
    """Synthetic photos: smooth low-frequency content + mild texture, at
    mixed aspect ratios (portrait/landscape) so resize+crop paths are
    exercised; pure noise would be the adversarial case for ANY resize
    kernel comparison and is not representative of corpus images."""
    from PIL import Image

    images = []
    for i in range(N_IMAGES):
        h, w = (480, 360) if i % 2 == 0 else (330, 500)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        base = np.stack(
            [
                0.5 + 0.4 * np.sin(2 * np.pi * (xx / w * (1 + i % 3) + i)),
                0.5 + 0.4 * np.cos(2 * np.pi * (yy / h * (2 + i % 2))),
                0.5 + 0.3 * np.sin(2 * np.pi * ((xx + yy) / (w + h) * 3)),
            ],
            axis=-1,
        )
        tex = 0.05 * rng.standard_normal((h, w, 3)).astype(np.float32)
        arr = np.clip((base + tex) * 255.0, 0, 255).astype(np.uint8)
        images.append(Image.fromarray(arr))
    return images


def test_device_preprocess_divergence_bounds():
    rng = np.random.default_rng(0)
    pil_images = make_images(rng)

    host = np.stack([image_mod.clip_preprocess_pil(im) for im in pil_images])

    raw = np.stack(
        [
            np.asarray(
                im.convert("RGB").resize(
                    (
                        int(round(im.size[0] * 256 / min(im.size))),
                        int(round(im.size[1] * 256 / min(im.size))),
                    ),
                    resample=2,  # BILINEAR, as load_image_raw
                ).crop(
                    (
                        (int(round(im.size[0] * 256 / min(im.size))) - 256) // 2,
                        (int(round(im.size[1] * 256 / min(im.size))) - 256) // 2,
                        (int(round(im.size[0] * 256 / min(im.size))) - 256) // 2 + 256,
                        (int(round(im.size[1] * 256 / min(im.size))) - 256) // 2 + 256,
                    )
                ),
                np.uint8,
            )
            for im in pil_images
        ]
    )
    device = np.asarray(
        image_mod.device_clip_preprocess(jnp.asarray(raw))
    )

    assert host.shape == device.shape == (N_IMAGES, 224, 224, 3)

    # pixel-space bound (normalized units; CLIP std ~0.27 so 1.0 here is
    # ~0.27 of the 0-1 pixel range). Measured: max 0.39, mean 0.046 —
    # dominated by the double-resize, concentrated at edges.
    pixel_delta = np.abs(host - device)
    assert float(pixel_delta.max()) < 1.0, pixel_delta.max()
    # mean delta is what the conv stem integrates over
    assert float(pixel_delta.mean()) < 0.15, pixel_delta.mean()

    # feature-space bound through a production-dims ViT-B/32
    from speechclip_tpu.models import clip as clip_mod

    params = clip_mod.clip_init(jax.random.key(0), clip_mod.CLIP_VIT_B32)
    feat_h = np.asarray(
        clip_mod.encode_image(params, clip_mod.CLIP_VIT_B32, jnp.asarray(host))
    )
    feat_d = np.asarray(
        clip_mod.encode_image(params, clip_mod.CLIP_VIT_B32, jnp.asarray(device))
    )
    feat_h = feat_h / np.linalg.norm(feat_h, axis=-1, keepdims=True)
    feat_d = feat_d / np.linalg.norm(feat_d, axis=-1, keepdims=True)
    cosines = (feat_h * feat_d).sum(-1)
    # measured: min 0.9996, mean 0.9998; pin with headroom
    assert float(cosines.min()) > 0.99, cosines
    assert float(cosines.mean()) > 0.995, cosines.mean()

    # retrieval agreement: device features pick the matching host image
    scores = feat_d @ feat_h.T
    assert (scores.argmax(-1) == np.arange(N_IMAGES)).all()
