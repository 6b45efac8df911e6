"""Data layer tests over a synthetic on-disk Flickr8k/SpokenCOCO corpus
(the reference's dataset tests were hard-coded to a cluster path —
SURVEY.md §4; here the corpus is generated into tmp)."""

import json
import os
import wave

import numpy as np
import pytest

from speechclip_tpu.data import (
    BucketedLoader,
    FlickrDataset,
    SpokenCOCODataset,
    make_buckets,
    read_wav,
    wav_num_samples,
)


def write_wav(path, n_samples, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    data = (rng.standard_normal(n_samples) * 8000).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(data.tobytes())
    return data.astype(np.float32) / 32768.0


def write_jpg(path, size=64, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    Image.fromarray(arr).save(str(path), quality=95)


@pytest.fixture(scope="module")
def flickr_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("flickr")
    (root / "flickr_audio" / "wavs").mkdir(parents=True)
    (root / "Images").mkdir()
    images = [f"img{i:04d}" for i in range(6)]
    lengths = {}
    captions = []
    for i, name in enumerate(images):
        write_jpg(root / "Images" / f"{name}.jpg", seed=i)
        for n in range(3):  # 3 wavs per image
            ln = 4000 + 3000 * n + i * 100
            write_wav(
                root / "flickr_audio" / "wavs" / f"{name}_{n}.wav", ln, seed=i * 10 + n
            )
            lengths[(name, n)] = ln
            captions.append(f"{name}.jpg#{n}\ta photo of thing {i} number {n} .")
    (root / "Flickr8k.token.txt").write_text("\n".join(captions))
    (root / "Flickr_8k.trainImages.txt").write_text(
        "\n".join(f"{n}.jpg" for n in images[:4])
    )
    (root / "Flickr_8k.devImages.txt").write_text(
        "\n".join(f"{n}.jpg" for n in images[4:])
    )
    return root


class TestAudioIO:
    def test_read_wav_roundtrip(self, tmp_path):
        data = write_wav(tmp_path / "a.wav", 5000, seed=1)
        wav = read_wav(str(tmp_path / "a.wav"))
        np.testing.assert_allclose(wav, data, atol=1e-6)
        assert wav_num_samples(str(tmp_path / "a.wav")) == 5000

    def test_resample(self, tmp_path):
        write_wav(tmp_path / "b.wav", 8000, sr=8000, seed=2)
        wav = read_wav(str(tmp_path / "b.wav"), target_sr=16000)
        assert abs(len(wav) - 16000) <= 2
        assert wav_num_samples(str(tmp_path / "b.wav"), 16000) == 16000


class TestFlickr:
    def test_split_and_pairing(self, flickr_root):
        ds = FlickrDataset(
            str(flickr_root), ["audio", "image", "text"], split="train"
        )
        # 4 images x 3 wavs
        assert len(ds) == 12
        sample = ds[0]
        assert sample["wav"].ndim == 1
        assert sample["image"].shape == (224, 224, 3)
        assert isinstance(sample["text"], str)
        # all 3 wavs of one image share its pair id
        ids = [ds.data[i]["id"] for i in range(3)]
        assert len(set(ids)) == 1
        # id pairs json generated
        assert (flickr_root / "Flickr8k_idPairs.json").exists()

    def test_dev_split(self, flickr_root):
        ds = FlickrDataset(str(flickr_root), ["audio", "image"], split="dev")
        assert len(ds) == 6

    def test_caption_indexing_matches_wav_subid(self, flickr_root):
        ds = FlickrDataset(
            str(flickr_root), ["audio", "text"], split="train"
        )
        for e in ds.data:
            sub = int(os.path.basename(e["wav"]).split("_")[-1][:-4])
            assert f"number {sub}" in e["text"]


class TestCoco:
    def test_ksplit_and_default(self, tmp_path):
        root = tmp_path / "coco"
        (root / "SpokenCOCO" / "wavs").mkdir(parents=True)
        (root / "mscoco_img").mkdir()
        write_jpg(root / "mscoco_img" / "COCO_val_000000000042.jpg", seed=3)
        write_wav(root / "SpokenCOCO" / "wavs" / "a.wav", 4000, seed=4)
        payload = {
            "data": [
                {
                    "image": "COCO_val_000000000042.jpg",
                    "reassign_id": 7,
                    "captions": [
                        {"wav": "wavs/a.wav", "text": "A duck."},
                    ],
                }
            ]
        }
        for prefix in ("SpokenCOCO", "SpokenCOCO_ksplit"):
            with open(root / "SpokenCOCO" / f"{prefix}_val.json", "w") as f:
                json.dump(payload, f)
        ds = SpokenCOCODataset(
            str(root), ["audio", "image", "text"], split="val",
            split_prefix="SpokenCOCO_ksplit",
        )
        assert len(ds) == 1 and ds.data[0]["id"] == 7
        ds2 = SpokenCOCODataset(
            str(root), ["audio", "image", "text"], split="val"
        )
        assert ds2.data[0]["id"] == 42  # parsed from filename
        assert ds2.data[0]["text"] == "a duck."


class TestLoader:
    def test_static_bucket_shapes(self, flickr_root):
        ds = FlickrDataset(str(flickr_root), ["audio", "image"], split="train")
        loader = BucketedLoader(
            ds, batch_size=4, train=True, max_audio_len=8000, seed=1,
            num_workers=2,
        )
        seen_shapes = set()
        total = 0
        for batch in loader:
            assert batch["wav"].shape[0] == 4
            assert batch["wav"].shape[1] in loader.buckets
            assert batch["image"].shape == (4, 224, 224, 3)
            assert (batch["wav_len"] <= batch["wav"].shape[1]).all()
            # padding is zero beyond wav_len
            for j in range(4):
                assert np.all(batch["wav"][j, batch["wav_len"][j]:] == 0)
            seen_shapes.add(batch["wav"].shape)
            total += batch["wav"].shape[0]
        assert total > 0
        assert len(seen_shapes) <= len(loader.buckets)

    def test_eval_keeps_all_samples(self, flickr_root):
        ds = FlickrDataset(str(flickr_root), ["audio", "image"], split="dev")
        loader = BucketedLoader(ds, batch_size=4, train=False, num_workers=2)
        total = sum(b["wav"].shape[0] for b in loader)
        assert total == len(ds)
        assert len(loader) >= 2

    def test_bucket_membership_matches_bucket_for(self, flickr_root):
        """The vectorized precomputed membership (searchsorted in __init__)
        must equal a brute-force bucket_for scan — including the
        max_audio_len clamp and the clamp-to-largest-bucket tail."""
        from speechclip_tpu.data.loader import bucket_for

        ds = FlickrDataset(str(flickr_root), ["audio"], split="train")
        # train=True: eval loaders discard max_audio_len (crop is a
        # train-time augmentation), and the clamp path is what we pin here
        loader = BucketedLoader(
            ds, batch_size=4, train=True, max_audio_len=8000, num_workers=2
        )
        for b in loader.buckets:
            expect = [
                i
                for i in range(len(ds))
                if bucket_for(min(ds.wav_length(i), 8000), loader.buckets) == b
            ]
            assert loader._bucket_indices(b).tolist() == expect

    def test_caption_containing_hash_digit_parses(self, tmp_path):
        """'man holds a #1 foam finger' must not crash the token-file parse
        (the index tag is the FIRST '#<digit>'; the reference asserts the
        split yields exactly two parts and dies, flickr_dataset.py:103-105
        — deliberate robustness improvement)."""
        from speechclip_tpu.data.datasets import FlickrDataset

        root = tmp_path / "flickr"
        (root / "flickr_audio" / "wavs").mkdir(parents=True)
        (root / "Images").mkdir()
        write_jpg(root / "Images" / "img0.jpg", seed=0)
        write_wav(root / "flickr_audio" / "wavs" / "img0_0.wav", 2000, seed=0)
        (root / "Flickr8k.token.txt").write_text(
            "img0.jpg#0\tman holds a #1 foam finger ."
        )
        (root / "Flickr_8k.trainImages.txt").write_text("img0.jpg")
        ds = FlickrDataset(str(root), ["audio", "text"], split="train")
        assert len(ds) == 1
        assert ds.data[0]["text"] == "man holds a #1 foam finger"

    def test_make_buckets_multiples(self):
        lengths = np.random.default_rng(0).integers(1000, 100000, 500)
        buckets = make_buckets(lengths, max_len=102400)
        assert all(b % 3200 == 0 for b in buckets)
        assert max(lengths.clip(max=102400)) <= max(buckets)


class TestNativeFallbacks:
    """The documented contract for BOTH native decode paths is 'fall back
    to the python reader' (native/wavio.cc:21-22; loader jpeg branch) — a
    mid-epoch RuntimeError from either must degrade, not crash."""

    def test_wav_decode_failure_falls_back_to_python(
        self, flickr_root, monkeypatch
    ):
        from speechclip_tpu.data import native as native_mod

        ds = FlickrDataset(str(flickr_root), ["audio"], split="train")
        loader = BucketedLoader(ds, batch_size=4, train=False, num_workers=2)
        reference = [b["wav"].copy() for b in loader]

        def boom(*a, **k):
            raise RuntimeError("native wav decode failed for file 1")

        monkeypatch.setattr(native_mod, "decode_wav_batch", boom)
        fallback = [b["wav"].copy() for b in loader]
        assert len(fallback) == len(reference) > 0
        for a, b in zip(reference, fallback):
            np.testing.assert_allclose(a, b, atol=1e-6)

    def test_jpeg_decode_failure_falls_back_to_pil(
        self, flickr_root, monkeypatch
    ):
        from speechclip_tpu.data import native as native_mod
        from speechclip_tpu.data import FlickrDataset as FD

        ds = FD(
            str(flickr_root), ["audio", "image"], split="train",
            image_size=32, image_mode="raw",
        )
        loader = BucketedLoader(ds, batch_size=4, train=False, num_workers=2)

        def boom(*a, **k):
            raise RuntimeError("Unsupported JPEG (CMYK)")

        monkeypatch.setattr(native_mod, "has_jpeg", lambda: True)
        monkeypatch.setattr(native_mod, "decode_jpeg_batch", boom)
        batch = next(iter(loader))
        # PIL fallback must still deliver real uint8 images for every row
        assert batch["image"].dtype == np.uint8
        assert batch["image"].shape[0] == 4
        assert batch["image"].any(axis=(1, 2, 3)).all()


class TestOnDeviceImagePath:
    def test_raw_mode_end_to_end(self, flickr_root):
        """data.dataset.on_device_preprocess: uint8 batches flow through the
        loader and the model normalizes them on device."""
        import jax
        import jax.numpy as jnp

        from speechclip_tpu.data.loader import BucketedLoader
        from speechclip_tpu.data import FlickrDataset, device_clip_preprocess

        ds = FlickrDataset(
            str(flickr_root), ["audio", "image"], split="train",
            image_size=32, image_mode="raw",
        )
        loader = BucketedLoader(ds, batch_size=4, train=False, num_workers=2)
        batch = next(iter(loader))
        assert batch["image"].dtype == np.uint8
        out = device_clip_preprocess(jnp.asarray(batch["image"]), 32)
        assert out.shape == (4, 32, 32, 3)
        assert np.isfinite(np.asarray(out)).all()


class TestCompactWav:
    """compact_wav: int16 PCM on the wire, rescaled on device — exact for
    PCM16 sources (f32 = pcm/32768 round-trips)."""

    def test_loader_emits_exact_int16(self, flickr_root):
        ds = FlickrDataset(str(flickr_root), ["audio"], split="train")
        kw = dict(batch_size=4, train=False, seed=1, num_workers=2)
        plain = list(BucketedLoader(ds, **kw))
        compact = list(BucketedLoader(ds, compact_wav=True, **kw))
        assert len(plain) == len(compact) > 0
        for ref, b in zip(plain, compact):  # eval order is deterministic
            wav = b["wav"]
            assert wav.dtype == np.int16
            np.testing.assert_array_equal(b["id"], ref["id"])
            # wav files are PCM16: quantization must round-trip exactly
            np.testing.assert_array_equal(
                wav.astype(np.float32) / 32768.0, ref["wav"]
            )

    def test_model_forward_identical(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from speechclip_tpu.models.speechclip import SpeechCLIPModel
        from tests.test_models import tiny_speechclip_config

        model = SpeechCLIPModel(tiny_speechclip_config(tmp_path))
        params, _ = model.init(jax.random.key(0))
        pcm = np.random.default_rng(0).integers(
            -32768, 32768, (2, 2000), dtype=np.int16
        )
        wav_len = jnp.asarray([2000, 1500])
        feat_i16, len_i16 = model.forward_audio(
            params, jnp.asarray(pcm), wav_len
        )
        feat_f32, len_f32 = model.forward_audio(
            params, jnp.asarray(pcm.astype(np.float32) / 32768.0), wav_len
        )
        np.testing.assert_array_equal(np.asarray(feat_i16), np.asarray(feat_f32))
        np.testing.assert_array_equal(np.asarray(len_i16), np.asarray(len_f32))


class TestLoaderDeterminism:
    def test_same_seed_same_stream(self, flickr_root):
        ds = FlickrDataset(str(flickr_root), ["audio"], split="train")
        def first_epoch(seed):
            loader = BucketedLoader(
                ds, batch_size=4, train=True, max_audio_len=8000,
                seed=seed, num_workers=2,
            )
            return [(b["id"].tolist(), b["wav"].sum()) for b in loader]
        a = first_epoch(123)
        b = first_epoch(123)
        c = first_epoch(456)
        assert a == b
        assert a != c  # different seed -> different order/crops

    def test_epochs_differ(self, flickr_root):
        ds = FlickrDataset(str(flickr_root), ["audio"], split="train")
        loader = BucketedLoader(
            ds, batch_size=4, train=True, max_audio_len=8000, seed=1,
            num_workers=2,
        )
        e1 = [b["id"].tolist() for b in loader]
        e2 = [b["id"].tolist() for b in loader]
        assert e1 != e2  # reshuffled per epoch


class TestVocabStats:
    """data/vocab_stats.py — the offline reduced-vocab stat tool (reference
    avssl/data/flickr_stat/stat_textCLIP_input.py:1-56)."""

    def test_compute_and_save(self, tmp_path):
        from speechclip_tpu.data.vocab_stats import (
            compute_vocab_usage,
            save_vocab_usage,
        )
        from speechclip_tpu.models.tokenizer import CLIPTokenizer

        from .test_trainer import make_tiny_bpe

        tok = CLIPTokenizer(make_tiny_bpe(tmp_path / "merges.txt.gz"))
        texts = ["the thing", "the thing the thing", "a thing"]
        data = compute_vocab_usage(texts, tok)
        assert data.ndim == 2 and data.shape[1] == 2
        counts = dict(data.tolist())
        sot, eot = tok.sot_id, tok.eot_id
        # SOT/EOT appear once per caption
        assert counts[sot] == 3 and counts[eot] == 3
        # reference-layout contract (stat_textCLIP_input.py:31-37): the FULL
        # padded 77-token buffers are counted, so the pad row (id 0) is
        # present and every caption contributes exactly 77 counts. A table
        # without the pad row would shift all reduced ids by one vs the
        # shipped tables (VQ prob_msk row semantics).
        assert counts[0] > 0
        assert data[:, 1].sum() == 77 * len(texts)
        save_vocab_usage(data, str(tmp_path / "stat"))
        import numpy as _np

        by_freq = _np.load(tmp_path / "stat" / "text_clip_vocab_usage_byfreq.npy")
        by_id = _np.load(tmp_path / "stat" / "text_clip_vocab_usage_byID.npy")
        assert (by_freq[:, 1][:-1] >= by_freq[:, 1][1:]).all()
        assert (by_id[:, 0][:-1] <= by_id[:, 0][1:]).all()
        # pad dominates the padded buffers -> byfreq row 0 is the pad row,
        # byID row 0 likewise (id 0 is the smallest id) — as in the shipped
        # flickr_stat tables (byfreq rows 0/2/3 = pad/SOT/EOT)
        assert by_freq[0, 0] == 0 and by_id[0, 0] == 0
        assert (tmp_path / "stat" / "text_clip_vocab_usage_byfreq.txt").exists()

    def test_layout_matches_reference_script(self, tmp_path):
        """Layout parity with the reference stat pipeline
        (stat_textCLIP_input.py:31-54: tokenize -> flatten padded buffers ->
        np.unique -> count orderings), computed here as an independent
        oracle. Tie order within equal counts uses OUR deterministic rule
        (descending count, ascending id) — the reference's own
        ``argsort()[::-1]`` tie permutation is a numpy-quicksort internals
        artifact that differs across numpy versions (see the
        save_vocab_usage docstring; exact-shipped-table compatibility is
        handled by vendoring in assets/, tests/test_vocab_tables.py)."""
        import numpy as _np

        from speechclip_tpu.data.vocab_stats import (
            compute_vocab_usage,
            save_vocab_usage,
        )
        from speechclip_tpu.models.tokenizer import CLIPTokenizer

        from .test_trainer import make_tiny_bpe

        tok = CLIPTokenizer(make_tiny_bpe(tmp_path / "merges.txt.gz"))
        texts = ["the thing of note", "in the thing", "of the era", "a thing"]

        # oracle: the reference script's numpy transcript, deterministic ties
        buffers = _np.stack([tok.tokenize(t)[0] for t in texts])
        flat = buffers.flatten()
        unique, counts = _np.unique(flat, return_counts=True)
        oracle = _np.asarray((unique, counts)).T
        oracle_byfreq = oracle[_np.lexsort((oracle[:, 0], -oracle[:, 1]))]
        oracle_byid = oracle[oracle[:, 0].argsort()]

        data = compute_vocab_usage(texts, tok)
        save_vocab_usage(data, str(tmp_path / "stat"))
        by_freq = _np.load(tmp_path / "stat" / "text_clip_vocab_usage_byfreq.npy")
        by_id = _np.load(tmp_path / "stat" / "text_clip_vocab_usage_byID.npy")
        assert (by_id == oracle_byid).all()
        assert (by_freq == oracle_byfreq).all()

    def test_reduced_checkpoint_table_compatibility(self, tmp_path):
        """A checkpoint's persisted reduced embedding (built when the run's
        table was generated) must equal the reduction our tool's regenerated
        table selects from the full embedding — i.e. mixing a released
        checkpoint with a locally regenerated table is safe (VERDICT r1
        missing #5)."""
        import numpy as _np

        import jax.numpy as jnp

        from speechclip_tpu.data.vocab_stats import (
            compute_vocab_usage,
            save_vocab_usage,
        )
        from speechclip_tpu.models.clip import (
            load_reduced_vocab,
            reduce_token_embedding,
        )
        from speechclip_tpu.models.tokenizer import CLIPTokenizer

        from .test_trainer import make_tiny_bpe

        tok = CLIPTokenizer(make_tiny_bpe(tmp_path / "merges.txt.gz"))
        texts = ["the thing of note", "in the thing", "of the era"]
        save_vocab_usage(compute_vocab_usage(texts, tok), str(tmp_path / "s"))
        vocab = load_reduced_vocab(
            str(tmp_path / "s" / "text_clip_vocab_usage_byfreq.npy")
        )

        # "training-time" reduction: the reference persists
        # token_embedding.weight already reduced by its own byfreq table
        # (clip_official.py:86); emulate with the oracle layout. Ties follow
        # OUR deterministic rule — compat holds between checkpoints and
        # tables produced by this pipeline; for the reference's RELEASED
        # checkpoints, use the vendored shipped tables (assets/).
        full = _np.random.default_rng(0).standard_normal((tok.eot_id + 1, 8))
        buffers = _np.stack([tok.tokenize(t)[0] for t in texts])
        unique, counts = _np.unique(buffers.flatten(), return_counts=True)
        oracle = _np.asarray((unique, counts)).T
        ckpt_table = full[oracle[_np.lexsort((oracle[:, 0], -oracle[:, 1]))][:, 0]]

        # "load-time" reduction with the regenerated table
        params = {"text": {"token_embedding": jnp.asarray(full)}}
        reduced = reduce_token_embedding(params, vocab)
        assert _np.allclose(
            _np.asarray(reduced["text"]["token_embedding"]), ckpt_table
        )
        # the VQ prob_msk rows: reduced id 0 is the pad token
        assert vocab.reduced_to_original[0] == 0
