"""Native ingest library tests.

No skip mark: conftest builds libwavio.so whenever it is absent, so by the
time this module runs the lib is either available or the build FAILED — and
a failed build must fail these tests loudly (the conftest autouse fixture
_require_native_build reports the build error), never skip them silently.
"""

import numpy as np
import pytest

from speechclip_tpu.data import native, read_wav, wav_num_samples
from tests.test_data import write_wav


class TestNativeWavio:
    def test_batch_decode_matches_python(self, tmp_path):
        paths = []
        for i, n in enumerate([4000, 2500, 7000]):
            p = tmp_path / f"w{i}.wav"
            write_wav(p, n, seed=i)
            paths.append(str(p))
        out, lens = native.decode_wav_batch(paths, max_len=8000)
        assert out.shape == (3, 8000)
        np.testing.assert_array_equal(lens, [4000, 2500, 7000])
        for i, p in enumerate(paths):
            ref = read_wav(p)
            np.testing.assert_allclose(out[i, : lens[i]], ref, atol=1e-6)
            assert np.all(out[i, lens[i]:] == 0)

    def test_crop_to_max_len(self, tmp_path):
        p = tmp_path / "long.wav"
        write_wav(p, 10000, seed=5)
        out, lens = native.decode_wav_batch([str(p)], max_len=4000)
        assert lens[0] == 4000
        ref = read_wav(str(p))
        np.testing.assert_allclose(out[0], ref[:4000], atol=1e-6)

    def test_header_probe(self, tmp_path):
        p = tmp_path / "probe.wav"
        write_wav(p, 12345, seed=6)
        assert native.wav_num_samples(str(p)) == 12345
        assert native.wav_num_samples(str(p)) == wav_num_samples(str(p))

    def test_missing_file_raises(self, tmp_path):
        with pytest.raises(RuntimeError):
            native.decode_wav_batch([str(tmp_path / "nope.wav")], max_len=100)

    def test_malformed_wavs_fail_cleanly_not_crash(self, tmp_path):
        """Corrupt headers must come back as the failed-index error (the
        documented contract: caller falls back to the Python reader) — a
        bits_per_sample in 1..7 used to divide by zero (SIGFPE killing the
        process from a worker thread) and an fmt chunk smaller than 16
        bytes used to read past its heap buffer."""
        import struct

        def wav_with(fmt_payload, data_payload=b"\x00" * 64):
            chunks = b"fmt " + struct.pack("<I", len(fmt_payload)) + fmt_payload
            if len(fmt_payload) % 2:
                chunks += b"\x00"
            chunks += b"data" + struct.pack("<I", len(data_payload)) + data_payload
            return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

        def pcm_fmt(bits, channels=1, rate=16000):
            block = max(bits // 8, 1) * channels
            return struct.pack(
                "<HHIIHH", 1, channels, rate, rate * block, block, bits
            )

        cases = {
            "bits4.wav": wav_with(pcm_fmt(4)),   # bits/8 == 0: was SIGFPE
            "bits0.wav": wav_with(pcm_fmt(0)),
            "shortfmt.wav": wav_with(b"\x01\x00\x00\x00"),  # fmt size 4: OOB
        }
        for name, blob in cases.items():
            p = tmp_path / name
            p.write_bytes(blob)
            with pytest.raises(RuntimeError):
                native.decode_wav_batch([str(p)], max_len=100)
            with pytest.raises(RuntimeError, match="header probe failed"):
                native.wav_num_samples(str(p))

    def test_stereo_downmix(self, tmp_path):
        import wave

        rng = np.random.default_rng(7)
        data = (rng.standard_normal((1000, 2)) * 8000).astype("<i2")
        p = tmp_path / "stereo.wav"
        with wave.open(str(p), "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(data.tobytes())
        out, lens = native.decode_wav_batch([str(p)], max_len=2000)
        expected = data.astype(np.float32).mean(axis=1) / 32768.0
        np.testing.assert_allclose(out[0, :1000], expected, atol=1e-6)


def write_smooth_jpg(path, w, h, mode="RGB", seed=0):
    from PIL import Image

    y, x = np.mgrid[0:h, 0:w]
    arr = np.stack(
        [
            (x * 255 / max(w - 1, 1)).astype(np.uint8),
            (y * 255 / max(h - 1, 1)).astype(np.uint8),
            ((x + y) * 255 / max(w + h - 2, 1)).astype(np.uint8),
        ],
        axis=-1,
    )
    img = Image.fromarray(arr)
    if mode != "RGB":
        img = img.convert(mode)
    img.save(str(path), quality=95)


@pytest.mark.skipif(
    not (native.available() and native.has_jpeg()),
    reason="native jpegio not built",
)
class TestNativeJpeg:
    def test_batch_decode_close_to_pil(self, tmp_path):
        from speechclip_tpu.data.image import load_image_raw

        paths = []
        for i, (w, h) in enumerate([(300, 200), (180, 260), (128, 128)]):
            p = tmp_path / f"im{i}.jpg"
            write_smooth_jpg(p, w, h, seed=i)
            paths.append(str(p))
        out = native.decode_jpeg_batch(paths, out_size=128)
        assert out.shape == (3, 128, 128, 3) and out.dtype == np.uint8
        for i, p in enumerate(paths):
            ref = load_image_raw(p, 128)
            # decoders match exactly; resize filters differ slightly
            # (classic bilinear vs PIL's support-scaled triangle)
            diff = np.abs(out[i].astype(np.int32) - ref.astype(np.int32))
            assert diff.mean() < 6.0, diff.mean()

    def test_grayscale_converts_to_rgb(self, tmp_path):
        p = tmp_path / "gray.jpg"
        write_smooth_jpg(p, 200, 150, mode="L")
        out = native.decode_jpeg_batch([str(p)], out_size=96)
        assert out.shape == (1, 96, 96, 3)
        # all three channels identical for a grayscale source
        np.testing.assert_array_equal(out[0, :, :, 0], out[0, :, :, 1])

    def test_missing_file_raises(self, tmp_path):
        with pytest.raises(RuntimeError, match="nope.jpg"):
            native.decode_jpeg_batch([str(tmp_path / "nope.jpg")], out_size=64)

    def test_loader_uses_native_jpeg_path(self, tmp_path):
        from tests.test_data import write_wav
        from speechclip_tpu.data.datasets import FlickrDataset
        from speechclip_tpu.data.loader import BucketedLoader

        (tmp_path / "flickr_audio" / "wavs").mkdir(parents=True)
        (tmp_path / "Images").mkdir()
        caps = []
        for i in range(4):
            name = f"nj{i:03d}"
            write_smooth_jpg(tmp_path / "Images" / f"{name}.jpg", 300, 200, seed=i)
            write_wav(
                tmp_path / "flickr_audio" / "wavs" / f"{name}_0.wav", 2000, seed=i
            )
            caps.append(f"{name}.jpg#0\tnative jpeg caption {i} .")
        (tmp_path / "Flickr8k.token.txt").write_text("\n".join(caps))
        (tmp_path / "Flickr_8k.trainImages.txt").write_text(
            "\n".join(f"nj{i:03d}.jpg" for i in range(4))
        )
        ds = FlickrDataset(
            str(tmp_path),
            ["audio", "image"],
            split="train",
            image_mode="raw",
            image_size=64,
        )
        loader = BucketedLoader(ds, batch_size=4, train=False, seed=0)
        batch = next(iter(loader))
        s = ds.raw_decode_size
        assert batch["image"].shape == (4, s, s, 3)
        assert batch["image"].dtype == np.uint8
        # values come from the native decoder: compare against a direct call
        direct = native.decode_jpeg_batch(
            [ds.data[i]["image"] for i in range(4)], s
        )
        order = np.argsort(batch["id"])
        direct_order = np.argsort([ds.data[i]["id"] for i in range(4)])
        np.testing.assert_array_equal(
            batch["image"][order], direct[direct_order]
        )
