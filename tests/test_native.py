"""Native ingest library tests (skipped when libwavio.so is not built)."""

import numpy as np
import pytest

from speechclip_tpu.data import native, read_wav, wav_num_samples
from tests.test_data import write_wav

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native/libwavio.so not built"
)


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
