"""AOT export (speechclip_tpu/export.py): StableHLO round-trips of the
three inference surfaces on the CPU backend."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechclip_tpu.export import (
    export_encode_image,
    export_encode_speech,
    export_encode_text,
    load_exported,
)
from speechclip_tpu.models.speechclip import SpeechCLIPModel
from tests.test_models import tiny_speechclip_config


@pytest.fixture(scope="module")
def model_and_state(tmp_path_factory):
    model = SpeechCLIPModel(
        tiny_speechclip_config(tmp_path_factory.mktemp("exp_cfg"))
    )
    params, state = model.init(jax.random.key(0))
    return model, params, state


class TestExport:
    def test_speech_roundtrip_matches_direct_call(self, model_and_state):
        model, params, state = model_and_state
        blob = export_encode_speech(
            model, params, state, batch_size=2, wav_samples=2000,
            platforms=("cpu",),
        )
        assert isinstance(blob, bytes) and len(blob) > 1000
        fn = load_exported(blob)

        rng = np.random.default_rng(0)
        wav = jnp.asarray(rng.standard_normal((2, 2000)).astype(np.float32))
        wav_len = jnp.asarray(np.array([2000, 1200], np.int32))
        got = fn(wav, wav_len)
        want = model.encode_speech(params, state, wav, wav_len)
        np.testing.assert_allclose(
            np.asarray(got["parallel_audio_feat"]),
            np.asarray(want["parallel_audio_feat"]),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(got["cascaded_audio_feat"]),
            np.asarray(want["cascaded_audio_feat"]),
            atol=1e-5,
        )
        assert "vq_results" not in got  # diagnostics stripped for serving

    def test_image_and_text_roundtrip(self, model_and_state):
        model, params, state = model_and_state
        img_fn = load_exported(
            export_encode_image(model, params, batch_size=2, platforms=("cpu",))
        )
        rng = np.random.default_rng(1)
        images = jnp.asarray(
            rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
        )
        np.testing.assert_allclose(
            np.asarray(img_fn(images)),
            np.asarray(model.forward_image(params, images)),
            atol=1e-5,
        )

        txt_fn = load_exported(
            export_encode_text(model, params, batch_size=2, platforms=("cpu",))
        )
        text = np.zeros((2, 77), np.int32)
        text[:, 0] = model.sot_id
        text[0, 1:4] = [5, 6, 7]
        text[0, 4] = model.eot_id
        text[1, 1] = model.eot_id
        eots = jnp.asarray(np.array([4, 1], np.int32))
        text = jnp.asarray(text)
        np.testing.assert_allclose(
            np.asarray(txt_fn(text, eots)),
            np.asarray(model.forward_text(params, text, eots)),
            atol=1e-5,
        )

    @pytest.mark.slow
    def test_polymorphic_batch_serves_multiple_sizes(self, model_and_state):
        """One polymorphic artifact must serve several batch sizes and match
        the direct call at each (jax.export shape polymorphism over the
        leading dim; wav length stays static)."""
        model, params, state = model_and_state
        blob = export_encode_speech(
            model, params, state, batch_size=2, wav_samples=2000,
            platforms=("cpu",), polymorphic_batch=True,
        )
        fn = load_exported(blob)
        rng = np.random.default_rng(2)
        for b in (1, 3, 5):
            wav = jnp.asarray(rng.standard_normal((b, 2000)).astype(np.float32))
            wav_len = jnp.asarray(np.full((b,), 2000, np.int32))
            got = fn(wav, wav_len)
            want = model.encode_speech(params, state, wav, wav_len)
            np.testing.assert_allclose(
                np.asarray(got["parallel_audio_feat"]),
                np.asarray(want["parallel_audio_feat"]),
                atol=1e-5,
                err_msg=f"batch {b}",
            )

        img_fn = load_exported(
            export_encode_image(
                model, params, batch_size=2, platforms=("cpu",),
                polymorphic_batch=True,
            )
        )
        for b in (1, 4):
            images = jnp.asarray(
                rng.standard_normal((b, 32, 32, 3)).astype(np.float32)
            )
            np.testing.assert_allclose(
                np.asarray(img_fn(images)),
                np.asarray(model.forward_image(params, images)),
                atol=1e-5,
                err_msg=f"batch {b}",
            )

    def test_bf16_cast_shrinks_artifact(self, model_and_state):
        """cast_float_params(bf16) roughly halves the baked-weights artifact
        and features stay within bf16 noise of the f32 export."""
        from speechclip_tpu.export import cast_float_params
        import jax.numpy as jnp

        model, params, state = model_and_state
        blob_f32 = export_encode_image(
            model, params, batch_size=2, platforms=("cpu",)
        )
        params_bf16 = cast_float_params(params, jnp.bfloat16)
        blob_bf16 = export_encode_image(
            model, params_bf16, batch_size=2, platforms=("cpu",)
        )
        assert len(blob_bf16) < 0.75 * len(blob_f32), (
            len(blob_bf16),
            len(blob_f32),
        )
        rng = np.random.default_rng(3)
        images = jnp.asarray(
            rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
        )
        a = np.asarray(load_exported(blob_f32)(images))
        b = np.asarray(load_exported(blob_bf16)(images))
        a = a / np.linalg.norm(a, axis=-1, keepdims=True)
        b = b / np.linalg.norm(b, axis=-1, keepdims=True)
        assert float((a * b).sum(-1).min()) > 0.995


def test_multi_platform_artifact_runs_on_cpu(model_and_state):
    """platforms=("cpu","tpu") lowers ONE artifact for both serving
    platforms (per-platform custom-call branches in the StableHLO); it
    must still deserialize and execute on the CPU backend. CLI:
    python -m speechclip_tpu.export --platform cpu,tpu."""
    model, params, state = model_and_state
    blob = export_encode_image(
        model, params, batch_size=2, platforms=("cpu", "tpu")
    )
    fn = load_exported(blob)
    rng = np.random.default_rng(5)
    images = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(fn(images)),
        np.asarray(model.forward_image(params, images)),
        atol=1e-5,
    )
