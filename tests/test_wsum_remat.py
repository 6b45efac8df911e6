"""Frozen weighted-sum remat path (``audio_encoder.wsum_remat``).

The op folds the per-state weighted sum into the encoder layer loop and
recomputes the frozen encoder on the backward pass (custom VJP), so the
N-hidden-state stack — the hubert_large b256 OOM buffer, see
docs/DESIGN_NOTES.md large-model budget — is never live. These tests pin:

- value + gradient parity against the reference pipeline
  hubert_apply -> stop_gradient -> normalize -> weighted_sum_apply
  (reference contract: speech_encoder_plus.py:558-621) for every
  normalization mode;
- zero gradients for the frozen encoder params (stop_gradient semantics);
- full-train-step equivalence with the knob on/off;
- the sharded (8-device mesh) step still matches single-device execution
  with the knob on (custom VJP under pjit + the pos_conv shard_map).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechclip_tpu.models import hubert
from speechclip_tpu.models.speechclip import SpeechCLIPModel
from speechclip_tpu.ops.weighted_sum import weighted_sum_apply
from speechclip_tpu.parallel import make_mesh
from speechclip_tpu.training import (
    build_optimizer,
    create_train_state,
    jit_train_step,
    make_train_step,
    place_state,
    shard_batch,
)
from tests.test_models import tiny_speechclip_config
from tests.test_train_step import make_batch

TINY = hubert.HubertConfig(
    conv_layers=((8, 10, 5), (8, 3, 2)),
    encoder_embed_dim=16,
    encoder_layers=3,
    encoder_ffn_dim=32,
    encoder_heads=2,
    downsample_rate=10,
)


@pytest.mark.parametrize("norm_type", [None, "method1", "method2", "s3prl"])
def test_matches_reference_pipeline(norm_type):
    params = hubert.hubert_init(jax.random.key(0), TINY)
    ws = {
        "weights": jax.random.normal(
            jax.random.key(1), (TINY.num_hidden_states,), jnp.float32
        )
    }
    wav = jax.random.normal(jax.random.key(2), (2, 200), jnp.float32)
    lens = jnp.array([200, 150])
    tgt = jax.random.normal(
        jax.random.key(3), (2, hubert.conv_output_length(TINY, 200), 16)
    )

    def ref_loss(ws, p):
        hs, fl = hubert.hubert_apply(p, TINY, wav, lens)
        hs = jax.tree.map(jax.lax.stop_gradient, hs)
        if norm_type in ("method1", "method2"):
            hs = hubert.normalize_hidden_states(hs, norm_type)
        feat = weighted_sum_apply(
            ws, hs, normalize_features=(norm_type == "s3prl")
        )
        return jnp.sum(feat * tgt.astype(feat.dtype)), (feat, fl)

    def remat_loss(ws, p):
        feat, fl = hubert.hubert_frozen_weighted_sum(
            ws, p, TINY, wav, lens, norm_type=norm_type
        )
        return jnp.sum(feat * tgt.astype(feat.dtype)), (feat, fl)

    (l0, (f0, fl0)), g0 = jax.value_and_grad(
        ref_loss, argnums=(0, 1), has_aux=True
    )(ws, params)
    (l1, (f1, fl1)), g1 = jax.value_and_grad(
        remat_loss, argnums=(0, 1), has_aux=True
    )(ws, params)

    assert f0.dtype == f1.dtype
    np.testing.assert_array_equal(np.asarray(fl0), np.asarray(fl1))
    if norm_type == "s3prl":
        # reference path multiplies in compute dtype (stacked einsum); the
        # remat path multiplies in f32 — f32-roundoff-level difference
        np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), atol=1e-5)
    else:
        np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
    np.testing.assert_allclose(
        np.asarray(g0[0]["weights"]), np.asarray(g1[0]["weights"]), atol=1e-5
    )
    # frozen encoder: exactly zero grads (stop_gradient semantics)
    assert all(
        float(jnp.max(jnp.abs(leaf))) == 0.0 for leaf in jax.tree.leaves(g1[1])
    )


def _fresh_setup(tmp_path, wsum_remat):
    tmp_path.mkdir(parents=True, exist_ok=True)
    cfg = tiny_speechclip_config(tmp_path)
    cfg.audio_encoder.wsum_remat = wsum_remat
    cfg.audio_encoder.optim = {
        "name": "Adam",
        "args": {"lr": 1e-3, "weight_decay": 1e-6},
    }
    cfg.audio_encoder.scheduler = {
        "name": "linear_warmup_decay",
        "warmup": 5,
        "max_step": 100,
        "final_lr": 1e-8,
    }
    cfg.trainer.gradient_clip_val = 4
    model = SpeechCLIPModel(cfg)
    params, _ = model.init(jax.random.key(0))
    tx, _ = build_optimizer(model.config, model.trainable_mask(params))
    state = create_train_state(model, tx, jax.random.key(0))
    return model, tx, state


@pytest.mark.slow
def test_train_step_equivalent(tmp_path):
    """Same batch, knob on vs off: loss, grad norm, and updated trainable
    params must agree (the remat path changes memory scheduling, not math)."""
    batch = make_batch()
    results = {}
    for flag in (False, True):
        model, tx, state = _fresh_setup(tmp_path / str(flag), flag)
        step = jit_train_step(make_train_step(model, tx), donate=False)
        state, metrics = step(state, batch)
        results[flag] = (state, metrics)
    s0, m0 = results[False]
    s1, m1 = results[True]
    np.testing.assert_allclose(
        float(m0["train_loss"]), float(m1["train_loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(m0["grad_norm"]), float(m1["grad_norm"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(s0.params["weighted_sum"]["weights"]),
        np.asarray(s1.params["weighted_sum"]["weights"]),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(s0.params["parallel_branch"]["cls"]),
        np.asarray(s1.params["parallel_branch"]["cls"]),
        atol=1e-6,
    )


@pytest.mark.slow
def test_sharded_step_matches_single_device(tmp_path):
    model, tx, state1 = _fresh_setup(tmp_path, True)
    batch = make_batch()
    step = jit_train_step(make_train_step(model, tx), donate=False)
    state1, metrics1 = step(state1, batch)

    mesh = make_mesh(data=8, model=1)
    _, _, state2 = _fresh_setup(tmp_path, True)
    state2 = place_state(state2, mesh)
    state2, metrics2 = step(state2, shard_batch(batch, mesh))

    np.testing.assert_allclose(
        float(metrics1["train_loss"]), float(metrics2["train_loss"]), rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(state1.params["weighted_sum"]["weights"]),
        np.asarray(state2.params["weighted_sum"]["weights"]),
        atol=1e-6,
    )


def test_eval_forward_identical(tmp_path):
    """Inference goes through the same primal computation — encode features
    must be bit-identical with the knob on/off."""
    batch = make_batch(b=4)
    feats = {}
    for flag in (False, True):
        sub = tmp_path / f"e{flag}"
        sub.mkdir(parents=True, exist_ok=True)
        cfg = tiny_speechclip_config(sub)
        cfg.audio_encoder.wsum_remat = flag
        model = SpeechCLIPModel(cfg)
        params, state = model.init(jax.random.key(0))
        loss_feats, _, _, _ = model.forward(params, state, batch, train=False)
        feats[flag] = loss_feats
    np.testing.assert_array_equal(
        np.asarray(feats[False]["parallel_audio_feat"]),
        np.asarray(feats[True]["parallel_audio_feat"]),
    )
    np.testing.assert_array_equal(
        np.asarray(feats[False]["cascaded_audio_feat"]),
        np.asarray(feats[True]["cascaded_audio_feat"]),
    )


def test_gate_blockers_warn_loudly(tmp_path, caplog):
    """wsum_remat with a statically-blocking config must WARN at model
    construction instead of silently no-opping into the OOM the knob was
    set to avoid (ADVICE r4). An engaging config must stay silent."""
    import logging

    cfg = tiny_speechclip_config(tmp_path)
    cfg.audio_encoder.wsum_remat = True
    cfg.audio_encoder.trainable = True  # blocks the memory path
    with caplog.at_level(logging.WARNING, logger="speechclip_tpu"):
        SpeechCLIPModel(cfg)
    assert any(
        "wsum_remat" in r.message and "NOT engage" in r.message
        for r in caplog.records
    ), caplog.records

    caplog.clear()
    cfg2 = tiny_speechclip_config(tmp_path)
    cfg2.audio_encoder.wsum_remat = True  # frozen encoder: engages
    with caplog.at_level(logging.WARNING, logger="speechclip_tpu"):
        SpeechCLIPModel(cfg2)
    assert not [r for r in caplog.records if "wsum_remat" in r.message]
