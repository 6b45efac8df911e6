"""kw-BatchNorm statistics-scope A/B: global-batch vs per-replica stats.

The reference trains with torch-DataParallel, whose BatchNorm computes
batch statistics PER REPLICA on each GPU's sub-batch (SURVEY.md §7 hard
parts; avssl/module/speechclip_c_modules/kw_bn.py under strategy: dp). Our
shipped default is GLOBAL-batch stats (``replica_groups: 0`` — cleaner,
chip-count-independent dynamics); the faithful per-replica emulation is the
``replica_groups: G`` knob (ops/kw_bn.py:19-26, unit-tested against literal
torch-DP in tests/test_ops.py).

This test bounds the TRAINING-DYNAMICS difference between the two modes on
the virtual mesh (VERDICT r2 missing #4): identical tiny cascaded model,
identical batches, 4-way data sharding; train both modes and compare loss
trajectories and BN running stats. Measured bounds are recorded in
docs/DESIGN_NOTES.md ("kw-BN statistics scope") and pinned loosely here so
a regression that blows the modes apart (or silently fuses them) fails.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechclip_tpu.models.speechclip import SpeechCLIPModel
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

pytestmark = pytest.mark.slow

BATCH = 16
N_DATA = 4  # sub-batch of 4 per replica group — the torch-DP 4-GPU shape
STEPS = 25
WAV_LEN = 2000


def _run(tmp_path, replica_groups):
    tmp_path.mkdir(parents=True, exist_ok=True)
    cfg = tiny_speechclip_config(tmp_path, cascaded=1.0, parallel=0.0)
    cfg.model_settings.cascaded_branch.keyword.batchnorms.replica_groups = (
        replica_groups
    )
    cfg.audio_encoder.optim = {
        "name": "Adam",
        "args": {"lr": 1e-3, "weight_decay": 0.0},
    }
    cfg.audio_encoder.scheduler = {
        "name": "linear_warmup_decay",
        "warmup": 5,
        "max_step": 400,
        "final_lr": 1e-4,
    }
    model = SpeechCLIPModel(cfg)
    params, _ = model.init(jax.random.key(0))
    tx, _ = build_optimizer(cfg, model.trainable_mask(params))
    state = create_train_state(model, tx, jax.random.key(0))
    mesh = make_mesh(data=N_DATA, model=1)
    state = place_state(state, mesh)
    step = jit_train_step(make_train_step(model, tx), donate=False)

    rng = np.random.default_rng(3)
    losses = []
    for i in range(STEPS):
        srng = np.random.default_rng(1000 + i)  # same batches in both runs
        batch = {
            "wav": jnp.asarray(
                srng.standard_normal((BATCH, WAV_LEN)).astype(np.float32)
            ),
            "wav_len": jnp.asarray(np.full(BATCH, WAV_LEN)),
            "image": jnp.asarray(
                srng.standard_normal((BATCH, 32, 32, 3)).astype(np.float32)
            ),
            "id": jnp.asarray(np.arange(BATCH) // 2),
        }
        batch = shard_batch(batch, mesh)
        state, metrics = step(state, batch)
        losses.append(float(metrics["train_loss"]))
    bn_state = jax.tree.map(
        np.asarray, state.model_state["cascaded_branch"]["bn"]
    )
    return np.array(losses), bn_state


def test_global_vs_per_replica_bn_dynamics(tmp_path):
    losses_g, bn_g = _run(tmp_path / "g", replica_groups=0)
    losses_r, bn_r = _run(tmp_path / "r", replica_groups=N_DATA)

    assert np.isfinite(losses_g).all() and np.isfinite(losses_r).all()

    # the knob DOES change training (per-replica stats differ from global:
    # normalization uses sub-batch mean/var, running stats track group 0)
    assert not np.allclose(losses_g, losses_r), "modes are unexpectedly fused"
    assert not np.allclose(bn_g["mean"], bn_r["mean"])

    # ...but the dynamics difference is BOUNDED. Measured on this setup
    # (virtual mesh, 25 steps, noise batches): max per-step relative loss
    # gap 0.165, final-loss gap 0.030, BN running-mean rel-L2 0.065,
    # running-var rel-L2 0.0018 (docs/DESIGN_NOTES.md "kw-BN statistics
    # scope"). Pin with ~3x headroom so only a real dynamics break trips.
    rel_gap = np.abs(losses_g - losses_r) / np.abs(losses_g)
    assert rel_gap.max() < 0.5, rel_gap.max()
    assert abs(losses_g[-1] - losses_r[-1]) / losses_g[-1] < 0.12

    # running stats stay in the same regime (relative L2 divergence bounded)
    def rel_l2(a, b):
        return float(np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12))

    assert rel_l2(bn_g["mean"], bn_r["mean"]) < 0.3
    assert rel_l2(bn_g["var"], bn_r["var"]) < 0.1
