"""HLO-level pins for the SCALING.md cost model (VERDICT r3 next #6).

docs/SCALING.md claims the SPMD partitioner inserts ONE feature
all-gather for the global-batch contrastive logits and reduces gradients
over the data axis. These tests compile the REAL sharded train step on
the virtual 8-device mesh and assert those collectives in the lowered
HLO, so a regression in sharding propagation (e.g. an accidental
full-activation replication) fails a test instead of a pod-slice bill.

The pos_conv gate is not hypothetical: XLA cannot batch-partition a
feature_group_count conv, so the grouped positional conv USED to lower
as `all-gather f32[B,T,D]` + replicated conv on every chip (~250 MB/step
of gather at production dims on data=8). models/hubert.py pos_conv_apply
now dispatches through an explicit shard_map over the data axis; the
rank-3 gather must stay gone.

Reference contract being replaced: the torch-DP gather in
avssl/model/kwClip.py:147-191 (training_step_end loss on the full batch).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechclip_tpu.config import flagship_tiny_config
from speechclip_tpu.models.speechclip import SpeechCLIPModel
from speechclip_tpu.ops.attention import kernel_mesh
from speechclip_tpu.parallel.hlo_inspect import collective_results
from speechclip_tpu.parallel import make_mesh
from speechclip_tpu.training import (
    build_optimizer,
    create_train_state,
    jit_train_step,
    make_train_step,
    place_state,
    shard_batch,
)

GLOBAL_BATCH = 16
FEAT_DIM = 16  # flagship_tiny_config output_dim


def _make_batch(b=GLOBAL_BATCH):
    rng = np.random.default_rng(0)
    return {
        "wav": jnp.asarray(rng.standard_normal((b, 2000)).astype(np.float32)),
        "wav_len": jnp.asarray(rng.integers(1000, 2001, b)),
        "image": jnp.asarray(
            rng.standard_normal((b, 32, 32, 3)).astype(np.float32)
        ),
        "id": jnp.asarray(np.arange(b) // 2),
    }


@pytest.fixture(scope="module")
def compiled_hlo():
    cfg = flagship_tiny_config()
    cfg.trainer.precision = 32
    model = SpeechCLIPModel(cfg)
    params, _ = model.init(jax.random.key(0))
    tx, _ = build_optimizer(cfg, model.trainable_mask(params))
    step = jit_train_step(make_train_step(model, tx), donate=False)
    mesh = make_mesh(devices=jax.devices()[:8], data=8, model=1)
    state = place_state(create_train_state(model, tx, jax.random.key(0)), mesh)
    batch = shard_batch(_make_batch(), mesh)
    with kernel_mesh(mesh):  # the trainer's fit/validate scope
        txt = step.lower(state, batch).compile().as_text()
    return txt


def _all_gather_shapes(txt):
    """[(dtype, dims tuple)] for every all-gather result in the module
    (shared parser: speechclip_tpu/parallel/hlo_inspect.py — handles the
    async -start tuple form, whose first shape is the operand)."""
    return [
        (dt, dims)
        for op, dt, dims in collective_results(txt)
        if op == "all-gather"
    ]


def test_contrastive_feature_all_gather_present(compiled_hlo):
    """The global-batch negatives ride ONE (N, feat) gather per feature
    (SCALING.md: ~1 MB at N=1024 — negligible next to the forward)."""
    feature_gathers = [
        s
        for dt, s in _all_gather_shapes(compiled_hlo)
        if dt == "f32" and s == (GLOBAL_BATCH, FEAT_DIM)
    ]
    assert feature_gathers, (
        "no (N, feat) all-gather found — the contrastive loss is no longer "
        "computing global-batch negatives"
    )


def test_no_full_activation_all_gather(compiled_hlo):
    """No rank-3 float activation (B, T, D) may be gathered: that is the
    replicated-pos-conv failure mode (and would also catch an accidental
    full-hidden-state replication anywhere else in the step)."""
    rank3 = [
        (dt, s)
        for dt, s in _all_gather_shapes(compiled_hlo)
        if dt.startswith(("f", "bf")) and len(s) >= 3
    ]
    assert not rank3, (
        f"full activation tensors are being all-gathered: {rank3} — "
        "sharding propagation regressed (see pos_conv_apply's shard_map "
        "dispatch note)"
    )


def test_gradient_reduction_present(compiled_hlo):
    """Trainable-param grads must reduce over the data axis (all-reduce or
    reduce-scatter; XLA chooses the spelling)."""
    n_reduce = sum(
        1
        for line in compiled_hlo.splitlines()
        if " all-reduce(" in line
        or "all-reduce-start(" in line
        or " reduce-scatter(" in line
    )
    assert n_reduce >= 1, "no gradient reduction collective in the step"


@pytest.mark.slow  # second full compile of the sharded step (~20 s); the
# dispatch decision itself is fast-tier (tests/test_kernels.py TestMeshPlan)
def test_sub_mesh_step_has_no_rank3_gather():
    """A trainer meshing a SUBSET of the process's devices (data=4 of 8)
    must still get the shard_map'd pos_conv: through round 4,
    kernels/_dispatch.mesh_plan refused sub-meshes, silently retaining the
    replicated-pos-conv rank-3 all-gather (VERDICT r4 weak #5). The mesh
    registration is scoped (kernel_mesh), which IS the ownership
    declaration — mesh_plan now trusts it."""
    cfg = flagship_tiny_config()
    cfg.trainer.precision = 32
    model = SpeechCLIPModel(cfg)
    params, _ = model.init(jax.random.key(0))
    tx, _ = build_optimizer(cfg, model.trainable_mask(params))
    step = jit_train_step(make_train_step(model, tx), donate=False)
    mesh = make_mesh(devices=jax.devices()[:4], data=4, model=1)
    state = place_state(create_train_state(model, tx, jax.random.key(0)), mesh)
    batch = shard_batch(_make_batch(), mesh)
    with kernel_mesh(mesh):
        txt = step.lower(state, batch).compile().as_text()
        _, metrics = step(state, batch)  # and it must actually run
    assert np.isfinite(float(metrics["train_loss"]))
    rank3 = [
        (dt, s)
        for dt, s in _all_gather_shapes(txt)
        if dt.startswith(("f", "bf")) and len(s) >= 3
    ]
    assert not rank3, (
        f"sub-mesh step all-gathers full activations: {rank3} — the "
        "sub-mesh dispatch hole is back (mesh_plan refused the mesh)"
    )
    # the global-batch contrastive gather must still be present
    assert any(
        dt == "f32" and s == (GLOBAL_BATCH, FEAT_DIM)
        for dt, s in _all_gather_shapes(txt)
    )


@pytest.mark.slow  # second full compile of the sharded step
def test_pos_conv_shard_map_is_numerically_exact():
    """The shard_map'd pos_conv must not change the step's math: same
    loss/grad-norm with and without the mesh-scoped dispatch.

    A FRESH jitted step is built inside each run: get_kernel_mesh() is
    read at TRACE time, so re-calling one jit object under the scope
    would silently reuse the unscoped executable (jit caches on
    avals/shardings only) and compare a program with itself."""
    cfg = flagship_tiny_config()
    cfg.trainer.precision = 32
    model = SpeechCLIPModel(cfg)
    params, _ = model.init(jax.random.key(0))
    tx, _ = build_optimizer(cfg, model.trainable_mask(params))
    mesh = make_mesh(devices=jax.devices()[:8], data=8, model=1)
    batch = _make_batch()

    def run(scoped):
        step = jit_train_step(make_train_step(model, tx), donate=False)
        state = place_state(
            create_train_state(model, tx, jax.random.key(0)), mesh
        )
        sharded = shard_batch(batch, mesh)
        with kernel_mesh(mesh if scoped else None):
            txt = step.lower(state, sharded).compile().as_text()
            _, metrics = step(state, sharded)
        rank3_gathers = sum(
            1
            for op, dt, dims in collective_results(txt)
            if op == "all-gather" and dt == "f32" and len(dims) >= 3
        )
        return (
            float(metrics["train_loss"]),
            float(metrics["grad_norm"]),
            rank3_gathers,
        )

    loss_a, gnorm_a, rank3_unscoped = run(scoped=False)
    loss_b, gnorm_b, rank3_scoped = run(scoped=True)
    # the two programs genuinely differ: unscoped replicates the grouped
    # pos_conv (rank-3 gather), scoped shard_maps it away
    assert rank3_unscoped >= 1, "expected the replicated-pos-conv gather"
    assert rank3_scoped == 0, "shard_map dispatch did not engage"
    np.testing.assert_allclose(loss_b, loss_a, rtol=1e-6)
    np.testing.assert_allclose(gnorm_b, gnorm_a, rtol=1e-5)
