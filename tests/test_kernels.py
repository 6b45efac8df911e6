"""Pallas kernel tests (interpret mode on the CPU platform)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechclip_tpu.kernels.flash_attention import (
    _reference_attention,
    flash_attention,
)


def make_qkv(b=2, h=2, l=96, d=16, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((b, h, l, d)).astype(np.float32))
    return mk(), mk(), mk()


class TestFlashAttention:
    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_reference(self, causal):
        q, k, v = make_qkv()
        out_f = flash_attention(q, k, v, None, causal)
        out_r = _reference_attention(q, k, v, None, causal)
        np.testing.assert_allclose(
            np.asarray(out_f), np.asarray(out_r), atol=2e-5
        )

    def test_key_length_masking(self):
        q, k, v = make_qkv(b=3, l=100)
        lens = jnp.asarray(np.array([100, 64, 17], np.int32))
        out_f = flash_attention(q, k, v, lens, False)
        out_r = _reference_attention(q, k, v, lens, False)
        np.testing.assert_allclose(
            np.asarray(out_f), np.asarray(out_r), atol=2e-5
        )

    def test_non_block_multiple_lengths(self):
        # L=130 exercises the padded final q/k block
        q, k, v = make_qkv(l=130, seed=3)
        out_f = flash_attention(q, k, v, None, False)
        out_r = _reference_attention(q, k, v, None, False)
        np.testing.assert_allclose(
            np.asarray(out_f), np.asarray(out_r), atol=2e-5
        )

    def test_gradients_flow(self):
        q, k, v = make_qkv(l=64, seed=4)
        lens = jnp.asarray(np.array([64, 32], np.int32))

        def loss(q, k, v):
            return jnp.sum(flash_attention(q, k, v, lens, False) ** 2)

        gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

        def loss_ref(q, k, v):
            return jnp.sum(_reference_attention(q, k, v, lens, False) ** 2)

        rq, rk, rv = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        np.testing.assert_allclose(np.asarray(gq), np.asarray(rq), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), atol=1e-4)

    def test_backend_switch_in_mha(self):
        """ops.attention dispatches to the kernel only on TPU; on the CPU
        test platform the flag must leave results unchanged."""
        from speechclip_tpu import ops

        params = ops.mha_init(jax.random.key(0), 32)
        x = jnp.asarray(
            np.random.default_rng(5).standard_normal((2, 10, 32)).astype(np.float32)
        )
        lens = jnp.asarray(np.array([10, 6]))
        out_xla, _ = ops.multi_head_attention(
            params, x, x, x, num_heads=4, key_valid_lens=lens
        )
        with ops.attention_backend("pallas"):
            out_p, _ = ops.multi_head_attention(
                params, x, x, x, num_heads=4, key_valid_lens=lens
            )
        np.testing.assert_allclose(np.asarray(out_xla), np.asarray(out_p), atol=1e-6)


class TestAttentionVmem:
    """Grouped VMEM-resident attention (kernels/attention_vmem.py),
    interpret mode on CPU."""

    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_reference(self, causal):
        from speechclip_tpu.kernels.attention_vmem import (
            _reference,
            attention_vmem,
        )

        q, k, v = make_qkv(b=2, h=4, l=77, d=64, seed=1)
        out = attention_vmem(q, k, v, None, causal)
        ref = _reference(q, k, v, None, causal)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_vmem_envelope_uses_true_shapes(self):
        """Cross-attention with S >> L must size k/v buffers by S, not L —
        an eligibility decision from the query-length-only formula could
        exceed VMEM at Mosaic compile time (ADVICE r1)."""
        from speechclip_tpu.kernels.attention_vmem import (
            _VMEM_BUDGET,
            _group_size,
            vmem_eligible,
        )

        l, s, d, isz = 128, 4096, 64, 2
        g = _group_size(bh=64, l=l, s=s, d=d, itemsize=isz)
        per_pair = (2 * l * d + s * d + s * (d + 1)) * isz * 2
        score = l * s * 6
        assert g * per_pair + score <= _VMEM_BUDGET
        # symmetric shapes keep their round-1 grouping (no regression)
        assert _group_size(bh=512 * 12, l=320, s=320, d=64, itemsize=2) >= 4
        assert vmem_eligible(512, 12, 320, 320, 64, 2)
        # self-attention at tiny L stays ineligible (XLA wins there)
        assert not vmem_eligible(256, 12, 50, 50, 64, 2)

    def test_key_length_masking_and_grouping(self):
        from speechclip_tpu.kernels.attention_vmem import (
            _forward,
            _reference,
        )

        # b*h = 12 groups as 4x3; lens vary per batch row
        q, k, v = make_qkv(b=3, h=4, l=100, d=32, seed=2)
        lens = jnp.asarray(np.array([100, 64, 17], np.int32))
        for g in (1, 3, 4):
            out = _forward(q, k, v, lens, False, group=g)
            ref = _reference(q, k, v, lens, False)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=2e-5
            )

    def test_gradients_flow(self):
        from speechclip_tpu.kernels.attention_vmem import (
            _reference,
            attention_vmem,
        )

        q, k, v = make_qkv(b=2, h=2, l=64, d=16, seed=4)
        lens = jnp.asarray(np.array([64, 32], np.int32))

        def loss(q, k, v):
            return jnp.sum(attention_vmem(q, k, v, lens, False) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(_reference(q, k, v, lens, False) ** 2)

        got = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for g, r in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-4)

    def test_auto_backend_inert_on_cpu(self):
        """The default backend is auto; on the CPU test platform it must
        resolve to the XLA path (identical results, no kernel)."""
        from speechclip_tpu import ops

        assert ops.get_attention_backend() == "auto"
        params = ops.mha_init(jax.random.key(0), 32)
        x = jnp.asarray(
            np.random.default_rng(7).standard_normal((2, 12, 32)).astype(np.float32)
        )
        lens = jnp.asarray(np.array([12, 5]))
        out_auto, _ = ops.multi_head_attention(
            params, x, x, x, num_heads=4, key_valid_lens=lens
        )
        with ops.attention_backend("xla"):
            out_xla, _ = ops.multi_head_attention(
                params, x, x, x, num_heads=4, key_valid_lens=lens
            )
        np.testing.assert_allclose(
            np.asarray(out_auto), np.asarray(out_xla), atol=0
        )

    def test_sharded_wrapper_matches_reference(self):
        """attention_vmem_sharded on the 8-device CPU mesh (interpret-mode
        kernel per shard) must equal the global reference."""
        from speechclip_tpu.kernels.attention_vmem import (
            _reference,
            attention_vmem_sharded,
        )
        from speechclip_tpu.parallel import make_mesh

        mesh = make_mesh(model=1)
        q, k, v = make_qkv(b=8, h=3, l=40, d=16, seed=9)
        lens = jnp.asarray(
            np.random.default_rng(9).integers(1, 41, 8).astype(np.int32)
        )
        out = jax.jit(
            lambda q, k, v, lens: attention_vmem_sharded(
                q, k, v, lens, False, mesh
            )
        )(q, k, v, lens)
        ref = _reference(q, k, v, lens, False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestMhaBlock:
    """Fused QKV->attention->out-proj block (kernels/mha_block.py),
    interpret mode on CPU."""

    def _params(self, d, seed=0):
        rng = np.random.default_rng(seed)
        mk = lambda *s: jnp.asarray((rng.standard_normal(s) * 0.1).astype(np.float32))
        return mk(d, 3 * d), mk(3 * d), mk(d, d), mk(d)

    @pytest.mark.parametrize("use_lens", [False, True])
    def test_matches_reference(self, use_lens):
        from speechclip_tpu.kernels.mha_block import _reference, mha_block

        b, t, d, h = 3, 40, 48, 6
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
        wi, bi, wo, bo = self._params(d)
        lens = (
            jnp.asarray(np.array([40, 17, 1], np.int32)) if use_lens else None
        )
        out = mha_block(x, wi, bi, wo, bo, lens, h)
        ref = _reference(x, wi, bi, wo, bo, lens, h)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5
        )

    def test_gradients_flow(self):
        from speechclip_tpu.kernels.mha_block import _reference, mha_block

        b, t, d, h = 2, 16, 32, 4
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
        wi, bi, wo, bo = self._params(d, seed=3)
        lens = jnp.asarray(np.array([16, 9], np.int32))

        def loss(fn):
            return lambda x, wi, wo: jnp.sum(
                fn(x, wi, bi, wo, bo, lens, h) ** 2
            )

        got = jax.grad(loss(mha_block), argnums=(0, 1, 2))(x, wi, wo)
        want = jax.grad(loss(_reference), argnums=(0, 1, 2))(x, wi, wo)
        for g, r in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), atol=1e-4
            )

    def test_sharded_wrapper(self):
        from speechclip_tpu.kernels.mha_block import (
            _reference,
            mha_block_sharded,
        )
        from speechclip_tpu.parallel import make_mesh

        mesh = make_mesh(model=1)
        b, t, d, h = 8, 24, 32, 4
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
        wi, bi, wo, bo = self._params(d, seed=6)
        lens = jnp.asarray(rng.integers(1, t + 1, b).astype(np.int32))
        out = jax.jit(
            lambda x, wi, bi, wo, bo, lens: mha_block_sharded(
                x, wi, bi, wo, bo, lens, h, mesh
            )
        )(x, wi, bi, wo, bo, lens)
        ref = _reference(x, wi, bi, wo, bo, lens, h)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestFusedLayerKernels:
    """Layer-mode kernels: mha_layer_block + ffn_block (interpret mode)."""

    def _mha_params(self, d, seed=0):
        rng = np.random.default_rng(seed)
        mk = lambda *s: jnp.asarray((rng.standard_normal(s) * 0.1).astype(np.float32))
        return mk(d, 3 * d), mk(3 * d), mk(d, d), mk(d)

    @pytest.mark.parametrize("mode", ["post", "pre"])
    def test_mha_layer_block(self, mode):
        from speechclip_tpu.kernels.mha_block import (
            _layer_reference,
            mha_layer_block,
        )

        b, t, d, h = 3, 40, 48, 6
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
        wi, bi, wo, bo = self._mha_params(d)
        g = jnp.asarray((1 + 0.1 * rng.standard_normal(d)).astype(np.float32))
        be = jnp.asarray((0.1 * rng.standard_normal(d)).astype(np.float32))
        lens = jnp.asarray(np.array([40, 17, 5], np.int32))
        out = mha_layer_block(x, wi, bi, wo, bo, g, be, lens, h, mode, 1e-5)
        ref = _layer_reference(x, wi, bi, wo, bo, g, be, lens, h, mode, 1e-5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    @pytest.mark.parametrize("mode", ["post", "pre"])
    def test_ffn_block(self, mode):
        from speechclip_tpu.kernels.ffn_block import _reference, ffn_block

        b, t, d, f = 3, 40, 48, 96
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
        mk = lambda *s: jnp.asarray((rng.standard_normal(s) * 0.1).astype(np.float32))
        w1, b1, w2, b2 = mk(d, f), mk(f), mk(f, d), mk(d)
        g = jnp.asarray((1 + 0.1 * rng.standard_normal(d)).astype(np.float32))
        be = jnp.asarray((0.1 * rng.standard_normal(d)).astype(np.float32))
        out = ffn_block(x, w1, b1, w2, b2, g, be, mode, 1e-5)
        ref = _reference(x, w1, b1, w2, b2, g, be, mode, 1e-5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    def test_gradients(self):
        from speechclip_tpu.kernels.ffn_block import _reference, ffn_block
        from speechclip_tpu.kernels.mha_block import (
            _layer_reference,
            mha_layer_block,
        )

        b, t, d, h, f = 2, 16, 32, 4, 64
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
        wi, bi, wo, bo = self._mha_params(d, seed=4)
        mk = lambda *s: jnp.asarray((rng.standard_normal(s) * 0.1).astype(np.float32))
        w1, b1, w2, b2 = mk(d, f), mk(f), mk(f, d), mk(d)
        g = jnp.ones((d,), jnp.float32)
        be = jnp.zeros((d,), jnp.float32)
        lens = jnp.asarray(np.array([16, 9], np.int32))

        def full(fn_m, fn_f):
            def loss(x, wi, w1):
                h_ = fn_m(x, wi, bi, wo, bo, g, be, lens, h, "post", 1e-5)
                return jnp.sum(fn_f(h_, w1, b1, w2, b2, g, be, "post", 1e-5) ** 2)
            return loss

        got = jax.grad(full(mha_layer_block, ffn_block), argnums=(0, 1, 2))(x, wi, w1)
        want = jax.grad(full(_layer_reference, _reference), argnums=(0, 1, 2))(x, wi, w1)
        for a, b_ in zip(got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)

    def test_sharded_wrappers(self):
        from speechclip_tpu.kernels.ffn_block import (
            _reference as ffn_ref,
            ffn_block_sharded,
        )
        from speechclip_tpu.kernels.mha_block import (
            _layer_reference,
            mha_layer_block_sharded,
        )
        from speechclip_tpu.parallel import make_mesh

        mesh = make_mesh(model=1)
        b, t, d, h, f = 8, 24, 32, 4, 64
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
        wi, bi, wo, bo = self._mha_params(d, seed=6)
        mk = lambda *s: jnp.asarray((rng.standard_normal(s) * 0.1).astype(np.float32))
        w1, b1, w2, b2 = mk(d, f), mk(f), mk(f, d), mk(d)
        g = jnp.ones((d,), jnp.float32)
        be = jnp.zeros((d,), jnp.float32)
        lens = jnp.asarray(rng.integers(1, t + 1, b).astype(np.int32))
        out = jax.jit(
            lambda x: ffn_block_sharded(
                mha_layer_block_sharded(
                    x, wi, bi, wo, bo, g, be, lens, h, "post", 1e-5, mesh
                ),
                w1, b1, w2, b2, g, be, "post", 1e-5, mesh,
            )
        )(x)
        ref = ffn_ref(
            _layer_reference(x, wi, bi, wo, bo, g, be, lens, h, "post", 1e-5),
            w1, b1, w2, b2, g, be, "post", 1e-5,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


class TestMultichipDispatch:
    """The multi-device kernel branches (mesh registered, device_count > 1)
    never run in the single-chip TPU environment — exercise them on the
    8-device CPU mesh by monkeypatching the platform gate; the kernels run
    in interpret mode per shard."""

    def test_mha_mesh_branch_matches_xla(self, monkeypatch):
        from speechclip_tpu import ops
        from speechclip_tpu.ops import attention as attn_mod
        from speechclip_tpu.parallel import make_mesh

        params = ops.mha_init(jax.random.key(0), 64)
        x = jnp.asarray(
            np.random.default_rng(11)
            .standard_normal((8, 130, 64))
            .astype(np.float32)
        )
        lens = jnp.asarray(
            np.random.default_rng(12).integers(1, 131, 8).astype(np.int32)
        )
        with ops.attention_backend("xla"):
            want, _ = ops.multi_head_attention(
                params, x, x, x, num_heads=8, key_valid_lens=lens
            )
        monkeypatch.setattr(attn_mod, "_on_tpu", lambda: True)
        mesh = make_mesh(model=1)
        attn_mod.set_kernel_mesh(mesh)
        try:
            got, _ = ops.multi_head_attention(
                params, x, x, x, num_heads=8, key_valid_lens=lens
            )
        finally:
            attn_mod.set_kernel_mesh(None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)

    def test_fused_layer_mesh_branch_matches_unfused(self, monkeypatch):
        from speechclip_tpu.models import hubert
        from speechclip_tpu.ops import attention as attn_mod
        from speechclip_tpu.parallel import make_mesh

        cfg = hubert.HubertConfig(
            encoder_layers=1,
            encoder_embed_dim=64,
            encoder_ffn_dim=128,
            encoder_heads=8,
        )
        rng = jax.random.key(0)
        layer = hubert.hubert_init(rng, cfg)["encoder"]["layers"][0]
        x32 = jnp.asarray(
            np.random.default_rng(13)
            .standard_normal((8, 130, 64))
            .astype(np.float32)
        )
        lens = jnp.asarray(
            np.random.default_rng(14).integers(100, 131, 8).astype(np.int32)
        )
        from speechclip_tpu.ops.masking import key_padding_mask

        kpm = key_padding_mask(lens, 130)
        want = hubert.encoder_layer_apply(
            layer, cfg, x32, kpm, None, False, lens
        )
        # bf16 + fake TPU + mesh -> the sharded fused path
        monkeypatch.setattr(attn_mod, "_on_tpu", lambda: True)
        mesh = make_mesh(model=1)
        attn_mod.set_kernel_mesh(mesh)
        try:
            got = hubert.encoder_layer_apply(
                layer, cfg, x32.astype(jnp.bfloat16), kpm, None, False, lens
            )
        finally:
            attn_mod.set_kernel_mesh(None)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want), atol=0.05, rtol=0.05
        )

    @pytest.mark.slow
    def test_dropout_free_training_uses_fused_path_with_exact_grads(
        self, monkeypatch
    ):
        """With every dropout rate 0, encoder_layer_apply takes the fused
        path even in train mode; forward and gradients (custom VJP -> XLA
        recompute) must match the unfused path run at the same dtype.

        Pitfalls this test avoids: batch must divide the 8-device mesh
        (else mesh_plan falls back to XLA and nothing is compared), and the
        loss must not be sum(LN(y)^2) — LayerNorm makes that nearly
        constant, so its true gradient is ~0 and dominated by rounding."""
        from speechclip_tpu.models import hubert
        from speechclip_tpu.ops import attention as attn_mod
        from speechclip_tpu.ops.masking import key_padding_mask
        from speechclip_tpu.parallel import make_mesh

        cfg = hubert.HubertConfig(
            encoder_layers=1,
            encoder_embed_dim=64,
            encoder_ffn_dim=128,
            encoder_heads=8,
            dropout=0.0,
            attention_dropout=0.0,
            activation_dropout=0.0,
        )
        layer = hubert.hubert_init(jax.random.key(0), cfg)["encoder"]["layers"][0]
        rng_np = np.random.default_rng(21)
        x = jnp.asarray(
            rng_np.standard_normal((8, 130, 64)).astype(np.float32)
        ).astype(jnp.bfloat16)
        proj = jnp.asarray(rng_np.standard_normal(64).astype(np.float32))
        lens = jnp.asarray(
            rng_np.integers(64, 131, 8).astype(np.int32)
        )
        kpm = key_padding_mask(lens, 130)

        # the fused path must actually engage at these shapes
        monkeypatch.setattr(attn_mod, "_on_tpu", lambda: True)
        attn_mod.set_kernel_mesh(make_mesh(model=1))
        try:
            assert (
                hubert._fused_encoder_layer(layer, cfg, x, lens) is not None
            ), "fused path did not engage; test shapes are wrong"

            def loss(xv, fused):
                monkeypatch.setattr(
                    attn_mod, "_on_tpu", (lambda: True) if fused else (lambda: False)
                )
                out = hubert.encoder_layer_apply(
                    layer, cfg, xv, kpm, None, True, lens
                )
                return jnp.sum(out.astype(jnp.float32) @ proj)

            o_f = loss(x, True)
            o_x = loss(x, False)
            np.testing.assert_allclose(float(o_f), float(o_x), rtol=3e-3)
            g_f = jax.grad(lambda x: loss(x, True))(x)
            g_x = jax.grad(lambda x: loss(x, False))(x)
        finally:
            attn_mod.set_kernel_mesh(None)
        a = np.asarray(g_f, np.float32).ravel()
        b = np.asarray(g_x, np.float32).ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
        ratio = float(np.linalg.norm(a) / (np.linalg.norm(b) + 1e-9))
        # bf16 forward rounding differs between the kernel and XLA paths
        # and is amplified through the LN/softmax backward — compare
        # direction and magnitude, not element-wise bits
        assert cos > 0.999 and 0.99 < ratio < 1.01, (cos, ratio)


class TestMeshPlan:
    """Unit pins for kernels/_dispatch.mesh_plan's dispatch ladder —
    especially the round-5 change: a registered SUB-mesh is trusted
    (registration is scoped, ops.attention.kernel_mesh), closing the
    silent XLA fallback that retained the replicated-pos-conv gather
    (VERDICT r4 weak #5; e2e pin in tests/test_scaling_hlo.py)."""

    def _mesh(self, n_data, n_model=1):
        from speechclip_tpu.parallel import make_mesh

        return make_mesh(
            devices=jax.devices()[: n_data * n_model],
            data=n_data,
            model=n_model,
        )

    def test_no_mesh_multi_device_falls_back_to_xla(self):
        from speechclip_tpu.kernels._dispatch import mesh_plan

        assert jax.device_count() > 1  # conftest's virtual 8-device CPU
        assert mesh_plan(None, 16, lambda b: True) is None

    def test_full_mesh_shards(self):
        from speechclip_tpu.kernels._dispatch import mesh_plan

        mesh = self._mesh(8)
        assert mesh_plan(mesh, 16, lambda b: True) is mesh
        # eligibility is checked at the PER-SHARD batch
        assert mesh_plan(mesh, 16, lambda b: b == 2) is mesh
        assert mesh_plan(mesh, 16, lambda b: False) is None

    def test_sub_mesh_is_trusted(self):
        from speechclip_tpu.kernels._dispatch import mesh_plan

        mesh = self._mesh(4)  # 4 of 8 devices
        assert mesh_plan(mesh, 16, lambda b: b == 4) is mesh

    def test_one_device_sub_mesh_is_single(self):
        from speechclip_tpu.kernels._dispatch import mesh_plan

        assert mesh_plan(self._mesh(1), 16, lambda b: b == 16) == "single"

    def test_tp_mesh_falls_back_to_xla(self):
        from speechclip_tpu.kernels._dispatch import mesh_plan

        assert mesh_plan(self._mesh(4, 2), 16, lambda b: True) is None

    def test_indivisible_batch_falls_back_to_xla(self):
        from speechclip_tpu.kernels._dispatch import mesh_plan

        assert mesh_plan(self._mesh(8), 12, lambda b: True) is None
