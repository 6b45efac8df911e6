"""Numerical parity tests for the ops layer against torch oracles."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from speechclip_tpu import ops
from tests import torch_ref


def rand(*shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32)


class TestMasking:
    def test_key_padding_mask(self):
        lens = jnp.array([2, 4, 0])
        m = ops.key_padding_mask(lens, 4)
        expected = np.array(
            [
                [False, False, True, True],
                [False, False, False, False],
                [True, True, True, True],
            ]
        )
        np.testing.assert_array_equal(np.asarray(m), expected)

    def test_feature_lengths_bankers_rounding(self):
        # round(l/320): torch/python use half-to-even; 160/320=0.5 -> 0
        lens = jnp.array([160, 480, 320, 16000])
        out = ops.hubert_feature_lengths(lens, 320, 100)
        np.testing.assert_array_equal(np.asarray(out), [0, 2, 1, 50])

    def test_conv_frame_valid_lengths(self):
        # 3200 samples -> 9 frames (fairseq: c=355, ceil semantics)
        wav_lens = jnp.array([3200, 1600, 355, 354])
        out = ops.conv_frame_valid_lengths(wav_lens, 3200, 9)
        c = 3200 // 9
        expected = [min(-(-min(l, c * 9) // c), 9) for l in [3200, 1600, 355, 354]]
        np.testing.assert_array_equal(np.asarray(out), expected)


class TestAttentionParity:
    @pytest.mark.parametrize("nhead", [1, 4])
    def test_mha_vs_torch(self, nhead):
        d = 32
        x = rand(3, 7, d, seed=1)
        lens = np.array([7, 5, 3])
        mha = torch.nn.MultiheadAttention(d, nhead, dropout=0.0, batch_first=True)
        mha.eval()
        kpm_t = torch.zeros(3, 7, dtype=torch.bool)
        for i, l in enumerate(lens):
            kpm_t[i, l:] = True
        with torch.no_grad():
            out_t, w_t = mha(
                torch.tensor(x),
                torch.tensor(x),
                torch.tensor(x),
                key_padding_mask=kpm_t,
                average_attn_weights=False,
            )
        params = torch_ref.torch_mha_params_to_jax(mha, torch.nn.LayerNorm(d))["attn"]
        out_j, w_j = ops.multi_head_attention(
            jax.tree.map(jnp.asarray, params),
            jnp.asarray(x),
            jnp.asarray(x),
            jnp.asarray(x),
            num_heads=nhead,
            key_padding_mask=ops.key_padding_mask(jnp.asarray(lens), 7),
            need_weights=True,
            average_attn_weights=False,
        )
        np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(w_j), w_t.numpy(), atol=2e-5)

    def test_bf16_buffer_path_close_to_f32(self):
        """The bf16 no-weights fast path (bf16 HBM score/weight buffers, f32
        softmax math) must track the f32 reference within bf16 rounding — it
        is the hot path of the HuBERT encode in precision-16 mode."""
        d, nhead, b, t = 64, 4, 3, 17
        x = rand(b, t, d, seed=31)
        lens = np.array([17, 11, 5])
        params = {
            "in_proj": {
                "w": jnp.asarray(rand(d, 3 * d, seed=32)) * 0.1,
                "b": jnp.zeros((3 * d,)),
            },
            "out_proj": {
                "w": jnp.asarray(rand(d, d, seed=33)) * 0.1,
                "b": jnp.zeros((d,)),
            },
        }
        kpm = ops.key_padding_mask(jnp.asarray(lens), t)
        out32, _ = ops.multi_head_attention(
            params, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
            num_heads=nhead, key_padding_mask=kpm,
        )
        xb = jnp.asarray(x).astype(jnp.bfloat16)
        pb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
        out16, w16 = ops.multi_head_attention(
            pb, xb, xb, xb, num_heads=nhead, key_padding_mask=kpm
        )
        assert w16 is None
        assert out16.dtype == jnp.bfloat16
        err = np.abs(np.asarray(out16, np.float32) - np.asarray(out32))
        scale = np.abs(np.asarray(out32)).max()
        assert err.max() / scale < 0.03, err.max() / scale

    @pytest.mark.parametrize("norm_first", [False, True])
    def test_transformer_encoder_vs_torch(self, norm_first):
        d, n_layers = 32, 2
        torch.manual_seed(0)
        enc = torch_ref.make_torch_encoder(
            n_layers=n_layers, d_model=d, nhead=4, dim_feedforward=64, norm_first=norm_first
        )
        enc.eval()
        x = rand(2, 9, d, seed=2)
        lens = np.array([9, 4])
        kpm_t = torch.zeros(2, 9, dtype=torch.bool)
        kpm_t[1, 4:] = True
        with torch.no_grad():
            out_t = enc(torch.tensor(x), src_key_padding_mask=kpm_t)
        params = jax.tree.map(
            jnp.asarray, torch_ref.torch_encoder_params_to_jax(enc)
        )
        out_j, hiddens = ops.transformer_encoder_apply(
            params,
            jnp.asarray(x),
            nhead=4,
            key_padding_mask=ops.key_padding_mask(jnp.asarray(lens), 9),
            norm_first=norm_first,
            return_hidden_states=True,
        )
        # padded positions can diverge (they attend to garbage in both
        # frameworks but torch NaN-handling differs); compare valid region
        np.testing.assert_allclose(
            np.asarray(out_j)[0], out_t.numpy()[0], atol=5e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_j)[1, :4], out_t.numpy()[1, :4], atol=5e-5
        )
        assert len(hiddens) == n_layers + 1

    def test_mha_and_norm_vs_torch(self):
        d = 32
        torch.manual_seed(1)
        mha, norm = torch_ref.make_torch_mha_and_norm(d_model=d, nhead=1)
        mha.eval()
        x = rand(2, 6, d, seed=3)
        lens = np.array([6, 3])
        kpm_t = torch.zeros(2, 6, dtype=torch.bool)
        kpm_t[1, 3:] = True
        with torch.no_grad():
            attn_out, _ = mha(
                torch.tensor(x), torch.tensor(x), torch.tensor(x), key_padding_mask=kpm_t
            )
            out_t = norm(attn_out + torch.tensor(x))
        params = jax.tree.map(jnp.asarray, torch_ref.torch_mha_params_to_jax(mha, norm))
        out_j, _ = ops.mha_and_norm_apply(
            params,
            jnp.asarray(x),
            nhead=1,
            key_padding_mask=ops.key_padding_mask(jnp.asarray(lens), 6),
        )
        np.testing.assert_allclose(np.asarray(out_j)[0], out_t.numpy()[0], atol=5e-5)
        np.testing.assert_allclose(
            np.asarray(out_j)[1, :3], out_t.numpy()[1, :3], atol=5e-5
        )


class TestLossParity:
    def test_masked_contrastive_matches_torch(self):
        n, d = 16, 8
        a = rand(n, d, seed=4)
        b = rand(n, d, seed=5)
        a /= np.linalg.norm(a, axis=-1, keepdims=True)
        b /= np.linalg.norm(b, axis=-1, keepdims=True)
        ids = np.array([i // 2 for i in range(n)])  # duplicated pair ids
        loss_t = torch_ref.masked_contrastive_loss_torch(
            torch.tensor(a), torch.tensor(b), torch.tensor(ids)
        )
        loss_j = ops.masked_contrastive_loss(
            {}, jnp.asarray(a), jnp.asarray(b), jnp.asarray(ids)
        )
        np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)

    def test_margin_and_dcl(self):
        n, d = 8, 4
        a = rand(n, d, seed=6)
        b = rand(n, d, seed=7)
        a /= np.linalg.norm(a, axis=-1, keepdims=True)
        b /= np.linalg.norm(b, axis=-1, keepdims=True)
        ids = np.arange(n)
        for margin, dcl in [(0.1, False), (0.0, True)]:
            loss_t = torch_ref.masked_contrastive_loss_torch(
                torch.tensor(a), torch.tensor(b), torch.tensor(ids),
                margin=margin, dcl=dcl,
            )
            loss_j = ops.masked_contrastive_loss(
                {}, jnp.asarray(a), jnp.asarray(b), jnp.asarray(ids),
                margin=margin, dcl=dcl,
            )
            np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)

    def test_trainable_temperature(self):
        params = ops.contrastive_temp_init(0.07, True)
        temp = ops.contrastive_temperature(params, 0.07, True)
        np.testing.assert_allclose(float(temp), 1 / 0.07, rtol=1e-6)

    def test_sharded_loss_matches_global(self):
        from jax.sharding import Mesh, PartitionSpec as P
        from jax import shard_map

        n, d = 16, 8
        a = rand(n, d, seed=8)
        b = rand(n, d, seed=9)
        ids = np.repeat(np.arange(n // 2), 2)
        global_loss = ops.masked_contrastive_loss(
            {}, jnp.asarray(a), jnp.asarray(b), jnp.asarray(ids)
        )
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        fn = shard_map(
            lambda fa, fb, i: ops.masked_contrastive_loss_sharded(
                {}, fa, fb, i, axis_name="data"
            ),
            mesh=mesh,
            in_specs=(P("data"), P("data"), P("data")),
            out_specs=P(),
            check_vma=False,
        )
        sharded_loss = fn(jnp.asarray(a), jnp.asarray(b), jnp.asarray(ids))
        np.testing.assert_allclose(
            float(sharded_loss), float(global_loss), rtol=1e-5
        )


class TestVQParity:
    @pytest.mark.parametrize("training", [False, True])
    def test_vq_matches_torch(self, training):
        b, t, v = 4, 8, 32
        x = rand(b, t, v, seed=10)
        ref = torch_ref.simple_vq_torch(
            torch.tensor(x), temp=0.1, training=training, hard=True
        )
        out = ops.vq_apply(
            {}, jnp.asarray(x), temp_spec="fixed=0.1", train=training
        )
        np.testing.assert_allclose(
            np.asarray(out["subword_prob"]),
            ref["subword_prob"].detach().numpy(),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            float(out["code_perplexity"]), float(ref["code_perplexity"]), rtol=1e-4
        )
        np.testing.assert_allclose(
            float(out["prob_perplexity"]), float(ref["prob_perplexity"]), rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out["ent_per_t"]), ref["ent_per_t"].numpy(), atol=1e-4
        )
        np.testing.assert_array_equal(
            np.asarray(out["targets"]), ref["targets"].numpy()
        )

    def test_special_tokens_never_selected(self):
        x = np.full((2, 3, 16), 5.0, np.float32)
        out = ops.vq_apply({}, jnp.asarray(x), temp_spec="fixed=0.1")
        assert not np.any(np.isin(np.asarray(out["targets"]), [0, 2, 3]))

    def test_temp_spec_parsing(self):
        assert ops.parse_temp_spec("fixed=0.1") == ("fixed", (0.1,))
        assert ops.parse_temp_spec("learnable=0.5") == ("learnable", (0.5,))
        assert ops.parse_temp_spec("(2.0, 0.5, 0.999995)") == (
            "scheduled",
            (2.0, 0.5, 0.999995),
        )
        params = ops.vq_init("learnable=0.3")
        np.testing.assert_allclose(np.asarray(params["curr_temp"]), [0.3])

    def test_straight_through_gradient(self):
        x = jnp.asarray(rand(2, 4, 16, seed=11))

        def loss_fn(x):
            out = ops.vq_apply({}, x, temp_spec="fixed=0.1", train=True)
            return jnp.sum(out["subword_prob"] ** 2)

        g = jax.grad(loss_fn)(x)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


class TestKwBN:
    def test_each_kw_parallel_matches_torch(self):
        b, k, d = 8, 4, 16
        x = rand(b, k, d, seed=12)
        emb = rand(100, d, seed=13)
        init_bias = emb.mean(0)
        init_scale = emb.std(0, ddof=1)
        bn_t = torch.nn.BatchNorm1d(d * k)
        bn_t.weight.data.copy_(torch.tensor(init_scale).repeat(k))
        bn_t.bias.data.copy_(torch.tensor(init_bias).repeat(k))
        bn_t.train()
        xt = torch.tensor(x).permute(0, 2, 1).reshape(b, -1)
        out_t = bn_t(xt).reshape(b, d, k).permute(0, 2, 1)

        params, state = ops.kw_bn_init(
            k, d, "eachKw", jnp.asarray(init_bias), jnp.asarray(init_scale),
            parallel=True,
        )
        out_j, new_state = ops.kw_bn_apply(
            params, state, jnp.asarray(x),
            batchnorm_type="eachKw", parallel=True, train=True,
        )
        np.testing.assert_allclose(
            np.asarray(out_j), out_t.detach().numpy(), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(new_state["mean"]), bn_t.running_mean.numpy(), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(new_state["var"]), bn_t.running_var.numpy(), atol=1e-4
        )

    def test_each_kw_separate(self):
        b, k, d = 8, 3, 8
        x = rand(b, k, d, seed=14)
        emb = rand(50, d, seed=15)
        bns = [torch.nn.BatchNorm1d(d) for _ in range(k)]
        for bn in bns:
            bn.weight.data.copy_(torch.tensor(emb.std(0, ddof=1)))
            bn.bias.data.copy_(torch.tensor(emb.mean(0)))
            bn.train()
        out_t = torch.stack(
            [bns[i](torch.tensor(x)[:, i]) for i in range(k)], dim=1
        )
        params, state = ops.kw_bn_init(
            k, d, "eachKw", jnp.asarray(emb.mean(0)),
            jnp.asarray(emb.std(0, ddof=1)),
        )
        out_j, _ = ops.kw_bn_apply(
            params, state, jnp.asarray(x), batchnorm_type="eachKw", train=True
        )
        np.testing.assert_allclose(np.asarray(out_j), out_t.detach().numpy(), atol=1e-4)

    def test_same_mode_eval_uses_running_stats(self):
        b, k, d = 4, 3, 8
        x = rand(b, k, d, seed=16)
        params, state = ops.kw_bn_init(
            k, d, "same", jnp.zeros(d), jnp.ones(d)
        )
        out, new_state = ops.kw_bn_apply(
            params, state, jnp.asarray(x), batchnorm_type="same", train=False
        )
        # eval with fresh state (mean 0, var 1) == identity given unit scale
        np.testing.assert_allclose(np.asarray(out), x, atol=1e-4)
        assert new_state is state

    def test_replica_groups_match_torch_dp(self):
        """replica_groups=G must reproduce literal torch-DataParallel BN:
        each contiguous sub-batch normalized with its own stats; persisted
        running stats come from replica 0 only (non-master buffer updates
        are discarded, torch/nn/parallel/data_parallel replicate semantics).
        Reference trains with strategy=dp (config/.../spchclp_p.yaml:127)."""
        import copy

        b, k, d, g = 8, 4, 16, 2
        x = rand(b, k, d, seed=21)
        emb = rand(100, d, seed=22)
        init_bias, init_scale = emb.mean(0), emb.std(0, ddof=1)

        bn_master = torch.nn.BatchNorm1d(d * k)
        bn_master.weight.data.copy_(torch.tensor(init_scale).repeat(k))
        bn_master.bias.data.copy_(torch.tensor(init_bias).repeat(k))
        xt = torch.tensor(x).permute(0, 2, 1).reshape(b, -1)
        outs = []
        for r in range(g):
            bn_r = bn_master if r == 0 else copy.deepcopy(bn_master)
            bn_r.train()
            outs.append(bn_r(xt[r * (b // g) : (r + 1) * (b // g)]))
        out_t = torch.cat(outs).reshape(b, d, k).permute(0, 2, 1)

        params, state = ops.kw_bn_init(
            k, d, "eachKw", jnp.asarray(init_bias), jnp.asarray(init_scale),
            parallel=True,
        )
        out_j, new_state = ops.kw_bn_apply(
            params, state, jnp.asarray(x),
            batchnorm_type="eachKw", parallel=True, train=True,
            replica_groups=g,
        )
        np.testing.assert_allclose(
            np.asarray(out_j), out_t.detach().numpy(), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(new_state["mean"]), bn_master.running_mean.numpy(),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(new_state["var"]), bn_master.running_var.numpy(),
            atol=1e-4,
        )

    def test_replica_groups_same_mode_validates_samples(self):
        """'same' mode flattens (B,K)->B*K rows; the divisibility check must
        run on B (samples), not rows — bsz=6,K=2,G=4 has 12%4==0 rows but
        groups would straddle sample boundaries."""
        b, k, d = 6, 2, 8
        x = rand(b, k, d, seed=41)
        params, state = ops.kw_bn_init(k, d, "same", jnp.zeros(d), jnp.ones(d))
        with pytest.raises(ValueError, match="batch 6"):
            ops.kw_bn_apply(
                params, state, jnp.asarray(x), batchnorm_type="same",
                train=True, replica_groups=4,
            )

    def test_replica_groups_masked_empty_group_no_nan(self):
        """A fully-padded replica group must not poison stats with NaN."""
        b, k, d, g = 4, 3, 8, 2
        x = rand(b, k, d, seed=42)
        params, state = ops.kw_bn_init(k, d, "same", jnp.zeros(d), jnp.ones(d))
        seq_lens = jnp.asarray(np.array([0, 0, 3, 2]))  # group 0 all-padded
        out, new_state = ops.kw_bn_apply(
            params, state, jnp.asarray(x), batchnorm_type="same",
            train=True, seq_lens=seq_lens, replica_groups=g,
        )
        assert np.isfinite(np.asarray(out)).all()
        assert np.isfinite(np.asarray(new_state["mean"])).all()
        assert np.isfinite(np.asarray(new_state["var"])).all()
        # fully-padded rows pass through unchanged (reference kw_bn semantics)
        np.testing.assert_allclose(np.asarray(out)[0], x[0], atol=1e-6)

    def test_replica_groups_each_kw_separate(self):
        import copy

        b, k, d, g = 8, 3, 8, 4
        x = rand(b, k, d, seed=23)
        emb = rand(50, d, seed=24)
        masters = [torch.nn.BatchNorm1d(d) for _ in range(k)]
        for bn in masters:
            bn.weight.data.copy_(torch.tensor(emb.std(0, ddof=1)))
            bn.bias.data.copy_(torch.tensor(emb.mean(0)))
        outs = []
        for r in range(g):
            sub = torch.tensor(x)[r * (b // g) : (r + 1) * (b // g)]
            cols = []
            for i in range(k):
                bn_r = masters[i] if r == 0 else copy.deepcopy(masters[i])
                bn_r.train()
                cols.append(bn_r(sub[:, i]))
            outs.append(torch.stack(cols, dim=1))
        out_t = torch.cat(outs)

        params, state = ops.kw_bn_init(
            k, d, "eachKw", jnp.asarray(emb.mean(0)),
            jnp.asarray(emb.std(0, ddof=1)),
        )
        out_j, new_state = ops.kw_bn_apply(
            params, state, jnp.asarray(x), batchnorm_type="eachKw",
            train=True, replica_groups=g,
        )
        np.testing.assert_allclose(
            np.asarray(out_j), out_t.detach().numpy(), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(new_state["mean"]),
            np.stack([bn.running_mean.numpy() for bn in masters]),
            atol=1e-5,
        )


class TestRetrieval:
    def test_recall_matches_bruteforce(self):
        rng = np.random.default_rng(17)
        na, nb = 40, 10
        gold = rng.integers(0, nb, na)
        cand_ids = np.arange(nb)
        scores = rng.standard_normal((na, nb)).astype(np.float32)
        out = ops.recall_at_k(
            jnp.asarray(scores), jnp.asarray(gold), jnp.asarray(cand_ids), [1, 5]
        )
        for k in [1, 5]:
            hits = 0
            for i in range(na):
                order = np.argsort(-scores[i])
                if gold[i] in cand_ids[order[:k]]:
                    hits += 1
            np.testing.assert_allclose(out[f"recall@{k}"], hits / na * 100, atol=1e-4)

    def test_mutual_retrieval_shapes(self):
        na, nb = 20, 5
        rng = np.random.default_rng(18)
        s = rng.standard_normal((na, nb)).astype(np.float32)
        ab = rng.integers(0, nb, na)
        ba = np.arange(nb)
        r_ab, r_ba, r_mean = ops.mutual_retrieval(
            jnp.asarray(s), jnp.asarray(s.T), jnp.asarray(ab), jnp.asarray(ba), [1, 5, 10]
        )
        assert set(r_mean) == {"recall@1", "recall@5", "recall@10"}
        for k in r_mean:
            np.testing.assert_allclose(r_mean[k], (r_ab[k] + r_ba[k]) / 2)


class TestWeightedSumAndMLP:
    def test_weighted_sum_uniform_at_init(self):
        params = ops.weighted_sum_init(4)
        xs = [jnp.full((2, 3, 8), float(i)) for i in range(4)]
        out = ops.weighted_sum_apply(params, xs)
        np.testing.assert_allclose(np.asarray(out), np.full((2, 3, 8), 1.5), atol=1e-6)

    def test_weighted_sum_unrolled_matches_stacked(self):
        """The tuple path (unrolled multiply-add, no HBM stack) must equal
        the ndarray stacked-einsum path."""
        rng_np = np.random.default_rng(4)
        params = {"weights": jnp.asarray(rng_np.standard_normal(5).astype(np.float32))}
        xs = [
            jnp.asarray(rng_np.standard_normal((3, 7, 16)).astype(np.float32))
            for _ in range(5)
        ]
        out_unrolled = ops.weighted_sum_apply(params, xs)
        out_stacked = ops.weighted_sum_apply(params, jnp.stack(xs, 0))
        np.testing.assert_allclose(
            np.asarray(out_unrolled), np.asarray(out_stacked), atol=2e-6
        )

    def test_mlp_matches_torch(self):
        units = [16, 32, 8]
        torch.manual_seed(2)
        layers = []
        seq = []
        for u0, u1 in zip(units[:-1], units[1:]):
            lin = torch.nn.Linear(u0, u1)
            layers.append(lin)
            seq += [lin, torch.nn.ReLU(), torch.nn.Dropout(0.0)]
        seq = seq[:-2]
        model = torch.nn.Sequential(*seq)
        model.eval()
        x = rand(5, 16, seed=19)
        with torch.no_grad():
            out_t = model(torch.tensor(x))
        params = {
            "layers": [
                {"w": jnp.asarray(l.weight.detach().numpy().T), "b": jnp.asarray(l.bias.detach().numpy())}
                for l in layers
            ]
        }
        out_j = ops.mlp_apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=1e-5)


class TestPooling:
    def test_mean_pooling_masked(self):
        x = rand(2, 5, 4, seed=20)
        lens = np.array([5, 2])
        params = ops.mean_pooling_init(jax.random.key(0))
        out = ops.mean_pooling_apply(params, jnp.asarray(x), jnp.asarray(lens))
        np.testing.assert_allclose(np.asarray(out)[0], x[0].mean(0), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out)[1], x[1, :2].mean(0), atol=1e-6)

    def test_attentive_pooling_shapes(self):
        pa, pb = 6, 6
        params = ops.attentive_pooling_init(jax.random.key(1), pa, pb)
        a = jnp.asarray(rand(3, pa, 7, seed=21))
        b = jnp.asarray(rand(3, pb, 5, seed=22))
        msk = ops.attentive_pooling_mask(jnp.array([7, 4, 2]), None, 7, 5)
        out_a, out_b = ops.attentive_pooling_apply(params, a, b, msk)
        assert out_a.shape == (3, pa) and out_b.shape == (3, pb)
        out_a2, out_b2 = ops.attentive_pooling_batch_apply(params, a, b, msk)
        assert out_a2.shape == (3, 3, pa) and out_b2.shape == (3, 3, pb)


class TestSchedules:
    def test_linear_warmup_decay(self):
        sched = ops.linear_warmup_decay_schedule(1e-4, warmup=10, max_step=100, final_lr=1e-8)
        assert float(sched(0)) == pytest.approx(1e-5)
        assert float(sched(9)) == pytest.approx(1e-4)
        assert float(sched(99)) == pytest.approx(1e-8, rel=1e-2)

    def test_noam(self):
        sched = ops.noam_schedule(1.0, warmup=10)
        assert float(sched(4)) == pytest.approx(0.5)
        assert float(sched(39)) == pytest.approx((10 / 40) ** 0.5)
