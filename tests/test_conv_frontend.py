"""Fused conv-chain kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from speechclip_tpu.kernels.conv_frontend import (
    fused_conv_chain,
    reference_conv_chain,
    window_for,
)


def make_chain(kernels, c=16, seed=0, scale=0.25):
    rng = np.random.default_rng(seed)
    return [
        jnp.asarray(rng.standard_normal((k, c, c)).astype(np.float32) * scale)
        for k in kernels
    ]


class TestFusedConvChain:
    @pytest.mark.parametrize(
        "kernels,t,blk",
        [
            ((3, 3, 2), 1300, 32),
            ((3, 3, 3, 3, 2, 2), 2100, 16),  # the HuBERT conv1..6 shape
            ((2, 2), 640, 40),
        ],
    )
    def test_matches_reference_f32(self, kernels, t, blk):
        weights = make_chain(kernels)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, t, 16)).astype(np.float32))
        ref = reference_conv_chain(x, weights, kernels)
        out = fused_conv_chain(x, weights, kernels, out_block=blk)
        assert out.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-4
        )

    def test_bf16_close(self):
        kernels = (3, 3, 2)
        weights = make_chain(kernels)
        rng = np.random.default_rng(2)
        x = jnp.asarray(
            rng.standard_normal((1, 900, 16)).astype(np.float32)
        ).astype(jnp.bfloat16)
        ref = np.asarray(reference_conv_chain(x, weights, kernels), np.float32)
        out = np.asarray(
            fused_conv_chain(x, weights, kernels, out_block=16), np.float32
        )
        scale = np.abs(ref).max()
        assert np.abs(out - ref).max() < 0.02 * max(scale, 1.0)

    def test_window_arithmetic(self):
        # 6-layer stride-2 chain: receptive window for one output frame
        assert window_for(1, (3, 3, 3, 3, 2, 2)) == 80  # 79 rounded to even
        # window grows by total_stride per extra output frame
        assert window_for(2, (3, 3, 3, 3, 2, 2)) - window_for(
            1, (3, 3, 3, 3, 2, 2)
        ) == 64

    def test_non_multiple_output_length(self):
        """T_out not divisible by out_block: padded blocks are sliced off."""
        kernels = (3, 2)
        weights = make_chain(kernels)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((1, 413, 16)).astype(np.float32))
        ref = reference_conv_chain(x, weights, kernels)
        out = fused_conv_chain(x, weights, kernels, out_block=32)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
