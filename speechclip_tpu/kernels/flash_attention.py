"""Pallas flash attention for TPU.

The hot op of every tower (HuBERT encoder, CLIP ViT, CLIP text, branch
transformers — SURVEY.md §2.7). Online-softmax tiling keeps the (L, S)
logits matrix out of HBM: per (batch*head, q-block) grid cell, the kernel
streams k/v blocks through VMEM, maintaining running max/denominator.

Scope: forward kernel with a custom VJP whose backward recomputes standard
attention in XLA — sequence lengths here are short (<=512 frames for 6.4 s
audio; 50-257 patches for ViT), so backward memory is not the constraint,
while the forward is the throughput path (frozen towers, inference,
no_grad training forwards).

Masking: key-padding lengths (B,) and/or causal flag — the two patterns the
framework uses — instead of a materialized bias tensor.

Head dims of 64 (HuBERT/CLIP) are zero-padded to the 128-lane tile; padded
lanes contribute nothing to q @ k^T and are sliced off the output.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._sdpa_ref import _NEG_INF, masked_sdpa

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128


def _flash_kernel(
    lens_ref,  # SMEM (B,) int32 valid key lengths (or None)
    q_ref,  # (1, block_q, d)
    k_ref,  # (1, S, d)
    v_ref,  # (1, S, d)
    o_ref,  # (1, block_q, d)
    *,
    scale: float,
    block_k: int,
    seq_len: int,
    causal: bool,
    has_lens: bool,
):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    block_q = q_ref.shape[1]
    d = q_ref.shape[2]

    q = q_ref[0].astype(jnp.float32) * scale  # (block_q, d)

    num_k_blocks = pl.cdiv(seq_len, block_k)

    def body(ki, carry):
        acc, m_prev, l_prev = carry
        k_start = ki * block_k
        k_blk = k_ref[0, pl.ds(k_start, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(k_start, block_k), :].astype(jnp.float32)

        s = jax.lax.dot_general(
            q,
            k_blk,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, block_k)

        col = k_start + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        mask = col < seq_len
        if has_lens:
            valid_len = lens_ref[bh]
            mask = jnp.logical_and(mask, col < valid_len)
        if causal:
            row = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            mask = jnp.logical_and(mask, col <= row)
        s = jnp.where(mask, s, _NEG_INF)

        m_cur = jnp.max(s, axis=-1)  # (block_q,)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, None])
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p,
            v_blk,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    if causal:
        # blocks fully above the diagonal contribute nothing
        last_block = jnp.minimum(
            num_k_blocks, (qi + 1) * block_q // block_k + 1
        )
    else:
        last_block = num_k_blocks

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q,), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, last_block, body, (acc0, m0, l0))

    out = acc / jnp.maximum(l, 1e-30)[:, None]
    o_ref[0] = out.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_forward(
    q: jnp.ndarray,  # (B, H, L, Dh)
    k: jnp.ndarray,
    v: jnp.ndarray,
    lens: Optional[jnp.ndarray],  # (B,) valid key lengths
    causal: bool,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    b, h, l, d = q.shape
    s = k.shape[2]
    scale = 1.0 / math.sqrt(d)

    d_pad = _round_up(d, 128)
    l_pad = _round_up(l, block_q)
    s_pad = _round_up(s, block_k)

    def pad(x, target_seq):
        return jnp.pad(
            x,
            (
                (0, 0),
                (0, 0),
                (0, target_seq - x.shape[2]),
                (0, d_pad - d),
            ),
        )

    qp = pad(q, l_pad).reshape(b * h, l_pad, d_pad)
    kp = pad(k, s_pad).reshape(b * h, s_pad, d_pad)
    vp = pad(v, s_pad).reshape(b * h, s_pad, d_pad)

    has_lens = lens is not None
    if has_lens:
        lens_arg = jnp.repeat(lens.astype(jnp.int32), h)  # (B*H,)
    else:
        lens_arg = jnp.zeros((b * h,), jnp.int32)

    grid = (b * h, l_pad // block_q)
    kernel = functools.partial(
        _flash_kernel,
        scale=scale,
        block_k=block_k,
        seq_len=s,
        causal=causal,
        has_lens=has_lens,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, block_q, d_pad), lambda bh, qi, lens: (bh, qi, 0)
                ),
                pl.BlockSpec((1, s_pad, d_pad), lambda bh, qi, lens: (bh, 0, 0)),
                pl.BlockSpec((1, s_pad, d_pad), lambda bh, qi, lens: (bh, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, d_pad), lambda bh, qi, lens: (bh, qi, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, l_pad, d_pad), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * l * s * d,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=b * h * l * s,
        ),
        interpret=interpret,
    )(lens_arg, qp, kp, vp)
    return out.reshape(b, h, l_pad, d_pad)[:, :, :l, :d]


# XLA reference path (used by the backward recompute) — the shared single
# source of truth; see kernels/_sdpa_ref.py for why it must not be copied
_reference_attention = masked_sdpa


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_attention(q, k, v, lens, causal=False):
    """Flash attention: (B, H, L, Dh) x3 [+ lens (B,)] -> (B, H, L, Dh)."""
    return _flash_forward(q, k, v, lens, causal)


def _fwd(q, k, v, lens, causal):
    return _flash_forward(q, k, v, lens, causal), (q, k, v, lens)


def _bwd(causal, residuals, g):
    q, k, v, lens = residuals
    _, vjp = jax.vjp(
        lambda q, k, v: _reference_attention(q, k, v, lens, causal), q, k, v
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention.defvjp(_fwd, _bwd)
