"""Fused FFN half-layer (Pallas TPU): fc1 -> GELU -> fc2 with the residual
and LayerNorm folded in.

Companion to kernels/mha_block.py — together they cover one full HuBERT
encoder layer (reference fairseq TransformerSentenceEncoderLayer;
models/hubert.py encoder_layer_apply) in two pallas calls. The win here is
HBM traffic: the (B, T, F) fc1 activation (F = 4D) never leaves VMEM, and
the residual + LN reuse the x block the cell already holds. Per cell
(one batch element): fc1 (T,D)@(D,F), GELU, fc2 (T,F)@(F,D), residual,
row LayerNorm. Weights (D*F*2 bf16 ~9.4 MB at base dims) are VMEM-resident
across the grid via constant index maps.

GELU matches ops.basic.gelu exactly: tanh approximation for bf16 (the
production TPU dtype), exact erf for f32 (torch-parity path; erf only
lowers in interpret mode, so TPU callers must be bf16 — enforced by
ffn_eligible).

ln_mode "post": LN(x + ffn(x)) — fairseq post-norm (HuBERT-base).
ln_mode "pre":  x + ffn(LN(x)) — layer_norm_first (HuBERT-large).
ln_mode "none": plain fc2(gelu(fc1(x))).

Backward: custom VJP recomputes the XLA chain (see mha_block.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


from .mha_block import _ln_ref, _ln_rows

_VMEM_BUDGET = 16 * 1024 * 1024


def _kernel(
    x_ref,  # (1, T, D)
    w1_ref,  # (D, F) resident
    b1_ref,  # (1, F)
    w2_ref,  # (F, D) resident
    b2_ref,  # (1, D)
    lng_ref,  # (1, D)
    lnb_ref,  # (1, D)
    o_ref,  # (1, T, D)
    *,
    ln_mode: str,
    eps: float,
):
    x = x_ref[0]
    if ln_mode == "pre":
        h_in = _ln_rows(x.astype(jnp.float32), lng_ref, lnb_ref, eps).astype(
            x.dtype
        )
    else:
        h_in = x
    mid = (
        jax.lax.dot_general(
            h_in, w1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b1_ref[0].astype(jnp.float32)[None, :]
    ).astype(x.dtype)  # (T, F) — never leaves VMEM
    mid = jax.nn.gelu(mid, approximate=(x.dtype == jnp.bfloat16))
    out32 = (
        jax.lax.dot_general(
            mid, w2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b2_ref[0].astype(jnp.float32)[None, :]
    )
    if ln_mode == "post":
        out32 = _ln_rows(out32 + x.astype(jnp.float32), lng_ref, lnb_ref, eps)
    elif ln_mode == "pre":
        out32 = out32 + x.astype(jnp.float32)
    o_ref[0] = out32.astype(o_ref.dtype)


def _forward(
    x: jnp.ndarray,  # (B, T, D)
    w1: jnp.ndarray,  # (D, F)
    b1: jnp.ndarray,  # (F,)
    w2: jnp.ndarray,  # (F, D)
    b2: jnp.ndarray,  # (D,)
    ln_g: Optional[jnp.ndarray],
    ln_b: Optional[jnp.ndarray],
    ln_mode: str,
    eps: float,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    b, t, d = x.shape
    f = w1.shape[1]
    if ln_mode == "none":
        ln_g = jnp.ones((d,), jnp.float32)
        ln_b = jnp.zeros((d,), jnp.float32)
    kernel = functools.partial(_kernel, ln_mode=ln_mode, eps=eps)
    return pl.pallas_call(
        kernel,
        grid_spec=pl.GridSpec(
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, t, d), lambda i: (i, 0, 0)),
                pl.BlockSpec((d, f), lambda i: (0, 0)),
                pl.BlockSpec((1, f), lambda i: (0, 0)),
                pl.BlockSpec((f, d), lambda i: (0, 0)),
                pl.BlockSpec((1, d), lambda i: (0, 0)),
                pl.BlockSpec((1, d), lambda i: (0, 0)),
                pl.BlockSpec((1, d), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, t, d), lambda i: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * t * d * f,
            bytes_accessed=2 * b * t * d * x.dtype.itemsize,
            transcendentals=b * t * f,
        ),
        interpret=interpret,
    )(
        x,
        w1.astype(x.dtype),
        b1.reshape(1, -1),
        w2.astype(x.dtype),
        b2.reshape(1, -1),
        ln_g.reshape(1, -1),
        ln_b.reshape(1, -1),
    )


def _reference(x, w1, b1, w2, b2, ln_g, ln_b, ln_mode, eps):
    """XLA chain (backward recompute + interpret cross-check); mirrors
    models/hubert.py encoder_layer_apply's ffn + residual + LN."""
    h_in = _ln_ref(x, ln_g, ln_b, eps) if ln_mode == "pre" else x
    mid = h_in @ w1.astype(x.dtype) + b1.astype(x.dtype)
    mid = jax.nn.gelu(mid, approximate=(x.dtype == jnp.bfloat16))
    out = mid @ w2.astype(x.dtype) + b2.astype(x.dtype)
    if ln_mode == "post":
        return _ln_ref(x + out, ln_g, ln_b, eps)
    if ln_mode == "pre":
        return x + out
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def ffn_block(x, w1, b1, w2, b2, ln_g, ln_b, ln_mode, eps):
    """Fused FFN half-layer: (B,T,D) -> (B,T,D)."""
    return _forward(x, w1, b1, w2, b2, ln_g, ln_b, ln_mode, eps)


def _fwd(x, w1, b1, w2, b2, ln_g, ln_b, ln_mode, eps):
    return (
        _forward(x, w1, b1, w2, b2, ln_g, ln_b, ln_mode, eps),
        (x, w1, b1, w2, b2, ln_g, ln_b),
    )


def _bwd(ln_mode, eps, residuals, g):
    x, w1, b1, w2, b2, ln_g, ln_b = residuals
    _, vjp = jax.vjp(
        lambda x, w1, b1, w2, b2, lg, lb: _reference(
            x, w1, b1, w2, b2, lg, lb, ln_mode, eps
        ),
        x, w1, b1, w2, b2, ln_g, ln_b,
    )
    return vjp(g)


ffn_block.defvjp(_fwd, _bwd)


def ffn_block_sharded(x, w1, b1, w2, b2, ln_g, ln_b, ln_mode, eps, mesh,
                      axis: str = "data"):
    """shard_map wrapper over the batch axis (weights replicated)."""
    from ._dispatch import shard_map
    from jax.sharding import PartitionSpec as P

    rep = P()
    f = shard_map(
        lambda x, w1, b1, w2, b2, lg, lb: ffn_block(
            x, w1, b1, w2, b2, lg, lb, ln_mode, eps
        ),
        mesh=mesh,
        in_specs=(P(axis), rep, rep, rep, rep, rep, rep),
        out_specs=P(axis),
        check_rep=False,
    )
    return f(x, w1, b1, w2, b2, ln_g, ln_b)


def ffn_eligible(
    b: int, t: int, d: int, f: int, itemsize: int = 2
) -> bool:
    """Weights + one cell must fit VMEM; T long enough that per-cell
    matmul rows utilize the MXU (T >= 128 — the FFN has no (T,T) score
    buffer; this is a plain row-count threshold); bf16-only on TPU is
    enforced by the caller (erf does not lower in Mosaic). `itemsize` is
    the dtype's (2 bf16 / 4 f32)."""
    if t < 128:
        return False
    weights = 2 * d * f * itemsize
    per_cell = (
        2 * 2 * t * d * itemsize  # x + out, double buffered
        + t * f * itemsize  # fc1 activation
        + t * d * 4  # f32 epilogue row
    )
    return weights + per_cell <= _VMEM_BUDGET
