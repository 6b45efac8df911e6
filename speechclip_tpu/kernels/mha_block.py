"""Fused multi-head self-attention block (Pallas TPU): QKV projection ->
attention -> output projection in ONE kernel.

Motivation (docs/DESIGN_NOTES.md round-1 budget): at HuBERT-base shapes
(B=512, T=320, D=768, H=12) the attention sub-block costs ~16 ms/layer as
three XLA ops (QKV matmul, attention core, out-proj matmul) because every
intermediate — qkv (B,T,2304), per-head attention output (B,T,768) — makes
an HBM round trip. Fusing them keeps ALL intermediates of one batch element
in VMEM:

- grid = (B,): one batch element per cell; T*D and T*T buffers fit VMEM
  comfortably at T<=512.
- the three weight matrices use constant index maps, so Mosaic DMAs them
  once and keeps them VMEM-resident across all B cells (~5 MB bf16).
- HBM traffic per layer: read x + write out = 2*B*T*D bytes — vs ~10x that
  for the unfused chain.

The kernel computes torch nn.MultiheadAttention semantics (reference
avssl/module/kw_modules/TransformerModels.py:111-116 for the branch;
fairseq self_attn for HuBERT): fused in_proj, per-head scaled-dot-product
with key-padding lengths, concat, out_proj. Softmax in f32, matmul
accumulators f32, HBM-resident tensors bf16 (or f32 on the f32 path).

Backward: custom VJP recomputes the XLA MHA (frozen-tower forwards are the
throughput path; see kernels/attention_vmem.py for the same trade).
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

# VMEM plan at T=320, D=768, bf16: weights 4.7 MB (resident), x/out blocks
# 2x0.5 MB double-buffered, qkv 1.5 MB, per-head (T,T) f32 scores 0.4 MB,
# assembled head outputs 0.5 MB -> ~9 MB. HuBERT-large dims (D=1024, H=16,
# ~14 MB by this accounting) compile and win on v5e (10.2 vs 16.8 ms at
# B=256) — the budget reflects that measured envelope.
_VMEM_BUDGET = 16 * 1024 * 1024


def _ln_rows(y32: jnp.ndarray, g_ref, b_ref, eps: float) -> jnp.ndarray:
    """Row-wise LayerNorm in f32, matching ops.basic.layer_norm."""
    mean = jnp.mean(y32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y32 - mean), axis=-1, keepdims=True)
    y = (y32 - mean) * jax.lax.rsqrt(var + eps)
    return y * g_ref[0].astype(jnp.float32)[None, :] + b_ref[0].astype(
        jnp.float32
    )[None, :]


def _kernel(
    lens_ref,  # SMEM (B,) int32 valid key lengths
    x_ref,  # (1, T, D)
    win_ref,  # (D, 3D) resident
    bin_ref,  # (1, 3D)
    wout_ref,  # (D, D) resident
    bout_ref,  # (1, D)
    lng_ref,  # (1, D) LayerNorm scale (ln_mode != "none")
    lnb_ref,  # (1, D) LayerNorm bias
    o_ref,  # (1, T, D)
    acc_ref,  # VMEM scratch (T, D) — assembled head outputs
    *,
    heads: int,
    has_lens: bool,
    ln_mode: str,  # "none" | "post" (LN(x+attn(x))) | "pre" (x+attn(LN(x)))
    eps: float,
):
    b = pl.program_id(0)
    t = x_ref.shape[1]
    d = x_ref.shape[2]
    dh = d // heads
    scale = 1.0 / math.sqrt(dh)

    x = x_ref[0]
    if ln_mode == "pre":
        h_in = _ln_rows(x.astype(jnp.float32), lng_ref, lnb_ref, eps).astype(
            x.dtype
        )
    else:
        h_in = x
    qkv = (
        jax.lax.dot_general(
            h_in, win_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bin_ref[0].astype(jnp.float32)[None, :]
    ).astype(x.dtype)  # (T, 3D)

    ok = None
    if has_lens:
        col = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
        ok = col < lens_ref[b]

    for h in range(heads):  # static unroll over heads
        q = qkv[:, h * dh : (h + 1) * dh]
        k = qkv[:, d + h * dh : d + (h + 1) * dh]
        v = qkv[:, 2 * d + h * dh : 2 * d + (h + 1) * dh]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (T, T) f32, VMEM only
        if ok is not None:
            s = jnp.where(ok, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
        w = (p / denom).astype(x.dtype)
        acc_ref[:, h * dh : (h + 1) * dh] = jax.lax.dot_general(
            w, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)

    out32 = (
        jax.lax.dot_general(
            acc_ref[:], wout_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bout_ref[0].astype(jnp.float32)[None, :]
    )
    if ln_mode == "post":
        out32 = _ln_rows(out32 + x.astype(jnp.float32), lng_ref, lnb_ref, eps)
    elif ln_mode == "pre":
        out32 = out32 + x.astype(jnp.float32)
    o_ref[0] = out32.astype(o_ref.dtype)


def _forward(
    x: jnp.ndarray,  # (B, T, D)
    w_in: jnp.ndarray,  # (D, 3D)
    b_in: jnp.ndarray,  # (3D,)
    w_out: jnp.ndarray,  # (D, D)
    b_out: jnp.ndarray,  # (D,)
    lens: Optional[jnp.ndarray],  # (B,)
    heads: int,
    ln_g: Optional[jnp.ndarray] = None,  # (D,) for ln_mode != "none"
    ln_b: Optional[jnp.ndarray] = None,
    ln_mode: str = "none",
    eps: float = 1e-5,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    b, t, d = x.shape
    has_lens = lens is not None
    lens_arg = (
        lens.astype(jnp.int32) if has_lens else jnp.zeros((b,), jnp.int32)
    )
    if ln_mode == "none":
        ln_g = jnp.ones((d,), jnp.float32)
        ln_b = jnp.zeros((d,), jnp.float32)
    kernel = functools.partial(
        _kernel, heads=heads, has_lens=has_lens, ln_mode=ln_mode, eps=eps
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, t, d), lambda i, lens: (i, 0, 0)),
                pl.BlockSpec((d, 3 * d), lambda i, lens: (0, 0)),
                pl.BlockSpec((1, 3 * d), lambda i, lens: (0, 0)),
                pl.BlockSpec((d, d), lambda i, lens: (0, 0)),
                pl.BlockSpec((1, d), lambda i, lens: (0, 0)),
                pl.BlockSpec((1, d), lambda i, lens: (0, 0)),
                pl.BlockSpec((1, d), lambda i, lens: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, t, d), lambda i, lens: (i, 0, 0)),
            scratch_shapes=[pltpu.VMEM((t, d), x.dtype)],
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * d * 4 * d + 4 * b * heads * t * t * (d // heads),
            bytes_accessed=2 * b * t * d * x.dtype.itemsize,
            transcendentals=b * heads * t * t,
        ),
        interpret=interpret,
    )(
        lens_arg,
        x,
        w_in.astype(x.dtype),
        b_in.reshape(1, -1),
        w_out.astype(x.dtype),
        b_out.reshape(1, -1),
        ln_g.reshape(1, -1),
        ln_b.reshape(1, -1),
    )


def _ln_ref(y, g, b, eps):
    y32 = y.astype(jnp.float32)
    mean = jnp.mean(y32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y32 - mean), axis=-1, keepdims=True)
    out = (y32 - mean) * jax.lax.rsqrt(var + eps)
    return (out * g.astype(jnp.float32) + b.astype(jnp.float32)).astype(
        y.dtype
    )


def _layer_reference(x, w_in, b_in, w_out, b_out, ln_g, ln_b, lens, heads,
                     ln_mode, eps):
    if ln_mode == "pre":
        h = _reference(
            _ln_ref(x, ln_g, ln_b, eps), w_in, b_in, w_out, b_out, lens, heads
        )
        return x + h
    h = _reference(x, w_in, b_in, w_out, b_out, lens, heads)
    if ln_mode == "post":
        return _ln_ref(x + h, ln_g, ln_b, eps)
    return h


def _reference(x, w_in, b_in, w_out, b_out, lens, heads):
    """XLA MHA (backward recompute + interpret cross-check). The SDPA core
    is the shared single source of truth (kernels/_sdpa_ref.py)."""
    b, t, d = x.shape
    dh = d // heads
    qkv = x @ w_in.astype(x.dtype) + b_in.astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    split = lambda z: z.reshape(b, t, heads, dh).transpose(0, 2, 1, 3)
    out = masked_sdpa(split(q), split(k), split(v), lens)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
    return out @ w_out.astype(x.dtype) + b_out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def mha_block(x, w_in, b_in, w_out, b_out, lens, heads):
    """Fused self-attention block: (B,T,D) -> (B,T,D)."""
    return _forward(x, w_in, b_in, w_out, b_out, lens, heads)


def _fwd(x, w_in, b_in, w_out, b_out, lens, heads):
    return (
        _forward(x, w_in, b_in, w_out, b_out, lens, heads),
        (x, w_in, b_in, w_out, b_out, lens),
    )


def _bwd(heads, residuals, g):
    x, w_in, b_in, w_out, b_out, lens = residuals
    _, vjp = jax.vjp(
        lambda x, wi, bi, wo, bo: _reference(x, wi, bi, wo, bo, lens, heads),
        x, w_in, b_in, w_out, b_out,
    )
    return (*vjp(g), None)


mha_block.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def mha_layer_block(x, w_in, b_in, w_out, b_out, ln_g, ln_b, lens, heads,
                    ln_mode, eps):
    """Fused attention HALF-LAYER: residual + LayerNorm folded in.

    ln_mode "post": LN(x + MHA(x)) — HuBERT-base (fairseq post-norm).
    ln_mode "pre":  x + MHA(LN(x)) — HuBERT-large (layer_norm_first).
    The residual reuses the x block already resident in VMEM, saving the
    separate (B,T,D) add+LN HBM round trip.
    """
    return _forward(
        x, w_in, b_in, w_out, b_out, lens, heads, ln_g, ln_b, ln_mode, eps
    )


def _layer_fwd(x, w_in, b_in, w_out, b_out, ln_g, ln_b, lens, heads, ln_mode,
               eps):
    out = _forward(
        x, w_in, b_in, w_out, b_out, lens, heads, ln_g, ln_b, ln_mode, eps
    )
    return out, (x, w_in, b_in, w_out, b_out, ln_g, ln_b, lens)


def _layer_bwd(heads, ln_mode, eps, residuals, g):
    x, w_in, b_in, w_out, b_out, ln_g, ln_b, lens = residuals
    _, vjp = jax.vjp(
        lambda x, wi, bi, wo, bo, lg, lb: _layer_reference(
            x, wi, bi, wo, bo, lg, lb, lens, heads, ln_mode, eps
        ),
        x, w_in, b_in, w_out, b_out, ln_g, ln_b,
    )
    return (*vjp(g), None)


mha_layer_block.defvjp(_layer_fwd, _layer_bwd)


def mha_block_sharded(x, w_in, b_in, w_out, b_out, lens, heads, mesh,
                      axis: str = "data"):
    """shard_map wrapper over the batch axis (weights replicated) — see
    kernels/attention_vmem.attention_vmem_sharded for why GSPMD needs this.
    lens rides as the LAST sharded arg so weights stay replicated."""
    from ._dispatch import shard_map
    from jax.sharding import PartitionSpec as P

    rep = P()
    if lens is None:
        f = shard_map(
            lambda x, wi, bi, wo, bo: mha_block(x, wi, bi, wo, bo, None, heads),
            mesh=mesh,
            in_specs=(P(axis), rep, rep, rep, rep),
            out_specs=P(axis),
            check_rep=False,
        )
        return f(x, w_in, b_in, w_out, b_out)
    f = shard_map(
        lambda x, wi, bi, wo, bo, l: mha_block(x, wi, bi, wo, bo, l, heads),
        mesh=mesh,
        in_specs=(P(axis), rep, rep, rep, rep, P(axis)),
        out_specs=P(axis),
        check_rep=False,
    )
    return f(x, w_in, b_in, w_out, b_out, lens)


def mha_layer_block_sharded(x, w_in, b_in, w_out, b_out, ln_g, ln_b, lens,
                            heads, ln_mode, eps, mesh, axis: str = "data"):
    """shard_map wrapper for mha_layer_block over the batch axis."""
    from ._dispatch import shard_map
    from jax.sharding import PartitionSpec as P

    rep = P()
    if lens is None:
        f = shard_map(
            lambda x, wi, bi, wo, bo, lg, lb: mha_layer_block(
                x, wi, bi, wo, bo, lg, lb, None, heads, ln_mode, eps
            ),
            mesh=mesh,
            in_specs=(P(axis), rep, rep, rep, rep, rep, rep),
            out_specs=P(axis),
            check_rep=False,
        )
        return f(x, w_in, b_in, w_out, b_out, ln_g, ln_b)
    f = shard_map(
        lambda x, wi, bi, wo, bo, lg, lb, l: mha_layer_block(
            x, wi, bi, wo, bo, lg, lb, l, heads, ln_mode, eps
        ),
        mesh=mesh,
        in_specs=(P(axis), rep, rep, rep, rep, rep, rep, P(axis)),
        out_specs=P(axis),
        check_rep=False,
    )
    return f(x, w_in, b_in, w_out, b_out, ln_g, ln_b, lens)


def block_eligible(
    b: int, t: int, d: int, heads: int, itemsize: int = 2
) -> bool:
    """One batch element per cell: T*T scores + T*3D qkv + weights must fit
    VMEM; head dim must be lane-sized; T long enough that fusion pays
    (same L*S >= 128^2 cutoff as attention_vmem). `itemsize` is the
    activation/weight dtype's (2 bf16 / 4 f32) — f32 doubles the VMEM
    footprint and must be gated accordingly."""
    if d % heads != 0:
        return False
    dh = d // heads
    if dh % 8 != 0 or dh > 128:
        return False
    if t * t < 128 * 128:
        return False
    weights = 3 * d * d * itemsize + d * d * itemsize
    per_cell = (
        2 * 2 * t * d * itemsize  # x + out, double buffered
        + 3 * t * d * itemsize  # qkv
        + t * t * 4  # one head's scores f32
        + t * d * itemsize  # assembled outputs
    )
    return weights + per_cell <= _VMEM_BUDGET
