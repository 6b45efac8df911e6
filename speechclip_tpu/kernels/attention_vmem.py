"""Grouped VMEM-resident attention for short sequences (Pallas TPU).

The HuBERT encoder's attention core runs at L = S = 320 frames (6.4 s of
16 kHz audio through the 320x conv frontend — reference
avssl/module/speech_encoder_plus.py:333-337) with Dh = 64. At these shapes
XLA's attention is HBM-bound on the (B, H, L, S) score/weight buffers
(~1.6x its own roofline, docs/DESIGN_NOTES.md). A streaming flash kernel
does not pay off here either: the online-softmax machinery never amortizes
over 3 k-blocks (kernels/flash_attention.py, kept for long sequences).

This kernel instead keeps the ENTIRE (L, S) score matrix of one head in
VMEM — no score traffic at all — and processes a GROUP of (batch, head)
pairs per grid cell so the per-cell dispatch overhead that sank the
one-pair-per-cell variant (measured round 1: 10.6 ms vs XLA 9.0 at B=256)
is amortized G-fold. q/k/v are read at their true head dim (64 lanes,
no 128-pad materialization: the padding pass alone costs a full HBM
round-trip of the inputs, which is most of the kernel's total IO budget).

HBM traffic: read q+k+v, write out = 4*B*H*L*D bytes — ~8x less than the
XLA path's score/weight round-trips at L=S=320.

Masking: per-(b,h) valid key lengths (B*H,) via scalar prefetch, plus an
optional causal flag (CLIP text tower, L=77). Rows beyond the true L are
computed into garbage and are harmless: softmax is row-wise.

Backward: custom VJP recomputes standard attention in XLA (sequences are
short; forward throughput is what matters — frozen towers/inference).
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

# VMEM cap for picking the group size: one cell holds G * (3 qkv + out)
# blocks (bf16) + one (L, S) f32 score matrix + its bf16 copy, double
# buffered by the pipeline. Stay well under the ~16 MB/core budget.
_VMEM_BUDGET = 10 * 1024 * 1024


def _group_size(bh: int, l: int, s: int, d: int, itemsize: int) -> int:
    # q/out are (l, d); k is (s, d); v carries the extra ones lane (s, d+1).
    # Sizing by true shapes matters for cross-attention (s != l): using l
    # for all four underestimates the envelope when s > l and a shape
    # deemed "eligible" could exceed VMEM at Mosaic compile time.
    per_pair = (2 * l * d + s * d + s * (d + 1)) * itemsize * 2  # dbl-buffered
    score = l * s * (4 + 2)  # f32 scores + bf16 weights (per-g temporaries)
    best = 1
    for g in (16, 12, 8, 6, 4, 3, 2):
        if bh % g == 0 and g * per_pair + score <= _VMEM_BUDGET:
            best = g
            break
    return best


def _kernel(
    lens_ref,  # SMEM (B*H,) int32 valid key lengths
    q_ref,  # (G, L, D) — pre-scaled by 1/sqrt(D) in the caller
    k_ref,  # (G, S, D)
    v_ref,  # (G, S, D+1) — last lane is ones (denominator trick)
    o_ref,  # (G, L, D)
    *,
    group: int,
    causal: bool,
    has_lens: bool,
):
    cell = pl.program_id(0)
    l, s = q_ref.shape[1], k_ref.shape[1]
    d = o_ref.shape[2]

    col = jax.lax.broadcasted_iota(jnp.int32, (l, s), 1)
    causal_ok = None
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (l, s), 0)
        causal_ok = col <= row

    for g in range(group):  # static unroll: G independent heads per cell
        scores = jax.lax.dot_general(
            q_ref[g],
            k_ref[g],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (L, S) f32, lives in VMEM only
        ok = None
        if has_lens:
            ok = col < lens_ref[cell * group + g]
        if causal_ok is not None:
            ok = causal_ok if ok is None else jnp.logical_and(ok, causal_ok)
        if ok is not None:
            scores = jnp.where(ok, scores, _NEG_INF)
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m).astype(q_ref.dtype)
        # PV with a ones-lane appended to v: column D of the product is
        # sum(p) — the softmax denominator comes off the MXU instead of a
        # cross-lane VPU reduction, and the (L, S) division shrinks to (L, D)
        acc = jax.lax.dot_general(
            p,
            v_ref[g],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (L, D+1)
        denom = jnp.maximum(acc[:, d:], 1e-30)
        o_ref[g] = (acc[:, :d] / denom).astype(o_ref.dtype)


def _forward(
    q: jnp.ndarray,  # (B, H, L, Dh)
    k: jnp.ndarray,
    v: jnp.ndarray,
    lens: Optional[jnp.ndarray],  # (B,) valid key lengths
    causal: bool,
    group: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    b, h, l, d = q.shape
    s = k.shape[2]
    bh = b * h
    if group is None:
        group = _group_size(bh, l, s, d, q.dtype.itemsize)
    assert bh % group == 0, (bh, group)

    # scale folds into q (XLA fuses it into whatever produced q); the ones
    # lane on v feeds the in-kernel denominator trick. Both pads/multiplies
    # fuse with the preceding head-split transpose — no extra HBM pass.
    qf = (q * jnp.asarray(1.0 / math.sqrt(d), q.dtype)).reshape(bh, l, d)
    kf = k.reshape(bh, s, d)
    vf = jnp.concatenate(
        [v, jnp.ones((b, h, s, 1), v.dtype)], axis=-1
    ).reshape(bh, s, d + 1)
    has_lens = lens is not None
    lens_arg = (
        jnp.repeat(lens.astype(jnp.int32), h)
        if has_lens
        else jnp.zeros((bh,), jnp.int32)
    )

    kernel = functools.partial(
        _kernel,
        group=group,
        causal=causal,
        has_lens=has_lens,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh // group,),
            in_specs=[
                pl.BlockSpec((group, l, d), lambda c, lens: (c, 0, 0)),
                pl.BlockSpec((group, s, d), lambda c, lens: (c, 0, 0)),
                pl.BlockSpec((group, s, d + 1), lambda c, lens: (c, 0, 0)),
            ],
            out_specs=pl.BlockSpec((group, l, d), lambda c, lens: (c, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((bh, l, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * l * s * d,
            bytes_accessed=(qf.size + kf.size + vf.size + qf.size)
            * qf.dtype.itemsize,
            transcendentals=bh * l * s,
        ),
        interpret=interpret,
    )(lens_arg, qf, kf, vf)
    return out.reshape(b, h, l, d)


# XLA reference path (backward recompute) — shared single source of truth
# (kernels/_sdpa_ref.py)
_reference = masked_sdpa


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def attention_vmem(q, k, v, lens, causal=False):
    """Grouped whole-row attention: (B,H,L,Dh) x3 [+ lens (B,)] -> same."""
    return _forward(q, k, v, lens, causal)


def _fwd(q, k, v, lens, causal):
    return _forward(q, k, v, lens, causal), (q, k, v, lens)


def _bwd(causal, residuals, g):
    q, k, v, lens = residuals
    _, vjp = jax.vjp(
        lambda q, k, v: _reference(q, k, v, lens, causal), q, k, v
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


attention_vmem.defvjp(_fwd, _bwd)


def vmem_eligible(
    b: int, h: int, l: int, s: int, d: int, itemsize: int = 2
) -> bool:
    """Shapes this kernel handles well: sequences long enough that the
    (L, S) score traffic dominates the XLA path (at tiny L — ViT's 50
    patches, CLIP text's 77 tokens — XLA's fused attention wins: the
    whole-row matmuls underutilize the MXU and the HBM saving is small;
    measured flat-to-negative on the train step), short enough that the
    score matrix fits VMEM, head dim a multiple of the sublane granule,
    and batch*head divisible into groups. `itemsize` is the q/k/v dtype's
    (2 bf16 / 4 f32) — f32 doubles the VMEM footprint."""
    if d % 8 != 0 or d > 128:
        return False
    if l * s < 128 * 128:  # score buffers too small to pay for the kernel
        return False
    if l * s * 6 > _VMEM_BUDGET // 2:  # score matrix dominates; keep slack
        return False
    return _group_size(b * h, l, s, d, itemsize) >= 2


def attention_vmem_sharded(q, k, v, lens, causal, mesh, axis: str = "data"):
    """Run the kernel per data shard under an explicit shard_map.

    GSPMD has no partitioning rule for pallas_call — inside a sharded jit
    it would all-gather the operands onto every chip. Attention is
    batch-pointwise, so mapping over the batch-sharded axis is exact: each
    chip runs the kernel on its own (B/data, H, L, Dh) shard, no
    collectives. Requires the model axis to be trivial (TP shards heads;
    see ops/attention gating).
    """
    from ._dispatch import data_shard_map

    if lens is None:
        f = data_shard_map(
            lambda q, k, v: attention_vmem(q, k, v, None, causal),
            mesh, n_arrays=3, n_sharded=3, axis=axis,
        )
        return f(q, k, v)
    f = data_shard_map(
        lambda q, k, v, l: attention_vmem(q, k, v, l, causal),
        mesh, n_arrays=4, n_sharded=4, axis=axis,
    )
    return f(q, k, v, lens)
