"""Fused Pallas kernel for the HuBERT conv frontend's stride-2 chain.

Motivation (docs/DESIGN_NOTES.md): XLA runs each strided conv of the chain
near speed-of-light in isolation (~156 TFLOP/s) but the CHAINED stack drops
to ~65 TFLOP/s (relayout/fusion choices between layers) — 123 ms of the
440 ms encode at batch 256. This kernel runs the k∈{3,2}, stride-2 layers
(conv1..conv6 for HuBERT) entirely in VMEM per (batch, output-block) grid
cell: the input window is DMA'd once from HBM, every intermediate stays
on-chip, and each layer lowers to ONE MXU matmul via the stride-2 reshape
trick:

  x (T, C) --reshape--> x2 (T/2, 2C)
  k=2: frames = x2                      -> (T/2, 2C) @ (2C, C')
  k=3: frames = [x2[t], x2[t+1][:C]]    -> (T/2-ish, 3C) @ (3C, C')

(no strided loads, no im2col in HBM). conv0 (k=10, s=5, 1 channel) stays in
XLA: it is bandwidth-bound and its GroupNorm needs global-time statistics.

VALID-conv arithmetic is preserved exactly; the wrapper pads the sequence
end with zeros and slices the true output length.
"""

from __future__ import annotations

import functools
import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """Abramowitz & Stegun 7.1.26 polynomial erf (max abs err 1.5e-7) —
    Mosaic TPU has no erf lowering; exp is supported."""
    a1, a2, a3, a4, a5 = (
        0.254829592,
        -0.284496736,
        1.421413741,
        -1.453152027,
        1.061405429,
    )
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    y = 1.0 - (((((a5 * t + a4) * t) + a3) * t + a2) * t + a1) * t * jnp.exp(
        -ax * ax
    )
    return sign * y


def _gelu(x):
    # exact-erf GELU via the polynomial above (matches ops.basic.gelu to
    # ~1e-7, far below bf16 resolution)
    return 0.5 * x * (1.0 + _erf(x / math.sqrt(2.0)))


def _layer_out_len(t_in: int, k: int) -> int:
    return (t_in - k) // 2 + 1


def window_for(out_block: int, kernels: Sequence[int]) -> int:
    """Input rows needed to produce ``out_block`` output rows through the
    chain (stride 2 each layer), rounded up to even for the reshape trick."""
    need = out_block
    for k in reversed(kernels):
        need = (need - 1) * 2 + k
    return need + (need % 2)


def _chain_kernel(
    x_hbm,  # (B, T_pad, C) in HBM/ANY
    *refs,
    kernels: Tuple[int, ...],
    out_block: int,
    win: int,
):
    """refs = [w_1..w_n (VMEM), out_ref (VMEM block), scratch, sem]."""
    n = len(kernels)
    w_refs = refs[:n]
    out_ref = refs[n]
    scratch = refs[n + 1]
    sem = refs[n + 2]

    b = pl.program_id(0)
    blk = pl.program_id(1)
    total_stride = 2**n

    start = blk * out_block * total_stride
    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(start, win), :], scratch, sem
    )
    copy.start()
    copy.wait()

    dtype = scratch.dtype  # compute in the caller's dtype (bf16 in prod)
    x = scratch[:]  # (win, C)
    t = win
    for i, k in enumerate(kernels):
        c_in = x.shape[-1]
        t_out = _layer_out_len(t, k)
        # stride-2 fold: (t, C) -> (ceil(t/2), 2C); pad to even so the k=3
        # cross-pair row (x2[t_out]) always exists
        if t % 2 == 1:
            x = jnp.pad(x, ((0, 1), (0, 0)))
            t = t + 1
        x2 = x.reshape(t // 2, 2 * c_in)
        w = w_refs[i][:].astype(dtype)  # (k*c_in, c_out)
        if k == 2:
            y = jax.lax.dot_general(
                x2[:t_out],
                w,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        elif k == 3:
            # two dots instead of a concat (Mosaic cannot concat an
            # offset-sliced operand, and this skips the 3C frame buffer):
            # y[t] = [x(2t), x(2t+1)] @ W[:2C] + x(2t+2) @ W[2C:]
            y = jax.lax.dot_general(
                x2[:t_out],
                w[: 2 * c_in],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            y = y + jax.lax.dot_general(
                x2[1 : t_out + 1, :c_in],
                w[2 * c_in :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            raise NotImplementedError(f"kernel size {k}")
        x = _gelu(y).astype(dtype)
        t = t_out

    out_ref[0] = x[:out_block].astype(out_ref.dtype)


def fused_conv_chain(
    x: jnp.ndarray,  # (B, T, C) output of conv0+GN+GELU
    weights: List[jnp.ndarray],  # per layer (k, C_in, C_out) WIO
    kernels: Sequence[int],  # kernel sizes, stride 2 each
    out_block: int = 64,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """-> (B, T_out, C_out) where T_out follows VALID conv arithmetic."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    b, t, c = x.shape
    kernels = tuple(kernels)
    n = len(kernels)
    total_stride = 2**n

    t_out_true = t
    for k in kernels:
        t_out_true = _layer_out_len(t_out_true, k)

    num_blocks = -(-t_out_true // out_block)
    win = window_for(out_block, kernels)
    # pad so the last block's window stays in bounds
    t_pad = (num_blocks - 1) * out_block * total_stride + win
    if t_pad > t:
        x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))

    w_flat = [
        w.reshape(-1, w.shape[-1]).astype(x.dtype) for w in weights
    ]
    c_out = weights[-1].shape[-1]

    kernel = functools.partial(
        _chain_kernel,
        kernels=kernels,
        out_block=out_block,
        win=win,
    )
    flops = 0
    tt = t
    for k, w in zip(kernels, weights):
        tt = _layer_out_len(tt, k)
        flops += 2 * b * tt * w.shape[0] * w.shape[1] * w.shape[2]

    out = pl.pallas_call(
        kernel,
        grid=(b, num_blocks),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]
        + [
            pl.BlockSpec(w.shape, lambda bi, blk: (0, 0), memory_space=pltpu.VMEM)
            for w in w_flat
        ],
        out_specs=pl.BlockSpec(
            (1, out_block, c_out), lambda bi, blk: (bi, blk, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, num_blocks * out_block, c_out), x.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((win, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize
            + b * num_blocks * out_block * c_out * x.dtype.itemsize,
            transcendentals=flops // 4,
        ),
        interpret=interpret,
    )(x, *w_flat)
    return out[:, :t_out_true]


def reference_conv_chain(x, weights, kernels):
    """XLA reference (for tests): the plain chained convs + GELU."""
    for w, k in zip(weights, kernels):
        x = jax.lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=(2,),
            padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)
    return x
