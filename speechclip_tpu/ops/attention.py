"""Multi-head attention with torch-``nn.MultiheadAttention`` semantics.

Used by the branch transformers (reference
avssl/module/kw_modules/TransformerModels.py:99-135), the HuBERT encoder
layers and the CLIP towers. The math is standard SDPA; the padding mask is a
bool (B, S) tensor with True at padding (torch convention). Softmax runs in
f32 regardless of the compute dtype.

Backend dispatch ("auto" by default): on TPU, self-attention with
length/no masks runs in the fused Pallas MHA block
(kernels/mha_block.py) and other structured-mask shapes in the grouped
VMEM-resident kernel (kernels/attention_vmem.py), each subject to
VMEM-envelope eligibility and the mesh rules in kernels/_dispatch.py;
the streaming flash kernel (kernels/flash_attention.py) is opt-in via
set_attention_backend("pallas") for long sequences. The XLA path is the
reference implementation and the fallback everywhere else (off-TPU,
unstructured masks, requested weights, active dropout).
"""

from __future__ import annotations

import math
from contextlib import contextmanager
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .basic import Params, dropout, linear

_NEG_INF = float(jnp.finfo(jnp.float32).min)

# "auto": on TPU, structured-mask attention runs in the grouped VMEM-resident
# Pallas kernel (kernels/attention_vmem.py) when the score matrix fits VMEM
# — measured 1.5x faster than the XLA path at HuBERT shapes (B=512, L=320,
# Dh=64; docs/DESIGN_NOTES.md). "pallas" forces the streaming flash kernel
# (long sequences); "xla" disables kernels entirely.
_ATTENTION_BACKEND = "auto"  # "auto" | "xla" | "pallas"


def set_attention_backend(name: str) -> None:
    global _ATTENTION_BACKEND
    assert name in ("auto", "xla", "pallas"), name
    _ATTENTION_BACKEND = name


def get_attention_backend() -> str:
    return _ATTENTION_BACKEND


@contextmanager
def attention_backend(name: str):
    old = get_attention_backend()
    set_attention_backend(name)
    try:
        yield
    finally:
        set_attention_backend(old)


def sdpa_xla(
    q: jnp.ndarray,  # (B, H, L, Dh)
    k: jnp.ndarray,  # (B, H, S, Dh)
    v: jnp.ndarray,  # (B, H, S, Dh)
    bias: Optional[jnp.ndarray] = None,  # additive, broadcastable to (B,H,L,S)
    return_weights: bool = False,
    dropout_rate: float = 0.0,  # torch semantics: dropout on the weights
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Reference XLA attention; softmax in f32.

    bf16 fast path (no-weights): the (B, H, L, S) logits/weights buffers are
    the HBM bottleneck of short-sequence attention (measured ~8.6 ms/layer of
    the HuBERT encode at B=256/L=320/Dh=64 on v5e, bandwidth- not
    compute-bound). When the compute dtype is bf16 and the caller does not
    need the weights, both buffers are stored bf16 — the MXU still
    accumulates in f32 and the softmax chain upcasts to f32 inside the
    fusion, so only the HBM-resident rounding changes (same order as the
    bf16 activation error already present)."""
    dh = q.shape[-1]
    scale = 1.0 / math.sqrt(dh)
    drop = train and dropout_rate > 0.0
    if drop and rng is None:
        raise ValueError("attention dropout in train mode requires an rng")
    if not return_weights and q.dtype == jnp.bfloat16:
        logits16 = jnp.einsum(
            "bhld,bhsd->bhls",
            q * jnp.bfloat16(scale),
            k,
            preferred_element_type=jnp.bfloat16,
        )
        x = logits16.astype(jnp.float32)
        if bias is not None:
            x = x + bias.astype(jnp.float32)
        w16 = jax.nn.softmax(x, axis=-1).astype(jnp.bfloat16)
        if drop:
            w16 = dropout(rng, w16, dropout_rate, train)
        out = jnp.einsum(
            "bhls,bhsd->bhld", w16, v, preferred_element_type=jnp.float32
        ).astype(v.dtype)
        return out, None
    logits = jnp.einsum(
        "bhld,bhsd->bhls", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1)
    if drop:
        # torch parity: F.multi_head_attention_forward drops the weights and
        # both uses AND returns the dropped tensor
        weights = dropout(rng, weights, dropout_rate, train)
    out = jnp.einsum(
        "bhls,bhsd->bhld",
        weights.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)
    return out, (weights if return_weights else None)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


# Mesh registered by the trainer for multi-chip kernel dispatch: GSPMD has
# no partitioning rule for pallas_call, so on >1 device the "auto" backend
# only engages through an explicit shard_map over the mesh's data axis
# (kernels/attention_vmem.attention_vmem_sharded). Read at trace time.
_KERNEL_MESH = None


def set_kernel_mesh(mesh) -> None:
    """Register (or clear, with None) the mesh for sharded kernel dispatch."""
    global _KERNEL_MESH
    _KERNEL_MESH = mesh


def get_kernel_mesh():
    return _KERNEL_MESH


@contextmanager
def kernel_mesh(mesh):
    """Scope a kernel-dispatch mesh (set_kernel_mesh is process-global;
    use this when mixing meshed and un-meshed jitted code in one process)."""
    old = get_kernel_mesh()
    set_kernel_mesh(mesh)
    try:
        yield
    finally:
        set_kernel_mesh(old)


def _structured_masks(attn_mask, key_padding_mask, key_valid_lens) -> bool:
    """Kernel-expressible masking: per-batch valid key lengths and/or a
    causal flag. Arbitrary additive or bool masks stay on the XLA path."""
    if attn_mask is not None:
        return False
    if key_padding_mask is not None and key_valid_lens is None:
        return False
    return True


def _flash_eligible() -> bool:
    # mask structure is already enforced by the caller's kernel_ok gate
    # (_structured_masks): only length/causal masking reaches this point
    return _ATTENTION_BACKEND == "pallas" and _on_tpu()


def padding_bias(
    key_padding_mask: Optional[jnp.ndarray],  # (B, S) True = pad
    attn_mask: Optional[jnp.ndarray] = None,  # (L, S) additive f32 or bool
) -> Optional[jnp.ndarray]:
    """Combine key-padding and attention masks into an additive bias."""
    bias = None
    if key_padding_mask is not None:
        bias = jnp.where(
            key_padding_mask[:, None, None, :], _NEG_INF, 0.0
        ).astype(jnp.float32)
    if attn_mask is not None:
        if attn_mask.dtype == jnp.bool_:
            add = jnp.where(attn_mask, _NEG_INF, 0.0).astype(jnp.float32)
        else:
            add = attn_mask.astype(jnp.float32)
        add = add[None, None, :, :]
        bias = add if bias is None else bias + add
    return bias


def causal_bias(length: int) -> jnp.ndarray:
    """Additive (L, L) causal mask — the CLIP text tower's attn_mask."""
    row = jax.lax.broadcasted_iota(jnp.int32, (length, length), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (length, length), 1)
    return jnp.where(col > row, _NEG_INF, 0.0).astype(jnp.float32)


def mha_init(rng: jax.Array, d_model: int, bias: bool = True) -> Params:
    """torch nn.MultiheadAttention init: xavier_uniform in_proj, zeros bias,
    out_proj like nn.Linear with zero bias."""
    k1, k2 = jax.random.split(rng)
    limit = math.sqrt(6.0 / (d_model + 3 * d_model))
    in_w = jax.random.uniform(
        k1, (d_model, 3 * d_model), jnp.float32, -limit, limit
    )
    bound = 1.0 / math.sqrt(d_model)
    out_w = jax.random.uniform(
        k2, (d_model, d_model), jnp.float32, -bound, bound
    )
    return {
        "in_proj": {"w": in_w, "b": jnp.zeros((3 * d_model,), jnp.float32) if bias else None},
        "out_proj": {"w": out_w, "b": jnp.zeros((d_model,), jnp.float32) if bias else None},
    }


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, t, d = x.shape
    return x.reshape(b, t, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


def multi_head_attention(
    params: Params,
    query: jnp.ndarray,  # (B, L, D)
    key: jnp.ndarray,  # (B, S, D)
    value: jnp.ndarray,  # (B, S, D)
    num_heads: int,
    key_padding_mask: Optional[jnp.ndarray] = None,  # (B, S) True = pad
    attn_mask: Optional[jnp.ndarray] = None,  # (L, S)
    key_valid_lens: Optional[jnp.ndarray] = None,  # (B,) structured mask
    causal: bool = False,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    need_weights: bool = False,
    average_attn_weights: bool = True,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """torch-parity MHA forward.

    Masks: either a bool key_padding_mask / additive attn_mask (general XLA
    path) or structured key_valid_lens / causal (eligible for the Pallas
    flash kernel when the backend is "pallas" on TPU). When key_valid_lens
    is given, key_padding_mask may be omitted.

    Returns (output (B, L, D), weights) where weights is (B, L, S) if
    averaged over heads else (B, H, L, S) — matching
    nn.MultiheadAttention(batch_first=True).
    """
    in_w, in_b = params["in_proj"]["w"], params["in_proj"]["b"]

    want_weights = need_weights
    kernel_ok = (
        not want_weights
        and not (train and dropout_rate > 0)
        and _structured_masks(attn_mask, key_padding_mask, key_valid_lens)
    )

    # first choice on TPU: the fully fused QKV->attention->out-proj block
    # (kernels/mha_block.py) — self-attention, length/no mask, one batch
    # element per grid cell. Measured 12.2 ms vs 22-25 ms for the unfused
    # chain per HuBERT-base layer at B=512 (docs/DESIGN_NOTES.md).
    if (
        (query is key and key is value)
        and kernel_ok
        and not causal
        and _ATTENTION_BACKEND == "auto"
        and _on_tpu()
    ):
        from ..kernels._dispatch import mesh_plan
        from ..kernels.mha_block import (
            block_eligible,
            mha_block,
            mha_block_sharded,
        )

        b, t, dm = query.shape
        isz = query.dtype.itemsize
        plan = mesh_plan(
            _KERNEL_MESH,
            b,
            lambda lb: block_eligible(lb, t, dm, num_heads, isz),
        )
        if plan is not None:
            ow, ob = params["out_proj"]["w"], params["out_proj"]["b"]
            bi = in_b if in_b is not None else jnp.zeros((3 * dm,), jnp.float32)
            bo = ob if ob is not None else jnp.zeros((dm,), jnp.float32)
            if plan == "single":
                return (
                    mha_block(query, in_w, bi, ow, bo, key_valid_lens, num_heads),
                    None,
                )
            return (
                mha_block_sharded(
                    query, in_w, bi, ow, bo, key_valid_lens, num_heads, plan
                ),
                None,
            )

    def proj(x, w, b):
        y = x @ w.astype(x.dtype)
        return y if b is None else y + b.astype(x.dtype)

    if query is key and key is value:
        # self-attention: one fused (D, 3D) matmul instead of three
        qkv = proj(query, in_w, in_b)
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        wq, wk, wv = jnp.split(in_w, 3, axis=1)
        if in_b is not None:
            bq, bk, bv = jnp.split(in_b, 3)
        else:
            bq = bk = bv = None
        q = proj(query, wq, bq)
        k = proj(key, wk, bk)
        v = proj(value, wv, bv)
    q = _split_heads(q, num_heads)
    k = _split_heads(k, num_heads)
    v = _split_heads(v, num_heads)

    if kernel_ok and _ATTENTION_BACKEND == "auto" and _on_tpu():
        from ..kernels._dispatch import mesh_plan
        from ..kernels.attention_vmem import (
            attention_vmem,
            attention_vmem_sharded,
            vmem_eligible,
        )

        b, lq, sq, dh = q.shape[0], q.shape[2], k.shape[2], q.shape[3]
        isz = q.dtype.itemsize
        plan = mesh_plan(
            _KERNEL_MESH,
            b,
            lambda lb: vmem_eligible(lb, num_heads, lq, sq, dh, isz),
        )
        if plan == "single":
            out = attention_vmem(q, k, v, key_valid_lens, causal)
            out = _merge_heads(out)
            return linear(params["out_proj"], out), None
        if plan is not None:
            out = attention_vmem_sharded(q, k, v, key_valid_lens, causal, plan)
            out = _merge_heads(out)
            return linear(params["out_proj"], out), None
    if kernel_ok and _flash_eligible():
        from ..kernels.flash_attention import flash_attention

        out = flash_attention(q, k, v, key_valid_lens, causal)
        out = _merge_heads(out)
        return linear(params["out_proj"], out), None

    if key_padding_mask is None and key_valid_lens is not None:
        from .masking import key_padding_mask as _kpm

        key_padding_mask = _kpm(key_valid_lens, key.shape[1])
    if causal and attn_mask is None:
        attn_mask = causal_bias(key.shape[1])[: query.shape[1]]
    bias = padding_bias(key_padding_mask, attn_mask)
    out, weights = sdpa_xla(
        q, k, v, bias, want_weights, dropout_rate=dropout_rate, rng=rng,
        train=train,
    )

    out = _merge_heads(out)
    out = linear(params["out_proj"], out)

    if not need_weights:
        return out, None
    w = weights
    if average_attn_weights:
        w = jnp.mean(w, axis=1)
    return out, w
