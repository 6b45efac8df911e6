"""Shared dispatcher for running a transformer encoder layer as two fused
Pallas calls (kernels/mha_block.py + kernels/ffn_block.py).

Both layer flavors in the framework have the same algebra:

- fairseq TransformerSentenceEncoderLayer (models/hubert.py) — post-norm
  (base) or pre-norm (large);
- torch nn.TransformerEncoderLayer (ops/transformer.py, the branch
  transformers) — norm_first False/True.

Eligibility (any failure -> return None, caller falls back to XLA):
"auto" attention backend on TPU; no active dropout (the custom VJPs
recompute in XLA and could not reproduce an in-kernel dropout mask — so
train mode is fine ONLY when every dropout rate is 0); bf16 activations
(Mosaic cannot lower the f32 path's exact-erf GELU); GELU activation;
per-batch valid-length (or no) masking; shapes within the kernels' VMEM
envelopes at the per-shard batch (kernels/_dispatch.mesh_plan).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def fused_encoder_layer(
    x: jnp.ndarray,  # (B, T, D)
    lens: Optional[jnp.ndarray],  # (B,) valid key lengths, or None
    *,
    heads: int,
    mode: str,  # "post" | "pre"
    eps: float,
    attn,  # {"in_proj": {w,b}, "out_proj": {w,b}}
    fc1,  # {"w","b"}
    fc2,
    ln1,  # {"scale","bias"} around attention
    ln2,  # {"scale","bias"} around ffn
    use_ffn_kernel: bool = True,
) -> Optional[jnp.ndarray]:
    if x.dtype != jnp.bfloat16:
        return None
    from ..ops import attention as attn_mod

    if attn_mod.get_attention_backend() != "auto" or not attn_mod._on_tpu():
        return None
    from ._dispatch import mesh_plan
    from .ffn_block import ffn_block, ffn_block_sharded, ffn_eligible
    from .mha_block import (
        block_eligible,
        mha_layer_block,
        mha_layer_block_sharded,
    )

    b, t, d = x.shape
    f = fc1["w"].shape[1]
    isz = x.dtype.itemsize
    plan = mesh_plan(
        attn_mod.get_kernel_mesh(),
        b,
        lambda lb: block_eligible(lb, t, d, heads, isz),
    )
    if plan is None:
        return None
    local_b = b if plan == "single" else b // plan.shape.get("data", 1)
    ffn_ok = use_ffn_kernel and ffn_eligible(local_b, t, d, f, isz)

    wi, bi = attn["in_proj"]["w"], attn["in_proj"]["b"]
    wo, bo = attn["out_proj"]["w"], attn["out_proj"]["b"]
    if bi is None:
        bi = jnp.zeros((3 * d,), jnp.float32)
    if bo is None:
        bo = jnp.zeros((d,), jnp.float32)

    if plan == "single":
        h = mha_layer_block(
            x, wi, bi, wo, bo, ln1["scale"], ln1["bias"], lens, heads, mode,
            eps,
        )
        if ffn_ok:
            return ffn_block(
                h, fc1["w"], fc1["b"], fc2["w"], fc2["b"], ln2["scale"],
                ln2["bias"], mode, eps,
            )
    else:
        h = mha_layer_block_sharded(
            x, wi, bi, wo, bo, ln1["scale"], ln1["bias"], lens, heads, mode,
            eps, plan,
        )
        if ffn_ok:
            return ffn_block_sharded(
                h, fc1["w"], fc1["b"], fc2["w"], fc2["b"], ln2["scale"],
                ln2["bias"], mode, eps, plan,
            )

    # XLA FFN epilogue (weights too large for the ffn kernel's envelope,
    # e.g. HuBERT-large 1024x4096, or the kernel is switched off)
    from ..ops.basic import gelu, layer_norm, linear

    h_in = layer_norm(ln2, h, eps) if mode == "pre" else h
    mid = gelu(linear(fc1, h_in))
    out = linear(fc2, mid)
    if mode == "post":
        return layer_norm(ln2, h + out, eps)
    return h + out


def fused_mha_and_norm(
    src: jnp.ndarray,  # (B, T, D)
    lens: Optional[jnp.ndarray],
    *,
    heads: int,
    eps: float,
    attn,  # {"in_proj", "out_proj"}
    norm,  # {"scale","bias"}
) -> Optional[jnp.ndarray]:
    """LayerNorm(MHA(src) + src) as one fused call (the cascaded branch's
    MultiheadAttentionAndNorm — reference TransformerModels.py:99-129) —
    exactly mha_layer_block with ln_mode "post"."""
    if src.dtype != jnp.bfloat16:
        return None
    from ..ops import attention as attn_mod

    if attn_mod.get_attention_backend() != "auto" or not attn_mod._on_tpu():
        return None
    from ._dispatch import mesh_plan
    from .mha_block import (
        block_eligible,
        mha_layer_block,
        mha_layer_block_sharded,
    )

    b, t, d = src.shape
    isz = src.dtype.itemsize
    plan = mesh_plan(
        attn_mod.get_kernel_mesh(),
        b,
        lambda lb: block_eligible(lb, t, d, heads, isz),
    )
    if plan is None:
        return None
    wi, bi = attn["in_proj"]["w"], attn["in_proj"]["b"]
    wo, bo = attn["out_proj"]["w"], attn["out_proj"]["b"]
    if bi is None:
        bi = jnp.zeros((3 * d,), jnp.float32)
    if bo is None:
        bo = jnp.zeros((d,), jnp.float32)
    if plan == "single":
        return mha_layer_block(
            src, wi, bi, wo, bo, norm["scale"], norm["bias"], lens, heads,
            "post", eps,
        )
    return mha_layer_block_sharded(
        src, wi, bi, wo, bo, norm["scale"], norm["bias"], lens, heads,
        "post", eps, plan,
    )
