"""The ONE masked-SDPA reference used by every kernel's backward recompute.

Each Pallas attention kernel (flash_attention, attention_vmem, mha_block)
is a custom_vjp whose backward re-derives gradients by jax.vjp over an XLA
restatement of the same math. Those restatements used to be three separate
near-identical copies — the exact drift hazard kernels/_dispatch's HLO
regexes were once bitten by: a masking/softmax-dtype fix applied to one
copy but not the others silently changes gradients depending on which
kernel dispatched. This module is the single source of truth.

Semantics (must stay bit-identical to the kernels' forward):
- logits accumulate in f32 (`preferred_element_type`), scaled by
  1/sqrt(Dh);
- key-padding positions (col >= lens) and, optionally, causal positions
  (col > row) are masked to f32 finfo.min BEFORE the softmax (reference
  masking convention, avssl/module/speechclip_c_modules/kw_modules/
  TransformerModels.py — finfo.min, not -inf, so fully-masked rows stay
  finite);
- softmax in f32, weights cast back to the value dtype, output contraction
  accumulates in f32 and returns the value dtype.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def masked_sdpa(q, k, v, lens, causal=False):
    """(B, H, L, Dh) x3 [+ lens (B,) or None] -> (B, H, L, Dh) in v.dtype."""
    d = q.shape[-1]
    logits = jnp.einsum(
        "bhld,bhsd->bhls", q, k, preferred_element_type=jnp.float32
    ) / math.sqrt(d)
    s = k.shape[2]
    if lens is not None:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, s), 3)
        logits = jnp.where(col < lens[:, None, None, None], logits, _NEG_INF)
    if causal:
        l = q.shape[2]
        row = jax.lax.broadcasted_iota(jnp.int32, (l, s), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (l, s), 1)
        logits = jnp.where((col <= row)[None, None], logits, _NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum(
        "bhls,bhsd->bhld", weights, v, preferred_element_type=jnp.float32
    ).astype(v.dtype)
