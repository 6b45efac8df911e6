"""Keyword BatchNorm.

Equivalent of the reference Kw_BatchNorm
(avssl/module/speechclip_c_modules/kw_bn.py:8-164): BatchNorm over keyword
embeddings before vector quantization, with gamma/beta initialized from the
mean/std of the CLIP token-embedding table.

Functional form: params (scale/bias) + state (running mean/var) threaded
explicitly; ``train=True`` uses batch statistics and returns updated running
stats (torch BatchNorm semantics: momentum 0.1, normalization by biased batch
var, running update with unbiased var).

Distribution note (SURVEY.md §7): torch-DP computes BN stats per replica on
its sub-batch. By default statistics are computed over the GLOBAL batch —
under pjit the mean/var reductions become cross-chip collectives
automatically. This is cleaner and makes training dynamics batch-size-
rather than chip-count-dependent.

For bit-faithful torch-DP dynamics set ``replica_groups=G``: the batch is
split into G contiguous groups (torch-DP scatters contiguous chunks,
torch/nn/parallel/scatter_gather) and each group is normalized with its own
batch statistics. Running stats are updated from group 0 only — in
torch-DP, buffer updates on non-master replicas are discarded and replica 0
aliases the master module, so the persisted running stats track GPU 0's
sub-batch. When G matches the mesh data-axis size and the batch is sharded
contiguously, the grouped reductions stay shard-local (no collectives).

Modes:
- ``eachKw`` + ``parallel``: one BN over (kw_dim * kw_num) features of the
  (B, D, K)->(B, D*K) reshaped tensor. The reference initializes gamma by
  tiling the std vector, which does NOT align with the d-major data layout
  (index d*K+k gets std[(d*K+k) % D]); replicated faithfully since the
  shipped base/large configs use this mode and the learnable BN absorbs it.
- ``eachKw``: K independent BNs over D.
- ``same``: one shared BN over D with stats over (B*K); supports a
  variable-length masked path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .basic import Params
from .masking import valid_mask


def kw_bn_init(
    kw_num: int,
    kw_dim: int,
    batchnorm_type: str,
    init_bias: jnp.ndarray,  # (D,) token-embedding mean
    init_scale: jnp.ndarray,  # (D,) token-embedding std (unbiased)
    std_scale=1.0,
    parallel: bool = False,
) -> Tuple[Params, Params]:
    """Returns (params, state)."""
    if not isinstance(std_scale, (list, tuple)):
        std_scale = [std_scale] * kw_num
    init_bias = init_bias.astype(jnp.float32)
    init_scale = init_scale.astype(jnp.float32)

    if batchnorm_type == "eachKw" and parallel:
        scale = jnp.tile(init_scale * std_scale[0], kw_num)  # (D*K,)
        bias = jnp.tile(init_bias, kw_num)
        n_feat = kw_dim * kw_num
    elif batchnorm_type == "eachKw":
        scale = jnp.stack(
            [init_scale * std_scale[i] for i in range(kw_num)], axis=0
        )  # (K, D)
        bias = jnp.broadcast_to(init_bias, (kw_num, kw_dim))
        n_feat = None
    elif batchnorm_type == "same":
        scale = init_scale * std_scale[0]
        bias = init_bias
        n_feat = kw_dim
    else:
        raise NotImplementedError(batchnorm_type)

    params = {"scale": scale, "bias": bias}
    state = {
        "mean": jnp.zeros_like(scale),
        "var": jnp.ones_like(scale),
    }
    return params, state


def _bn(
    x: jnp.ndarray,  # (N, C)
    params: Params,
    state: Params,
    train: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
    weights: Optional[jnp.ndarray] = None,  # (N,) 0/1 sample weights
    groups: int = 0,  # per-replica-group stats; 0/1 = whole batch
) -> Tuple[jnp.ndarray, Params]:
    x32 = x.astype(jnp.float32)
    if train:
        if groups and groups > 1:
            n_total = x.shape[0]
            if n_total % groups:
                raise ValueError(
                    f"{n_total} rows not divisible by replica_groups {groups}"
                )
            g = x32.reshape(groups, n_total // groups, -1)  # (G, n, C)
            if weights is None:
                n = jnp.full((groups, 1), g.shape[1], jnp.float32)
                mean = jnp.mean(g, axis=1)  # (G, C)
                var = jnp.mean(jnp.square(g - mean[:, None, :]), axis=1)
            else:
                w = weights.astype(jnp.float32).reshape(
                    groups, n_total // groups, 1
                )
                # a fully-padded group contributes zeros (not NaN) to its
                # normalization; padded rows are overwritten by the caller
                n = jnp.maximum(jnp.sum(w, axis=1), 1.0)  # (G, 1)
                mean = jnp.sum(g * w, axis=1) / n
                var = jnp.sum(jnp.square(g - mean[:, None, :]) * w, axis=1) / n
            # running stats persist from replica 0 only (torch-DP master)
            unbiased0 = var[0] * (n[0, 0] / jnp.maximum(n[0, 0] - 1, 1))
            new_state = {
                "mean": (1 - momentum) * state["mean"] + momentum * mean[0],
                "var": (1 - momentum) * state["var"] + momentum * unbiased0,
            }
            y = (g - mean[:, None, :]) * jax.lax.rsqrt(var[:, None, :] + eps)
            y = y.reshape(n_total, -1) * params["scale"] + params["bias"]
            return y.astype(x.dtype), new_state
        if weights is None:
            n = x.shape[0]
            mean = jnp.mean(x32, axis=0)
            var = jnp.mean(jnp.square(x32 - mean), axis=0)
        else:
            w = weights.astype(jnp.float32)[:, None]
            n = jnp.maximum(jnp.sum(w), 1.0)
            mean = jnp.sum(x32 * w, axis=0) / n
            var = jnp.sum(jnp.square(x32 - mean) * w, axis=0) / n
        unbiased = var * (n / jnp.maximum(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x32 - mean) / jnp.sqrt(var + eps)
    y = y * params["scale"] + params["bias"]
    return y.astype(x.dtype), new_state


def kw_bn_apply(
    params: Params,
    state: Params,
    keywords: jnp.ndarray,  # (B, K, D)
    *,
    batchnorm_type: str,
    parallel: bool = False,
    train: bool = False,
    seq_lens: Optional[jnp.ndarray] = None,  # (B,) for `same` variable-length
    replica_groups: int = 0,  # per-replica-group stats (torch-DP emulation)
) -> Tuple[jnp.ndarray, Params]:
    bsz, kw_num, kw_dim = keywords.shape
    groups = replica_groups if train else 0
    if groups and groups > 1 and bsz % groups:
        # validate on the SAMPLE count: the `same` mode flattens to B*K rows,
        # where a row-count check alone could pass while replica groups
        # straddle sample boundaries
        raise ValueError(
            f"batch {bsz} not divisible by replica_groups {groups}"
        )

    if batchnorm_type == "eachKw" and parallel:
        # (B, K, D) -> (B, D, K) -> (B, D*K): feature index = d*K + k
        flat = keywords.transpose(0, 2, 1).reshape(bsz, kw_dim * kw_num)
        out, new_state = _bn(flat, params, state, train, groups=groups)
        out = out.reshape(bsz, kw_dim, kw_num).transpose(0, 2, 1)
        return out, new_state

    if batchnorm_type == "eachKw":
        # K independent BNs, vmapped over the keyword axis — one shared
        # implementation of the statistics/running-stat math (_bn)
        x = keywords.transpose(1, 0, 2).astype(jnp.float32)  # (K, B, D)
        y, new_state = jax.vmap(
            lambda xk, sc, bi, mk, vk: _bn(
                xk,
                {"scale": sc, "bias": bi},
                {"mean": mk, "var": vk},
                train,
                groups=groups,
            )
        )(x, params["scale"], params["bias"], state["mean"], state["var"])
        if not train:
            new_state = state
        return y.transpose(1, 0, 2).astype(keywords.dtype), new_state

    if batchnorm_type == "same":
        flat = keywords.reshape(bsz * kw_num, kw_dim)
        if seq_lens is None:
            out, new_state = _bn(flat, params, state, train, groups=groups)
            return out.reshape(bsz, kw_num, kw_dim), new_state
        # masked path: stats over valid positions only; padded positions
        # pass through unchanged (reference kw_bn.py:137-158). Rows are
        # B-major, so contiguous replica groups over B stay contiguous flat.
        mask = valid_mask(seq_lens, kw_num)  # (B, K)
        out, new_state = _bn(
            flat, params, state, train, weights=mask.reshape(-1), groups=groups
        )
        out = out.reshape(bsz, kw_num, kw_dim)
        out = jnp.where(mask[..., None], out, keywords)
        return out, new_state

    raise NotImplementedError(batchnorm_type)
