"""Hand-written torch reference modules used ONLY by the test suite.

These re-state the mathematical contracts of the reference's torch modules
(losses, VQ, kw-BN, branch transformers) so our JAX ops can be checked
numerically against torch semantics without importing the reference repo.
Torch here is the CPU oracle, never a runtime dependency of the framework.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn


def masked_contrastive_loss_torch(
    feat_a: torch.Tensor,
    feat_b: torch.Tensor,
    ids: torch.Tensor | None,
    temperature: float = 0.07,
    margin: float = 0.0,
    dcl: bool = False,
    a2b: bool = True,
    b2a: bool = True,
) -> torch.Tensor:
    """Contract of reference MaskedContrastiveLoss (losses.py:185-245)."""
    n = feat_a.shape[0]
    temp = 1.0 / temperature
    if ids is not None:
        idx = ids.unsqueeze(1)
        neg_mask = idx != idx.t()
    else:
        neg_mask = ~torch.eye(n, dtype=torch.bool)
    pos_mask = torch.eye(n, dtype=torch.bool)
    if not dcl:
        neg_mask = neg_mask.clone()
        neg_mask[pos_mask] = True
    logits = feat_a @ feat_b.t() * temp
    if margin > 0:
        logits = logits - margin * pos_mask.float()
    pos = logits[pos_mask]
    exp_logits = logits.exp() * neg_mask.float()
    loss = 0.0
    if a2b:
        loss = loss + (-pos + torch.log(exp_logits.sum(1))).mean()
    if b2a:
        loss = loss + (-pos + torch.log(exp_logits.sum(0))).mean()
    if a2b and b2a:
        loss = loss / 2
    return loss


def simple_vq_torch(
    x: torch.Tensor,
    temp: float,
    prob_msk=(0, 2, 3),
    training: bool = False,
    hard: bool = True,
) -> dict:
    """Contract of reference SimpleVectorQuantizer (my_vector_quantizer.py:64-165),
    non-gumbel path."""
    bsz, tsz, fsz = x.shape
    x = x.reshape(-1, fsz).clone()
    for i in prob_msk:
        x[:, i] += float("-inf")
    _, k = x.max(-1)
    hard_x = x.new_zeros(*x.shape).scatter_(-1, k.view(-1, 1), 1.0)
    hard_probs = torch.mean(hard_x.float(), dim=0)
    code_ppl = torch.exp(-torch.sum(hard_probs * torch.log(hard_probs + 1e-7), dim=-1))
    avg_probs = torch.softmax(x.view(bsz * tsz, -1).float(), dim=-1).mean(dim=0)
    prob_ppl = torch.exp(-torch.sum(avg_probs * torch.log(avg_probs + 1e-7), dim=-1))
    probs_per_t = torch.softmax(x.view(bsz, tsz, -1), dim=-1).permute(1, 0, 2)
    ent_per_t = (-torch.sum(probs_per_t * torch.log(probs_per_t + 1e-9), dim=-1)).mean(-1)
    if training:
        soft = F.softmax(x / temp, dim=-1)
        out = hard_x + soft - soft.detach() if hard else soft
    else:
        out = hard_x
    return {
        "subword_prob": out.view(bsz, tsz, -1),
        "code_perplexity": code_ppl,
        "prob_perplexity": prob_ppl,
        "ent_per_t": ent_per_t,
        "targets": out.view(bsz * tsz, -1).argmax(-1).view(bsz, tsz, 1),
        "diversity_loss": (fsz - prob_ppl) / fsz,
    }


def make_torch_encoder(
    n_layers=1,
    d_model=32,
    nhead=4,
    dim_feedforward=64,
    norm_first=False,
):
    """torch branch transformer: N x TransformerEncoderLayer + final LN
    (contract of TransformerModels.py:47-96)."""
    layer = nn.TransformerEncoderLayer(
        d_model=d_model,
        nhead=nhead,
        dim_feedforward=dim_feedforward,
        dropout=0.0,
        activation="gelu",
        layer_norm_eps=1e-5,
        batch_first=True,
        norm_first=norm_first,
    )
    norm = nn.LayerNorm(d_model, eps=1e-5)
    return nn.TransformerEncoder(layer, n_layers, norm)


def torch_encoder_params_to_jax(encoder: nn.TransformerEncoder) -> dict:
    """Convert a torch TransformerEncoder state into our param pytree."""
    layers = []
    for mod in encoder.layers:
        layers.append(
            {
                "self_attn": {
                    "in_proj": {
                        "w": mod.self_attn.in_proj_weight.detach().numpy().T,
                        "b": mod.self_attn.in_proj_bias.detach().numpy(),
                    },
                    "out_proj": {
                        "w": mod.self_attn.out_proj.weight.detach().numpy().T,
                        "b": mod.self_attn.out_proj.bias.detach().numpy(),
                    },
                },
                "linear1": {
                    "w": mod.linear1.weight.detach().numpy().T,
                    "b": mod.linear1.bias.detach().numpy(),
                },
                "linear2": {
                    "w": mod.linear2.weight.detach().numpy().T,
                    "b": mod.linear2.bias.detach().numpy(),
                },
                "norm1": {
                    "scale": mod.norm1.weight.detach().numpy(),
                    "bias": mod.norm1.bias.detach().numpy(),
                },
                "norm2": {
                    "scale": mod.norm2.weight.detach().numpy(),
                    "bias": mod.norm2.bias.detach().numpy(),
                },
            }
        )
    return {
        "layers": layers,
        "norm": {
            "scale": encoder.norm.weight.detach().numpy(),
            "bias": encoder.norm.bias.detach().numpy(),
        },
    }


def make_torch_mha_and_norm(d_model=32, nhead=1):
    mha = nn.MultiheadAttention(d_model, num_heads=nhead, dropout=0.0, batch_first=True)
    norm = nn.LayerNorm(d_model, eps=1e-5)
    return mha, norm


def torch_mha_params_to_jax(mha: nn.MultiheadAttention, norm: nn.LayerNorm) -> dict:
    return {
        "attn": {
            "in_proj": {
                "w": mha.in_proj_weight.detach().numpy().T,
                "b": mha.in_proj_bias.detach().numpy(),
            },
            "out_proj": {
                "w": mha.out_proj.weight.detach().numpy().T,
                "b": mha.out_proj.bias.detach().numpy(),
            },
        },
        "norm": {
            "scale": norm.weight.detach().numpy(),
            "bias": norm.bias.detach().numpy(),
        },
    }
