"""Hand-written torch reference modules used ONLY by the test suite.

These re-state the mathematical contracts of the reference's torch modules
(losses, VQ, kw-BN, branch transformers) so our JAX ops can be checked
numerically against torch semantics without importing the reference repo.
Torch here is the CPU oracle, never a runtime dependency of the framework.
"""

from __future__ import annotations

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


# ---------------------------------------------------------------------------
# CLIP ModifiedResNet (the RN* image towers the reference reaches through
# clip.load, clip_official.py:14-23): re-stated from the public OpenAI CLIP
# architecture — 3-conv stem + 2x2 avgpool, bottlenecks whose stride-2 conv
# is replaced by stride-1 conv + avgpool (anti-aliased downsampling), and a
# final AttentionPool2d. Used as the CPU oracle for models/clip.py's RN path.
# ---------------------------------------------------------------------------
class CLIPBottleneckTorch(nn.Module):
    expansion = 4

    def __init__(self, inplanes: int, planes: int, stride: int = 1):
        super().__init__()
        from collections import OrderedDict

        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.avgpool = nn.AvgPool2d(stride) if stride > 1 else nn.Identity()
        self.conv3 = nn.Conv2d(planes, planes * self.expansion, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * self.expansion)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        self.stride = stride
        if stride > 1 or inplanes != planes * self.expansion:
            self.downsample = nn.Sequential(
                OrderedDict(
                    [
                        ("-1", nn.AvgPool2d(stride)),
                        (
                            "0",
                            nn.Conv2d(
                                inplanes,
                                planes * self.expansion,
                                1,
                                stride=1,
                                bias=False,
                            ),
                        ),
                        ("1", nn.BatchNorm2d(planes * self.expansion)),
                    ]
                )
            )

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        out = out + identity
        return self.relu(out)


class CLIPAttentionPool2dTorch(nn.Module):
    def __init__(
        self,
        spacial_dim: int,
        embed_dim: int,
        num_heads: int,
        output_dim: int | None = None,
    ):
        super().__init__()
        self.positional_embedding = nn.Parameter(
            torch.randn(spacial_dim**2 + 1, embed_dim) / embed_dim**0.5
        )
        self.k_proj = nn.Linear(embed_dim, embed_dim)
        self.q_proj = nn.Linear(embed_dim, embed_dim)
        self.v_proj = nn.Linear(embed_dim, embed_dim)
        self.c_proj = nn.Linear(embed_dim, output_dim or embed_dim)
        self.num_heads = num_heads

    def forward(self, x):
        x = x.flatten(start_dim=2).permute(2, 0, 1)  # NCHW -> (HW)NC
        x = torch.cat([x.mean(dim=0, keepdim=True), x], dim=0)
        x = x + self.positional_embedding[:, None, :].to(x.dtype)
        x, _ = F.multi_head_attention_forward(
            query=x[:1],
            key=x,
            value=x,
            embed_dim_to_check=x.shape[-1],
            num_heads=self.num_heads,
            q_proj_weight=self.q_proj.weight,
            k_proj_weight=self.k_proj.weight,
            v_proj_weight=self.v_proj.weight,
            in_proj_weight=None,
            in_proj_bias=torch.cat(
                [self.q_proj.bias, self.k_proj.bias, self.v_proj.bias]
            ),
            bias_k=None,
            bias_v=None,
            add_zero_attn=False,
            dropout_p=0.0,
            out_proj_weight=self.c_proj.weight,
            out_proj_bias=self.c_proj.bias,
            use_separate_proj_weight=True,
            training=self.training,
            need_weights=False,
        )
        return x.squeeze(0)


class ModifiedResNetTorch(nn.Module):
    def __init__(
        self,
        layers,
        output_dim: int,
        heads: int,
        input_resolution: int = 224,
        width: int = 64,
    ):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width // 2, 3, stride=2, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(width // 2)
        self.conv2 = nn.Conv2d(width // 2, width // 2, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(width // 2)
        self.conv3 = nn.Conv2d(width // 2, width, 3, padding=1, bias=False)
        self.bn3 = nn.BatchNorm2d(width)
        self.relu = nn.ReLU(inplace=True)
        self.avgpool = nn.AvgPool2d(2)
        self._inplanes = width
        self.layer1 = self._make_layer(width, layers[0])
        self.layer2 = self._make_layer(width * 2, layers[1], stride=2)
        self.layer3 = self._make_layer(width * 4, layers[2], stride=2)
        self.layer4 = self._make_layer(width * 8, layers[3], stride=2)
        self.attnpool = CLIPAttentionPool2dTorch(
            input_resolution // 32, width * 32, heads, output_dim
        )

    def _make_layer(self, planes: int, blocks: int, stride: int = 1):
        layers = [CLIPBottleneckTorch(self._inplanes, planes, stride)]
        self._inplanes = planes * CLIPBottleneckTorch.expansion
        for _ in range(1, blocks):
            layers.append(CLIPBottleneckTorch(self._inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.relu(self.bn2(self.conv2(x)))
        x = self.relu(self.bn3(self.conv3(x)))
        x = self.avgpool(x)
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        return self.attnpool(x)


def randomize_bn_stats(module: nn.Module, seed: int = 0) -> None:
    """Give every BatchNorm nontrivial running stats so inference-mode
    parity actually exercises the (mean, var) math, not the (0, 1) init."""
    gen = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=gen) * 0.2)
            m.running_var.copy_(
                torch.rand(m.num_features, generator=gen) * 1.5 + 0.25
            )
