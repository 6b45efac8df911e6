"""Weight conversion: torch checkpoints -> JAX param pytrees."""

from .from_torch import (
    clip_from_hf,
    clip_from_openai,
    hubert_from_fairseq,
    hubert_from_hf,
)
from .reference_ckpt import convert_reference_checkpoint, load_reference_checkpoint

__all__ = [
    "clip_from_hf",
    "clip_from_openai",
    "hubert_from_fairseq",
    "hubert_from_hf",
    "convert_reference_checkpoint",
    "load_reference_checkpoint",
]
