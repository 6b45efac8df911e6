"""Model layer: HuBERT, CLIP towers, SpeechCLIP branches & main model."""

from . import branches, clip, hubert
from .speechclip import SpeechCLIPModel
from .tokenizer import CLIPTokenizer

__all__ = ["branches", "clip", "hubert", "SpeechCLIPModel", "CLIPTokenizer"]
