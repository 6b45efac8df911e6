"""CLIP byte-pair-encoding tokenizer (host side).

Capability equivalent of the reference's ``clip.simple_tokenizer.
SimpleTokenizer`` dependency (used at avssl/module/clip_official.py:10,57):
lower-cased, byte-level BPE over the classic
``bpe_simple_vocab_16e6.txt.gz`` merges list, vocabulary =
256 byte symbols + 256 ``</w>`` word-end symbols + ~48k merge tokens +
``<|startoftext|>`` / ``<|endoftext|>``.

The merges file is an external asset (same file OpenAI CLIP ships); pass its
path, or point the SPEECHCLIP_BPE_PATH env var at it. Text cleaning matches
the reference pipeline (ftfy.fix_text -> double html-unescape -> whitespace
normalization, clip/simple_tokenizer.py semantics): ftfy itself is not a
dependency, so ``_fix_mojibake`` implements its core repair — iterative
cp1252/latin-1 -> UTF-8 re-decoding plus NFC normalization — which covers
the mojibake classes that occur in caption corpora ("Ã©" -> "é",
"â€™" -> "’", double-encoded UTF-8); exotic encodings ftfy also handles
(UTF-16 shifts, lossy replacements) stay as-is.
"""

from __future__ import annotations

import functools
import gzip
import html
import os
from typing import Iterable, List, Sequence, Union

import numpy as np
import regex as re

SOT_TEXT = "<|startoftext|>"
EOT_TEXT = "<|endoftext|>"
CONTEXT_LENGTH = 77

_TOKEN_PATTERN = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    re.IGNORECASE,
)


@functools.lru_cache()
def bytes_to_unicode() -> dict:
    """Reversible byte -> printable-unicode map (GPT-2 convention)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


#: UTF-8-as-cp1252 mojibake gating. Every multi-byte UTF-8 sequence starts
#: with a lead byte 0xC2-0xF4; its cp1252 renderings are the LEAD class
#: below ('Â' 'Ã' ... 'Ð' 'Ñ' for Cyrillic, 'â' for 3-byte punctuation,
#: accented letters like 'ß' 'é' too). The repair fires when either
#:   (a) a CLASSIC marker appears — 'Ã'/'Â' (Latin-1-range 2-byte leads)
#:       or 'â' (3-byte E2 class: smart quotes, dashes, '€') — these are
#:       virtually never sentence text themselves; or
#:   (b) at least TWO lead-class characters appear — genuine prose like
#:       "Spaß”" has exactly one accented letter adjacent to a
#:       continuation-range char and must NOT be "repaired" even though
#:       its bytes coincidentally decode as valid UTF-8, while real
#:       mojibake of any multi-char word carries one lead per original
#:       character ("ÐŸÑ€Ð¸Ð²ÐµÑ‚" has six).
_MOJIBAKE_CLASSIC = ("Ã", "Â", "â")
_MOJIBAKE_LEADS = frozenset(
    bytes([b]).decode("cp1252") for b in range(0xC2, 0xF5)
)


def _fix_mojibake(text: str) -> str:
    """ftfy's core repair, dependency-free: text that was UTF-8 but got
    decoded as cp1252/latin-1 re-encodes byte-identically and decodes as
    valid UTF-8 — genuine text essentially never does (multi-byte UTF-8
    lead/continuation patterns are vanishingly rare in real cp1252 prose).
    Two passes heal double-encoded UTF-8. NFC-normalize like ftfy does.

    The cp1252 re-decode only fires when the marker heuristic says the text
    looks like mojibake (classic marker, or >= 2 lead-class chars — see
    ``_MOJIBAKE_CLASSIC``/``_MOJIBAKE_LEADS``) and logs at DEBUG when it
    rewrites, so corpus-level false positives are observable; NFC
    normalization applies unconditionally (matching ftfy.fix_text's
    default)."""
    import unicodedata

    looks_mojibake = any(m in text for m in _MOJIBAKE_CLASSIC) or (
        sum(c in _MOJIBAKE_LEADS for c in text) >= 2
    )
    if not looks_mojibake:
        return unicodedata.normalize("NFC", text)
    original = text
    for _ in range(2):
        try:
            raw = text.encode("cp1252")
        except UnicodeEncodeError:
            try:
                raw = text.encode("latin-1")
            except UnicodeEncodeError:
                break
        try:
            fixed = raw.decode("utf-8")
        except UnicodeDecodeError:
            break
        if fixed == text:
            break
        text = fixed
    if text != original:
        import logging

        logging.getLogger(__name__).debug(
            "mojibake repair fired: %r -> %r", original, text
        )
    return unicodedata.normalize("NFC", text)


def _clean(text: str) -> str:
    text = _fix_mojibake(text)
    text = html.unescape(html.unescape(text))
    text = re.sub(r"\s+", " ", text)
    return text.strip()


def _get_pairs(word: Sequence[str]) -> set:
    return {(a, b) for a, b in zip(word[:-1], word[1:])}


def default_bpe_path() -> str | None:
    env = os.environ.get("SPEECHCLIP_BPE_PATH")
    if env and os.path.exists(env):
        return env
    here = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..",
        "assets",
        "bpe_simple_vocab_16e6.txt.gz",
    )
    return here if os.path.exists(here) else None


class CLIPTokenizer:
    def __init__(self, bpe_path: str | None = None, max_merges: int = 48894):
        bpe_path = bpe_path or default_bpe_path()
        if bpe_path is None:
            raise FileNotFoundError(
                "CLIP BPE merges file not found; set SPEECHCLIP_BPE_PATH or "
                "pass bpe_path (expected bpe_simple_vocab_16e6.txt.gz)."
            )
        if bpe_path.endswith(".gz"):
            with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
                lines = f.read().split("\n")
        else:
            with open(bpe_path, encoding="utf-8") as f:
                lines = f.read().split("\n")
        merges = [
            tuple(line.split()) for line in lines[1 : max_merges + 1] if line
        ]

        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        vocab = list(self.byte_encoder.values())
        vocab += [v + "</w>" for v in vocab]
        vocab += ["".join(m) for m in merges]
        vocab += [SOT_TEXT, EOT_TEXT]
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self._cache = {SOT_TEXT: SOT_TEXT, EOT_TEXT: EOT_TEXT}

    @property
    def sot_id(self) -> int:
        return self.encoder[SOT_TEXT]

    @property
    def eot_id(self) -> int:
        return self.encoder[EOT_TEXT]

    @property
    def vocab_size(self) -> int:
        return len(self.encoder)

    def _bpe(self, token: str) -> str:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(
                pairs, key=lambda p: self.bpe_ranks.get(p, float("inf"))
            )
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if (
                    i < len(word) - 1
                    and word[i] == first
                    and word[i + 1] == second
                ):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self._cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        text = _clean(text).lower()
        for token in re.findall(_TOKEN_PATTERN, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(
                self.encoder[t] for t in self._bpe(token).split(" ")
            )
        return ids

    def decode(self, ids: Iterable[int]) -> str:
        """Ids -> text; special tokens pass through literally, everything
        else goes back through the byte decoder."""
        text = "".join(self.decoder[int(i)] for i in ids)
        buf = bytearray()
        res: List[str] = []
        idx = 0
        while idx < len(text):
            if text.startswith(SOT_TEXT, idx):
                res.append(
                    buf.decode("utf-8", errors="replace") if buf else ""
                )
                buf = bytearray()
                res.append(SOT_TEXT)
                idx += len(SOT_TEXT)
            elif text.startswith(EOT_TEXT, idx):
                res.append(
                    buf.decode("utf-8", errors="replace") if buf else ""
                )
                buf = bytearray()
                res.append(EOT_TEXT)
                idx += len(EOT_TEXT)
            else:
                ch = text[idx]
                if ch in self.byte_decoder:
                    buf.append(self.byte_decoder[ch])
                idx += 1
        if buf:
            res.append(buf.decode("utf-8", errors="replace"))
        return "".join(res).replace("</w>", " ")

    def tokenize(
        self,
        texts: Union[str, Sequence[str]],
        context_length: int = CONTEXT_LENGTH,
        truncate: bool = True,
    ) -> np.ndarray:
        """-> (B, context_length) int64, [SOT, ..., EOT, 0...] per row
        (contract of clip.tokenize, used at reference base_dataset.py:112-116)."""
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), context_length), np.int64)
        for i, text in enumerate(texts):
            ids = [self.sot_id] + self.encode(text) + [self.eot_id]
            if len(ids) > context_length:
                if not truncate:
                    raise RuntimeError(
                        f"input too long for context {context_length}: {text!r}"
                    )
                ids = ids[:context_length]
                ids[-1] = self.eot_id
            out[i, : len(ids)] = ids
        return out
