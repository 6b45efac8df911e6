"""Pins for the analytic-FLOP side of the MFU statement (round 5).

The MFU table in docs/DESIGN_NOTES.md ("MFU statement") and README.md
divides ANALYTIC matmul/conv FLOPs (scripts/mfu_statement.py) by measured
step times. The measured halves are driver-visible through bench.py; the
analytic halves are pinned HERE so a config or model-shape change cannot
silently stale the published GFLOP/utt column — if these numbers move,
update the table (and re-derive MFU) in the same change.

Reference surfaces being counted: the flagship encode path
(/root/reference example.py:27-34), the b256 train step
(avssl/model/kwClip.py:143-191 at config/.../spchclp_p.yaml batch 256),
and the large wsum-remat single-chip step (same semantics at
hubert_large dims).
"""

import importlib.util
import os

import pytest

_SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "mfu_statement.py",
)


@pytest.fixture(scope="module")
def mfu():
    spec = importlib.util.spec_from_file_location("mfu_statement", _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_conv_chain_frame_count_matches_conv_arithmetic(mfu):
    """The analytic conv chain uses TRUE VALID-padding conv arithmetic:
    319 frames at 102400 samples — one fewer than the reference's
    round(len/320) length formula (speech_encoder_plus.py:604-611, the
    known off-by-one SURVEY.md §7 flags), so the FLOP count errs
    conservative."""
    cfg = mfu.build("base_par").audio_cfg
    _, frames = mfu.conv_chain_flops(cfg.conv_layers, mfu.WAV_LEN)
    assert frames == 319
    assert round(mfu.WAV_LEN / 320) == 320  # the reference's formula


def test_encoder_layer_flops_formula(mfu):
    # QKV 6TD^2 + out-proj 2TD^2 + QK^T/PV 4T^2D + FFN 4TD*F, by hand
    t, d, f = 10, 8, 32
    assert mfu.encoder_layer_flops(t, d, f) == (
        6 * t * d * d + 2 * t * d * d + 4 * t * t * d + 4 * t * d * f
    )
    assert mfu.mha_layer_flops(t, d) == 8 * t * d * d + 4 * t * t * d


def test_analytic_gflops_match_published_table(mfu):
    """The GFLOP/utt column of the published MFU table (DESIGN_NOTES.md
    "MFU statement", README.md "Benchmarks"): encode 97.2, base train
    125.3, large wsum train 504.3."""
    flops = mfu.analytic_flops()
    assert flops["encode"] / 1e9 == pytest.approx(97.2, abs=0.05)
    assert flops["train_b256"] / 1e9 == pytest.approx(125.3, abs=0.05)
    assert flops["large_wsum_b256"] / 1e9 == pytest.approx(504.3, abs=0.05)
    # internal consistency: the large wsum step recomputes the frozen
    # forward (2x a >hubert-base-sized forward), so it must dominate
    assert flops["large_wsum_b256"] > 3 * flops["train_b256"]
