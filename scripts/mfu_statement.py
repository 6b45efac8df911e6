"""Auditable MFU statement (VERDICT r4 next #4).

Computes ANALYTIC matmul/conv FLOPs per utterance for the flagship
surfaces from the model configs (no estimates hiding in constants — every
term is spelled out below), divides by the MEASURED amortized times from
bench_last.json (or CLI overrides), and states MFU against the chip's
nominal bf16 peak. This replaces the invented A100 `vs_baseline`
denominator as the defensible absolute perf claim: the reference
publishes no throughput numbers (SURVEY.md §6), so "fraction of chip
peak" is the honest comparison axis.

Accounting rules (same convention as the public scaling-book MFU):
  - 2 FLOPs per MAC; matmuls and convs only. LayerNorm/softmax/GELU/
    masking/elementwise are EXCLUDED (VPU work, <2% of total FLOPs —
    excluding them makes the MFU statement conservative).
  - attention counts QK^T and PV (4*T^2*D per layer) but not the softmax.
  - the backward counts dX and dW matmuls for TRAINABLE modules only;
    frozen towers' dW matmuls are pruned by the stop-gradient at frozen
    leaves (training/train_step.py) and the frozen HuBERT/ViT receive no
    cotangent at all (hidden states are stop_gradient'd; the image is a
    non-differentiated leaf) — both verified in round 2. The cascaded
    keywords DO pass through the frozen CLIP text tower, so its dX chain
    (~1x its forward) is counted.

Measured times: reads bench_last.json beside bench.py by default.
Usage:  python scripts/mfu_statement.py [--encode-utts-per-s X]
            [--train-b256-ms X] [--large-wsum-b256-ms X] [--peak-tflops X]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# TPU v5e (v5 lite) nominal peak: 197 TFLOP/s bf16 per chip (public spec;
# jax.devices() on this machine reports "TPU v5 lite"). Override with
# --peak-tflops for other chips.
V5E_BF16_PEAK_TFLOPS = 197.0

WAV_LEN = 102400  # 6.4 s @ 16 kHz — the bench operating point
GALLERY = 5000


def conv_chain_flops(conv_layers, n_samples):
    """2 * out_len * K * Cin * Cout per layer, VALID padding (per utt)."""
    fl, length, cin = 0, n_samples, 1
    for (ch, k, s) in conv_layers:
        length = (length - k) // s + 1
        fl += 2 * length * k * cin * ch
        cin = ch
    return fl, length


def encoder_layer_flops(t, d, ffn):
    """QKV (6TD^2) + out-proj (2TD^2) + QK^T/PV (4T^2D) + FFN (4TD*ffn)."""
    return 8 * t * d * d + 4 * t * t * d + 4 * t * d * ffn


def mha_layer_flops(t, d):
    """MultiheadAttentionAndNorm: QKV + out-proj + QK^T/PV, no FFN."""
    return 8 * t * d * d + 4 * t * t * d


def hubert_forward_flops(cfg):
    """Frozen HuBERT forward (per utt): conv chain + pos_conv + layers.
    Returns (flops, n_frames)."""
    conv, t = conv_chain_flops(cfg.conv_layers, WAV_LEN)
    d = cfg.encoder_embed_dim
    pos_conv = 2 * t * cfg.pos_conv_kernel * (d // cfg.pos_conv_groups) * d
    layers = cfg.encoder_layers * encoder_layer_flops(t, d, cfg.encoder_ffn_dim)
    wsum = 2 * cfg.num_hidden_states * t * d  # multiply-add chain
    return conv + pos_conv + layers + wsum, t


def vit_forward_flops(v):
    """CLIP ViT forward (per image): patch conv + layers + output proj."""
    grid = v.image_size // v.patch_size
    t = grid * grid + 1
    patch = 2 * grid * grid * (3 * v.patch_size * v.patch_size) * v.width
    layers = v.layers * encoder_layer_flops(t, v.width, 4 * v.width)
    return patch + layers + 2 * v.width * v.output_dim


def text_tower_flops(txt, n_tokens):
    """CLIP text transformer at the K+2-truncated keyword length."""
    layers = txt.layers * encoder_layer_flops(n_tokens, txt.width, 4 * txt.width)
    return layers + 2 * txt.width * txt.output_dim


def branch_flops(model, t_frames, train):
    """Parallel + cascaded branch (per utt) as configured; train counts
    dX+dW (3x fwd) for the trainable branch matmuls and 1x dX for the
    frozen text tower."""
    ms = model.config.model_settings
    fl = 0
    bwd = 3 if train else 1
    if model.use_parallel:
        pa = ms.parallel_branch.transformer_args
        fl += bwd * encoder_layer_flops(
            t_frames + 1, pa.d_model, pa.dim_feedforward
        )
        fl += bwd * 2 * pa.d_model * model.clip_cfg.embed_dim  # CLS proj
    if model.use_cascaded:
        ca = ms.cascaded_branch.transformer_args
        k = model.keyword_num
        fl += bwd * mha_layer_flops(t_frames + k, ca.d_model)
        vocab = (
            len(model.reduced_vocab.keep_ids)
            if model.reduced_vocab is not None
            else model.clip_cfg.text.vocab_size
        )
        dsub = model.subword_embd_dim
        # cosine scores vs the token-embedding table + VQ @ table
        fl += bwd * 2 * (2 * k * vocab * dsub)
        # frozen text tower over K+2 tokens: fwd + dX (dW pruned)
        fl += (2 if train else 1) * text_tower_flops(
            model.clip_cfg.text, k + 2
        )
    return fl


def build(variant):
    from speechclip_tpu.config import bench_variant_config
    from speechclip_tpu.models.speechclip import SpeechCLIPModel

    return SpeechCLIPModel(bench_variant_config(variant))


def analytic_flops():
    """Per-utterance analytic FLOPs for the three stated surfaces.

    {"encode": ..., "train_b256": ..., "large_wsum_b256": ...} — the
    numbers behind the MFU table in docs/DESIGN_NOTES.md and README.md;
    pinned by tests/test_mfu.py so a config/model change cannot silently
    stale the documented table."""
    # 1) flagship encode+retrieval (bench.py headline: parallel base, b1024)
    m = build("base_par")
    hub, t = hubert_forward_flops(m.audio_cfg)
    enc = hub + branch_flops(m, t, train=False) + 2 * GALLERY * m.clip_cfg.embed_dim

    # 2) base train step b256, honest (both branches, ViT fwd in-step)
    m = build("base")
    hub, t = hubert_forward_flops(m.audio_cfg)
    train = (
        hub
        + vit_forward_flops(m.clip_cfg.vision)
        + branch_flops(m, t, train=True)
        + 2 * 2 * 256 * m.clip_cfg.embed_dim  # logits, both directions
    )

    # 3) large_par wsum_remat b256 (image cache on: ViT absent; the wsum
    #    custom VJP recomputes ONE extra frozen forward per step)
    m = build("large_par")
    hub, t = hubert_forward_flops(m.audio_cfg)
    large = 2 * hub + branch_flops(m, t, train=True) + 2 * 2 * 256 * m.clip_cfg.embed_dim

    return {"encode": enc, "train_b256": train, "large_wsum_b256": large}


def main(argv):
    opts = {}
    it = iter(argv)
    for a in it:
        if a.startswith("--"):
            try:
                opts[a[2:]] = float(next(it))
            except StopIteration:
                raise SystemExit(f"{a} requires a value")

    measured = {}
    bench_last = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_last.json",
    )
    if os.path.exists(bench_last):
        with open(bench_last) as f:
            rec = json.load(f)
        measured["encode_utts_per_s"] = rec.get("value")
        ex = rec.get("extras", {})
        if isinstance(ex.get("train_step_ms_b256"), (int, float)):
            measured["train_b256_ms"] = ex["train_step_ms_b256"]
    for k in ("encode-utts-per-s", "train-b256-ms", "large-wsum-b256-ms"):
        if k in opts:
            measured[k.replace("-", "_")] = opts[k]
    peak = opts.get("peak-tflops", V5E_BF16_PEAK_TFLOPS)

    flops = analytic_flops()
    rows = []
    if measured.get("encode_utts_per_s"):
        enc = flops["encode"]
        tf = enc * measured["encode_utts_per_s"] / 1e12
        rows.append(
            ("flagship encode+retrieval (b1024)", enc / 1e9,
             f"{measured['encode_utts_per_s']:.0f} utt/s", tf)
        )
    if measured.get("train_b256_ms"):
        step = flops["train_b256"]
        per_utt_s = measured["train_b256_ms"] / 1e3 / 256
        rows.append(
            ("base train step b256 (honest)", step / 1e9,
             f"{measured['train_b256_ms']:.1f} ms/step", step / per_utt_s / 1e12)
        )
    if measured.get("large_wsum_b256_ms"):
        step = flops["large_wsum_b256"]
        per_utt_s = measured["large_wsum_b256_ms"] / 1e3 / 256
        rows.append(
            ("large_par train b256 wsum_remat+imgcache", step / 1e9,
             f"{measured['large_wsum_b256_ms']:.1f} ms/step", step / per_utt_s / 1e12)
        )

    print(f"chip nominal bf16 peak: {peak:.0f} TFLOP/s")
    print(f"{'surface':44s} {'GFLOP/utt':>10s} {'measured':>16s} "
          f"{'TFLOP/s':>8s} {'MFU':>6s}")
    out = {}
    for name, gflop, meas, tflops in rows:
        print(f"{name:44s} {gflop:10.1f} {meas:>16s} {tflops:8.1f} "
              f"{tflops / peak:6.1%}")
        out[name] = {
            "gflop_per_utt": round(gflop, 1),
            "measured": meas,
            "tflops": round(tflops, 1),
            "mfu": round(tflops / peak, 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1:])
