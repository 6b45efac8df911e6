"""Serving-runtime throughput: concurrent requests through EncoderService.

Two backends (speechclip_tpu/serving.py):
  --backend artifact  — tiny-dims StableHLO export artifacts (the relay
                        cannot compile weight-constant artifacts at
                        flagship dims — docs/DESIGN_NOTES.md), so this
                        backend only ever drives toy dims on TPU.
  --backend jit       — EncoderService.from_model: the encoder surfaces
                        jitted with params as call ARGUMENTS. This is the
                        backend that reaches PRODUCTION dims on the axon
                        relay (same constraint class as bench.py, which
                        compiles these functions at full dims every run).

Dims:
  --dims tiny         — the hermetic tiny model (CI/CPU smoke).
  --dims flagship     — HuBERT-base + ViT-B/32 at production dims with
                        real wav-length buckets (3.2 s + 6.4 s, the
                        loader's quantile-bucket convention; 6.4 s is the
                        reference's max_audio_len crop,
                        config/.../spchclp_p.yaml:104).
  --dims large        — HuBERT-large + ViT-L/14 (parallel branch), the
                        reference's 4-GPU model, same buckets.

Measures, at several client concurrency levels: end-to-end request
throughput, per-request latency p50/p95 (what a serving SLA is written
against), and mean achieved device batch (how well the micro-batcher
turns concurrent single-utterance requests into full batches).

Run: python scripts/bench_serving.py [--backend jit] [--dims flagship]
        [--platform cpu] [--devices N] [--dtype bf16]
        [BATCH [WAV_SAMPLES [N_REQ]]]
(BATCH = fixed device batch; WAV_SAMPLES only applies to --dims tiny —
flagship/large always use the 51200/102400 bucket pair.)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PLATFORM = None
N_DEVICES = None
BACKEND = "artifact"
DIMS = "tiny"
DTYPE = None
COMPACT_WAV = False
MAX_WAIT_MS = 8.0
args = []
def _flagval(it, flag):
    try:
        return next(it)
    except StopIteration:
        raise SystemExit(f"{flag} requires a value")

_argv = iter(sys.argv[1:])
for a in _argv:
    if a.startswith("--platform="):
        PLATFORM = a.split("=", 1)[1]
    elif a == "--platform":
        PLATFORM = _flagval(_argv, "--platform")
    elif a.startswith("--devices="):
        N_DEVICES = int(a.split("=", 1)[1])
    elif a == "--devices":
        N_DEVICES = int(_flagval(_argv, "--devices"))
    elif a.startswith("--backend="):
        BACKEND = a.split("=", 1)[1]
    elif a == "--backend":
        BACKEND = _flagval(_argv, "--backend")
    elif a.startswith("--dims="):
        DIMS = a.split("=", 1)[1]
    elif a == "--dims":
        DIMS = _flagval(_argv, "--dims")
    elif a == "--dtype":
        DTYPE = _flagval(_argv, "--dtype")
    elif a.startswith("--dtype="):
        DTYPE = a.split("=", 1)[1]
    elif a == "--compact-wav":
        COMPACT_WAV = True
    elif a.startswith("--max-wait-ms="):
        MAX_WAIT_MS = float(a.split("=", 1)[1])
    elif a == "--max-wait-ms":
        MAX_WAIT_MS = float(_flagval(_argv, "--max-wait-ms"))
    elif a.startswith("--"):
        raise SystemExit(
            f"unknown flag {a!r} "
            "(valid: --platform, --devices, --backend, --dims, --dtype, "
            "--compact-wav, --max-wait-ms)"
        )
    else:
        args.append(a)
if BACKEND not in ("artifact", "jit"):
    raise SystemExit(f"--backend must be artifact|jit, got {BACKEND!r}")
if DIMS not in ("tiny", "flagship", "large"):
    raise SystemExit(f"--dims must be tiny|flagship|large, got {DIMS!r}")
if DIMS != "tiny" and BACKEND == "artifact":
    raise SystemExit(
        f"--dims {DIMS} needs --backend jit: the relay cannot compile "
        "weight-constant artifacts at production dims (DESIGN_NOTES)"
    )
BATCH = int(args[0]) if len(args) > 0 else 8
WAV_SAMPLES = int(args[1]) if len(args) > 1 else 16000
N_REQ = int(args[2]) if len(args) > 2 else 64

FLAGSHIP_BUCKETS = (51200, 102400)  # 3.2 s / 6.4 s @ 16 kHz


def build_service(jax):
    import os
    import tempfile

    from speechclip_tpu.serving import EncoderService

    devices = (
        jax.devices()[:N_DEVICES] if N_DEVICES and N_DEVICES > 1 else None
    )
    if devices:
        print(f"round-robin over {len(devices)} devices", flush=True)

    if DIMS in ("flagship", "large"):
        from __graft_entry__ import _flagship_config
        from speechclip_tpu.config import flagship_large_config
        from speechclip_tpu.models.speechclip import SpeechCLIPModel

        if DIMS == "large":
            cfg = flagship_large_config()
            cfg.model_settings.cascaded_objective_weight = 0.0
        else:
            cfg = _flagship_config()
        cfg.audio_encoder.conv_batch_chunk = min(BATCH, 256)
        model = SpeechCLIPModel(cfg)
        params, state = model.init(jax.random.key(0))
        buckets = FLAGSHIP_BUCKETS
        return (
            EncoderService.from_model(
                model, params, state, wav_buckets=buckets, batch=BATCH,
                dtype=DTYPE, compact_wav=COMPACT_WAV, max_wait_ms=MAX_WAIT_MS,
                devices=devices,
            ),
            buckets,
        )

    from speechclip_tpu.config import flagship_tiny_config
    from speechclip_tpu.models.speechclip import SpeechCLIPModel

    model = SpeechCLIPModel(flagship_tiny_config())
    params, state = model.init(jax.random.key(0))
    if BACKEND == "jit":
        return (
            EncoderService.from_model(
                model, params, state, wav_buckets=(WAV_SAMPLES,), batch=BATCH,
                dtype=DTYPE, compact_wav=COMPACT_WAV, max_wait_ms=MAX_WAIT_MS,
                devices=devices,
            ),
            (WAV_SAMPLES,),
        )

    from speechclip_tpu import export as export_mod

    art_dir = tempfile.mkdtemp(prefix="serve_bench_")
    blob = export_mod.export_encode_speech(
        model, params, state, BATCH, WAV_SAMPLES
    )
    with open(os.path.join(art_dir, "encode_speech.stablehlo"), "wb") as f:
        f.write(blob)
    return (
        EncoderService(art_dir, max_wait_ms=MAX_WAIT_MS, devices=devices),
        (WAV_SAMPLES,),
    )


def main():
    import numpy as np

    import jax

    if PLATFORM:
        jax.config.update("jax_platforms", PLATFORM)
    if N_DEVICES and N_DEVICES > 1 and PLATFORM == "cpu":
        jax.config.update("jax_num_cpu_devices", N_DEVICES)

    print(
        f"backend: {BACKEND}/{DIMS} on {jax.devices()[0].platform} "
        f"x{len(jax.devices())} (fixed batch {BATCH}, {N_REQ} requests/level)",
        flush=True,
    )
    svc, buckets = build_service(jax)
    speech_batchers = [
        name for name in svc.batchers if name.startswith("encode_speech")
    ]
    t0 = time.perf_counter()
    svc.warmup()
    print(f"warmup (compile): {time.perf_counter() - t0:.1f} s", flush=True)

    rng = np.random.default_rng(0)
    # mixed lengths spanning the buckets: short requests must ride the
    # short bucket, not pay long-bucket compute
    wavs = [
        rng.standard_normal(n).astype(np.float32)
        for n in np.linspace(buckets[0] // 2, buckets[-1], 8).astype(int)
    ]

    from speechclip_tpu.serving import drive_requests

    for concurrency in (1, BATCH // 2 or 1, BATCH, 2 * BATCH):
        b0 = {n: svc.batchers[n].batches_run for n in speech_batchers}
        dt, latencies = drive_requests(svc, wavs, N_REQ, concurrency)
        batches = sum(
            svc.batchers[n].batches_run - b0[n] for n in speech_batchers
        )
        lat = np.asarray(latencies) * 1e3
        print(
            f"concurrency {concurrency:3d}: {N_REQ / dt:7.1f} utt/s "
            f"(latency p50 {np.percentile(lat, 50):7.1f} ms / "
            f"p95 {np.percentile(lat, 95):7.1f} ms, "
            f"mean batch {N_REQ / max(batches, 1):.1f} over {batches} device calls)",
            flush=True,
        )
    svc.close()
    print("serving bench OK", flush=True)


if __name__ == "__main__":
    main()
