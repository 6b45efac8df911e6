"""Serving-runtime throughput: concurrent requests through EncoderService.

Exports tiny-dims artifacts on the ambient backend (or --platform cpu),
warms up, then measures end-to-end request throughput at several client
concurrency levels — the number that matters for the serving story is how
well the micro-batcher turns concurrent single-utterance requests into
full device batches (mean achieved batch size vs the fixed batch).

Run: python scripts/bench_serving.py [--platform cpu] [BATCH [WAV_SAMPLES [N_REQ]]]
(tiny dims by default for the axon relay, same constraint as
scripts/verify_export_tpu.py — export bakes weights as constants.)
"""

import sys
import time

sys.path.insert(0, ".")

PLATFORM = None
N_DEVICES = None
args = []
_argv = iter(sys.argv[1:])
for a in _argv:
    if a.startswith("--platform="):
        PLATFORM = a.split("=", 1)[1]
    elif a == "--platform":
        PLATFORM = next(_argv, None)
    elif a.startswith("--devices="):
        N_DEVICES = int(a.split("=", 1)[1])
    elif a == "--devices":
        N_DEVICES = int(next(_argv))
    elif a.startswith("--"):
        raise SystemExit(f"unknown flag {a!r} (valid: --platform, --devices)")
    else:
        args.append(a)
BATCH = int(args[0]) if len(args) > 0 else 8
WAV_SAMPLES = int(args[1]) if len(args) > 1 else 16000
N_REQ = int(args[2]) if len(args) > 2 else 64


def main():
    import os
    import tempfile
    import threading

    import numpy as np

    import jax

    if PLATFORM:
        jax.config.update("jax_platforms", PLATFORM)
    if N_DEVICES and N_DEVICES > 1 and PLATFORM == "cpu":
        jax.config.update("jax_num_cpu_devices", N_DEVICES)

    from speechclip_tpu import export as export_mod
    from speechclip_tpu.config import flagship_tiny_config
    from speechclip_tpu.models.speechclip import SpeechCLIPModel
    from speechclip_tpu.serving import EncoderService

    print(
        f"backend: {jax.devices()[0].platform} x{len(jax.devices())} "
        f"(fixed batch {BATCH}, wav {WAV_SAMPLES}, {N_REQ} requests/level)",
        flush=True,
    )
    model = SpeechCLIPModel(flagship_tiny_config())
    params, state = model.init(jax.random.key(0))

    art_dir = tempfile.mkdtemp(prefix="serve_bench_")
    blob = export_mod.export_encode_speech(
        model, params, state, BATCH, WAV_SAMPLES
    )
    with open(os.path.join(art_dir, "encode_speech.stablehlo"), "wb") as f:
        f.write(blob)

    devices = (
        jax.devices()[:N_DEVICES] if N_DEVICES and N_DEVICES > 1 else None
    )
    if devices:
        print(f"round-robin over {len(devices)} devices", flush=True)
    svc = EncoderService(art_dir, max_wait_ms=8.0, devices=devices)
    t0 = time.perf_counter()
    svc.warmup()
    print(f"warmup (compile): {time.perf_counter() - t0:.1f} s", flush=True)

    rng = np.random.default_rng(0)
    wav = rng.standard_normal(WAV_SAMPLES).astype(np.float32)

    for concurrency in (1, BATCH // 2 or 1, BATCH, 2 * BATCH):
        done = threading.Semaphore(0)
        t_start = time.perf_counter()
        b0 = svc.batchers["encode_speech"].batches_run
        remaining = [N_REQ]
        lock = threading.Lock()

        def client():
            while True:
                with lock:
                    if remaining[0] == 0:
                        break
                    remaining[0] -= 1
                svc.encode_speech(wav)
            done.release()

        threads = [threading.Thread(target=client) for _ in range(concurrency)]
        for t in threads:
            t.start()
        for _ in threads:
            done.acquire()
        dt = time.perf_counter() - t_start
        batches = svc.batchers["encode_speech"].batches_run - b0
        print(
            f"concurrency {concurrency:3d}: {N_REQ / dt:7.1f} req/s "
            f"({dt * 1e3 / N_REQ:6.2f} ms/req amortized, "
            f"mean batch {N_REQ / max(batches, 1):.1f} over {batches} device calls)",
            flush=True,
        )
    svc.close()
    print("serving bench OK", flush=True)


if __name__ == "__main__":
    main()
