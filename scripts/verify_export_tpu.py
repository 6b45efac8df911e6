"""Drive the AOT StableHLO export artifacts on the REAL TPU backend.

Guards the serving-export surface (speechclip_tpu/export.py) against
platform-lowering regressions the CPU round-trip test (tests/test_export.py)
cannot see: exports the three encoders on the ambient (axon) backend, loads
each artifact via load_exported, runs one batch, checks finiteness, and
reports per-call latency (single-shot; the relay adds ~15-30 ms dispatch —
treat these as upper bounds, not throughput numbers).

Default = TINY tower dims (both branches, kw-BN, VQ, reduced vocab — the
full export code path at small constant size). Export bakes weights in as
StableHLO constants, and this machine's remote-compile relay stalls/rejects
multi-hundred-MB constant graphs (same class as the HTTP 413 closed-over-
params limit, docs/DESIGN_NOTES.md) — a round-3 full-dims attempt produced
no output in 50 min. Pass --full only in a real serving environment with a
local compiler.

Run: python scripts/verify_export_tpu.py [--full] [BATCH [WAV_SAMPLES]]
(verify-skill step; tiny ~3-8 min on the relay.)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# --platform=cpu / --platform cpu: smoke the whole drive off-TPU (e.g.
# during tunnel outages)
FULL = False
PLATFORM = None
args = []
_argv = iter(sys.argv[1:])
for a in _argv:
    if a == "--full":
        FULL = True
    elif a.startswith("--platform="):
        PLATFORM = a.split("=", 1)[1]
    elif a == "--platform":
        PLATFORM = next(_argv, None)
    elif a.startswith("--"):
        raise SystemExit(f"unknown flag {a!r} (valid: --full, --platform)")
    else:
        args.append(a)
BATCH = int(args[0]) if len(args) > 0 else 8
WAV_SAMPLES = int(args[1]) if len(args) > 1 else 16000


def main():
    import jax

    if PLATFORM:
        jax.config.update("jax_platforms", PLATFORM)
    import jax.numpy as jnp

    from speechclip_tpu import export as export_mod
    from speechclip_tpu.config import flagship_config, flagship_tiny_config
    from speechclip_tpu.models.speechclip import SpeechCLIPModel

    print(
        f"backend: {jax.devices()[0].platform} x{len(jax.devices())} "
        f"({'FULL' if FULL else 'tiny'} dims, batch {BATCH})",
        flush=True,
    )
    # tiny = full export path with relay-sized constants (see module doc)
    cfg = flagship_config() if FULL else flagship_tiny_config()
    model = SpeechCLIPModel(cfg)
    params, state = model.init(jax.random.key(0))

    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((BATCH, WAV_SAMPLES)).astype(np.float32))
    wav_len = jnp.asarray(np.full((BATCH,), WAV_SAMPLES, np.int32))
    size = model.clip_cfg.vision.image_size
    images = jnp.asarray(
        rng.standard_normal((BATCH, size, size, 3)).astype(np.float32)
    )
    ctx = model.clip_cfg.text.context_length
    text = np.zeros((BATCH, ctx), np.int32)
    text[:, 0] = model.sot_id
    text[:, 5] = model.eot_id
    eots = jnp.asarray(np.full((BATCH,), 5, np.int32))

    cases = [
        (
            "encode_speech",
            lambda: export_mod.export_encode_speech(
                model, params, state, BATCH, WAV_SAMPLES
            ),
            (wav, wav_len),
        ),
        (
            "encode_image",
            lambda: export_mod.export_encode_image(model, params, BATCH),
            (images,),
        ),
        (
            "encode_text",
            lambda: export_mod.export_encode_text(model, params, BATCH),
            (text, eots),
        ),
    ]
    blobs = {}
    for name, exporter, call_args in cases:
        t0 = time.perf_counter()
        blob = blobs[name] = exporter()
        t_export = time.perf_counter() - t0
        fn = export_mod.load_exported(blob)
        t0 = time.perf_counter()
        out = fn(*call_args)
        leaves = jax.tree.leaves(out)
        # scalar fetch is the only sync on the axon relay
        checksum = float(
            sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)
        )
        t_first = time.perf_counter() - t0  # includes platform compile
        t0 = time.perf_counter()
        out = fn(*call_args)
        float(sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out)))
        t_warm = time.perf_counter() - t0
        assert np.isfinite(checksum), name
        print(
            f"{name}: artifact {len(blob)/1e6:.1f} MB, export {t_export:.1f} s, "
            f"first call (incl. compile) {t_first:.1f} s, warm call "
            f"{t_warm*1e3:.1f} ms, checksum finite",
            flush=True,
        )
    # --- RN tower on this backend (extra, failure-isolated case) -----------
    # proves the ModifiedResNet image path (conv/BN/avgpool/attnpool) lowers
    # and runs on the real TPU, not only the CPU parity suite
    try:
        from speechclip_tpu.models import clip as clip_mod

        rn_cfg = clip_mod.CLIPConfig(
            vision=clip_mod.CLIPResNetVisionConfig(
                image_size=64, width=8, layers=(1, 1, 1, 1), heads=4,
                output_dim=16,
            ),
            text=model.clip_cfg.text,
        )
        rn_params = clip_mod.clip_init(jax.random.key(1), rn_cfg)
        rn_images = jnp.asarray(
            rng.standard_normal((BATCH, 64, 64, 3)).astype(np.float32)
        )
        t0 = time.perf_counter()
        rn_out = jax.jit(
            lambda p, im: clip_mod.encode_image(p, rn_cfg, im)
        )(rn_params, rn_images)
        rn_sum = float(jnp.sum(rn_out.astype(jnp.float32)))
        assert np.isfinite(rn_sum)
        print(
            f"rn tower (tiny ModifiedResNet): ran on this backend in "
            f"{time.perf_counter() - t0:.1f} s (incl. compile), output "
            f"{tuple(rn_out.shape)}, checksum finite",
            flush=True,
        )
    except Exception as exc:  # do not lose the main drive to the extra case
        print(f"rn tower case FAILED: {type(exc).__name__}: {exc}", flush=True)

    # --- serving runtime over the same artifacts (speechclip_tpu/serving) ---
    import os
    import tempfile
    import threading

    from speechclip_tpu.serving import EncoderService

    art_dir = tempfile.mkdtemp(prefix="serve_drive_")
    for name, blob in blobs.items():  # reuse the already-serialized blobs
        with open(os.path.join(art_dir, f"{name}.stablehlo"), "wb") as f:
            f.write(blob)
    svc = EncoderService(art_dir, max_wait_ms=20.0)
    single = rng.standard_normal(WAV_SAMPLES).astype(np.float32)
    t0 = time.perf_counter()
    svc.encode_speech(single)  # first request: platform compile
    t_first = time.perf_counter() - t0
    n_req = 8
    results = [None] * n_req
    threads = [
        threading.Thread(
            target=lambda i=i: results.__setitem__(i, svc.encode_speech(single))
        )
        for i in range(n_req)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    t_conc = time.perf_counter() - t0
    stats = svc.stats()["encode_speech"]
    assert all(
        r is not None and np.isfinite(r["parallel_audio_feat"]).all()
        for r in results
    )
    svc.close()
    print(
        f"serving: first request {t_first:.1f} s, {n_req} concurrent requests "
        f"{t_conc*1e3:.0f} ms in {stats['batches'] - 1} device batch(es) "
        f"(mean batch {(stats['items'] - 1) / max(stats['batches'] - 1, 1):.1f})",
        flush=True,
    )
    print("export TPU drive OK", flush=True)


if __name__ == "__main__":
    main()
