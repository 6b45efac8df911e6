"""Headline benchmark: utterances/sec/chip, encode + retrieval.

Measures the flagship inference path on one chip — SpeechCLIP base
(HuBERT-base + ViT-B/32, parallel branch): 6.4 s waveforms (the reference's
max_audio_len crop, config/.../spchclp_p.yaml:104) -> HuBERT all-hidden-states
-> weighted sum -> branch transformer -> projection -> L2 norm -> similarity
scores against a 5k-image gallery (Flickr8k-test scale) -> top-10.

Prints the result as a JSON line {"metric", "value", "unit", "vs_baseline",
"extras"} — first the bare headline the moment it is measured, then the
final enriched line (same schema, extras filled) when everything is done;
parsers that take the last JSON line on stdout get the complete record.
"extras" carries the non-flagship driver-visible numbers so regressions in
those paths are caught round-over-round (VERDICT r1 weak #4):
  cascaded_base_utt_per_sec  — cascaded branch encode (kw attention, VQ,
                               CLIP text tower) at batch 256
  hubert_large_utt_per_sec   — HuBERT-large parallel encode at batch 256
  train_step_ms_b256         — full train step (fwd+bwd+Adam, both branches,
                               frozen towers) at batch 256
  train_step_ms_large_*_b128 — HuBERT-large + ViT-L/14 train step (the
                               reference's 4-GPU configs), single live
                               branch, at the largest single-chip batch
  encode_mfu_pct /
  train_b256_mfu_pct         — analytic-FLOP MFU of this run's headline /
                               b256 train step vs the v5e nominal bf16
                               peak (scripts/mfu_statement.py; zero device
                               cost — the defensible absolute perf claim
                               on the driver record)

Driver-budget discipline (round 5 — round 4's driver bench was killed at
~30 min mid-compile with NOTHING on stdout, BENCH_r04.json rc=124):
  * the headline JSON line is printed (flushed) the moment it exists, BEFORE
    any extra runs; the final enriched line is printed at the end. A caller-
    side timeout therefore always leaves a parseable record on stdout.
  * extras run under an internal wall-clock budget
    (SPEECHCLIP_BENCH_BUDGET_S, default 1500 s — ~5 min under the
    driver's observed ~30-min kill, so a slow-relay headline compile
    [measured up to ~23 min to first extra] does not starve EVERY extra
    the way a 1200 s budget did — measured from process
    start): before each extra, the remaining budget is checked against that
    extra's estimated compile+run cost (_EXTRA_EST_S, tuned from measured
    driver runs) and the extra is recorded as "SKIPPED budget (...)"
    instead of dying mid-compile. Measured per-extra wall times are
    recorded in extras["timings_s"] so the estimates stay honest.
  * the large cascaded train step is OFF by default
    (SPEECHCLIP_BENCH_LARGE_CASC=1 re-enables): it differs from large_par
    only in the live branch, its b128 number is on record in
    docs/DESIGN_NOTES.md, and its multi-minute remote compile was half of
    what blew round 4's budget. The serving canary runs 3 drives (was 5).

Extras methodology (VERDICT r2 weak #1/#2): each number is AMORTIZED — an
in-graph ``lax.fori_loop`` runs AMORTIZE_ITERS step bodies per dispatch
(the body input depends on the loop carry so XLA cannot hoist it), so the
axon relay's ~15-30 ms per-dispatch latency is divided by the depth
instead of added to every step. The loop is re-dispatched REPS times post-warmup;
the reported value is the median per-iteration time and
``<key>_minmax`` carries [min, max] across reps so round-over-round
deltas are distinguishable from relay noise. The headline also reports
``headline_minmax_s`` over its 8 single-shot reps (at ~740 ms/shot the
dispatch bias is <4%).

vs_baseline normalizes against an estimated A100 PyTorch reference of
250 utt/s/GPU for the same path (the reference publishes no throughput
numbers — SURVEY.md §6; this constant is the documented assumption: fp16
torch HuBERT-base inference at batch 256 with pad-to-longest plus retrieval
scoring). The driver's target is >=5x => vs_baseline >= 5.

Set SPEECHCLIP_BENCH_HEADLINE_ONLY=1 to skip the extras (fast iteration).
"""

import json
import os
import time

import numpy as np

A100_BASELINE_UTT_PER_SEC = 250.0

BATCH = 1024  # conv frontend chunked (conv_batch_chunk=256) to fit HBM
WAV_LEN = 102400  # 6.4 s @ 16 kHz
GALLERY = 5000
STEPS = 8
EXTRA_BATCH = 256
# In-graph fori_loop iterations per dispatch. Depth 32 (round 4; was 8):
# the relay's ~23 ms per-dispatch latency divides by this, and a depth
# A/B (282.7 ms at 8 vs 279.8 at 32 for the b256 train step, spread
# <0.4 ms) showed depth 8 still carried ~3 ms of dispatch residue —
# docs/DESIGN_NOTES.md "Amortization depth".
AMORTIZE_ITERS = 32
REPS = 5  # timed dispatches of the amortized loop (median + min/max)


def _median_time(fn, steps):
    """fn must fetch a scalar to host (block_until_ready does not
    synchronize on the axon tunnel). -> (median, [min, max]) seconds."""
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), [float(min(times)), float(max(times))]


def _amortized_time(fn):
    """Median/min/max per-iteration seconds of an already-compiled fn whose
    single dispatch runs AMORTIZE_ITERS step bodies in-graph."""
    med, (lo, hi) = _median_time(fn, REPS)
    return (
        med / AMORTIZE_ITERS,
        [lo / AMORTIZE_ITERS, hi / AMORTIZE_ITERS],
    )


def _make_wavs(rng, batch):
    import jax.numpy as jnp

    wav = jnp.asarray(rng.standard_normal((batch, WAV_LEN)).astype(np.float32))
    wav_len = jnp.asarray(
        rng.integers(WAV_LEN // 2, WAV_LEN + 1, batch).astype(np.int32)
    )
    return wav, wav_len


def headline():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config
    from speechclip_tpu.models.speechclip import SpeechCLIPModel
    from speechclip_tpu.models import branches
    from speechclip_tpu.ops.basic import l2_normalize

    cfg = _flagship_config()
    cfg.model_settings.cascaded_objective_weight = 0.0  # flagship = parallel base
    cfg.audio_encoder.conv_batch_chunk = 256  # bound conv0 intermediate
    model = SpeechCLIPModel(cfg)
    params, state = model.init(jax.random.key(0))

    rng = np.random.default_rng(0)
    wav, wav_len = _make_wavs(rng, BATCH)
    gallery = l2_normalize(
        jnp.asarray(rng.standard_normal((GALLERY, 512)).astype(np.float32))
    )

    @jax.jit
    def encode_and_retrieve(params, wav, wav_len, gallery):
        audio_feat, audio_len = model.forward_audio(params, wav, wav_len)
        feat = branches.parallel_branch_apply(
            params["parallel_branch"],
            model.config.model_settings.parallel_branch,
            audio_feat,
            audio_len,
        )
        feat = l2_normalize(feat.astype(jnp.float32))
        scores = feat @ gallery.T
        _, top10 = jax.lax.top_k(scores, 10)
        # scalar checksum: forces full execution; fetching it is the sync point
        return jnp.sum(feat) + jnp.sum(top10).astype(jnp.float32)

    float(encode_and_retrieve(params, wav, wav_len, gallery))  # compile
    med, minmax = _median_time(
        lambda: float(encode_and_retrieve(params, wav, wav_len, gallery)), STEPS
    )
    return BATCH / med, minmax


def encode_variant(variant):
    """(utt/s, [min, max] utt/s) for a non-flagship encode path at
    EXTRA_BATCH, amortized over an in-graph fori_loop."""
    import jax
    import jax.numpy as jnp

    from speechclip_tpu.config import bench_variant_config
    from speechclip_tpu.models.speechclip import SpeechCLIPModel
    from speechclip_tpu.ops.basic import l2_normalize

    cfg = bench_variant_config(variant)
    cfg.audio_encoder.conv_batch_chunk = 256

    model = SpeechCLIPModel(cfg)
    params, state = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    wav, wav_len = _make_wavs(rng, EXTRA_BATCH)

    def encode_once(params, state, wav, wav_len):
        out = model.encode_speech(params, state, wav, wav_len)
        feats = [
            v for k, v in out.items() if k.endswith("audio_feat") and v is not None
        ]
        return sum(jnp.sum(l2_normalize(f.astype(jnp.float32))) for f in feats)

    @jax.jit
    def encode_loop(params, state, wav, wav_len):
        # body input depends on the carry so XLA cannot hoist/dedupe bodies
        def body(i, acc):
            w = wav + (acc * 0).astype(wav.dtype)
            return encode_once(params, state, w, wav_len) + i * 0.0

        return jax.lax.fori_loop(0, AMORTIZE_ITERS, body, jnp.float32(0))

    float(encode_loop(params, state, wav, wav_len))  # compile
    med, minmax = _amortized_time(
        lambda: float(encode_loop(params, state, wav, wav_len))
    )
    return EXTRA_BATCH / med, [EXTRA_BATCH / minmax[1], EXTRA_BATCH / minmax[0]]


def train_step_ms(cache_images=False, variant="base", batch=None):
    """(ms, [min, max] ms) full training-step latency, amortized: an
    in-graph fori_loop chains AMORTIZE_ITERS real train steps (state
    threads through the carry; wav is perturbed by the carry so the bodies
    cannot be hoisted) — the methodology the round-2 VERDICT prescribed so
    the driver-visible number matches scripts/bench_train_budget.py
    instead of eating the relay's per-dispatch latency on every step.

    cache_images=True measures the trainer.cache_image_features operating
    point: the frozen ViT features ride in the batch and only the trainable
    path runs per step (docs/DESIGN_NOTES.md "Per-fit image-feature
    cache").

    variant: "base" (both branches, batch 256 — the shipped base operating
    point) or "large_par"/"large_casc" (HuBERT-large + ViT-L/14 single
    live branch, the reference's 4-GPU configs — here per-chip at the
    largest single-chip batch, scripts/bench_train_budget.py probes)."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config
    from speechclip_tpu.config import flagship_large_config
    from speechclip_tpu.models.speechclip import SpeechCLIPModel
    from speechclip_tpu.training import (
        build_optimizer,
        create_train_state,
        make_train_step,
    )

    if variant == "base":
        cfg = _flagship_config()
    else:
        cfg = flagship_large_config()
        if variant == "large_par":
            cfg.model_settings.cascaded_objective_weight = 0.0
        elif variant == "large_casc":
            cfg.model_settings.parallel_objective_weight = 0.0
        else:
            raise ValueError(variant)
    batch = EXTRA_BATCH if batch is None else batch
    if variant != "base":
        cfg.audio_encoder.conv_batch_chunk = min(batch, 256)
    model = SpeechCLIPModel(cfg)
    rng = np.random.default_rng(0)
    wav, wav_len = _make_wavs(rng, batch)
    batch_data = {
        "wav": wav,
        "wav_len": wav_len,
        "image": jnp.asarray(
            rng.standard_normal((batch, 224, 224, 3)).astype(np.float32)
        ),
        "id": jnp.asarray(np.arange(batch) % (batch // 5)),
    }
    params, _ = model.init(jax.random.key(0))
    tx, _ = build_optimizer(cfg, model.trainable_mask(params))
    del params
    state = create_train_state(model, tx, jax.random.key(1))
    train_step = make_train_step(model, tx)

    if cache_images:
        feat = jax.jit(model.encode_image_tower)(
            state.params, batch_data["image"]
        )
        batch_data = dict(batch_data)
        batch_data["image_feat_frozen"] = feat.astype(jnp.float32)
        del batch_data["image"]

    @jax.jit
    def multi_step(s, b):
        def body(i, s):
            # every carry-independent batch field must be perturbed by the
            # carry or XLA hoists its (frozen-tower) forward out of the loop
            # — with a constant image the ViT fwd ran once per 8 steps,
            # understating the step ~11 ms and hiding the image-cache win
            b2 = dict(b)
            # image_feat_frozen too: the cached-feature variant's normalize
            # would otherwise be loop-invariant and hoisted (same contract
            # as scripts/bench_train_budget.py's loop helper)
            for k in ("wav", "image", "image_feat_frozen"):
                if k in b2:
                    b2[k] = b[k] + (0.0 * s.step).astype(b[k].dtype)
            s2, _ = train_step(s, b2)
            return s2

        s_final = jax.lax.fori_loop(0, AMORTIZE_ITERS, body, s)
        return (
            jnp.sum(s_final.params["weighted_sum"]["weights"].astype(jnp.float32))
            + s_final.step.astype(jnp.float32)
        )

    float(multi_step(state, batch_data))  # compile + warm
    med, minmax = _amortized_time(lambda: float(multi_step(state, batch_data)))
    return med * 1e3, [minmax[0] * 1e3, minmax[1] * 1e3]


def serving_throughput(batch=32, n_req=256, concurrency=64):
    """(utt/s, [min, max]) end-to-end through the serving runtime: the jit
    backend (EncoderService.from_model) at flagship dims with a fixed
    device batch (ONE compile), bf16 weights, int16 wav on the wire, 60 ms
    coalescing — the production operating point of docs/SERVING.md. On the
    axon relay this is H2D-bandwidth-bound, not compute-bound
    (docs/DESIGN_NOTES.md "Production-dims serving"); it is driver-visible
    so serving-stack regressions show round-over-round."""
    import jax

    from __graft_entry__ import _flagship_config
    from speechclip_tpu.models.speechclip import SpeechCLIPModel
    from speechclip_tpu import serving as serving_mod
    from speechclip_tpu.serving import EncoderService

    cfg = _flagship_config()
    cfg.audio_encoder.conv_batch_chunk = min(batch, 256)
    model = SpeechCLIPModel(cfg)
    params, state = model.init(jax.random.key(0))
    svc = EncoderService.from_model(
        model,
        params,
        state,
        wav_buckets=(WAV_LEN,),
        batch=batch,
        dtype="bf16",
        compact_wav=True,
        fixed_batch=True,
        max_wait_ms=60.0,
    )
    try:
        # warm the SPEECH bucket only (one compile): the bench never calls
        # encode_image/text, and full warmup() would pay two more b32
        # remote compiles for nothing on every driver run
        svc._speech_batch(
            [np.zeros(16, np.float32)], svc._route_speech(WAV_LEN)
        )
        rng = np.random.default_rng(0)
        wavs = [
            rng.standard_normal(n).astype(np.float32)
            for n in np.linspace(WAV_LEN // 2, WAV_LEN, 8).astype(int)
        ]
        return _canary_drive(
            svc, wavs, n_req, concurrency, serving_mod.drive_requests
        )
    finally:
        svc.close()


CANARY_DRIVES = 3  # was 5; best-of-N needs few draws and round 4's bench
# blew the driver budget partly on canary bring-up (VERDICT r4 weak #3)


def _canary_drive(svc, wavs, n_req, concurrency, drive):
    """(best-of-N utt/s, [min, max]) over CANARY_DRIVES timed drives,
    after one untimed half-size drive that primes the client-thread pool
    and coalescing pipeline (the compile warmup does not).

    value = best-of-N, NOT median: this surface is WIRE-bound and the
    relay's background load varies ~2x WITHIN a run (quiet-host drives
    measured [72.6, 148.6] utt/s back to back, 2026-08-19 — stack
    unchanged since a 164.9 median the day before). The fastest drive
    estimates stack capability; the rest measure relay weather, and a
    median canary would cry regression on every choppy round. Spread
    stays visible via the _minmax extra. Pinned by
    tests/test_serving.py::test_bench_canary_estimator."""
    drive(svc, wavs, n_req // 2, concurrency)
    vals = []
    for _ in range(CANARY_DRIVES):
        elapsed, _lat = drive(svc, wavs, n_req, concurrency)
        vals.append(n_req / elapsed)
    return float(max(vals)), [float(min(vals)), float(max(vals))]


# Estimated wall cost (seconds, compile + timed dispatches on the axon
# relay) per extra — the budget gate compares these against the remaining
# budget BEFORE starting an extra, so a slow-relay round degrades by
# skipping loudly instead of being killed mid-compile. Tuned from measured
# driver/builder runs (extras["timings_s"] records each round's actuals).
_EXTRA_EST_S = {
    "cascaded_base_utt_per_sec": 120,
    "hubert_large_utt_per_sec": 180,
    "train_step_ms_b256": 180,
    "train_step_ms_b256_imgcache": 180,
    "train_step_ms_large_par_b128": 330,
    "train_step_ms_large_casc_b128": 390,
    "serving_utt_per_sec_b32": 270,
}

_BENCH_LAST = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_last.json")


def checkpoint_result(result):
    # the axon remote-compile latency is large and variable (minutes per
    # graph, docs/DESIGN_NOTES.md); persist progress so a caller-side
    # timeout still leaves the measured numbers on disk
    with open(_BENCH_LAST, "w") as f:
        json.dump(result, f)


def _extras_spec():
    """[(key, est_cost_s, fn)] for the non-headline extras, cheap first."""
    spec = [
        ("cascaded_base_utt_per_sec", lambda: encode_variant("base_casc")),
        ("hubert_large_utt_per_sec", lambda: encode_variant("large_par")),
        ("train_step_ms_b256", train_step_ms),
        (
            "train_step_ms_b256_imgcache",
            lambda: train_step_ms(cache_images=True),
        ),
        # the large half of the shipped surface (reference 4-GPU configs)
        # — largest single-chip batch (b256 OOMs on the plain path, probed
        # round 4; scripts/bench_train_budget.py --variant large_*)
        (
            "train_step_ms_large_par_b128",
            lambda: train_step_ms(variant="large_par", batch=128),
        ),
    ]
    if os.environ.get("SPEECHCLIP_BENCH_LARGE_CASC") == "1":
        # off by default since round 5: same towers as large_par (only the
        # live branch differs), number on record in DESIGN_NOTES, and its
        # remote compile was half of round 4's budget blowout
        spec.append(
            (
                "train_step_ms_large_casc_b128",
                lambda: train_step_ms(variant="large_casc", batch=128),
            )
        )
    # end-to-end serving runtime (micro-batcher + jit backend) —
    # relay-H2D-bound on this machine, still a regression canary
    spec.append(("serving_utt_per_sec_b32", serving_throughput))
    return [(key, _EXTRA_EST_S[key], fn) for key, fn in spec]


def mfu_extras(result):
    """Driver-visible MFU at zero device cost: the analytic matmul/conv
    FLOPs (scripts/mfu_statement.py — the column is pinned by
    tests/test_mfu.py) divided by THIS run's measured headline and b256
    train step, against the v5e nominal bf16 peak. Puts the defensible
    absolute perf claim (docs/DESIGN_NOTES.md "MFU statement") on the
    driver record every round, next to the assumed-constant vs_baseline."""
    try:
        import importlib.util

        path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "scripts",
            "mfu_statement.py",
        )
        spec = importlib.util.spec_from_file_location("mfu_statement", path)
        mfu = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mfu)
        flops = mfu.analytic_flops()
        peak_flops = mfu.V5E_BF16_PEAK_TFLOPS * 1e12
        out = {}
        v = result.get("value")
        if isinstance(v, (int, float)) and v > 0:
            out["encode_mfu_pct"] = round(
                flops["encode"] * v / peak_flops * 100, 1
            )
        t_ms = result.get("extras", {}).get("train_step_ms_b256")
        if isinstance(t_ms, (int, float)) and t_ms > 0:
            out["train_b256_mfu_pct"] = round(
                flops["train_b256"] * 256 / (t_ms / 1e3) / peak_flops * 100, 1
            )
        return out
    except Exception as e:  # never let the bookkeeping hide the record
        return {"encode_mfu_pct": f"FAILED {type(e).__name__}: {str(e)[:80]}"}


def run_extras(result, extras_spec, *, budget_s, t_start, checkpoint, now=time.monotonic):
    """Run extras under the wall-clock budget; mutates result["extras"].

    Before each extra: if (budget_s - elapsed-since-t_start) is below the
    extra's estimated cost, record "SKIPPED budget (...)" and move on —
    later, cheaper extras still get their chance. A failing extra records
    "FAILED ..." and never hides the headline. checkpoint(result) is called
    after every extra so a caller-side kill keeps all finished numbers.
    Pinned by tests/test_bench.py.
    """
    extras = result.setdefault("extras", {})
    timings = extras.setdefault("timings_s", {})
    for key, est_s, fn in extras_spec:
        remaining = budget_s - (now() - t_start)
        if remaining < est_s:
            extras[key] = (
                f"SKIPPED budget ({remaining:.0f}s left < ~{est_s:.0f}s est)"
            )
            checkpoint(result)
            continue
        t0 = now()
        try:
            value, minmax = fn()
            extras[key] = round(value, 2)
            extras[key + "_minmax"] = [round(v, 2) for v in minmax]
        except Exception as e:  # a broken variant must not hide the headline
            extras[key] = f"FAILED {type(e).__name__}: {str(e)[:120]}"
        timings[key] = round(now() - t0, 1)
        checkpoint(result)
    return result


def main():
    t_start = time.monotonic()
    # fail FAST with a parseable line if the TPU tunnel is unreachable:
    # jax.devices() HANGS (no exception) during axon outages (observed
    # round 3, >90 min), which would otherwise eat the whole driver budget
    # (guard shared with __graft_entry__'s compile-check entry)
    import sys

    from __graft_entry__ import probe_backend

    status, detail = probe_backend()
    if status != "ok":
        error = {
            "metric": "utterances_per_sec_per_chip_encode_retrieval",
            "value": 0,
            "unit": f"ERROR: TPU backend unreachable ({detail})",
            "vs_baseline": 0,
        }
        checkpoint_result(error)
        print(json.dumps(error), flush=True)
        sys.exit(1)

    # production configuration: the shipped configs set trainer.fast_rng
    # (rbg PRNG — dropout masks ~28 ms/step cheaper than threefry at b256);
    # must be set before any key is created, hence here
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")

    utt_per_sec, headline_minmax = headline()
    result = {
        "metric": "utterances_per_sec_per_chip_encode_retrieval",
        "value": round(utt_per_sec, 2),
        "unit": "utt/s/chip (6.4s audio, parallel base)",
        "vs_baseline": round(utt_per_sec / A100_BASELINE_UTT_PER_SEC, 3),
    }
    checkpoint_result(result)
    # EARLY print (flushed): the driver tails stdout, so the headline must
    # be parseable even if a caller-side timeout kills the extras below
    print(json.dumps(result), flush=True)
    if os.environ.get("SPEECHCLIP_BENCH_HEADLINE_ONLY") != "1":
        result["extras"] = {
            "headline_minmax_s": [round(v, 4) for v in headline_minmax],
        }
        budget_s = float(os.environ.get("SPEECHCLIP_BENCH_BUDGET_S", "1500"))
        run_extras(
            result,
            _extras_spec(),
            budget_s=budget_s,
            t_start=t_start,
            checkpoint=checkpoint_result,
        )
        result["extras"].update(mfu_extras(result))
        checkpoint_result(result)
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
