"""Scratch bench: train-step component budget on one chip.

Decomposes the full training step (both branches, frozen towers) into
stages to find where the ~470 ms at batch 256 goes:

  audio    — HuBERT forward (13 states) + weighted sum
  image    — ViT-B/32 forward
  forward  — model.forward (audio + image + both branches + features)
  loss     — forward + compute_loss
  grad     — value_and_grad of the loss (no optimizer)
  step     — full train step (grad + clip + Adam + schedule)

Amortized fori_loop methodology per stage (docs/DESIGN_NOTES.md); each
stage is one remote compile — pass a subset to keep compiles short.

Run: python scripts/bench_train_budget.py [--variant V] [--remat]
        [--accum N] [STAGES [BATCH [ITERS]]]
STAGES = comma list of audio,image,forward,loss,grad,step (default all)
VARIANT = base (both branches, the default) | base_par | base_casc |
          large | large_par | large_casc — large = HuBERT-large +
          ViT-L/14 at the shipped large-config dims
          (speechclip_tpu.config.flagship_large_config)
--remat   = rematerialize HuBERT encoder layers in the backward
          (audio_encoder.remat — trades FLOPs for activation memory)
--wsum-remat = audio_encoder.wsum_remat: frozen weighted-sum with backward
          recompute; the N-state stack is never live (large b256 enabler)
--imgcache = feed precomputed frozen image features (the shipped
          trainer.cache_image_features operating point)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANT = "base"
REMAT = False
ACCUM = 1
WSUM_REMAT = False
IMGCACHE = False
CONV_CHUNK = 0  # 0 = the default min(BATCH, 256)
args = []
def _flagval(it, flag):
    try:
        return next(it)
    except StopIteration:
        raise SystemExit(f"{flag} requires a value")

_argv = iter(sys.argv[1:])
for a in _argv:
    if a.startswith("--variant="):
        VARIANT = a.split("=", 1)[1]
    elif a == "--variant":
        VARIANT = _flagval(_argv, "--variant")
    elif a == "--remat":
        REMAT = True
    elif a == "--wsum-remat":
        # audio_encoder.wsum_remat: frozen weighted-sum with backward
        # recompute — the N-hidden-state stack is never live (the large
        # model's b256 OOM buffer, docs/DESIGN_NOTES.md)
        WSUM_REMAT = True
    elif a == "--imgcache":
        # trainer.cache_image_features operating point: feed precomputed
        # frozen image features (the shipped default)
        IMGCACHE = True
    elif a.startswith("--accum="):
        ACCUM = int(a.split("=", 1)[1])
    elif a == "--accum":
        ACCUM = int(_flagval(_argv, "--accum"))
    elif a.startswith("--conv-chunk="):
        CONV_CHUNK = int(a.split("=", 1)[1])
    elif a == "--conv-chunk":
        CONV_CHUNK = int(_flagval(_argv, "--conv-chunk"))
    elif a.startswith("--"):
        raise SystemExit(
            f"unknown flag {a!r} (valid: --variant, --remat, --wsum-remat,"
            " --imgcache, --accum, --conv-chunk)"
        )
    else:
        args.append(a)
STAGES = (
    args[0] if len(args) > 0 else "audio,image,forward,loss,grad,step"
).split(",")
BATCH = int(args[1]) if len(args) > 1 else 256
ITERS = int(args[2]) if len(args) > 2 else 4
WAV_LEN = 102400


def variant_config(variant):
    """The bench variant's model config (speechclip_tpu.config owns the
    shared switch)."""
    from speechclip_tpu.config import bench_variant_config

    try:
        return bench_variant_config(variant)
    except ValueError as e:
        raise SystemExit(str(e))


def main():
    import os

    import jax
    import jax.numpy as jnp

    if os.environ.get("SPEECHCLIP_FAST_RNG") == "1":
        # production operating point: shipped configs set trainer.fast_rng
        jax.config.update("jax_default_prng_impl", "rbg")

    from speechclip_tpu.models.speechclip import SpeechCLIPModel
    from speechclip_tpu.training import (
        build_optimizer,
        create_train_state,
        make_train_step,
    )

    cfg = variant_config(VARIANT)
    cfg.audio_encoder.conv_batch_chunk = CONV_CHUNK or min(BATCH, 256)
    if REMAT:
        cfg.audio_encoder.remat = True
    if WSUM_REMAT:
        cfg.audio_encoder.wsum_remat = True
    print(
        f"variant {VARIANT} b{BATCH} remat={REMAT} wsum_remat={WSUM_REMAT}"
        f" imgcache={IMGCACHE} conv_chunk={cfg.audio_encoder.conv_batch_chunk}",
        flush=True,
    )
    model = SpeechCLIPModel(cfg)

    rng = np.random.default_rng(0)
    batch = {
        "wav": jnp.asarray(
            rng.standard_normal((BATCH, WAV_LEN)).astype(np.float32)
        ),
        "wav_len": jnp.asarray(
            rng.integers(WAV_LEN // 2, WAV_LEN + 1, BATCH).astype(np.int32)
        ),
        "image": jnp.asarray(
            rng.standard_normal((BATCH, 224, 224, 3)).astype(np.float32)
        ),
        "id": jnp.asarray(np.arange(BATCH, dtype=np.int32) // 5),
    }

    params, state = model.init(jax.random.key(0))

    if IMGCACHE:
        # the shipped operating point: the frozen tower's features are
        # precomputed once per fit (trainer.cache_image_features); the step
        # consumes features, not images (bench.py does the same)
        tower = jax.jit(model.encode_image_tower)
        feat = tower(params, batch.pop("image"))
        batch["image_feat_frozen"] = feat.astype(jnp.float32)

    def timed(name, fn, *args):
        f = jax.jit(fn)
        float(jnp.sum(f(*args)).astype(jnp.float32))  # compile+warm
        t0 = time.perf_counter()
        float(jnp.sum(f(*args)).astype(jnp.float32))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:10s} {dt*1e3:8.1f} ms/iter")
        return dt

    def loop(body):
        def fn(p, batch):
            def step(i, acc):
                # EVERY body input must depend on the carry: with only wav
                # perturbed, XLA's loop-invariant code motion hoists the
                # frozen image-tower forward out of the loop (measured:
                # full step 263 -> 286.5 ms once the image is perturbed)
                b2 = dict(batch)
                for k in ("wav", "image", "image_feat_frozen"):
                    if k in b2:
                        b2[k] = batch[k] + (acc[0] * 0).astype(
                            batch[k].dtype
                        )
                out = body(p, b2)
                return jnp.ones((1,), jnp.float32) * out + i * 0.0

            return jax.lax.fori_loop(
                0, ITERS, step, jnp.zeros((1,), jnp.float32)
            )

        return fn

    if "audio" in STAGES:
        def audio(p, b):
            feat, _ = model.forward_audio(p, b["wav"], b["wav_len"])
            return jnp.mean(feat.astype(jnp.float32))

        timed("audio", loop(audio), params, batch)

    if "image" in STAGES and IMGCACHE:
        print("image      skipped (--imgcache: tower runs once per fit)")
    elif "image" in STAGES:
        def image(p, b):
            feat = model.forward_image(p, b["image"])
            return jnp.mean(feat.astype(jnp.float32))

        timed("image", loop(image), params, batch)

    if "forward" in STAGES:
        def forward(p, b):
            loss_feats, _, _, _ = model.forward(p, state, b, rng=None, train=False)
            return jnp.mean(
                loss_feats["parallel_audio_feat"].astype(jnp.float32)
            )

        timed("forward", loop(forward), params, batch)

    if "loss" in STAGES:
        def loss(p, b):
            loss_feats, _, _, _ = model.forward(p, state, b, rng=None, train=False)
            return model.compute_loss(p, loss_feats)["loss"].astype(jnp.float32)

        timed("loss", loop(loss), params, batch)

    if "grad" in STAGES:
        def lossfn(p, b):
            loss_feats, _, _, _ = model.forward(
                p, state, b, rng=jax.random.key(0), train=True
            )
            return model.compute_loss(p, loss_feats)["loss"]

        def grad(p, b):
            l, g = jax.value_and_grad(lossfn)(p, b)
            gsum = sum(
                jnp.sum(jnp.abs(x).astype(jnp.float32))
                for x in jax.tree.leaves(g)
            )
            return l.astype(jnp.float32) + 0 * gsum

        timed("grad", loop(grad), params, batch)

    if "step" in STAGES:
        if ACCUM > 1:
            # gradient accumulation (trainer.accumulate_grad_batches ->
            # optax.MultiSteps, training/optim.py): each fori_loop
            # iteration is then ONE micro-step, so the printed ms/iter is
            # the micro-step cost INCLUDING the accumulator read+write
            # (param-sized f32 buffers); an effective batch of
            # ACCUM*BATCH costs ACCUM times the printed number.
            cfg.set_path("trainer.accumulate_grad_batches", ACCUM)
        tx, _ = build_optimizer(cfg, model.trainable_mask(params))
        tstate = create_train_state(model, tx, jax.random.key(0))
        train_step = make_train_step(model, tx)

        def multi(s, b):
            def body(i, s):
                b2 = dict(b)
                for k in ("wav", "image", "image_feat_frozen"):
                    if k in b2:
                        b2[k] = b[k] + (0.0 * s.step).astype(b[k].dtype)
                s2, _ = train_step(s, b2)
                return s2

            s_final = jax.lax.fori_loop(0, ITERS, body, s)
            return jnp.sum(
                s_final.params["weighted_sum"]["weights"].astype(jnp.float32)
            ) + s_final.step.astype(jnp.float32)

        f = jax.jit(multi)
        float(f(tstate, batch))
        # 3 timed dispatches -> median + [min, max] (same spread convention
        # as bench.py's extras; one dispatch = ITERS in-graph steps)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(tstate, batch))
            times.append((time.perf_counter() - t0) / ITERS)
        dt = float(np.median(times))
        tag = f" accum={ACCUM} (micro-step)" if ACCUM > 1 else ""
        print(
            f"{'step':10s} {dt*1e3:8.1f} ms/iter (amortized, median of 3)"
            f" [{min(times)*1e3:.1f}, {max(times)*1e3:.1f}]{tag}"
        )


if __name__ == "__main__":
    main()
