"""Scratch bench: stage-by-stage encode budget at the current operating point.

Times each stage with the amortized in-graph fori_loop methodology
(docs/DESIGN_NOTES.md): the loop body depends on the iteration index so XLA
cannot hoist it; a scalar fetch is the sync point.

Run: python scripts/bench_encode_budget.py STAGES [BATCH [CHUNK [ITERS]]]
STAGES = comma-separated subset of conv,frontend,hubert,ws,encode
(one remote compile each — run stages in separate invocations if the
compiler is slow).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = (sys.argv[1] if len(sys.argv) > 1 else "conv,hubert,encode").split(",")
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 512
CHUNK = int(sys.argv[3]) if len(sys.argv) > 3 else 256
ITERS = int(sys.argv[4]) if len(sys.argv) > 4 else 4
WAV_LEN = 102400


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config
    from speechclip_tpu.models import branches, hubert
    from speechclip_tpu.models.speechclip import SpeechCLIPModel
    from speechclip_tpu.ops import masking
    from speechclip_tpu.ops.basic import l2_normalize, layer_norm, linear
    from speechclip_tpu.ops.weighted_sum import weighted_sum_apply

    cfg = _flagship_config()
    cfg.model_settings.cascaded_objective_weight = 0.0
    cfg.audio_encoder.conv_batch_chunk = CHUNK
    model = SpeechCLIPModel(cfg)
    params, _ = model.init(jax.random.key(0))
    acfg = model.audio_cfg
    ae = params["audio_encoder"]

    rng = np.random.default_rng(0)
    wav = jnp.asarray(
        rng.standard_normal((BATCH, WAV_LEN)).astype(np.float32)
    ).astype(jnp.bfloat16)
    wav_len = jnp.asarray(
        rng.integers(WAV_LEN // 2, WAV_LEN + 1, BATCH).astype(np.int32)
    )

    def timed(name, fn, *args):
        # params ride as arguments: the remote compiler rejects big inlined
        # constants (HTTP 413) — see CLAUDE.md
        f = jax.jit(fn)
        float(jnp.sum(f(*args).astype(jnp.float32)))  # compile+warm
        t0 = time.perf_counter()
        float(jnp.sum(f(*args).astype(jnp.float32)))
        dt = time.perf_counter() - t0
        print(f"{name:28s} {dt*1e3/ITERS:8.1f} ms/iter  ({dt*1e3:.0f} ms for {ITERS})")
        return dt / ITERS

    def loop(body):
        # body(p, wav, wav_len); params passed through jit (not closed over)
        def fn(p, wav, wav_len):
            def step(i, acc):
                out = body(p, wav + (acc[0] * 0).astype(wav.dtype), wav_len)
                return jnp.ones((1,), jnp.float32) * jnp.mean(
                    out.astype(jnp.float32)
                ) + i * 0.0

            return jax.lax.fori_loop(0, ITERS, step, jnp.zeros((1,), jnp.float32))

        return fn

    if "conv" in STAGES:
        timed(
            "conv chain (7 convs+GN)",
            loop(lambda p, w, wl: hubert.conv_feature_extractor(p["feature_extractor"], acfg, w)),
            ae,
            wav,
            wav_len,
        )

    # stage 2: conv + LN + proj + pos_conv
    def frontend(p, w, wl):
        feats = hubert.conv_feature_extractor(p["feature_extractor"], acfg, w)
        feats = layer_norm(p["layer_norm"], feats)
        feats = linear(p["post_extract_proj"], feats)
        t = feats.shape[1]
        fl = masking.conv_frame_valid_lengths(wl, w.shape[1], t)
        kpm = masking.key_padding_mask(fl, t)
        x = jnp.where(kpm[..., None], jnp.zeros_like(feats), feats)
        return x + hubert.pos_conv_apply(p["encoder"]["pos_conv"], acfg, x)

    if "frontend" in STAGES:
        timed("frontend (+LN+proj+posconv)", loop(frontend), ae, wav, wav_len)

    # stage 3: full hubert (13 states)
    def full_hubert(p, w, wl):
        hs, fl = hubert.hubert_apply(p, acfg, w, wl)
        return hs[-1]

    if "hubert" in STAGES:
        timed("full hubert (13 states)", loop(full_hubert), ae, wav, wav_len)

    # stage 4: hubert + weighted sum
    def hubert_ws(p, w, wl):
        hs, fl = hubert.hubert_apply(p["ae"], acfg, w, wl)
        return weighted_sum_apply(p["ws"], hs)

    if "ws" in STAGES:
        timed("hubert + weighted sum", loop(hubert_ws),
              {"ae": ae, "ws": params["weighted_sum"]}, wav, wav_len)

    # stage 5: + branch + l2
    def encode(p, w, wl):
        hs, fl = hubert.hubert_apply(p["ae"], acfg, w, wl)
        feat = weighted_sum_apply(p["ws"], hs)
        out = branches.parallel_branch_apply(
            p["branch"],
            model.config.model_settings.parallel_branch,
            feat,
            fl,
        )
        return l2_normalize(out.astype(jnp.float32))

    if "encode" in STAGES:
        timed("full encode (+branch)", loop(encode),
              {"ae": ae, "ws": params["weighted_sum"],
               "branch": params["parallel_branch"]}, wav, wav_len)


if __name__ == "__main__":
    main()
