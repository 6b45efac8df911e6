"""AOT export of the inference surfaces (jax.export / StableHLO).

A deployment capability beyond the reference, which has no serving story —
its inference is ``example.py`` importing the full training repo
(reference example.py:10-40). Here the three encoders can be serialized to
StableHLO artifacts that run under any JAX runtime (or PJRT C API consumer)
WITHOUT the model code, config system, or checkpoint machinery:

- ``export_encode_speech``  — wav/wav_len -> {parallel_audio_feat,
  cascaded_audio_feat, keywords} (whatever the config enables),
- ``export_encode_image``   — images -> image_feat,
- ``export_encode_text``    — token ids (+ EOT positions) -> text_feat,
- ``load_exported``         — deserialize and call.

Weights are baked into the artifact as constants (self-contained single
file; the usual serving trade — artifact size for zero-dependency loads).
Shapes are static per artifact, matching the bucketed-loader design: export
one artifact per (batch, wav_len) serving shape — or pass
``polymorphic_batch=True`` (CLI ``--polymorphic-batch``) to make the batch
dim symbolic via jax.export shape polymorphism, so ONE artifact serves any
batch size (wav length / context stay static).

TPU note: export with ``platforms=("tpu",)`` (the default when a TPU
backend is live) compiles nothing at export time — StableHLO is lowered,
then the serving runtime's XLA does the platform compile at load. The same
artifact can carry several platforms.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def _default_platforms() -> Tuple[str, ...]:
    return (jax.devices()[0].platform,)


def _export_fn(fn, example_args, platforms, polymorphic_batch=False):
    from jax import export as jexport

    if polymorphic_batch:
        # one artifact serves ANY batch size: leading dim becomes the
        # symbolic "b" (jax.export shape polymorphism). The model's graphs
        # are batch-size-agnostic (static T comes from wav_samples/ctx, not
        # the batch), so this trades nothing but constant-folding
        # opportunities in the serving compile.
        scope = jexport.SymbolicScope()
        (b,) = jexport.symbolic_shape("b", scope=scope)
        specs = tuple(
            jax.ShapeDtypeStruct((b,) + a.shape[1:], a.dtype)
            for a in example_args
        )
    else:
        specs = tuple(
            jax.ShapeDtypeStruct(a.shape, a.dtype) for a in example_args
        )
    exported = jexport.export(jax.jit(fn), platforms=list(platforms))(*specs)
    return bytes(exported.serialize())


def encode_speech_surface(model):
    """The encode_speech deployment surface shared by export and the jit
    serving backend: ``fn(params, state, wav, wav_len) -> feature dict``,
    arrays only, vq diagnostics dropped."""

    def fn(params, state, wav, wav_len):
        out = model.encode_speech(params, state, wav, wav_len)
        return {
            k: v
            for k, v in out.items()
            if isinstance(v, jnp.ndarray) or hasattr(v, "shape")
            if k != "vq_results"
        }

    return fn


def export_encode_speech(
    model,
    params,
    state,
    batch_size: int,
    wav_samples: int,
    platforms: Optional[Sequence[str]] = None,
    polymorphic_batch: bool = False,
) -> bytes:
    """Serialize ``model.encode_speech`` at a static (batch, wav) shape —
    or, with ``polymorphic_batch=True``, with a symbolic batch dim so ONE
    artifact serves any batch size (wav length stays static per artifact,
    matching the bucketed-loader design).

    Returns the serialized artifact; write it to disk as-is. Params/state
    are captured as constants.
    """
    platforms = tuple(platforms) if platforms else _default_platforms()
    surface = encode_speech_surface(model)

    def fn(wav, wav_len):
        return surface(params, state, wav, wav_len)

    example = (
        jnp.zeros((batch_size, wav_samples), jnp.float32),
        jnp.zeros((batch_size,), jnp.int32),
    )
    return _export_fn(fn, example, platforms, polymorphic_batch)


def export_encode_image(
    model,
    params,
    batch_size: int,
    platforms: Optional[Sequence[str]] = None,
    polymorphic_batch: bool = False,
) -> bytes:
    """Serialize the image tower (+ optional projection) for gallery
    encoding; input is normalized NHWC float32."""
    platforms = tuple(platforms) if platforms else _default_platforms()
    size = model.clip_cfg.vision.image_size

    def fn(images):
        return model.forward_image(params, images)

    example = (jnp.zeros((batch_size, size, size, 3), jnp.float32),)
    return _export_fn(fn, example, platforms, polymorphic_batch)


def export_encode_text(
    model,
    params,
    batch_size: int,
    platforms: Optional[Sequence[str]] = None,
    polymorphic_batch: bool = False,
) -> bytes:
    """Serialize the text tower (reduced-vocab ids + EOT positions)."""
    platforms = tuple(platforms) if platforms else _default_platforms()
    ctx = model.clip_cfg.text.context_length

    def fn(text, eot_positions):
        return model.forward_text(params, text, eot_positions)

    example = (
        jnp.zeros((batch_size, ctx), jnp.int32),
        jnp.zeros((batch_size,), jnp.int32),
    )
    return _export_fn(fn, example, platforms, polymorphic_batch)


def cast_float_params(params, dtype) -> dict:
    """Cast inexact-dtype leaves (weights) for smaller artifacts; integer
    leaves (e.g. reduced-vocab id maps) are untouched."""
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact)
        else x,
        params,
    )


def load_exported(blob: bytes) -> Callable:
    """bytes -> callable running the artifact on the ambient backend."""
    from jax import export as jexport

    exported = jexport.deserialize(blob)
    return exported.call


def main():
    """CLI: export serving artifacts from a checkpoint.

    python -m speechclip_tpu.export --ckpt <run_dir_or_.ckpt> \
        --out exports/ --batch 8 --wav-samples 102400 [--platform cpu]
    """
    import argparse
    import os

    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument(
        "--wav-samples",
        type=int,
        nargs="+",
        default=[102400],
        help="one artifact per wav length (serving buckets); a single "
        "value writes encode_speech.stablehlo, several write "
        "encode_speech@<n>.stablehlo each — the serving runtime routes "
        "requests to the smallest bucket that fits",
    )
    parser.add_argument(
        "--platform",
        default=None,
        help="jax platform for model restore AND artifact lowering; a "
        "comma list (e.g. cpu,tpu) lowers one artifact for several "
        "serving platforms (restore runs on the first)",
    )
    parser.add_argument("--polymorphic-batch", action="store_true")
    parser.add_argument(
        "--dtype",
        default=None,
        choices=["bf16"],
        help="cast float weights before export (bf16 halves the artifact; "
        "features move by ~bf16 noise — the TPU compute path already runs "
        "bf16 under the shipped precision: 16 configs)",
    )
    args = parser.parse_args()

    platforms = args.platform.split(",") if args.platform else None
    if platforms:
        jax.config.update("jax_platforms", platforms[0])

    from .training.checkpoint import load_any_checkpoint

    # shared restore path (handles reference .ckpt conversion and the
    # orbax-run PRNG-impl guard — trainer.fast_rng -> rbg before any key)
    model, params, state = load_any_checkpoint(args.ckpt)

    if args.dtype == "bf16":
        params = cast_float_params(params, jnp.bfloat16)

    os.makedirs(args.out, exist_ok=True)
    poly = args.polymorphic_batch
    blobs = {}
    for wav_samples in args.wav_samples:
        name = (
            "encode_speech"
            if len(args.wav_samples) == 1
            else f"encode_speech@{wav_samples}"
        )
        blobs[name] = export_encode_speech(
            model, params, state, args.batch, wav_samples,
            platforms=platforms, polymorphic_batch=poly,
        )
    blobs["encode_image"] = export_encode_image(
        model, params, args.batch, platforms=platforms, polymorphic_batch=poly
    )
    blobs["encode_text"] = export_encode_text(
        model, params, args.batch, platforms=platforms, polymorphic_batch=poly
    )
    for name, blob in blobs.items():
        path = os.path.join(args.out, f"{name}.stablehlo")
        with open(path, "wb") as f:
            f.write(blob)
        print(f"wrote {path} ({len(blob)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
