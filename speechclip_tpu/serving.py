"""Dynamic-batching serving runtime (AOT artifacts or jit-from-checkpoint).

The reference has no serving story — inference means importing the full
training repo (reference example.py:10-40). This module is the runtime:
micro-batching, wav-length bucket routing, multi-device round-robin, and a
stdlib HTTP front, over either of two interchangeable backends:

- **artifact**: self-contained StableHLO blobs from `export.py` (weights
  baked as constants — zero-dependency deployment), or
- **jit** (``EncoderService.from_checkpoint`` / ``.from_model``): the same
  encoder surfaces jitted with params passed as call arguments — the
  backend that runs PRODUCTION dims on remote-compiled platforms whose
  compilers reject giant weight-constant graphs (docs/DESIGN_NOTES.md).

Runtime surface:

- ``MicroBatcher`` — a request coalescer: concurrent single-item requests
  are gathered into one device batch (up to ``max_batch``, waiting at most
  ``max_wait_ms`` after the first arrival). Dynamic batching is what makes
  a TPU serve interactive traffic at batch-N efficiency — the MXU is
  hopeless at batch 1.
- ``EncoderService`` — loads the exported encoders, introspects their
  input shapes (fixed or batch-polymorphic), pads speech to the artifact's
  static wav length (exact: the model masks by ``wav_len``), pads partial
  batches for fixed-batch artifacts and slices the results back. Several
  ``encode_speech@<n>.stablehlo`` artifacts form wav-length buckets
  (export with ``--wav-samples n1 n2 ...``): each request routes to the
  smallest bucket that fits — the bucketed-loader design carried into
  serving, so short utterances don't pay long-bucket compute.
- an HTTP front end (stdlib ``ThreadingHTTPServer``; zero dependencies):

    python -m speechclip_tpu.serving --artifacts exports/ --port 8787

  POST /encode_speech   body: .npy float32 1-D waveform (16 kHz)
  POST /encode_image    body: JPEG bytes, or .npy uint8 (H, W, 3) any
                        size, or .npy float32 already CLIP-preprocessed
  POST /encode_text     body: JSON {"token_ids": [...], "eot_position": N}
                        (reduced-vocab ids for reduced-vocab exports)
  POST /gallery/add     body: image payload (as /encode_image); ?id=name
                        optional -> encodes into the retrieval gallery
  POST /gallery/save    ?path= optional (defaults to --gallery; confined
                        to --gallery's directory) -> persist the gallery
                        as one .npz (ids + features)
  POST /gallery/load    ?path= optional (same confinement) -> replace the
                        gallery from a saved .npz (trimmed to
                        --gallery-max newest rows)
  POST /retrieve        body: .npy wav; ?k=5&feat=parallel|cascaded ->
                        top-k gallery images by cosine (the reference's
                        mutualRetrieval as an online service)
  GET  /healthz         endpoint + batching stats + gallery size

The gallery is memory-bounded via --gallery-max (FIFO eviction of the
oldest entries) and restart-safe via --gallery (load at startup, save on
clean shutdown).

Responses are JSON ``{"features": {name: nested_list}}``. Each HTTP
request is one item in the micro-batch; issue concurrent requests to fill
device batches.
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from concurrent.futures import Future
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np


class MicroBatcher:
    """Coalesce concurrent single-item requests into device batches.

    ``batch_fn(items) -> list_of_results`` runs on a dedicated worker
    thread; ``submit`` returns a Future. After the first item of a batch
    arrives, the worker waits at most ``max_wait_ms`` for more, capping at
    ``max_batch`` items per call.

    Pipelined mode: pass ``finalize_fn`` and ``batch_fn`` becomes the
    DISPATCH stage (pack + launch on a device, return a handle without
    blocking — JAX dispatch is async); a separate fetch thread runs
    ``finalize_fn(handle) -> list_of_results`` (device->host sync) and
    resolves the futures. The worker can then dispatch batch N+1 (to the
    next device in a round-robin) while batch N still computes — without
    this, multi-device serving would serialize on the single worker's
    blocking fetch. ``pipeline_depth`` bounds in-flight batches.
    """

    def __init__(
        self,
        batch_fn: Callable[[List], List],
        max_batch: int = 8,
        max_wait_ms: float = 5.0,
        name: str = "",
        finalize_fn: Optional[Callable] = None,
        pipeline_depth: int = 2,
    ):
        self._fn = batch_fn
        self._finalize = finalize_fn
        self.max_batch = int(max_batch)
        self._max_wait = max_wait_ms / 1e3
        self._q: queue.Queue = queue.Queue()
        self._submit_lock = threading.Lock()  # serializes submit vs close
        self._stop = threading.Event()
        self.batches_run = 0
        self.items_run = 0
        self._thread = threading.Thread(
            target=self._loop, daemon=True, name=f"microbatcher-{name}"
        )
        self._fetch_q: Optional[queue.Queue] = None
        self._fetch_thread = None
        if finalize_fn is not None:
            self._fetch_q = queue.Queue(maxsize=max(int(pipeline_depth), 1))
            self._fetch_thread = threading.Thread(
                target=self._fetch_loop,
                daemon=True,
                name=f"microbatcher-fetch-{name}",
            )
            self._fetch_thread.start()
        self._thread.start()

    def submit(self, item) -> Future:
        fut: Future = Future()
        # the stop-check and the put must be atomic vs close(): a put that
        # raced past a bare check could land after close() drained the
        # queue, leaving the caller blocked on the future forever
        with self._submit_lock:
            if self._stop.is_set():
                raise RuntimeError("MicroBatcher is closed")
            self._q.put((item, fut))
        return fut

    def _loop(self):
        while not self._stop.is_set():
            try:
                pairs = [self._q.get(timeout=0.1)]
            except queue.Empty:
                continue
            deadline = time.monotonic() + self._max_wait
            while len(pairs) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    pairs.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            items = [it for it, _ in pairs]
            futs = [f for _, f in pairs]
            # count BEFORE resolving futures: callers unblocked by
            # set_result must observe the batch in the stats
            self.batches_run += 1
            self.items_run += len(items)
            try:
                out = self._fn(items)
            except Exception as exc:  # surface to every waiter
                for fut in futs:
                    fut.set_exception(exc)
                continue
            if self._fetch_q is None:
                for fut, res in zip(futs, out):
                    fut.set_result(res)
            else:
                # bounded: blocks (backpressure) at pipeline_depth in-flight
                self._fetch_q.put((out, futs))
        if self._fetch_q is not None:
            self._fetch_q.put(None)  # fetcher shutdown sentinel

    def _fetch_loop(self):
        while True:
            entry = self._fetch_q.get()
            if entry is None:
                return
            handle, futs = entry
            try:
                results = self._finalize(handle)
                for fut, res in zip(futs, results):
                    fut.set_result(res)
            except Exception as exc:
                for fut in futs:
                    fut.set_exception(exc)

    def close(self):
        with self._submit_lock:  # no put can land after this block
            self._stop.set()
        self._thread.join(timeout=5.0)
        if self._fetch_thread is not None:
            self._fetch_thread.join(timeout=5.0)
        # drain anything still queued so no caller blocks on Future.result()
        while True:
            try:
                _, fut = self._q.get_nowait()
            except queue.Empty:
                break
            fut.set_exception(RuntimeError("MicroBatcher closed"))


def _static_dim(d) -> Optional[int]:
    """int for a concrete aval dim, None for a symbolic (polymorphic) one."""
    return int(d) if isinstance(d, (int, np.integer)) else None


class _ArtifactEncoder:
    """A deserialized StableHLO artifact behind the uniform encoder
    contract (``.in_avals`` + ``.call(*args, device=)``). Weights ride
    inside the artifact as constants — self-contained single file, the
    zero-dependency deployment path (export.py)."""

    def __init__(self, exported):
        self._exported = exported
        self.in_avals = list(exported.in_avals)

    def call(self, *args, device=None):
        if device is not None:
            import jax

            args = tuple(jax.device_put(a, device) for a in args)
        return self._exported.call(*args)


class _JitEncoder:
    """A jitted model surface behind the same contract, with params/state
    passed as jit ARGUMENTS on every call — never baked in as constants.

    This is the backend that reaches production dims on remote-compiled
    platforms: the axon relay compiles these same functions at flagship
    dims on every bench run when params are arguments, but never finished
    compiling a weight-constant StableHLO artifact at those dims (50 min,
    no output — docs/DESIGN_NOTES.md "Full-dims StableHLO export drive";
    the constant-free graph is also what keeps the request under the
    remote compiler's HTTP 413 size limit). Captures (params/state) are
    ``device_put`` once per serving device and cached, so steady-state
    calls ship activations only.
    """

    def __init__(self, fn, captures, in_avals):
        import jax

        self._jit = jax.jit(fn)
        self._captures = captures  # tuple of pytrees: (params[, state])
        self._placed: Dict = {}
        self._placed_lock = threading.Lock()
        self.in_avals = list(in_avals)

    def _captures_on(self, device):
        if device is None:
            return self._captures
        with self._placed_lock:  # one transfer per device, ever
            if device not in self._placed:
                import jax

                self._placed[device] = jax.device_put(self._captures, device)
            return self._placed[device]

    def call(self, *args, device=None):
        captures = self._captures_on(device)
        if device is not None:
            import jax

            args = tuple(jax.device_put(a, device) for a in args)
        return self._jit(*captures, *args)


class _Aval:
    """Input-shape declaration for a _JitEncoder bucket: a None batch dim
    means polymorphic (the service pads coalesced batches to the next
    power of two and jit compiles per size); a concrete dim means every
    call pads to exactly that batch (one compile)."""

    def __init__(self, shape, dtype):
        self.shape = shape
        self.dtype = dtype


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length() if n > 1 else 1


def _cap_batch(max_batch: Optional[int], fixed_batch: Optional[int]) -> int:
    """The micro-batch cap can never exceed a fixed-batch artifact's size —
    otherwise whole coalesced batches would fail under load."""
    cap = max_batch or fixed_batch or 8
    return min(cap, fixed_batch) if fixed_batch is not None else cap


class EncoderService:
    """The encoder surfaces as padded, micro-batched callables.

    Two backends behind one runtime (same batchers, bucket routing,
    padding, warmup, gallery, HTTP front):

    - **artifact** (``EncoderService(artifact_dir)``): deserialized
      StableHLO artifacts from export.py — self-contained, weights as
      constants.
    - **jit** (``EncoderService.from_checkpoint(ckpt, ...)`` /
      ``.from_model(model, params, state, ...)``): the same three surfaces
      jitted directly, params passed as call arguments — the backend that
      runs production dims on remote-compiled platforms (see _JitEncoder).
    """

    def __init__(
        self,
        artifact_dir: Optional[str] = None,
        max_batch: Optional[int] = None,
        max_wait_ms: float = 5.0,
        devices: Optional[Sequence] = None,
        pipeline_depth: int = 2,
        gallery_max: Optional[int] = None,
        _encoders: Optional[List] = None,
    ):
        import itertools
        import os

        # multi-device serving: round-robin each dispatched batch across
        # `devices` (jax.devices() subset). The batchers' pipelined mode
        # makes this real parallelism: dispatch is async, the fetch thread
        # syncs, so batch N+1 launches on the next device while batch N
        # computes. None = default device (single-chip behavior).
        self._devices = list(devices) if devices else None
        self._rr = itertools.count()
        self._pipeline_depth = pipeline_depth

        self._exported: Dict = {}
        speech_encoders = []
        if _encoders is not None:  # from_model/from_checkpoint backend
            for stem, encoder in _encoders:
                if stem == "encode_speech":
                    speech_encoders.append(encoder)
                else:
                    self._exported[stem] = encoder
        else:
            if artifact_dir is None:
                raise TypeError(
                    "EncoderService needs an artifact_dir (or use "
                    "EncoderService.from_checkpoint / .from_model)"
                )
            from jax import export as jexport

            for fname in sorted(os.listdir(artifact_dir)):
                if not fname.endswith(".stablehlo"):
                    continue
                stem = fname[: -len(".stablehlo")]
                with open(os.path.join(artifact_dir, fname), "rb") as f:
                    exported = _ArtifactEncoder(jexport.deserialize(f.read()))
                if stem.startswith("encode_speech"):
                    # bucket length comes from the artifact's own aval, not
                    # the filename suffix (encode_speech@<n> is convention)
                    speech_encoders.append(exported)
                elif stem in ("encode_image", "encode_text"):
                    self._exported[stem] = exported
        if not self._exported and not speech_encoders:
            raise FileNotFoundError(
                f"no *.stablehlo artifacts under {artifact_dir} "
                "(produce them with python -m speechclip_tpu.export)"
            )

        self.batchers: Dict[str, MicroBatcher] = {}
        # speech buckets (bucketed-loader design carried into serving): one
        # encoder per static wav length; requests route to the smallest
        # bucket that fits, overlong audio crops to the largest
        self._speech_buckets: List[Dict] = []
        speech_encoders.sort(key=lambda e: int(e.in_avals[0].shape[1]))
        seen_lengths = set()
        for exported in speech_encoders:
            wav_aval = exported.in_avals[0]
            bucket = {
                "exported": exported,
                "wav_samples": int(wav_aval.shape[1]),
                "fixed_batch": _static_dim(wav_aval.shape[0]),
                # compact_wav buckets take int16 PCM on device (rescaled
                # in-graph); everything else f32
                "wav_dtype": np.dtype(wav_aval.dtype),
            }
            if bucket["wav_samples"] in seen_lengths:
                # e.g. a legacy encode_speech.stablehlo next to a re-exported
                # encode_speech@<n> of the same length — one bucket per length
                import logging

                logging.getLogger(__name__).warning(
                    "duplicate encode_speech artifact for wav length %d "
                    "ignored",
                    bucket["wav_samples"],
                )
                continue
            seen_lengths.add(bucket["wav_samples"])
            self._speech_buckets.append(bucket)
        for bucket in self._speech_buckets:
            # name AFTER dedup: a lone surviving bucket keeps the documented
            # single-bucket surface batchers["encode_speech"]
            name = (
                "encode_speech"
                if len(self._speech_buckets) == 1
                else f"encode_speech@{bucket['wav_samples']}"
            )
            bucket["batcher"] = self.batchers[name] = MicroBatcher(
                lambda wavs, b=bucket: self._speech_dispatch(wavs, b),
                max_batch=_cap_batch(max_batch, bucket["fixed_batch"]),
                max_wait_ms=max_wait_ms,
                name=name,
                finalize_fn=self._finalize_call,
                pipeline_depth=pipeline_depth,
            )
        if self._speech_buckets:
            # single-bucket conveniences (and back-compat surface)
            self.wav_samples = self._speech_buckets[-1]["wav_samples"]
            self.fixed_batch_speech = self._speech_buckets[-1]["fixed_batch"]
        if "encode_image" in self._exported:
            img_aval = self._exported["encode_image"].in_avals[0]
            self.fixed_batch_image = _static_dim(img_aval.shape[0])
            self.image_size = int(img_aval.shape[1])
            self.batchers["encode_image"] = MicroBatcher(
                self._image_dispatch,
                max_batch=_cap_batch(max_batch, self.fixed_batch_image),
                max_wait_ms=max_wait_ms,
                name="image",
                finalize_fn=self._finalize_call,
                pipeline_depth=pipeline_depth,
            )
        if "encode_text" in self._exported:
            txt_aval = self._exported["encode_text"].in_avals[0]
            self.fixed_batch_text = _static_dim(txt_aval.shape[0])
            self.context_length = int(txt_aval.shape[1])
            self.batchers["encode_text"] = MicroBatcher(
                self._text_dispatch,
                max_batch=_cap_batch(max_batch, self.fixed_batch_text),
                max_wait_ms=max_wait_ms,
                name="text",
                finalize_fn=self._finalize_call,
                pipeline_depth=pipeline_depth,
            )

        # online retrieval gallery (image features, L2-normalized);
        # bounded by gallery_max (FIFO eviction) and persistable via
        # gallery_save/gallery_load
        self._gallery_lock = threading.Lock()
        self._gallery_ids: List[str] = []
        self._gallery_feats: List[np.ndarray] = []
        self._gallery_matrix: Optional[np.ndarray] = None
        self._gallery_max = int(gallery_max) if gallery_max else None
        self._gallery_seq = 0  # monotonic auto-id, survives eviction
        # default artifact path for /gallery/save and /gallery/load
        # without ?path= (the CLI's --gallery flag sets it)
        self.gallery_path: Optional[str] = None

    # ----------------------------------------------------- jit backend
    @classmethod
    def from_model(
        cls,
        model,
        params,
        state,
        wav_buckets: Sequence[int] = (102400,),
        batch: int = 8,
        dtype=None,
        compact_wav: bool = False,
        fixed_batch: bool = False,
        **kw,
    ):
        """Serve an in-memory model directly: the three encoder surfaces
        as jitted calls (params as arguments — _JitEncoder), behind the
        same micro-batching/bucket-routing/warmup machinery as the
        artifact backend.

        ``wav_buckets`` — one wav length per serving bucket (the export
        CLI's ``--wav-samples`` contract). ``batch`` — the micro-batch
        CAP; unlike a fixed-batch artifact, the jit backend pads coalesced
        batches to the next power of two (jit compiles one graph per pow2
        size, all covered by warmup), so a lone request pays batch-1
        transfer+compute instead of a full fixed batch. ``dtype`` —
        optional float-weight cast ("bf16" halves param bytes; the shipped
        precision-16 configs compute in bf16 anyway). ``compact_wav`` —
        ship wav to the device as int16 PCM and rescale by 1/32768
        in-graph (the loader's compact_wav convention, data/loader.py:
        half the request + H2D bytes; exact for int16-origin payloads,
        ±1/65536 quantization for float payloads). ``fixed_batch=True``
        pads every coalesced batch to exactly ``batch`` instead (ONE
        compile per surface — the right trade when compiles are minutes,
        e.g. remote-compiled platforms, and traffic keeps batches full).
        """
        import jax
        import jax.numpy as jnp

        if dtype is not None:
            from .export import cast_float_params

            dtype = jnp.bfloat16 if dtype in ("bf16", "bfloat16") else dtype
            params = cast_float_params(params, dtype)
        state = state or {}
        batch = int(batch)
        # `batch` is the cap unless the caller set an explicit max_batch;
        # the CLI always passes max_batch (None when the flag is omitted),
        # so a plain setdefault would silently ignore --batch
        if kw.get("max_batch") is None:
            kw["max_batch"] = batch
        wav_dtype = jnp.int16 if compact_wav else jnp.float32
        # int16 wav passes straight through the surface fn: forward_audio
        # owns the compact-wav rescale contract (speechclip.py:391-396)
        from .export import encode_speech_surface

        speech_fn = encode_speech_surface(model)
        bdim = batch if fixed_batch else None

        encoders = []
        for n in sorted({int(b) for b in wav_buckets}):
            encoders.append(
                (
                    "encode_speech",
                    _JitEncoder(
                        speech_fn,
                        (params, state),
                        [
                            _Aval((bdim, n), wav_dtype),
                            _Aval((bdim,), jnp.int32),
                        ],
                    ),
                )
            )
        size = model.clip_cfg.vision.image_size
        encoders.append(
            (
                "encode_image",
                _JitEncoder(
                    lambda params, images: model.forward_image(params, images),
                    (params,),
                    [_Aval((bdim, size, size, 3), jnp.float32)],
                ),
            )
        )
        ctx = model.clip_cfg.text.context_length
        encoders.append(
            (
                "encode_text",
                _JitEncoder(
                    lambda params, text, eot: model.forward_text(
                        params, text, eot
                    ),
                    (params,),
                    [
                        _Aval((bdim, ctx), jnp.int32),
                        _Aval((bdim,), jnp.int32),
                    ],
                ),
            )
        )
        return cls(None, _encoders=encoders, **kw)

    @classmethod
    def from_checkpoint(
        cls,
        ckpt: str,
        wav_buckets: Sequence[int] = (102400,),
        batch: int = 8,
        dtype=None,
        compact_wav: bool = False,
        **kw,
    ):
        """Restore a training checkpoint (orbax run dir, or a reference
        Lightning ``.ckpt``) and serve its encoders via the jit backend —
        the production-dims serving path (reference inference surface:
        example.py:10-40, which imports the whole training repo instead).
        Restore itself is the export CLI's shared path
        (training/checkpoint.py load_any_checkpoint)."""
        from .training.checkpoint import load_any_checkpoint

        model, params, state = load_any_checkpoint(ckpt)
        return cls.from_model(
            model,
            params,
            state,
            wav_buckets=wav_buckets,
            batch=batch,
            dtype=dtype,
            compact_wav=compact_wav,
            **kw,
        )

    # ------------------------------------------------------------ speech
    def encode_speech(self, wav: np.ndarray) -> Dict[str, np.ndarray]:
        """One waveform -> feature dict; micro-batched within the
        wav-length bucket the request routes to. float32 samples pass
        through; int16 PCM is rescaled by 1/32768 (exact for PCM16
        sources — the loader's compact_wav convention, half the payload
        bytes over the wire)."""
        if not self._speech_buckets:
            raise RuntimeError(
                "no encode_speech artifact loaded (export one with "
                "python -m speechclip_tpu.export)"
            )
        wav = np.asarray(wav)
        if wav.squeeze().ndim > 1:
            # a batched array silently flattened would concatenate the
            # utterances into one plausible-looking wrong feature
            raise ValueError(
                f"encode_speech takes ONE 1-D waveform, got shape "
                f"{wav.shape}; send one request per utterance"
            )
        if wav.dtype == np.int16:
            wav = wav.astype(np.float32) / 32768.0
        wav = wav.astype(np.float32).reshape(-1)
        return self._route_speech(len(wav))["batcher"].submit(wav).result()

    def _route_speech(self, n_samples: int) -> Dict:
        """Smallest bucket that fits; overlong audio -> largest (cropped)."""
        for bucket in self._speech_buckets:  # sorted ascending
            if n_samples <= bucket["wav_samples"]:
                return bucket
        return self._speech_buckets[-1]

    def _dispatch(self, encoder, args, n, unpack, device=None):
        """Launch a packed batch (async JAX dispatch) on the round-robin
        device (or an explicit one); returns a handle for _finalize_call.
        Device placement is the encoder's job (the jit backend also keeps
        per-device param copies)."""
        if device is None and self._devices:
            device = self._devices[next(self._rr) % len(self._devices)]
        return (encoder.call(*args, device=device), n, unpack)

    @staticmethod
    def _finalize_call(handle) -> List:
        out, n, unpack = handle
        return unpack(out, n)

    @staticmethod
    def _unpack_feature_dict(out, n: int) -> List[Dict]:
        out = {k: np.asarray(v) for k, v in out.items()}
        return [{k: v[i] for k, v in out.items()} for i in range(n)]

    @staticmethod
    def _unpack_rows(out, n: int) -> List[np.ndarray]:
        out = np.asarray(out)
        return [out[i] for i in range(n)]

    def _speech_dispatch(
        self, wavs: Sequence[np.ndarray], bucket: Dict, device=None
    ):
        n = len(wavs)
        s = bucket["wav_samples"]
        dt = bucket.get("wav_dtype", np.dtype(np.float32))
        wav_arr = np.zeros((n, s), dt)
        wav_len = np.empty((n,), np.int32)
        for i, w in enumerate(wavs):
            if dt == np.int16:
                # int16-on-device bucket (compact_wav): exact round-trip
                # for int16-origin payloads (round(x/32768*32768) == x)
                w = np.clip(
                    np.round(np.asarray(w, np.float32) * 32768.0),
                    -32768,
                    32767,
                ).astype(np.int16)
            else:
                w = np.asarray(w, np.float32)
            w = w.reshape(-1)[:s]  # crop overlong
            wav_arr[i, : len(w)] = w
            wav_len[i] = len(w)
        wav_arr, wav_len = self._pad_rows(
            wav_arr, wav_len, bucket["fixed_batch"], pad_len=s
        )
        return self._dispatch(
            bucket["exported"],
            (wav_arr, wav_len),
            n,
            self._unpack_feature_dict,
            device=device,
        )

    def _speech_batch(
        self, wavs: Sequence[np.ndarray], bucket: Dict, device=None
    ) -> List[Dict]:
        """Synchronous dispatch+finalize (warmup and direct callers)."""
        return self._finalize_call(self._speech_dispatch(wavs, bucket, device))

    # ------------------------------------------------------------- image
    def encode_image(self, image) -> np.ndarray:
        """JPEG bytes / uint8 (H, W, 3) / preprocessed f32 -> feature."""
        if "encode_image" not in self._exported:
            raise RuntimeError(
                "no encode_image artifact loaded (export one with "
                "python -m speechclip_tpu.export)"
            )
        return (
            self.batchers["encode_image"].submit(self.preprocess_image(image))
            .result()
        )

    def preprocess_image(self, image) -> np.ndarray:
        """-> (size, size, 3) float32, CLIP-normalized (host path — the
        artifact was traced with f32 input, data/image.py contract)."""
        if "encode_image" not in self._exported:
            raise RuntimeError("no encode_image artifact loaded")
        from .data.image import clip_preprocess_pil

        if isinstance(image, (bytes, bytearray)):
            from PIL import Image

            return clip_preprocess_pil(
                Image.open(io.BytesIO(image)), self.image_size
            )
        image = np.asarray(image)
        if image.dtype == np.uint8:
            from PIL import Image

            return clip_preprocess_pil(Image.fromarray(image), self.image_size)
        expect = (self.image_size, self.image_size, 3)
        if image.shape != expect:
            raise ValueError(
                f"float image must be preprocessed to {expect}, got {image.shape}"
            )
        return image.astype(np.float32)

    def _image_dispatch(self, images: Sequence[np.ndarray], device=None):
        n = len(images)
        arr = np.stack([np.asarray(im, np.float32) for im in images])
        arr, _ = self._pad_rows(arr, None, self.fixed_batch_image)
        return self._dispatch(
            self._exported["encode_image"], (arr,), n, self._unpack_rows,
            device=device,
        )

    def _image_batch(
        self, images: Sequence[np.ndarray], device=None
    ) -> List[np.ndarray]:
        return self._finalize_call(self._image_dispatch(images, device))

    # -------------------------------------------------------------- text
    def encode_text(self, token_ids: np.ndarray, eot_position: int) -> np.ndarray:
        """One tokenized caption ((context_length,) int ids — reduced ids
        for reduced-vocab exports — plus its EOT index) -> text feature."""
        if "encode_text" not in self._exported:
            raise RuntimeError(
                "no encode_text artifact loaded (export one with "
                "python -m speechclip_tpu.export)"
            )
        ids = np.asarray(token_ids, np.int32).reshape(-1)
        if len(ids) > self.context_length:
            raise ValueError(
                f"{len(ids)} token ids exceed the artifact's context "
                f"{self.context_length}"
            )
        if not 0 <= int(eot_position) < len(ids):
            # an out-of-range gather index would CLAMP on device and return
            # a feature from the wrong position with status 200
            raise ValueError(
                f"eot_position {eot_position} outside the caption "
                f"(0..{len(ids) - 1})"
            )
        padded = np.zeros((self.context_length,), np.int32)
        padded[: len(ids)] = ids
        return (
            self.batchers["encode_text"]
            .submit((padded, int(eot_position)))
            .result()
        )

    def _text_dispatch(self, items: Sequence, device=None):
        n = len(items)
        ids = np.stack([ids for ids, _ in items])
        eots = np.asarray([eot for _, eot in items], np.int32)
        ids, eots = self._pad_rows(ids, eots, self.fixed_batch_text, pad_len=0)
        return self._dispatch(
            self._exported["encode_text"], (ids, eots), n, self._unpack_rows,
            device=device,
        )

    def _text_batch(self, items: Sequence, device=None) -> List[np.ndarray]:
        return self._finalize_call(self._text_dispatch(items, device))

    # ----------------------------------------------------------- helpers
    @staticmethod
    def _pad_rows(arr, lens, fixed_batch, pad_len=None):
        """Pad a partial batch up to a fixed-batch artifact's size (zero
        rows, full valid length so masks stay well-formed). Polymorphic
        artifacts pad to the next power of two instead: the serving
        backend then compiles O(log max_batch) batch shapes, not one per
        distinct coalesced size — each distinct shape is a fresh XLA
        compile on the request path (minutes on remote-compiled backends),
        and warmup() can cover the whole set up front."""
        n = arr.shape[0]
        if fixed_batch is None:
            target = _next_pow2(n)
        else:
            if n > fixed_batch:
                raise ValueError(
                    f"batch {n} exceeds the artifact's fixed batch "
                    f"{fixed_batch}"
                )
            target = fixed_batch
        if n == target:
            return arr, lens
        pad = target - n
        arr = np.concatenate(
            [arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)], axis=0
        )
        if lens is not None:
            lens = np.concatenate(
                [lens, np.full((pad,), pad_len, lens.dtype)], axis=0
            )
        return arr, lens

    # --------------------------------------------------------- retrieval
    # The model's purpose is speech<->image retrieval (reference
    # mutualRetrieval, retrieval.py:45-121, run at validation time); the
    # service exposes it online: a gallery of encoded image features and
    # cosine top-k for speech queries.
    #
    # Lifecycle: the gallery lives in process memory, persists via
    # gallery_save/gallery_load (one .npz of ids + the L2-normalized
    # feature matrix — restart-safe), and is bounded by ``gallery_max``:
    # adding past the bound evicts the OLDEST entry (FIFO — the documented
    # size policy; pick ids you can re-add if you need pinning), and
    # gallery_load keeps only the newest ``gallery_max`` rows.
    def gallery_add(self, image, image_id: Optional[str] = None) -> str:
        """Encode an image payload into the gallery; returns its id."""
        feat = np.asarray(self.encode_image(image), np.float32)
        feat = feat / max(float(np.linalg.norm(feat)), 1e-12)
        with self._gallery_lock:
            if image_id is None:
                image_id = str(self._gallery_seq)
            self._gallery_seq += 1
            self._gallery_ids.append(str(image_id))
            self._gallery_feats.append(feat)
            if (
                self._gallery_max is not None
                and len(self._gallery_ids) > self._gallery_max
            ):
                # FIFO eviction keeps the service memory-bounded under an
                # endless stream of adds
                drop = len(self._gallery_ids) - self._gallery_max
                del self._gallery_ids[:drop]
                del self._gallery_feats[:drop]
            self._gallery_matrix = None  # rebuilt lazily on next retrieve
        return str(image_id)

    def gallery_size(self) -> int:
        with self._gallery_lock:
            return len(self._gallery_ids)

    def gallery_save(self, path: str) -> int:
        """Persist the gallery (ids + L2-normalized features) as one .npz;
        returns the number of rows written. Atomic: writes ``path.part``
        then renames, so a crash mid-save never corrupts the artifact."""
        import os

        with self._gallery_lock:
            ids = np.asarray(self._gallery_ids, dtype=np.str_)
            feats = (
                np.stack(self._gallery_feats)
                if self._gallery_feats
                else np.zeros((0, 0), np.float32)
            )
            seq = self._gallery_seq
        tmp = path + ".part"
        with open(tmp, "wb") as f:
            np.savez(f, ids=ids, feats=feats, seq=np.int64(seq))
        os.replace(tmp, path)
        return len(ids)

    def gallery_load(self, path: str) -> int:
        """Replace the gallery with a gallery_save artifact; returns the
        number of rows now live (trimmed to ``gallery_max`` newest-first
        when a bound is set)."""
        with np.load(path, allow_pickle=False) as data:
            ids = [str(s) for s in data["ids"]]
            feats = np.asarray(data["feats"], np.float32)
            seq = int(data["seq"]) if "seq" in data else len(ids)
        if feats.shape[0] != len(ids):
            raise ValueError(
                f"corrupt gallery artifact: {len(ids)} ids vs "
                f"{feats.shape[0]} feature rows"
            )
        if self._gallery_max is not None and len(ids) > self._gallery_max:
            ids = ids[-self._gallery_max:]
            feats = feats[-self._gallery_max:]
        with self._gallery_lock:
            self._gallery_ids = ids
            self._gallery_feats = [feats[i] for i in range(len(ids))]
            self._gallery_seq = max(seq, len(ids))
            self._gallery_matrix = None
        return len(ids)

    def retrieve(
        self, wav: np.ndarray, k: int = 5, feat: str = "parallel"
    ) -> List[Dict]:
        """Speech query -> top-k gallery images by cosine score
        (feat: 'parallel' | 'cascaded', the retrieval.audio_feat_src
        choice, reference config .../spchclp_p.yaml:86)."""
        key = f"{feat}_audio_feat"
        feats = self.encode_speech(wav)
        if key not in feats:
            raise ValueError(
                f"audio feature {key!r} not in this export "
                f"(available: {sorted(feats)})"
            )
        q = np.asarray(feats[key], np.float32)
        q = q / max(float(np.linalg.norm(q)), 1e-12)
        with self._gallery_lock:
            if not self._gallery_ids:
                return []
            # additions are rare, retrievals hot: cache the stacked matrix
            # instead of re-stacking O(N*d) under the lock per query
            if self._gallery_matrix is None:
                self._gallery_matrix = np.stack(self._gallery_feats)
            gallery = self._gallery_matrix
            ids = list(self._gallery_ids)
        scores = gallery @ q
        order = np.argsort(-scores)[: max(int(k), 0)]
        return [
            {"id": ids[i], "score": float(scores[i])} for i in order
        ]

    @staticmethod
    def _warm_sizes(fixed_batch: Optional[int], max_batch: int) -> List[int]:
        """Batch sizes warmup must compile: fixed artifacts see exactly one
        shape (padding forces it); polymorphic ones see every power of two
        _pad_rows can produce up to the batcher cap."""
        if fixed_batch is not None:
            return [1]
        sizes, s = [], 1
        while s < _next_pow2(max_batch):
            sizes.append(s)
            s *= 2
        sizes.append(s)
        return sizes

    def warmup(self) -> None:
        """Compile every (artifact, batch shape, device) before taking
        traffic: first calls pay the serving platform's XLA compile
        (minutes on remote-compiled backends) — absorb that at startup,
        not on a user request. Covers all shapes _pad_rows can produce,
        on every round-robin device."""
        for dev in self._devices or [None]:  # every round-robin device
            for bucket in self._speech_buckets:
                for n in self._warm_sizes(
                    bucket["fixed_batch"], bucket["batcher"].max_batch
                ):
                    self._speech_batch(
                        [np.zeros(16, np.float32)] * n, bucket, device=dev
                    )
            if "encode_image" in self._exported:
                img = np.zeros(
                    (self.image_size, self.image_size, 3), np.float32
                )
                for n in self._warm_sizes(
                    self.fixed_batch_image,
                    self.batchers["encode_image"].max_batch,
                ):
                    self._image_batch([img] * n, device=dev)
            if "encode_text" in self._exported:
                item = (np.zeros(self.context_length, np.int32), 0)
                for n in self._warm_sizes(
                    self.fixed_batch_text,
                    self.batchers["encode_text"].max_batch,
                ):
                    self._text_batch([item] * n, device=dev)

    def stats(self) -> Dict:
        return {
            name: {
                "batches": b.batches_run,
                "items": b.items_run,
                "max_batch": b.max_batch,
            }
            for name, b in self.batchers.items()
        }

    def close(self):
        for b in self.batchers.values():
            b.close()


def drive_requests(service, wavs, n_req: int, concurrency: int):
    """Load-generator for benches: fire ``n_req`` encode_speech requests
    from ``concurrency`` client threads over the ``wavs`` pool (round-
    robin); -> (elapsed_seconds, per-request latencies). The one shared
    harness for bench.py's serving extra and scripts/bench_serving.py.

    Hang-proof by construction: completion is thread ``join``, not a
    semaphore a dying client could fail to release; a client exception
    stops the remaining work and re-raises in the caller after all
    threads have joined."""
    remaining = [int(n_req)]
    lock = threading.Lock()
    latencies: List[float] = []
    errors: List[BaseException] = []

    def client():
        try:
            while True:
                with lock:
                    if remaining[0] == 0:
                        return
                    i = remaining[0] = remaining[0] - 1
                t0 = time.perf_counter()
                service.encode_speech(wavs[i % len(wavs)])
                dt = time.perf_counter() - t0
                with lock:
                    latencies.append(dt)
        except BaseException as e:  # noqa: BLE001 — must reach the caller
            with lock:
                errors.append(e)
                remaining[0] = 0  # stop the other clients promptly

    threads = [threading.Thread(target=client) for _ in range(concurrency)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.perf_counter() - t_start
    if errors:
        raise errors[0]
    return elapsed, latencies


# ---------------------------------------------------------------------------
# HTTP front end (stdlib only)
# ---------------------------------------------------------------------------
def make_http_server(service: EncoderService, host: str = "0.0.0.0", port: int = 8787):
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet; stats live in /healthz
            pass

        def _reply(self, code: int, payload: Dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _gallery_target(self, qs):
            """Resolve the save/load target. ?path= is confined to the
            --gallery directory: these endpoints write/read the server's
            filesystem on behalf of unauthenticated HTTP clients, so an
            unconfined path would be remote arbitrary-file write/probe."""
            import os

            requested = qs.get("path", [None])[0]
            default = service.gallery_path
            if requested is None:
                if not default:
                    raise ValueError(
                        "no ?path= and the service was started without "
                        "--gallery"
                    )
                return default
            if not default:
                raise ValueError(
                    "?path= requires --gallery (it pins the one directory "
                    "reachable over HTTP)"
                )
            base = os.path.dirname(os.path.abspath(default)) or "."
            # a relative ?path= means "inside the gallery directory" — NOT
            # relative to whatever CWD the server happened to launch from
            # (the natural ?path=backup.npz usage depended on the CWD before)
            if not os.path.isabs(requested):
                requested = os.path.join(base, requested)
            target = os.path.abspath(requested)
            if os.path.dirname(target) != base:
                raise ValueError(
                    f"?path= must stay inside the --gallery directory "
                    f"{base}"
                )
            return target

        def do_GET(self):
            if self.path.startswith("/healthz"):
                self._reply(
                    200,
                    {
                        "status": "ok",
                        "endpoints": sorted(service.batchers),
                        "stats": service.stats(),
                        "gallery_size": service.gallery_size(),
                    },
                )
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            try:
                if self.path.startswith("/encode_speech"):
                    wav = np.load(io.BytesIO(body), allow_pickle=False)
                    feats = service.encode_speech(wav)
                    self._reply(
                        200,
                        {"features": {k: v.tolist() for k, v in feats.items()}},
                    )
                elif self.path.startswith("/gallery/save"):
                    from urllib.parse import parse_qs, urlparse

                    qs = parse_qs(urlparse(self.path).query)
                    path = self._gallery_target(qs)
                    n = service.gallery_save(path)
                    self._reply(200, {"saved": n, "path": path})
                elif self.path.startswith("/gallery/load"):
                    from urllib.parse import parse_qs, urlparse

                    qs = parse_qs(urlparse(self.path).query)
                    path = self._gallery_target(qs)
                    n = service.gallery_load(path)
                    self._reply(200, {"loaded": n, "path": path})
                elif self.path.startswith("/gallery/add"):
                    from urllib.parse import parse_qs, urlparse

                    qs = parse_qs(urlparse(self.path).query)
                    if body[:2] == b"\xff\xd8":  # JPEG magic
                        payload = bytes(body)
                    else:
                        payload = np.load(io.BytesIO(body), allow_pickle=False)
                    image_id = service.gallery_add(
                        payload, qs.get("id", [None])[0]
                    )
                    self._reply(
                        200, {"id": image_id, "gallery_size": service.gallery_size()}
                    )
                elif self.path.startswith("/retrieve"):
                    from urllib.parse import parse_qs, urlparse

                    qs = parse_qs(urlparse(self.path).query)
                    wav = np.load(io.BytesIO(body), allow_pickle=False)
                    hits = service.retrieve(
                        wav,
                        k=int(qs.get("k", ["5"])[0]),
                        feat=qs.get("feat", ["parallel"])[0],
                    )
                    self._reply(200, {"results": hits})
                elif self.path.startswith("/encode_text"):
                    req = json.loads(body)
                    feat = service.encode_text(
                        np.asarray(req["token_ids"], np.int32),
                        int(req["eot_position"]),
                    )
                    self._reply(200, {"features": {"text_feat": feat.tolist()}})
                elif self.path.startswith("/encode_image"):
                    if body[:2] == b"\xff\xd8":  # JPEG magic
                        payload = bytes(body)
                    else:
                        payload = np.load(io.BytesIO(body), allow_pickle=False)
                    feat = service.encode_image(payload)
                    self._reply(200, {"features": {"image_feat": feat.tolist()}})
                else:
                    self._reply(404, {"error": f"unknown path {self.path}"})
            except (ValueError, KeyError) as exc:
                # malformed client input: bad npy/json payload, missing json
                # keys, unknown feat name, out-of-tree gallery path
                # (json.JSONDecodeError is a ValueError subclass)
                self._reply(400, {"error": f"{type(exc).__name__}: {exc}"})
            except Exception as exc:
                # server-side fault (backend compile failure, closed
                # MicroBatcher during shutdown, filesystem errors): 500, so
                # clients/load-balancers retry and alert correctly — and the
                # internal detail goes to the server log, not the wire
                # (these endpoints are unauthenticated)
                import logging

                logging.getLogger(__name__).exception("serving POST failed")
                self._reply(
                    500, {"error": f"internal error ({type(exc).__name__})"}
                )

    return ThreadingHTTPServer((host, port), Handler)


def main():
    import argparse

    parser = argparse.ArgumentParser()
    backend = parser.add_mutually_exclusive_group(required=True)
    backend.add_argument("--artifacts", help="dir of *.stablehlo (AOT backend)")
    backend.add_argument(
        "--ckpt",
        help="orbax run dir or reference .ckpt: serve straight from the "
        "checkpoint via the jit backend (params as call arguments — the "
        "production-dims path on remote-compiled platforms)",
    )
    parser.add_argument(
        "--wav-samples",
        type=int,
        nargs="+",
        default=[102400],
        help="(--ckpt only) one serving bucket per wav length, the export "
        "CLI contract",
    )
    parser.add_argument(
        "--batch",
        type=int,
        default=8,
        help="(--ckpt only) fixed device batch per bucket",
    )
    parser.add_argument(
        "--dtype",
        default=None,
        choices=["bf16"],
        help="(--ckpt only) cast float weights before serving",
    )
    parser.add_argument(
        "--compact-wav",
        action="store_true",
        help="(--ckpt only) ship wav to the device as int16 PCM, rescaled "
        "1/32768 in-graph — half the H2D bytes (part of the measured "
        "production operating point, docs/DESIGN_NOTES.md)",
    )
    parser.add_argument(
        "--gallery",
        default=None,
        help="gallery .npz artifact: loaded at startup when present, "
        "saved on clean shutdown, and the default path for the "
        "/gallery/save and /gallery/load endpoints",
    )
    parser.add_argument(
        "--gallery-max",
        type=int,
        default=None,
        help="bound the in-memory retrieval gallery: adds past the bound "
        "evict the OLDEST entries (FIFO)",
    )
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8787)
    parser.add_argument("--max-batch", type=int, default=None)
    parser.add_argument("--max-wait-ms", type=float, default=5.0)
    parser.add_argument(
        "--platform",
        default=None,
        help="jax platform override (e.g. cpu; see CLAUDE.md env gotchas)",
    )
    parser.add_argument(
        "--warmup",
        action="store_true",
        help="compile every artifact before accepting traffic (first "
        "calls otherwise pay the XLA compile on a user request)",
    )
    parser.add_argument(
        "--devices",
        type=int,
        default=None,
        help="round-robin dispatched batches across the first N "
        "jax.devices() (pipelined: batch N+1 launches while batch N "
        "computes); default = the backend's default device",
    )
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    devices = None
    if args.devices and args.devices > 1:
        import jax

        devices = jax.devices()[: args.devices]
    if args.ckpt:
        service = EncoderService.from_checkpoint(
            args.ckpt,
            wav_buckets=args.wav_samples,
            batch=args.batch,
            dtype=args.dtype,
            compact_wav=args.compact_wav,
            max_batch=args.max_batch,
            max_wait_ms=args.max_wait_ms,
            devices=devices,
            gallery_max=args.gallery_max,
        )
    else:
        service = EncoderService(
            args.artifacts,
            max_batch=args.max_batch,
            max_wait_ms=args.max_wait_ms,
            devices=devices,
            gallery_max=args.gallery_max,
        )
    if args.gallery:
        import os

        service.gallery_path = args.gallery
        if os.path.exists(args.gallery):
            n = service.gallery_load(args.gallery)
            print(f"gallery: loaded {n} entries from {args.gallery}", flush=True)
    if args.warmup:
        print("warming up (compiling artifacts)...", flush=True)
        service.warmup()
    server = make_http_server(service, args.host, args.port)
    names = ", ".join(sorted(service.batchers))
    print(f"serving {names} on {args.host}:{args.port}", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        if args.gallery and service.gallery_size():
            n = service.gallery_save(args.gallery)
            print(f"gallery: saved {n} entries to {args.gallery}", flush=True)
        service.close()


if __name__ == "__main__":
    main()
