"""Trainer: the fit/validate orchestration loop.

Equivalent of the reference's task layer + Lightning Trainer usage
(avssl/task/base_task.py:35-245, SURVEY.md §3.1): seed, datasets, bucketed
loaders, sharded train step, per-epoch validation with retrieval recall,
two-monitor checkpointing, metric logging, resume.

TPU specifics: one jit specialization per wav bucket (static shapes), batch
sharded over the mesh "data" axis, params optionally tensor-sharded over
"model"; eval remainder batches are padded to the bucket batch size and
trimmed on host.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..config import ConfigNode
from ..data import BucketedLoader, build_dataset
from ..models.speechclip import SpeechCLIPModel
from ..parallel import make_mesh
from .checkpoint import CheckpointManager
from .evaluation import (
    collect_validation_outputs,
    retrieval_metrics,
    run_keyword_diagnostics,
)
from .logging import MetricsLogger
from .optim import build_optimizer
from .train_step import (
    TrainState,
    create_train_state,
    device_prefetch,
    jit_train_step,
    make_eval_step,
    make_train_step,
    place_state,
    shard_batch,
)

logger = logging.getLogger(__name__)


def _inject_cached_image_feats(batch, cache, id2row):
    """Swap pixels for precomputed frozen-tower features (trainer.
    cache_image_features): gather the batch's rows from the host cache by
    pair id. Fancy indexing copies, so donation/prefetch see fresh arrays."""
    batch = dict(batch)
    rows = np.fromiter(
        (id2row[int(i)] for i in batch["id"]), np.int64, len(batch["id"])
    )
    batch["image_feat_frozen"] = cache[rows]
    batch.pop("image", None)
    return batch


def _pad_batch(batch: Dict[str, np.ndarray], size: int):
    n = len(batch["id"])
    if n == size:
        return batch, n
    out = {}
    for k, v in batch.items():
        pad_width = [(0, size - n)] + [(0, 0)] * (v.ndim - 1)
        # cached frozen features pad by EDGE replication: a zero feature
        # row would l2_normalize to NaN inside forward (zero pixels, by
        # contrast, produce a real tower output). Dummy rows are trimmed
        # from features either way; this only keeps all-ragged loss
        # metrics finite.
        mode = "edge" if k == "image_feat_frozen" else "constant"
        out[k] = np.pad(v, pad_width, mode=mode)
    # padded ids must not collide with real pair ids in the loss mask
    out["id"][n:] = -np.arange(1, size - n + 1)
    return out, n


class Trainer:
    def __init__(
        self,
        config: ConfigNode,
        workdir: Optional[str] = None,
        tokenizer=None,
        devices=None,
    ):
        self.config = config
        self.workdir = workdir or config.get_path(
            "trainer.default_root_dir", "exp/run"
        )
        os.makedirs(self.workdir, exist_ok=True)
        self.seed = int(config.get_path("seed", 7122))

        self.model = SpeechCLIPModel(config)
        self.tokenizer = tokenizer

        model_axis = int(config.get_path("trainer.model_parallel", 1))
        self.mesh = make_mesh(devices=devices, model=model_axis)
        self.n_data = self.mesh.shape["data"]

        # the mesh is registered for Pallas kernel dispatch (shard_map; GSPMD
        # cannot partition a pallas_call itself) only while fit/validate run
        # — see _kernel_mesh_scope. A process-global registration here would
        # leak across trainer instances with different meshes (two trainers
        # in one process, or jitted code running after teardown).

        # derive the trainable mask from abstract shapes only — no need to
        # materialize a full random model here
        params_shapes = jax.eval_shape(
            lambda: self.model.init(jax.random.key(0))[0]
        )
        self._trainable_mask = self.model.trainable_mask(params_shapes)
        self.tx, self.schedule = build_optimizer(config, self._trainable_mask)

        # trainer.checkpoint_frozen: false -> exclude the frozen towers from
        # checkpoints (the reference stores the full state_dict; SURVEY.md §5
        # flags excluding them as the TPU-rebuild improvement)
        slim = not config.get_path("trainer.checkpoint_frozen", True)
        self.ckpt = CheckpointManager(
            os.path.join(self.workdir, "ckpts"),
            save_at_steps=config.get_path("trainer.save_at_steps", []) or [],
            slim_mask=self._trainable_mask if slim else None,
        )
        self.metrics_logger = MetricsLogger(
            self.workdir,
            backend=config.get_path("trainer.logger", "tb"),
            project=config.get_path("logger.project"),
            run_name=os.path.basename(self.workdir),
        )
        self._accum = int(
            config.get_path("trainer.accumulate_grad_batches", 1) or 1
        )
        self._train_step = jit_train_step(
            make_train_step(self.model, self.tx, self._accum), donate=True
        )
        self._eval_step = jax.jit(make_eval_step(self.model))

    # ------------------------------------------------------------------ data
    def eval_split_name(self, split: str) -> str:
        """Map the logical eval split to the dataset's split name.

        "dev" -> Flickr8k "dev" / SpokenCOCO "val" (the validation split);
        "test" -> "test" for both. Mirrors the reference, which builds a
        dev set for --eval and a test set for --test
        (avssl/task/base_task.py:86-110, 236-245).
        """
        if split in ("dev", "val"):
            name = self.config.data.dataset.name
            return "dev" if name == "flickr" else "val"
        if split == "test":
            return "test"
        raise ValueError(f"unknown eval split {split!r} (use 'dev' or 'test')")

    def build_eval_loader(self, split: str = "dev") -> BucketedLoader:
        data_cfg = self.config.data
        ds = build_dataset(
            data_cfg,
            self.eval_split_name(split),
            self.tokenizer,
            image_size=self.model.clip_cfg.vision.image_size,
        )
        # data.eval_batch_size: hardware-throughput override for the eval
        # loop (a 5k dev set at the reference's dev_batch_size=8 is ~600
        # dispatches of a tiny batch). Defaults to dev_batch_size because
        # the contrastive val_loss is a per-batch quantity: its magnitude
        # (log-denominator over batch-1 negatives) changes with batch size,
        # and matching the reference's logged val_loss requires its batch.
        # Retrieval recall is batch-independent either way.
        batch_size = int(
            data_cfg.get("eval_batch_size", data_cfg.get("dev_batch_size", 8))
        )
        return BucketedLoader(
            ds,
            batch_size=batch_size,
            train=False,
            seed=self.seed,
            compact_wav=self._compact_wav(),
            # with the image-feature cache validation also consumes cached
            # frozen features (computed once, reused every epoch)
            skip_images=self._cache_image_features(),
        )

    def _compact_wav(self) -> bool:
        # on_device_preprocess = "ship compact dtypes, normalize on device":
        # uint8 images (dataset image_mode raw) + int16 PCM wav (loader)
        return bool(
            self.config.get_path("data.dataset.on_device_preprocess", False)
        )

    def _cache_image_features(self) -> bool:
        # precompute the frozen image tower once per fit (the tower is
        # frozen and the preprocess deterministic — see
        # SpeechCLIPModel.encode_image_tower). Invalid with a trainable
        # image tower, so refuse loudly rather than silently stale-cache.
        enabled = bool(
            self.config.get_path("trainer.cache_image_features", False)
        )
        if enabled and self.config.get_path("clip.image_encoder_trainable", False):
            raise ValueError(
                "trainer.cache_image_features requires a frozen image tower"
            )
        return enabled

    def build_loaders(self):
        data_cfg = self.config.data
        image_size = self.model.clip_cfg.vision.image_size
        train_ds = build_dataset(
            data_cfg, "train", self.tokenizer, image_size=image_size
        )
        max_audio_len = int(
            self.config.get_path("audio_encoder.max_audio_len", 102400)
        )
        train_loader = BucketedLoader(
            train_ds,
            batch_size=int(data_cfg.batch_size),
            train=True,
            max_audio_len=max_audio_len,
            seed=self.seed,
            compact_wav=self._compact_wav(),
            # with the per-fit image-feature cache the train loader never
            # decodes or ships images (the eval loader still does)
            skip_images=self._cache_image_features(),
        )
        return train_loader, self.build_eval_loader("dev")

    def build_image_feature_cache(self, dataset, params) -> tuple:
        """-> (feats (n_unique, out_dim) f32 ndarray, id -> row dict).

        One pass of the frozen image tower over the dataset's unique images
        (one image per pair id; the 5-captions-per-image layout means a
        naive per-step recompute does the same ViT work 5x per epoch AND
        re-ships every image every step). Fixed-size chunks with a padded
        tail keep it to ONE jit specialization."""
        first_index_of_id: Dict[int, int] = {}
        for i, entry in enumerate(dataset.data):
            if "image" in entry and entry["id"] not in first_index_of_id:
                first_index_of_id[entry["id"]] = i
        ids = sorted(first_index_of_id)
        tower = jax.jit(self.model.encode_image_tower)

        from concurrent.futures import ThreadPoolExecutor

        chunk = 64
        feats = []
        pool = ThreadPoolExecutor(max_workers=8)  # PIL decode is GIL-releasing
        for lo in range(0, len(ids), chunk):
            part = ids[lo : lo + chunk]
            imgs = np.stack(
                list(
                    pool.map(
                        lambda i: dataset.get_item(
                            first_index_of_id[i], skip_wav=True
                        )["image"],
                        part,
                    )
                )
            )
            if len(part) < chunk:  # pad the tail to the one compiled shape
                pad = np.repeat(imgs[:1], chunk - len(part), axis=0)
                imgs = np.concatenate([imgs, pad], axis=0)
            out = jax.device_get(tower(params, jnp.asarray(imgs)))
            feats.append(np.asarray(out[: len(part)], np.float32))
        pool.shutdown()
        cache = np.concatenate(feats, axis=0)
        logger.info(
            "image-feature cache: %d unique images -> (%d, %d) f32 (%.1f MB)",
            len(ids), *cache.shape, cache.nbytes / 1e6,
        )
        return cache, {pair_id: row for row, pair_id in enumerate(ids)}

    def prepare_restore_target(self, ckpt_path: str, state: TrainState) -> TrainState:
        """Slim checkpoints exclude frozen towers: populate them from the
        pretrained assets before restore. load_pretrained keeps random init
        (with a warning) when assets are absent — correct only for runs that
        were themselves trained on that same seed-deterministic init."""
        import dataclasses

        if not self.ckpt.is_slim(ckpt_path):
            return state
        logger.warning(
            "%s is a slim checkpoint: frozen towers come from the pretrained "
            "assets (or seed-deterministic random init if assets are absent)",
            ckpt_path,
        )
        return dataclasses.replace(
            state, params=self.model.load_pretrained(state.params)
        )

    def _kernel_mesh_scope(self):
        """Register self.mesh for sharded Pallas dispatch for the duration of
        an entry point (trace time is what matters: jit specializations bake
        the dispatch in when first called)."""
        from ..ops.attention import kernel_mesh

        return kernel_mesh(self.mesh)

    # ------------------------------------------------------------------- fit
    def fit(
        self,
        resume: Optional[str] = None,
        initial_params=None,
        initial_model_state=None,
    ) -> TrainState:
        with self._kernel_mesh_scope():
            return self._fit(resume, initial_params, initial_model_state)

    def _fit(
        self,
        resume: Optional[str] = None,
        initial_params=None,
        initial_model_state=None,
    ) -> TrainState:
        """initial_params/model_state: warm-start weights (e.g. a converted
        reference checkpoint) without optimizer state."""
        state = create_train_state(self.model, self.tx, jax.random.key(self.seed))
        if initial_params is not None:
            state = TrainState(
                params=initial_params,
                model_state=initial_model_state or state.model_state,
                opt_state=self.tx.init(initial_params),
                step=state.step,
                rng=state.rng,
            )
        if resume == "auto":
            # elastic restart: pick up the run's own last checkpoint if one
            # exists (the reference's only recovery story is --resume,
            # SURVEY.md §5; auto mode removes the manual step)
            last = os.path.join(self.workdir, "ckpts", "last")
            resume = last if os.path.exists(last) else None
        if resume:
            state = self.prepare_restore_target(resume, state)
            state = self.ckpt.restore(resume, state)
            logger.info("resumed from %s at step %d", resume, int(state.step))
        elif initial_params is None:
            state = TrainState(
                params=self.model.load_pretrained(state.params),
                model_state=state.model_state,
                opt_state=state.opt_state,
                step=state.step,
                rng=state.rng,
            )
        state = place_state(state, self.mesh)

        train_loader, dev_loader = self.build_loaders()

        image_cache = id2row = None
        if self._cache_image_features():
            image_cache, id2row = self.build_image_feature_cache(
                train_loader.dataset, state.params
            )

        max_steps = int(self.config.get_path("trainer.max_steps", 50000))
        log_every = int(self.config.get_path("trainer.log_every_n_steps", 8))
        val_every_epoch = int(
            self.config.get_path("trainer.check_val_every_n_epoch", 1)
        )

        # step-time tracing (capability the reference lacks — SURVEY.md §5):
        # trainer.profile_steps: [start, stop] captures a jax.profiler trace
        profile_steps = self.config.get_path("trainer.profile_steps")
        profile_dir = os.path.join(self.workdir, "profile")

        if int(train_loader.batch_size) % self.n_data != 0:
            raise ValueError(
                f"data.batch_size={train_loader.batch_size} must be divisible "
                f"by the data-mesh size {self.n_data} (otherwise no batch "
                "could ever run)"
            )

        step = int(jax.device_get(state.step))
        epoch = 0
        t_last = time.perf_counter()
        steps_at_last_log = step
        profiling = False
        while step < max_steps:
            steps_at_epoch_start = step

            def _whole_batches(loader=train_loader):
                for b in loader:
                    if len(b["id"]) % self.n_data != 0:
                        continue  # ragged trailing batch (drop_last default)
                    if image_cache is not None:
                        b = _inject_cached_image_feats(b, image_cache, id2row)
                    yield b

            for sharded in device_prefetch(_whole_batches(), self.mesh):
                if profile_steps and step == int(profile_steps[0]):
                    jax.profiler.start_trace(profile_dir)
                    profiling = True
                state, metrics = self._train_step(state, sharded)
                step += 1
                if profiling and step >= int(profile_steps[1]):
                    # a host fetch is the only reliable sync on the axon
                    # platform (block_until_ready returns early there) —
                    # without it stop_trace() truncates the device trace
                    float(jax.device_get(metrics["train_loss"]))
                    jax.profiler.stop_trace()
                    profiling = False
                    logger.info("profiler trace written to %s", profile_dir)
                if step % log_every == 0:
                    host_metrics = {
                        k: float(jax.device_get(v)) for k, v in metrics.items()
                    }
                    now = time.perf_counter()
                    # numerator = steps ACTUALLY elapsed since t_last (not a
                    # fixed log_every: the post-validation reset can land
                    # mid-interval, and epoch lengths need not be multiples
                    # of log_every)
                    host_metrics["steps_per_sec"] = (
                        step - steps_at_last_log
                    ) / (now - t_last)
                    steps_at_last_log = step
                    # the lr APPLIED by the latest update: optax consumes
                    # schedule(count) with count = number of prior emits,
                    # advancing once per optimizer emit (optax.MultiSteps),
                    # not per micro-batch. Logging schedule(step) would show
                    # the NEXT step's lr — visibly wrong at the max_step
                    # boundary, where the (formula-exact, reference
                    # scheduler.py:33-37) unclamped decay dips below zero on
                    # a step the optimizer never takes.
                    # after `step` micro-batches there were step//accum
                    # emits; the latest consumed schedule(emits - 1)
                    host_metrics["lr"] = float(
                        self.schedule(max(step // self._accum - 1, 0))
                    )
                    t_last = now
                    self.metrics_logger.log(host_metrics, step)
                if step >= max_steps:
                    break
            epoch += 1
            if step == steps_at_epoch_start:
                raise RuntimeError(
                    "no training batch ran this epoch (dataset smaller than "
                    "batch_size x data-mesh, or all batches ragged)"
                )
            if epoch % val_every_epoch == 0 or step >= max_steps:
                val_metrics = self.validate(state, dev_loader, epoch=epoch)
                self.metrics_logger.log(val_metrics, step)
                self.ckpt.save(
                    jax.device_get(state), step, val_metrics, self.config
                )
                # steps_per_sec measures the TRAIN loop: without this reset
                # the first log of the next epoch divides by an interval
                # that swallowed the whole validation + checkpoint write
                # (minutes on the axon relay). Steps run since the last log
                # point get no throughput sample (their wall time is mixed
                # with the validation's), hence both trackers reset.
                t_last = time.perf_counter()
                steps_at_last_log = step
        if profiling:
            # the window's end step was never reached (max_steps or the
            # data ran out first) — stop anyway, else the trace is LOST
            # (jax.profiler only flushes on stop_trace)
            float(jax.device_get(state.step))  # axon-safe sync
            jax.profiler.stop_trace()
            logger.warning(
                "profiler window end %s was never reached; trace stopped at "
                "step %d and written to %s",
                profile_steps[1], step, profile_dir,
            )
        self.ckpt.wait()
        return state

    # -------------------------------------------------------------- validate
    def validate(
        self,
        state: TrainState,
        loader: Optional[BucketedLoader] = None,
        epoch: int = 0,
        split: str = "dev",
    ) -> Dict[str, float]:
        with self._kernel_mesh_scope():
            return self._validate(state, loader, epoch, split)

    def _validate(
        self,
        state: TrainState,
        loader: Optional[BucketedLoader] = None,
        epoch: int = 0,
        split: str = "dev",
    ) -> Dict[str, float]:
        if loader is None:
            loader = self.build_eval_loader(split)
        batch_size = loader.batch_size
        if int(batch_size) % self.n_data != 0:
            # same guard fit() applies to the train loader — every eval batch
            # is padded to exactly batch_size and sharded over the data axis,
            # so an indivisible size dies inside jax with an opaque error.
            # (Padding to the next mesh multiple instead would put dummy rows
            # into full batches' val_loss — see the eval_batch_size note in
            # build_eval_loader: its magnitude is batch-size-dependent.)
            raise ValueError(
                f"eval batch size {batch_size} must be divisible by the "
                f"data-mesh size {self.n_data} (set data.eval_batch_size / "
                "data.dev_batch_size to a multiple of the device count)"
            )
        outputs: List[Dict] = []
        agg: Dict[str, List[float]] = {}
        ragged_metrics: Dict[str, float] = {}

        img_cache = id2row = None
        if self._cache_image_features():
            # the tower is frozen: one pass per (dataset, tower weights),
            # reused across the per-epoch validations of a fit. The key
            # fingerprints the tower (a cheap leaf checksum — donation can
            # recreate even frozen arrays, so object identity is useless)
            # and the cache entry holds the dataset strongly so a GC'd
            # dataset cannot recycle its id() onto a different split.
            caches = getattr(self, "_eval_img_caches", None)
            if caches is None:
                caches = self._eval_img_caches = {}
            # first leaf in (deterministic, sorted-key) tree order — present
            # for BOTH tower families, unlike e.g. class_embedding which
            # only the ViT visual tree has
            sig_leaf = jax.tree_util.tree_leaves(
                state.params["clip"]["visual"]
            )[0]
            tower_sig = float(
                jax.device_get(jnp.sum(sig_leaf.astype(jnp.float32)))
            )
            key = (id(loader.dataset), tower_sig)
            if key not in caches:
                if len(caches) > 4:  # bound growth across many validates
                    caches.clear()
                caches[key] = (
                    loader.dataset,
                    *self.build_image_feature_cache(
                        loader.dataset, state.params
                    ),
                )
            _, img_cache, id2row = caches[key]

        def _prepared():
            # jax.device_put is async: staging the next batches onto the
            # mesh while the current eval step runs hides the H2D transfer
            # on hardware with async transfers (fit() does the same via
            # device_prefetch; on the axon relay H2D measures synchronous —
            # no win, no harm, see DESIGN_NOTES round-2 eval budget)
            for batch in loader:
                if img_cache is not None:
                    batch = _inject_cached_image_feats(batch, img_cache, id2row)
                padded, n_valid = _pad_batch(batch, batch_size)
                yield shard_batch(padded, self.mesh), n_valid, batch

        from .train_step import staged

        for sharded, n_valid, batch in staged(_prepared()):
            out = self._eval_step(state, sharded)
            out = jax.device_get(out)
            rec = {
                "id": out["id"][:n_valid],
                "audio_feat": out["audio_feat"][:n_valid],
                "image_feat": out["image_feat"][:n_valid],
            }
            if "keywords" in out:
                rec["keywords"] = out["keywords"][:n_valid]
                if "text" in batch and self.tokenizer is not None:
                    # rows are [SOT, tokens..., EOT, 0 pad...]: trim at the
                    # EOT position — id 0 is a REAL token ('!') in the full
                    # vocab, so a `t > 0` filter corrupted gold text (and
                    # leaked the literal SOT/EOT strings into it)
                    sot, eot = self.tokenizer.sot_id, self.tokenizer.eot_id

                    def _gold_text(row):
                        toks = [int(t) for t in row]
                        end = toks.index(eot) if eot in toks else len(toks)
                        start = 1 if toks and toks[0] == sot else 0
                        return self.tokenizer.decode(toks[start:end])

                    rec["gold_text"] = [
                        _gold_text(row) for row in batch["text"][:n_valid]
                    ]
            outputs.append(rec)
            if n_valid == batch_size:
                # ragged batches are padded with dummy rows whose features
                # would bias the loss metrics; keep only full batches for
                # metric means (features above are trimmed and always kept)
                for k, v in out["metrics"].items():
                    agg.setdefault(k, []).append(float(v))
            else:
                ragged_metrics = {
                    k: float(v) for k, v in out["metrics"].items()
                }

        if not agg and ragged_metrics:
            # tiny dev sets can be all-ragged; better a padded-batch metric
            # than none (retrieval metrics below are unaffected either way)
            logger.warning(
                "every eval batch was ragged: loss metrics come from a "
                "padded batch and include dummy-row contamination (features "
                "and retrieval metrics are trimmed and unaffected)"
            )
            for k, v in ragged_metrics.items():
                agg.setdefault(k, []).append(v)
        collected = collect_validation_outputs(outputs)
        recall_ab, recall_ba, recall_mean = retrieval_metrics(
            collected, self.model.recall_at
        )
        logger.info("val_recall_AI %s", recall_ab)
        logger.info("val_recall_IA %s", recall_ba)
        logger.info("val_recall_mean %s", recall_mean)

        metrics: Dict[str, float] = {k: float(np.mean(v)) for k, v in agg.items()}
        metrics.update({f"val_recall_AI/{k}": v for k, v in recall_ab.items()})
        metrics.update({f"val_recall_IA/{k}": v for k, v in recall_ba.items()})
        metrics.update({f"val_recall_mean/{k}": v for k, v in recall_mean.items()})
        if "recall@10" in recall_mean:
            metrics["val_recall_mean_10"] = recall_mean["recall@10"]
        if "recall@1" in recall_mean:
            metrics["val_recall_mean_1"] = recall_mean["recall@1"]

        log_detok = self.config.get_path(
            "log_setting.log_detokenize_results", True
        )
        every_n = int(
            self.config.get_path(
                "log_setting.log_detokenize_results_every_n_epoch", 1
            )
        )
        if (
            log_detok
            and self.model.use_cascaded
            and self.tokenizer is not None
            and "keywords" in collected
            and epoch % max(every_n, 1) == 0
        ):
            emb = jax.device_get(
                state.params["clip"]["text"]["token_embedding"]
            )
            hits = run_keyword_diagnostics(
                self.model,
                collected,
                emb,
                self.tokenizer,
                os.path.join(self.workdir, "detokenizeText"),
                epoch,
            )
            if hits:
                metrics["kw_hit_rate"] = hits
        return metrics
