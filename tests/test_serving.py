"""Serving runtime (speechclip_tpu/serving.py): micro-batching, padded
fixed-batch artifacts, polymorphic artifacts, and the HTTP front end —
all on CPU with tiny exported models."""

import http.client
import io
import json
import os
import threading

import numpy as np
import pytest

import jax

from speechclip_tpu.export import (
    export_encode_image,
    export_encode_speech,
    export_encode_text,
)
from speechclip_tpu.models.speechclip import SpeechCLIPModel
from speechclip_tpu.serving import EncoderService, MicroBatcher, make_http_server
from tests.test_models import tiny_speechclip_config


@pytest.fixture(scope="module")
def model_and_state(tmp_path_factory):
    model = SpeechCLIPModel(
        tiny_speechclip_config(tmp_path_factory.mktemp("srv_cfg"))
    )
    params, state = model.init(jax.random.key(0))
    return model, params, state


def _write_artifacts(model, params, state, out_dir, polymorphic):
    os.makedirs(out_dir, exist_ok=True)
    blobs = {
        "encode_speech": export_encode_speech(
            model, params, state, batch_size=4, wav_samples=2000,
            platforms=("cpu",), polymorphic_batch=polymorphic,
        ),
        "encode_image": export_encode_image(
            model, params, batch_size=4, platforms=("cpu",),
            polymorphic_batch=polymorphic,
        ),
        "encode_text": export_encode_text(
            model, params, batch_size=4, platforms=("cpu",),
            polymorphic_batch=polymorphic,
        ),
    }
    for name, blob in blobs.items():
        with open(os.path.join(out_dir, f"{name}.stablehlo"), "wb") as f:
            f.write(blob)


@pytest.fixture(
    scope="module",
    params=[
        "fixed",
        # poly artifacts re-trace per pow2 batch size — the priciest
        # fixture; full-suite only (the fast tier keeps one artifact
        # backend and the jit backend)
        pytest.param("poly", marks=pytest.mark.slow),
        "jit",
    ],
    ids=["fixed", "poly", "jit"],
)
def service(request, model_and_state, tmp_path_factory):
    """Every service-level test runs against BOTH backends: the AOT
    artifact runtime (fixed + polymorphic batch) and the jit-from-model
    backend (params as call arguments — the production-dims path)."""
    model, params, state = model_and_state
    if request.param == "jit":
        svc = EncoderService.from_model(
            model, params, state, wav_buckets=(2000,), batch=4,
            max_wait_ms=30.0,
        )
    else:
        out = tmp_path_factory.mktemp(f"artifacts_{request.param}")
        _write_artifacts(model, params, state, str(out), request.param == "poly")
        svc = EncoderService(str(out), max_wait_ms=30.0)
    yield svc
    svc.close()


class TestMicroBatcher:
    def test_coalesces_concurrent_requests(self):
        calls = []

        def batch_fn(items):
            calls.append(len(items))
            return [x * 2 for x in items]

        b = MicroBatcher(batch_fn, max_batch=4, max_wait_ms=50.0)
        futs = [b.submit(i) for i in range(8)]
        assert [f.result(timeout=5) for f in futs] == [2 * i for i in range(8)]
        # 8 items, cap 4, 50 ms window -> at most 4 device calls and at
        # least one multi-item batch (the point of the coalescer)
        assert sum(calls) == 8
        assert len(calls) <= 4
        assert max(calls) > 1
        b.close()

    def test_close_drains_queued_requests(self):
        import time as _time

        def slow_fn(items):
            _time.sleep(0.4)
            return items

        b = MicroBatcher(slow_fn, max_batch=1, max_wait_ms=1.0)
        futs = [b.submit(i) for i in range(3)]
        _time.sleep(0.05)  # let the worker take the first item
        b.close()
        assert futs[0].result(timeout=5) == 0  # in-flight batch completes
        drained = sum(
            1
            for f in futs[1:]
            if isinstance(f.exception(timeout=5), RuntimeError)
        )
        assert drained >= 1  # queued leftovers resolve with an error, not hang
        with pytest.raises(RuntimeError, match="closed"):
            b.submit(99)

    def test_batch_fn_error_propagates_to_every_waiter(self):
        def batch_fn(items):
            raise ValueError("boom")

        b = MicroBatcher(batch_fn, max_batch=2, max_wait_ms=10.0)
        futs = [b.submit(i) for i in range(2)]
        for f in futs:
            with pytest.raises(ValueError, match="boom"):
                f.result(timeout=5)
        b.close()


class TestEncoderService:
    def test_speech_features_match_direct_call(self, service, model_and_state):
        model, params, state = model_and_state
        rng = np.random.default_rng(0)
        wav = rng.standard_normal(1500).astype(np.float32)
        got = service.encode_speech(wav)

        import jax.numpy as jnp

        padded = np.zeros((1, 2000), np.float32)
        padded[0, :1500] = wav
        want = model.encode_speech(
            params, state, jnp.asarray(padded), jnp.asarray([1500])
        )
        for key in ("parallel_audio_feat", "cascaded_audio_feat"):
            np.testing.assert_allclose(
                got[key], np.asarray(want[key])[0], atol=1e-5
            )

    def test_concurrent_speech_requests_batch_together(self, service):
        rng = np.random.default_rng(1)
        wavs = [
            rng.standard_normal(n).astype(np.float32)
            for n in (800, 1200, 2000, 2600)  # 2600 exceeds -> cropped
        ]
        before = service.batchers["encode_speech"].batches_run
        results = [None] * len(wavs)

        def worker(i):
            results[i] = service.encode_speech(wavs[i])

        threads = [
            threading.Thread(target=worker, args=(i,)) for i in range(len(wavs))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        ran = service.batchers["encode_speech"].batches_run - before
        assert 1 <= ran < len(wavs)  # coalesced into fewer device calls
        for r in results:
            assert r is not None
            assert np.isfinite(r["parallel_audio_feat"]).all()

    def test_image_payload_forms_agree(self, service):
        rng = np.random.default_rng(2)
        uint8_img = rng.integers(0, 256, (48, 40, 3), dtype=np.uint8)
        pre = service.preprocess_image(uint8_img)
        assert pre.shape == (service.image_size, service.image_size, 3)
        feat_pre = service.encode_image(pre)
        feat_u8 = service.encode_image(uint8_img)
        np.testing.assert_allclose(feat_pre, feat_u8, atol=1e-6)
        assert feat_pre.shape[-1] == 16

    def test_int16_pcm_payload_equals_rescaled_f32(self, service):
        """int16 PCM requests (loader compact_wav convention, half the
        payload bytes) must produce identical features to f32/32768."""
        rng = np.random.default_rng(6)
        pcm = rng.integers(-30000, 30000, 1100, dtype=np.int16)
        got_i16 = service.encode_speech(pcm)
        got_f32 = service.encode_speech(pcm.astype(np.float32) / 32768.0)
        np.testing.assert_array_equal(
            got_i16["parallel_audio_feat"], got_f32["parallel_audio_feat"]
        )

    def test_text_features_match_direct_call(self, service, model_and_state):
        model, params, state = model_and_state
        import jax.numpy as jnp

        ids = np.zeros((77,), np.int32)
        ids[0] = model.sot_id
        ids[1:4] = [5, 6, 7]
        ids[4] = model.eot_id
        got = service.encode_text(ids, eot_position=4)
        want = model.forward_text(
            params, jnp.asarray(ids[None]), jnp.asarray([4], np.int32)
        )
        np.testing.assert_allclose(got, np.asarray(want)[0], atol=1e-5)
        with pytest.raises(ValueError, match="context"):
            service.encode_text(np.zeros(100, np.int32), 0)

    def test_large_batch_contract(self, service):
        """Fixed-batch artifacts reject overflow loudly; polymorphic
        artifacts take any batch size (that's their point)."""
        wavs = [np.zeros(100, np.float32)] * 8
        bucket = service._route_speech(100)
        if service.fixed_batch_speech is None:
            outs = service._speech_batch(wavs, bucket)
            assert len(outs) == 8
        else:
            with pytest.raises(ValueError, match="exceeds"):
                service._speech_batch(wavs, bucket)


class TestServiceGuards:
    def test_max_batch_clamped_to_fixed_artifact(
        self, model_and_state, tmp_path
    ):
        """An oversized --max-batch must not make coalesced batches fail
        under load — the cap clamps to the artifact's fixed batch."""
        model, params, state = model_and_state
        _write_artifacts(model, params, state, str(tmp_path), False)
        svc = EncoderService(str(tmp_path), max_batch=16, max_wait_ms=50.0)
        try:
            for b in svc.batchers.values():
                assert b.max_batch == 4  # the artifacts' fixed batch
            # burst of 6 > fixed 4: must split cleanly, not 400
            wavs = [np.zeros(500, np.float32)] * 6
            results = [None] * 6

            def worker(i):
                results[i] = svc.encode_speech(wavs[i])

            threads = [
                threading.Thread(target=worker, args=(i,)) for i in range(6)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=60)
            assert all(r is not None for r in results)
        finally:
            svc.close()

    def test_missing_speech_artifact_is_a_clear_error(
        self, model_and_state, tmp_path
    ):
        model, params, state = model_and_state
        blob = export_encode_image(
            model, params, batch_size=2, platforms=("cpu",)
        )
        with open(tmp_path / "encode_image.stablehlo", "wb") as f:
            f.write(blob)
        svc = EncoderService(str(tmp_path))
        try:
            with pytest.raises(RuntimeError, match="encode_speech"):
                svc.encode_speech(np.zeros(100, np.float32))
        finally:
            svc.close()

    def test_duplicate_wav_length_artifacts_collapse_to_one_bucket(
        self, model_and_state, tmp_path
    ):
        model, params, state = model_and_state
        blob = export_encode_speech(
            model, params, state, batch_size=2, wav_samples=2000,
            platforms=("cpu",),
        )
        for fname in ("encode_speech.stablehlo", "encode_speech@2000.stablehlo"):
            with open(tmp_path / fname, "wb") as f:
                f.write(blob)
        svc = EncoderService(str(tmp_path))
        try:
            assert len(svc._speech_buckets) == 1
            assert len(svc.batchers) == 1
        finally:
            svc.close()


@pytest.mark.slow  # artifact re-export per bucket/device
class TestMultiBucketServing:
    def test_requests_route_to_wav_length_buckets(
        self, model_and_state, tmp_path
    ):
        """Several encode_speech@<n> artifacts = serving-side length
        bucketing (the bucketed-loader design carried into serving):
        requests go to the smallest bucket that fits, overlong audio
        crops to the largest."""
        model, params, state = model_and_state
        for n in (2000, 4000):
            blob = export_encode_speech(
                model, params, state, batch_size=2, wav_samples=n,
                platforms=("cpu",),
            )
            with open(tmp_path / f"encode_speech@{n}.stablehlo", "wb") as f:
                f.write(blob)
        svc = EncoderService(str(tmp_path), max_wait_ms=5.0)
        try:
            assert sorted(svc.batchers) == [
                "encode_speech@2000",
                "encode_speech@4000",
            ]
            assert svc._route_speech(1500)["wav_samples"] == 2000
            assert svc._route_speech(2000)["wav_samples"] == 2000
            assert svc._route_speech(3000)["wav_samples"] == 4000
            assert svc._route_speech(9000)["wav_samples"] == 4000  # crop

            rng = np.random.default_rng(7)
            wav = rng.standard_normal(3000).astype(np.float32)
            got = svc.encode_speech(wav)

            import jax.numpy as jnp

            padded = np.zeros((1, 4000), np.float32)
            padded[0, :3000] = wav
            want = model.encode_speech(
                params, state, jnp.asarray(padded), jnp.asarray([3000])
            )
            np.testing.assert_allclose(
                got["parallel_audio_feat"],
                np.asarray(want["parallel_audio_feat"])[0],
                atol=1e-5,
            )
            stats = svc.stats()
            assert stats["encode_speech@4000"]["items"] == 1
            assert stats["encode_speech@2000"]["items"] == 0
        finally:
            svc.close()


@pytest.mark.slow  # artifact re-export per bucket/device
class TestMultiDeviceServing:
    def test_round_robin_dispatch_across_devices(
        self, model_and_state, tmp_path
    ):
        """devices=[d0, d1]: consecutive dispatched batches land on
        alternating devices (pipelined: the fetch thread syncs while the
        worker launches the next batch) and produce identical features."""
        devs = jax.devices()
        assert len(devs) >= 2  # conftest forces an 8-device CPU platform
        model, params, state = model_and_state
        _write_artifacts(model, params, state, str(tmp_path), False)
        svc = EncoderService(
            str(tmp_path), max_wait_ms=5.0, devices=devs[:2]
        )
        try:
            wav = np.random.default_rng(8).standard_normal(900).astype(
                np.float32
            )
            bucket = svc._route_speech(900)
            h1 = svc._speech_dispatch([wav], bucket)
            h2 = svc._speech_dispatch([wav], bucket)
            d1 = next(iter(list(h1[0].values())[0].devices()))
            d2 = next(iter(list(h2[0].values())[0].devices()))
            assert d1 != d2  # round-robin actually moved devices
            r1 = svc._finalize_call(h1)[0]
            r2 = svc._finalize_call(h2)[0]
            np.testing.assert_allclose(
                r1["parallel_audio_feat"], r2["parallel_audio_feat"], atol=1e-6
            )
            # end-to-end through the batcher + fetch pipeline too
            out = svc.encode_speech(wav)
            np.testing.assert_allclose(
                out["parallel_audio_feat"], r1["parallel_audio_feat"], atol=1e-6
            )
        finally:
            svc.close()


class TestRetrievalService:
    def test_gallery_retrieve_matches_direct_cosine_math(self, service):
        """The online gallery must reproduce the score math of the
        reference's mutualRetrieval: cosine of L2-normalized features,
        descending."""
        rng = np.random.default_rng(11)
        wav = rng.standard_normal(1800).astype(np.float32)
        assert service.retrieve(wav, k=3) == []  # before anything is added

        images = [
            rng.integers(0, 256, (40, 40, 3), dtype=np.uint8) for _ in range(3)
        ]
        ids = [service.gallery_add(im, f"img{i}") for i, im in enumerate(images)]
        assert ids == ["img0", "img1", "img2"]
        assert service.gallery_size() == 3

        hits = service.retrieve(wav, k=2)
        assert len(hits) == 2
        assert hits[0]["score"] >= hits[1]["score"]

        q = service.encode_speech(wav)["parallel_audio_feat"].astype(np.float64)
        q /= np.linalg.norm(q)
        feats = np.stack(
            [np.asarray(service.encode_image(im), np.float64) for im in images]
        )
        feats /= np.linalg.norm(feats, axis=1, keepdims=True)
        expected = np.argsort(-(feats @ q))[:2]
        assert [h["id"] for h in hits] == [f"img{i}" for i in expected]

        with pytest.raises(ValueError, match="audio feature"):
            service.retrieve(wav, feat="bogus")


class TestHTTPServer:
    @pytest.fixture()
    def http_service(self, service):
        server = make_http_server(service, host="127.0.0.1", port=0)
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        yield server.server_address
        server.shutdown()

    def _post_npy(self, addr, path, arr):
        buf = io.BytesIO()
        np.save(buf, arr)
        conn = http.client.HTTPConnection(*addr, timeout=30)
        conn.request("POST", path, body=buf.getvalue())
        resp = conn.getresponse()
        out = json.loads(resp.read())
        conn.close()
        return resp.status, out

    def test_healthz(self, http_service):
        conn = http.client.HTTPConnection(*http_service, timeout=10)
        conn.request("GET", "/healthz")
        resp = conn.getresponse()
        body = json.loads(resp.read())
        conn.close()
        assert resp.status == 200 and body["status"] == "ok"
        assert "encode_speech" in body["endpoints"]

    def test_encode_speech_endpoint(self, http_service):
        wav = np.random.default_rng(3).standard_normal(1000).astype(np.float32)
        status, body = self._post_npy(http_service, "/encode_speech", wav)
        assert status == 200, body
        feat = np.asarray(body["features"]["parallel_audio_feat"])
        assert feat.shape == (16,) and np.isfinite(feat).all()

    def test_encode_image_endpoint_uint8(self, http_service):
        img = np.random.default_rng(4).integers(
            0, 256, (64, 64, 3), dtype=np.uint8
        )
        status, body = self._post_npy(http_service, "/encode_image", img)
        assert status == 200, body
        assert len(body["features"]["image_feat"]) == 16

    def test_encode_text_endpoint(self, http_service, model_and_state):
        model, _, _ = model_and_state
        payload = json.dumps(
            {
                "token_ids": [int(model.sot_id), 5, int(model.eot_id)],
                "eot_position": 2,
            }
        ).encode()
        conn = http.client.HTTPConnection(*http_service, timeout=30)
        conn.request("POST", "/encode_text", body=payload)
        resp = conn.getresponse()
        body = json.loads(resp.read())
        conn.close()
        assert resp.status == 200, body
        feat = np.asarray(body["features"]["text_feat"])
        assert feat.shape == (16,) and np.isfinite(feat).all()

    def test_gallery_and_retrieve_endpoints(self, http_service):
        rng = np.random.default_rng(12)
        img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
        status, body = self._post_npy(
            http_service, "/gallery/add?id=http_img", img
        )
        assert status == 200 and body["id"] == "http_img", body

        wav = rng.standard_normal(900).astype(np.float32)
        status, body = self._post_npy(http_service, "/retrieve?k=1", wav)
        assert status == 200, body
        assert len(body["results"]) == 1  # top-1 over the gallery
        hit = body["results"][0]
        assert isinstance(hit["id"], str) and isinstance(hit["score"], float)

    def test_bad_payload_is_a_clean_400(self, http_service):
        conn = http.client.HTTPConnection(*http_service, timeout=10)
        conn.request("POST", "/encode_speech", body=b"not an npy")
        resp = conn.getresponse()
        body = json.loads(resp.read())
        conn.close()
        assert resp.status == 400 and "error" in body

    def test_server_fault_is_500_without_detail(
        self, service, http_service, monkeypatch
    ):
        """A server-side fault (backend death, shutdown race) must map to
        500 — not 400, which clients/load-balancers read as their own bad
        request — and must not leak the internal message to the wire."""

        def boom(wav):
            raise RuntimeError("secret internal state: /etc/creds")

        monkeypatch.setattr(service, "encode_speech", boom)
        wav = np.zeros(1000, np.float32)
        status, body = self._post_npy(http_service, "/encode_speech", wav)
        assert status == 500, body
        assert "RuntimeError" in body["error"]
        assert "secret" not in body["error"]


class TestDriveRequests:
    """The shared bench load-generator (serving.drive_requests) must be
    hang-proof: a client exception re-raises in the caller after all
    threads join, never deadlocks (review finding: the old semaphore shape
    hung forever if a client died before releasing)."""

    class _FakeService:
        def __init__(self, fail_at=None):
            self.calls = 0
            self._fail_at = fail_at
            self._lock = threading.Lock()

        def encode_speech(self, wav):
            with self._lock:
                self.calls += 1
                n = self.calls
            if self._fail_at is not None and n == self._fail_at:
                raise RuntimeError("device fell over")
            return {"parallel_audio_feat": np.zeros(4)}

    def test_all_requests_complete(self):
        from speechclip_tpu.serving import drive_requests

        svc = self._FakeService()
        wavs = [np.zeros(8, np.float32)]
        elapsed, latencies = drive_requests(svc, wavs, 20, 4)
        assert svc.calls == 20
        assert len(latencies) == 20
        assert elapsed > 0

    def test_client_error_reraises_without_hanging(self):
        from speechclip_tpu.serving import drive_requests

        svc = self._FakeService(fail_at=5)
        wavs = [np.zeros(8, np.float32)]
        with pytest.raises(RuntimeError, match="device fell over"):
            drive_requests(svc, wavs, 1000, 8)
        # remaining work was cancelled, not drained
        assert svc.calls < 1000


class TestGalleryLifecycle:
    """Persistence + size bound for the retrieval gallery (restart-safe
    serving: save/load one .npz of ids + L2-normalized features; FIFO
    eviction at gallery_max)."""

    def _service(self, model_and_state, **kw):
        model, params, state = model_and_state
        return EncoderService.from_model(
            model, params, state, wav_buckets=(2000,), batch=4,
            max_wait_ms=5.0, **kw,
        )

    def test_save_load_roundtrip_preserves_retrieval(
        self, model_and_state, tmp_path
    ):
        svc = self._service(model_and_state)
        rng = np.random.default_rng(31)
        wav = rng.standard_normal(1500).astype(np.float32)
        try:
            for i in range(3):
                svc.gallery_add(
                    rng.integers(0, 256, (40, 40, 3), dtype=np.uint8),
                    f"g{i}",
                )
            before = svc.retrieve(wav, k=3)
            path = str(tmp_path / "gallery.npz")
            assert svc.gallery_save(path) == 3
        finally:
            svc.close()

        svc2 = self._service(model_and_state)
        try:
            assert svc2.gallery_size() == 0
            assert svc2.gallery_load(path) == 3
            after = svc2.retrieve(wav, k=3)
            assert [h["id"] for h in after] == [h["id"] for h in before]
            np.testing.assert_allclose(
                [h["score"] for h in after],
                [h["score"] for h in before],
                atol=1e-6,
            )
        finally:
            svc2.close()

    def test_gallery_max_evicts_oldest_fifo(self, model_and_state):
        svc = self._service(model_and_state, gallery_max=2)
        rng = np.random.default_rng(32)
        try:
            for i in range(4):
                svc.gallery_add(
                    rng.integers(0, 256, (40, 40, 3), dtype=np.uint8),
                    f"g{i}",
                )
            assert svc.gallery_size() == 2
            with svc._gallery_lock:
                assert svc._gallery_ids == ["g2", "g3"]  # oldest evicted
            # auto-ids stay monotonic across eviction (no id reuse)
            auto = svc.gallery_add(
                rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
            )
            assert auto == "4"
        finally:
            svc.close()

    def test_load_trims_to_gallery_max(self, model_and_state, tmp_path):
        svc = self._service(model_and_state)
        rng = np.random.default_rng(33)
        path = str(tmp_path / "g.npz")
        try:
            for i in range(4):
                svc.gallery_add(
                    rng.integers(0, 256, (40, 40, 3), dtype=np.uint8),
                    f"g{i}",
                )
            svc.gallery_save(path)
        finally:
            svc.close()
        svc2 = self._service(model_and_state, gallery_max=2)
        try:
            assert svc2.gallery_load(path) == 2  # newest two kept
            with svc2._gallery_lock:
                assert svc2._gallery_ids == ["g2", "g3"]
        finally:
            svc2.close()

    def test_http_save_load_endpoints(self, model_and_state, tmp_path):
        svc = self._service(model_and_state)
        svc.gallery_path = str(tmp_path / "default_gallery.npz")
        server = make_http_server(svc, host="127.0.0.1", port=0)
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        addr = server.server_address
        try:
            img = np.random.default_rng(34).integers(
                0, 256, (40, 40, 3), dtype=np.uint8
            )
            buf = io.BytesIO()
            np.save(buf, img)
            conn = http.client.HTTPConnection(*addr, timeout=30)
            conn.request("POST", "/gallery/add?id=a", body=buf.getvalue())
            assert conn.getresponse().status == 200
            # ?path= inside the --gallery directory: allowed
            path = str(tmp_path / "http_gallery.npz")
            conn.request("POST", f"/gallery/save?path={path}")
            resp = json.loads(conn.getresponse().read())
            assert resp == {"saved": 1, "path": path}
            # no ?path= -> the configured --gallery default
            conn.request("POST", "/gallery/save")
            resp = json.loads(conn.getresponse().read())
            assert resp["path"] == svc.gallery_path
            conn.request("POST", f"/gallery/load?path={path}")
            resp = json.loads(conn.getresponse().read())
            assert resp == {"loaded": 1, "path": path}
            # a RELATIVE ?path= resolves inside the gallery directory —
            # not against whatever CWD the server was launched from
            conn.request("POST", "/gallery/save?path=rel_gallery.npz")
            resp = json.loads(conn.getresponse().read())
            assert resp["path"] == str(tmp_path / "rel_gallery.npz")
            assert (tmp_path / "rel_gallery.npz").exists()
            conn.request("GET", "/healthz")
            health = json.loads(conn.getresponse().read())
            assert health["gallery_size"] == 1
            conn.close()
        finally:
            server.shutdown()
            svc.close()

    def test_http_gallery_path_is_confined(self, model_and_state, tmp_path):
        """The save/load endpoints write the server's filesystem for
        unauthenticated clients: ?path= must be confined to --gallery's
        directory, and rejected entirely when --gallery is unset."""
        svc = self._service(model_and_state)
        server = make_http_server(svc, host="127.0.0.1", port=0)
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        addr = server.server_address
        try:
            conn = http.client.HTTPConnection(*addr, timeout=30)
            # no --gallery configured: both no-path and explicit-path 400
            conn.request("POST", "/gallery/save")
            r = conn.getresponse()
            assert r.status == 400 and b"--gallery" in r.read()
            outside = str(tmp_path / "x.npz")
            conn.request("POST", f"/gallery/save?path={outside}")
            r = conn.getresponse()
            assert r.status == 400 and b"--gallery" in r.read()
            # --gallery set: escapes out of its directory are rejected
            svc.gallery_path = str(tmp_path / "g.npz")
            for bad in (
                "/tmp/evil.npz",
                str(tmp_path / "sub" / "evil.npz"),
                str(tmp_path / ".." / "evil.npz"),
            ):
                conn.request("POST", f"/gallery/save?path={bad}")
                r = conn.getresponse()
                body = r.read()
                assert r.status == 400 and b"directory" in body, (bad, body)
            conn.close()
        finally:
            server.shutdown()
            svc.close()


class TestJitBackend:
    """from_model / from_checkpoint: the jit serving backend (params as
    call arguments — the production-dims path the artifact backend cannot
    reach on remote-compiled platforms; VERDICT r3 weak #1)."""

    def test_jit_features_equal_artifact_features(
        self, model_and_state, tmp_path
    ):
        """Both backends serve the SAME math: features agree to float
        tolerance for speech, image, and text."""
        model, params, state = model_and_state
        _write_artifacts(model, params, state, str(tmp_path), False)
        art = EncoderService(str(tmp_path), max_wait_ms=5.0)
        jit = EncoderService.from_model(
            model, params, state, wav_buckets=(2000,), batch=4, max_wait_ms=5.0
        )
        try:
            rng = np.random.default_rng(21)
            wav = rng.standard_normal(1700).astype(np.float32)
            a, j = art.encode_speech(wav), jit.encode_speech(wav)
            assert sorted(a) == sorted(j)
            for key in a:
                np.testing.assert_allclose(a[key], j[key], atol=1e-5)
            img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
            np.testing.assert_allclose(
                art.encode_image(img), jit.encode_image(img), atol=1e-5
            )
            ids = np.zeros((77,), np.int32)
            ids[0], ids[1], ids[2] = model.sot_id, 5, model.eot_id
            np.testing.assert_allclose(
                art.encode_text(ids, 2), jit.encode_text(ids, 2), atol=1e-5
            )
        finally:
            art.close()
            jit.close()

    def test_from_model_multi_bucket_routing(self, model_and_state):
        model, params, state = model_and_state
        svc = EncoderService.from_model(
            model, params, state, wav_buckets=(2000, 4000), batch=2,
            max_wait_ms=5.0,
        )
        try:
            assert sorted(svc.batchers) == [
                "encode_image",
                "encode_speech@2000",
                "encode_speech@4000",
                "encode_text",
            ]
            assert svc._route_speech(1500)["wav_samples"] == 2000
            assert svc._route_speech(3000)["wav_samples"] == 4000
            out = svc.encode_speech(np.zeros(3000, np.float32))
            assert np.isfinite(out["parallel_audio_feat"]).all()
            assert svc.stats()["encode_speech@4000"]["items"] == 1
        finally:
            svc.close()

    def test_jit_round_robin_places_params_once_per_device(
        self, model_and_state
    ):
        devs = jax.devices()[:2]
        model, params, state = model_and_state
        svc = EncoderService.from_model(
            model, params, state, wav_buckets=(2000,), batch=2,
            max_wait_ms=5.0, devices=devs,
        )
        try:
            wav = np.random.default_rng(22).standard_normal(900).astype(
                np.float32
            )
            bucket = svc._route_speech(900)
            h1 = svc._speech_dispatch([wav], bucket)
            h2 = svc._speech_dispatch([wav], bucket)
            d1 = next(iter(list(h1[0].values())[0].devices()))
            d2 = next(iter(list(h2[0].values())[0].devices()))
            assert d1 != d2  # round-robin moved devices
            r1, r2 = svc._finalize_call(h1)[0], svc._finalize_call(h2)[0]
            np.testing.assert_allclose(
                r1["parallel_audio_feat"], r2["parallel_audio_feat"], atol=1e-6
            )
            encoder = bucket["exported"]
            assert set(encoder._placed) == set(devs)  # params cached per device
            svc._speech_batch([wav], bucket)  # third call: no new placement
            assert set(encoder._placed) == set(devs)
        finally:
            svc.close()

    def test_from_checkpoint_serves_restored_weights(self, tmp_path):
        """Round-trip: train-state checkpoint on disk -> from_checkpoint
        -> served features equal the checkpointed model's direct math."""
        import jax.numpy as jnp

        from speechclip_tpu.training.checkpoint import CheckpointManager
        from speechclip_tpu.training.optim import build_optimizer
        from speechclip_tpu.training.train_step import create_train_state

        cfg = tiny_speechclip_config(tmp_path)
        cfg.merge_(
            {
                "audio_encoder": {
                    "optim": {
                        "name": "Adam",
                        "args": {"lr": 1e-3, "weight_decay": 1e-6},
                    },
                    "scheduler": {
                        "name": "linear_warmup_decay",
                        "warmup": 2,
                        "max_step": 10,
                        "final_lr": 1e-8,
                    },
                },
            }
        )
        model = SpeechCLIPModel(cfg)
        params_shapes = jax.eval_shape(
            lambda: model.init(jax.random.key(0))[0]
        )
        tx, _ = build_optimizer(cfg, model.trainable_mask(params_shapes))
        state = create_train_state(model, tx, jax.random.key(42))
        run_dir = tmp_path / "run"
        mgr = CheckpointManager(str(run_dir))
        mgr.save(jax.device_get(state), 1, {"val_loss": 1.0}, cfg)
        mgr.wait()

        svc = EncoderService.from_checkpoint(
            str(run_dir / "last"), wav_buckets=(2000,), batch=2,
            max_wait_ms=5.0,
        )
        try:
            rng = np.random.default_rng(23)
            wav = rng.standard_normal(1800).astype(np.float32)
            got = svc.encode_speech(wav)
            padded = np.zeros((1, 2000), np.float32)
            padded[0, :1800] = wav
            want = model.encode_speech(
                state.params,
                state.model_state,
                jnp.asarray(padded),
                jnp.asarray([1800]),
            )
            np.testing.assert_allclose(
                got["parallel_audio_feat"],
                np.asarray(want["parallel_audio_feat"])[0],
                atol=1e-5,
            )
        finally:
            svc.close()

    def test_batch_arg_caps_the_micro_batchers(self, model_and_state):
        """`batch` must reach the MicroBatcher caps (regression: the CLI
        passes max_batch=None explicitly, which once defeated the
        setdefault and silently capped every batcher at 8)."""
        model, params, state = model_and_state
        svc = EncoderService.from_model(
            model, params, state, wav_buckets=(2000,), batch=16,
            max_wait_ms=5.0, max_batch=None,
        )
        try:
            for name, b in svc.batchers.items():
                assert b.max_batch == 16, (name, b.max_batch)
        finally:
            svc.close()
        # an explicit max_batch still wins over `batch`
        svc2 = EncoderService.from_model(
            model, params, state, wav_buckets=(2000,), batch=16,
            max_wait_ms=5.0, max_batch=4,
        )
        try:
            assert svc2.batchers["encode_speech"].max_batch == 4
        finally:
            svc2.close()

    def test_fixed_batch_mode_pads_to_exactly_batch(self, model_and_state):
        """fixed_batch=True = one compile per surface: every dispatch pads
        to exactly `batch` (the remote-compile-friendly serving mode the
        bench's serving_utt_per_sec extra uses)."""
        model, params, state = model_and_state
        svc = EncoderService.from_model(
            model, params, state, wav_buckets=(2000,), batch=4,
            max_wait_ms=5.0, fixed_batch=True,
        )
        try:
            bucket = svc._route_speech(100)
            assert bucket["fixed_batch"] == 4
            h = svc._speech_dispatch([np.zeros(100, np.float32)], bucket)
            out, n, _ = h
            assert n == 1
            # the device batch really is 4 (padded), sliced back to 1
            assert list(out.values())[0].shape[0] == 4
            res = svc._finalize_call(h)
            assert len(res) == 1
            # overflow beyond the fixed batch is a loud error, as with
            # fixed artifacts
            with pytest.raises(ValueError, match="exceeds"):
                svc._speech_batch([np.zeros(10, np.float32)] * 8, bucket)
        finally:
            svc.close()

    def test_compact_wav_int16_on_device_matches_f32(self, model_and_state):
        """compact_wav=True ships int16 to the device (the measured v2/v3
        serving operating point): features must equal the f32 service's
        for int16-origin payloads (exact round-trip)."""
        model, params, state = model_and_state
        f32 = EncoderService.from_model(
            model, params, state, wav_buckets=(2000,), batch=2,
            max_wait_ms=5.0,
        )
        i16 = EncoderService.from_model(
            model, params, state, wav_buckets=(2000,), batch=2,
            max_wait_ms=5.0, compact_wav=True,
        )
        try:
            bucket = i16._route_speech(1000)
            assert bucket["wav_dtype"] == np.int16  # really int16 on device
            rng = np.random.default_rng(25)
            pcm = rng.integers(-30000, 30000, 1500, dtype=np.int16)
            a = f32.encode_speech(pcm)["parallel_audio_feat"]
            b = i16.encode_speech(pcm)["parallel_audio_feat"]
            np.testing.assert_allclose(a, b, atol=1e-6)
            # float payloads quantize to the int16 grid: close, not exact
            wav = rng.standard_normal(1500).astype(np.float32) * 0.1
            af = f32.encode_speech(wav)["parallel_audio_feat"]
            bf = i16.encode_speech(wav)["parallel_audio_feat"]
            assert np.linalg.norm(af - bf) < 1e-2
        finally:
            f32.close()
            i16.close()

    def test_bf16_dtype_option_moves_features_little(self, model_and_state):
        model, params, state = model_and_state
        f32 = EncoderService.from_model(
            model, params, state, wav_buckets=(2000,), batch=2, max_wait_ms=5.0
        )
        b16 = EncoderService.from_model(
            model, params, state, wav_buckets=(2000,), batch=2,
            max_wait_ms=5.0, dtype="bf16",
        )
        try:
            wav = np.random.default_rng(24).standard_normal(1500).astype(
                np.float32
            )
            a = f32.encode_speech(wav)["parallel_audio_feat"]
            b = b16.encode_speech(wav)["parallel_audio_feat"]
            # bf16 weights move unit-norm features by ~1e-2, not more
            assert np.linalg.norm(a - b) < 0.1
            assert not np.array_equal(a, b)  # the cast actually happened
        finally:
            f32.close()
            b16.close()


def test_warmup_compiles_every_surface(service):
    """warmup() must touch every loaded artifact without going through the
    batchers (stats stay request-only) and leave the service usable."""
    before = {k: v["items"] for k, v in service.stats().items()}
    service.warmup()
    after = {k: v["items"] for k, v in service.stats().items()}
    assert before == after  # direct calls, not fake requests
    out = service.encode_speech(np.zeros(700, np.float32))
    assert np.isfinite(out["parallel_audio_feat"]).all()


def test_bench_canary_estimator():
    """Drift guard for bench.py's serving canary methodology: one untimed
    half-size priming drive, then CANARY_DRIVES timed drives, value =
    best-of-N with the full spread in _minmax (see bench._canary_drive for
    the wire-weather rationale; reverting to a median or dropping the
    priming pass silently changes what the round-over-round key means)."""
    import bench

    calls = []
    # elapsed seconds per timed drive for n_req=200 -> utt/s 50,100,80
    elapsed = iter([9.9, 4.0, 2.0, 2.5])

    def fake_drive(svc, wavs, n_req, concurrency):
        calls.append((n_req, concurrency))
        return next(elapsed), []

    value, minmax = bench._canary_drive("svc", ["wav"], 200, 64, fake_drive)
    # priming drive: half-size, untimed (its 9.9 s must not appear below)
    assert calls[0] == (100, 64)
    assert bench.CANARY_DRIVES == 3  # was 5; round-4 budget blowout
    assert len(calls) == 1 + bench.CANARY_DRIVES
    assert all(c == (200, 64) for c in calls[1:])
    assert value == 100.0  # best of [50, 100, 80]
    assert minmax == [50.0, 100.0]
