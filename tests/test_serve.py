"""HTTP serving layer: drive the real server over a socket."""

import json
import os
import threading
import urllib.request
import urllib.error

import numpy as np
import pytest
import jax

from speech_transcript_embeddings_tpu.config import (
    DataConfig, ExperimentConfig, FreezeConfig, TrainConfig, tiny_model_config,
)
from speech_transcript_embeddings_tpu.data.sources import synth_audio_for_sentence
from speech_transcript_embeddings_tpu.models.dual_encoder import (
    DualEncoderModel, init_params,
)
from speech_transcript_embeddings_tpu.training import checkpoints as ckpt_lib
from speech_transcript_embeddings_tpu.training import optimizer as opt_lib
from speech_transcript_embeddings_tpu.training.train_step import create_train_state


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from http.server import ThreadingHTTPServer
    from speech_transcript_embeddings_tpu.serve import EmbeddingService, make_handler

    tmp = tmp_path_factory.mktemp("serve_ckpt")
    cfg = ExperimentConfig(
        model=tiny_model_config(),
        freeze=FreezeConfig(mode="partial", text_layers_to_unfreeze=1,
                            audio_layers_to_unfreeze=1),
        data=DataConfig(dataset="synthetic", batch_size=4, max_text_length=12,
                        audio_buckets=(16000, 48000), max_audio_samples=48000),
        train=TrainConfig(output_dir=str(tmp)),
    )
    model = DualEncoderModel(cfg.model)
    params = init_params(model, jax.random.PRNGKey(0))
    labels = opt_lib.param_labels(params, cfg.freeze, cfg.model)
    tl, _ = opt_lib.split_params(labels, labels)
    tx = opt_lib.make_optimizer(cfg.optimizer, cfg.freeze, tl, 10)
    state = create_train_state(params, labels, tx)
    path = os.path.join(str(tmp), "final_model")
    ckpt_lib.save_checkpoint(path, state, cfg, epoch=1)

    service = EmbeddingService(path)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(url, data=json.dumps(payload).encode(),
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        data = json.loads(r.read())
    assert data["status"] == "ok" and data["projection_dim"] == 24


def test_embed_and_similarity(server):
    status, out = _post(server + "/embed_text", {"texts": ["casa tempo", "mar sol"]})
    assert status == 200
    embs = np.asarray(out["embeddings"])
    assert embs.shape == (2, 24)
    np.testing.assert_allclose(np.linalg.norm(embs, axis=1), 1.0, rtol=1e-4)

    audio = synth_audio_for_sentence("casa tempo").tolist()
    status, out = _post(server + "/embed_audio", {"audios": [audio]})
    assert status == 200 and np.asarray(out["embeddings"]).shape == (1, 24)

    status, out = _post(server + "/similarity", {"text": "casa tempo", "audio": audio})
    assert status == 200
    assert -1 <= out["similarity"] <= 1 and -1 <= out["similarity_fused"] <= 1


def test_microbatcher_coalesces_concurrent_requests():
    """Concurrent submits within the collection window dispatch as ONE device
    batch (the round-1 server serialized every request behind a lock)."""
    import time
    from speech_transcript_embeddings_tpu.serve import MicroBatcher

    calls = []
    lock = threading.Lock()

    def fn(items):
        calls.append(len(items))
        time.sleep(0.02)                 # emulate device latency
        return np.asarray([[float(x)] for x in items])

    mb = MicroBatcher(fn, lock, max_batch=64, window_s=0.05)
    results = [None] * 8
    barrier = threading.Barrier(8)

    def client(i):
        barrier.wait()
        results[i] = mb.submit([i, 100 + i])

    threads = [threading.Thread(target=client, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(8):
        np.testing.assert_array_equal(results[i].ravel(), [i, 100 + i])
    # 16 rows across 8 clients must have dispatched in far fewer device calls
    assert sum(calls) == 16
    assert len(calls) <= 3, f"dispatch not coalesced: {calls}"


def test_microbatcher_lone_request_skips_window():
    """A single request on an idle server dispatches immediately — it must
    NOT pay the straggler window (here deliberately huge, 0.5 s)."""
    import time
    from speech_transcript_embeddings_tpu.serve import MicroBatcher

    def fn(items):
        return np.asarray([[0.0] for _ in items])

    mb = MicroBatcher(fn, threading.Lock(), max_batch=64, window_s=0.5)
    t0 = time.monotonic()
    mb.submit(["x"])
    assert time.monotonic() - t0 < 0.25, "lone request waited for the window"


def test_microbatcher_propagates_errors():
    from speech_transcript_embeddings_tpu.serve import MicroBatcher

    def fn(items):
        raise RuntimeError("boom")

    mb = MicroBatcher(fn, threading.Lock(), window_s=0.001)
    with pytest.raises(RuntimeError, match="boom"):
        mb.submit(["x"])


def test_concurrent_http_clients(server):
    """Drive the real server with parallel clients; all succeed and agree."""
    out = [None] * 6
    def client(i):
        out[i] = _post(server + "/embed_text", {"texts": [f"casa {i}", "tempo"]})
    threads = [threading.Thread(target=client, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(6):
        status, payload = out[i]
        assert status == 200
        assert np.asarray(payload["embeddings"]).shape == (2, 24)


def test_bad_requests(server):
    for path, payload in (("/embed_text", {}), ("/embed_text", {"texts": []}),
                          ("/similarity", {"text": "x"})):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server + path, payload)
        assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server + "/nope", {})
    assert e.value.code == 404


def test_stats_endpoint(server):
    """/stats reports per-modality request/item counts, dispatch telemetry
    and latency percentiles from bounded windows."""
    _post(server + "/embed_text", {"texts": ["uma casa"]})
    with urllib.request.urlopen(server + "/stats", timeout=30) as r:
        stats = json.loads(r.read())
    assert stats["uptime_s"] >= 0
    for mod in ("text", "audio"):
        assert {"requests", "items", "dispatches"} <= set(stats[mod])
    t = stats["text"]
    assert t["requests"] >= 1 and t["items"] >= t["requests"]
    assert t["dispatches"] >= 1
    assert t["latency_ms"]["p50"] <= t["latency_ms"]["max"]
    assert t["coalesced_batch"]["max"] >= 1
