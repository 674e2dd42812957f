"""Embedding/similarity HTTP service.

A lightweight serving layer over ``inference.Embedder`` (stdlib-only —
ThreadingHTTPServer + JSON), giving the framework a deployment surface the
reference lacked (its inference was two hard-coded scripts):

    python -m speech_transcript_embeddings_tpu.serve \
        --checkpoint runs/cv_5p5/best_model_gap --port 8787

Endpoints (JSON in/out):
  GET  /healthz            → {"status": "ok", "projection_dim": D}
  POST /embed_text         {"texts": [...]}                → {"embeddings": [[...]]}
  POST /embed_audio        {"audios": [[...]], "sample_rate": N} → {"embeddings": ...}
  POST /similarity         {"text": "...", "audio": [...], "sample_rate": N}
                           → {"similarity": s, "similarity_fused": f}

Device work is serialized behind a lock (one model, one chip); shapes reuse the
bucketed jit cache, so repeated requests hit compiled programs.
"""

from __future__ import annotations

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class EmbeddingService:
    def __init__(self, checkpoint: str):
        from speech_transcript_embeddings_tpu.inference.embed import Embedder
        self.embedder = Embedder.from_checkpoint(checkpoint)
        self._lock = threading.Lock()

    def _prep_audio(self, audio, sample_rate):
        wav = np.asarray(audio, np.float32)
        if sample_rate and sample_rate != 16000:
            from speech_transcript_embeddings_tpu.data import native_audio
            wav = native_audio.resample(wav, int(sample_rate), 16000)
        return wav

    def embed_text(self, texts):
        with self._lock:
            return self.embedder.embed_texts(list(texts)).tolist()

    def embed_audio(self, audios, sample_rate=16000):
        wavs = [self._prep_audio(a, sample_rate) for a in audios]
        with self._lock:
            return self.embedder.embed_audios(wavs).tolist()

    def similarity(self, text, audio, sample_rate=16000):
        wav = self._prep_audio(audio, sample_rate)
        with self._lock:
            te = self.embedder.embed_texts([text])[0]
            ae = self.embedder.embed_audios([wav])[0]
            fused, _, _ = self.embedder.embed_pair(text, wav)
        return {"similarity": float(np.dot(te, ae)),
                "similarity_fused": float(fused)}


def make_handler(service: EmbeddingService):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):   # quiet by default
            pass

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {
                    "status": "ok",
                    "projection_dim": service.embedder.cfg.model.heads.projection_dim,
                })
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                if self.path == "/embed_text":
                    if not isinstance(req.get("texts"), list) or not req["texts"]:
                        return self._send(400, {"error": "texts: non-empty list required"})
                    return self._send(200, {"embeddings": service.embed_text(req["texts"])})
                if self.path == "/embed_audio":
                    if not isinstance(req.get("audios"), list) or not req["audios"]:
                        return self._send(400, {"error": "audios: non-empty list required"})
                    return self._send(200, {"embeddings": service.embed_audio(
                        req["audios"], req.get("sample_rate", 16000))})
                if self.path == "/similarity":
                    if "text" not in req or "audio" not in req:
                        return self._send(400, {"error": "text and audio required"})
                    return self._send(200, service.similarity(
                        req["text"], req["audio"], req.get("sample_rate", 16000)))
                return self._send(404, {"error": f"unknown path {self.path}"})
            except json.JSONDecodeError:
                self._send(400, {"error": "invalid JSON body"})
            except Exception as e:                       # surface, don't crash
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(checkpoint: str, host: str = "127.0.0.1", port: int = 8787):
    service = EmbeddingService(checkpoint)
    server = ThreadingHTTPServer((host, port), make_handler(service))
    print(f"serving embeddings from {checkpoint} on http://{host}:{server.server_port}")
    server.serve_forever()


def main(argv=None):
    p = argparse.ArgumentParser(description="Embedding HTTP service")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8787)
    args = p.parse_args(argv)
    from speech_transcript_embeddings_tpu.utils.compilation_cache import enable
    enable()
    serve(args.checkpoint, args.host, args.port)


if __name__ == "__main__":
    main()
