from speech_transcript_embeddings_tpu.inference.embed import Embedder  # noqa: F401
