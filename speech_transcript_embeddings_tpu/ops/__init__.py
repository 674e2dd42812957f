from speech_transcript_embeddings_tpu.ops.frontend import LogMelFrontend  # noqa: F401
