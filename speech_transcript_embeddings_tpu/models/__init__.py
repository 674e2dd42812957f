from speech_transcript_embeddings_tpu.models import heads as heads  # noqa: F401
