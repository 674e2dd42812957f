from speech_transcript_embeddings_tpu.data.corruption import create_corrupted_transcript  # noqa: F401
from speech_transcript_embeddings_tpu.data.pipeline import DataPipeline  # noqa: F401
