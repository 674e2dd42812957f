from speech_transcript_embeddings_tpu.ops.frontend import LogMelFrontend  # noqa: F401


def make_frontend(cfg):
    """LogMelFrontend factory honouring ``FrontendConfig.use_pallas``.

    The fused Pallas kernel needs a real TPU backend (interpret mode elsewhere);
    the pure-jnp path is the oracle and default.
    """
    if cfg.use_pallas:
        import jax
        from speech_transcript_embeddings_tpu.ops.frontend_pallas import (
            PallasLogMelFrontend,
        )
        interpret = jax.default_backend() != "tpu"
        return PallasLogMelFrontend(cfg, interpret=interpret)
    return LogMelFrontend(cfg)
