"""Orbax checkpointing with explicit JSON metadata.

The reference saves raw ``torch.save`` dicts and *reconstructs model config by
sniffing state-dict key patterns* at load time (inference.py:56-59); here every
checkpoint directory carries a ``metadata.json`` with the full experiment config,
epoch and metrics, so loading is self-describing (SURVEY.md §5.4). Four checkpoint
kinds mirror the reference: ``best_model_loss``, ``best_model_gap``,
``checkpoint_epoch_N``, ``final_model`` — plus ``latest`` for resume, which the
reference lacked (optimizer state was saved but never loaded,
trainer_unfreeze.py:267-268 note in SURVEY §5.3).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from speech_transcript_embeddings_tpu.config import ExperimentConfig
from speech_transcript_embeddings_tpu.training.train_step import TrainState

FORMAT_VERSION = 1


def _state_to_pytree(state: TrainState) -> Dict[str, Any]:
    return {
        "step": state.step,
        "trainable": dict(state.trainable),
        "frozen": dict(state.frozen),
        "opt_state": state.opt_state,
    }


# device→host fetch tuning for save_checkpoint: the axon relay's d2h path is
# ~5.5 MB/s for a single stream but ~50 MB/s with ~32 concurrent ~8 MB
# transfers (measured r4) — a 6 GB flagship `latest` save drops from ~10 min
# to ~2 min. Pieces are fetched in bounded waves so the transient device-side
# slice copies and host buffers stay small.
_FETCH_CHUNK_BYTES = 8 << 20
_FETCH_WAVE_BYTES = 256 << 20


def fetch_to_host(tree, chunk_bytes: int = _FETCH_CHUNK_BYTES,
                  wave_bytes: int = _FETCH_WAVE_BYTES):
    """Fetch a pytree of device arrays to host numpy with chunked, concurrent
    d2h transfers (large leaves are split along their largest axis and
    reassembled).

    Device-side slice copies are created lazily, one wave at a time, and
    dropped as soon as their d2h completes — peak extra HBM is bounded by
    ``wave_bytes``, not by a full duplicate of the state (the save path runs
    while the training state is live, so an eager full-tree slice-up would be
    the same OOM class the params-only test phase fixes).

    Returns an equivalent pytree of host arrays; non-array leaves and arrays
    that are not fully addressable (multi-host shards) pass through unchanged
    — orbax handles those itself during save.
    """
    leaves, treedef = jax.tree.flatten(tree)
    plans = []          # (leaf_idx, split_axis|None, [(start, end), ...]|None)
    for i, a in enumerate(leaves):
        if (not isinstance(a, jax.Array)
                or not getattr(a, "is_fully_addressable", True)):
            plans.append((i, None, None))       # pass through unchanged
            continue
        axis = int(np.argmax(a.shape)) if a.ndim else 0
        if a.nbytes <= chunk_bytes or a.ndim == 0 or a.shape[axis] < 2:
            plans.append((i, None, [(None, None)]))  # single whole-array fetch
            continue
        # split along the largest axis (a (1, N, D) leaf is still chunkable)
        n = a.shape[axis]
        rows = max(1, int(chunk_bytes * n // a.nbytes))
        plans.append((i, axis,
                      [(s, min(s + rows, n)) for s in range(0, n, rows)]))

    # flat piece plan (indices only — no device slices yet)
    pieces = []         # (leaf_idx, piece_slot, axis, start, end, nbytes)
    for i, axis, spans in plans:
        if spans is None:
            continue
        a = leaves[i]
        for slot, (s, e) in enumerate(spans):
            nb = (a.nbytes if s is None
                  else a.nbytes * (e - s) // a.shape[axis])
            pieces.append((i, slot, axis, s, e, nb))

    parts: Dict[int, list] = {}
    w = 0
    while w < len(pieces):
        wave, total = [], 0
        while w < len(pieces) and (not wave or total < wave_bytes):
            wave.append(pieces[w])
            total += pieces[w][5]
            w += 1
        # materialize this wave's device slices only now; free them right after
        dev = []
        for i, _, axis, s, e, _ in wave:
            a = leaves[i]
            dev.append(a if s is None
                       else a[(slice(None),) * axis + (slice(s, e),)])
        fetched = jax.device_get(dev)
        del dev
        for (i, slot, *_), h in zip(wave, fetched):
            parts.setdefault(i, []).append((slot, h))

    out = list(leaves)
    for i, axis, spans in plans:
        if spans is None:
            continue
        ps = [h for _, h in sorted(parts[i])]
        out[i] = ps[0] if len(ps) == 1 else np.concatenate(ps, axis=axis)
    return jax.tree.unflatten(treedef, out)


def _atomic_replace(tmp_path: str, path: str) -> None:
    """Write-to-temp-then-rename so a crash mid-save never destroys the
    previous checkpoint (the only resume point)."""
    import shutil
    old = path + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp_path, path)
    if os.path.exists(old):
        shutil.rmtree(old)


def save_checkpoint(path: str, state: TrainState, cfg: ExperimentConfig,
                    epoch: int, metrics: Optional[dict] = None,
                    params_only: bool = False) -> None:
    """``params_only=True`` drops the optimizer state from the saved tree.

    Used for the best/final checkpoints, which are only ever reloaded for
    evaluation and inference: the reference also saved optimizer state in every
    checkpoint but never loaded it (trainer_unfreeze.py:1621 / SURVEY §5.3), so
    shipping it was pure dead weight — at the 877M flagship geometry the
    optimizer state is ~60% of the bytes and the device→host fetch dominates
    save time. ``latest`` (the resume point) always saves the full state.
    """
    path = os.path.abspath(path)
    tmp_path = path + ".tmp"
    if os.path.exists(tmp_path):
        import shutil
        shutil.rmtree(tmp_path)
    tree = _state_to_pytree(state)
    if params_only:
        tree.pop("opt_state")
    if jax.process_count() == 1:
        # host-stage with chunked concurrent d2h (the relay's single-stream
        # fetch is the save bottleneck); orbax then only does disk writes.
        # Multi-host saves keep the direct path: non-addressable shards must
        # be serialized by orbax's distributed machinery.
        tree = fetch_to_host(tree)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(tmp_path, "state"), tree)
    ckptr.wait_until_finished()
    meta = {
        "format_version": FORMAT_VERSION,
        "epoch": epoch,
        "params_only": params_only,
        "metrics": _jsonable(metrics or {}),
        "config": json.loads(cfg.to_json()),
    }
    with open(os.path.join(tmp_path, "metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)
    _atomic_replace(tmp_path, path)


def load_metadata(path: str) -> dict:
    with open(os.path.join(path, "metadata.json")) as f:
        return json.load(f)


def restore_checkpoint(path: str, abstract_state: TrainState) -> TrainState:
    """Restore into the structure of ``abstract_state`` (from jax.eval_shape or a
    freshly created state). Leaves without a concrete sharding (eval_shape
    structs) are restored onto the default device — orbax requires every target
    leaf to carry a concrete ``jax.sharding.Sharding``."""
    if load_metadata(path).get("params_only"):
        raise ValueError(
            f"{path} is a params-only checkpoint (no optimizer state): restore "
            "it with restore_model_params / load_params_for_model, or resume "
            "from the 'latest' checkpoint instead")
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    default = jax.sharding.SingleDeviceSharding(jax.devices()[0])

    def to_target(x):
        if isinstance(x, jax.ShapeDtypeStruct):
            sharding = x.sharding if x.sharding is not None else default
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        return x

    target = jax.tree.map(to_target, _state_to_pytree(abstract_state))
    restored = ckptr.restore(os.path.join(path, "state"), target)
    return TrainState(
        step=restored["step"],
        trainable=restored["trainable"],
        frozen=restored["frozen"],
        opt_state=restored["opt_state"],
    )


def checkpoint_exists(path: str) -> bool:
    return os.path.exists(os.path.join(path, "metadata.json"))


def restore_model_params(path: str, abstract_params) -> tuple:
    """Restore only the (trainable, frozen) param splits from a full training
    checkpoint — no optimizer reconstruction needed (inference path)."""
    path = os.path.abspath(path)
    default = jax.sharding.SingleDeviceSharding(jax.devices()[0])

    def to_target(x):
        sharding = getattr(x, "sharding", None) or default
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)

    target = {k: jax.tree.map(to_target, v) for k, v in abstract_params.items()}
    restore_args = jax.tree.map(
        lambda s: ocp.ArrayRestoreArgs(sharding=s.sharding, dtype=s.dtype),
        target)
    with ocp.PyTreeCheckpointer() as pytree_ckptr:
        restored = pytree_ckptr.restore(
            os.path.join(path, "state"),
            args=ocp.args.PyTreeRestore(item=target, restore_args=restore_args,
                                        partial_restore=True))
    return restored["trainable"], restored["frozen"]


def save_params_checkpoint(path: str, params, cfg: ExperimentConfig,
                           info: Optional[dict] = None) -> None:
    """Params-only checkpoint (e.g. converted pretrained encoders + fresh heads),
    used to initialise training via ``TrainConfig.init_checkpoint``."""
    path = os.path.abspath(path)
    tmp_path = path + ".tmp"
    if os.path.exists(tmp_path):
        import shutil
        shutil.rmtree(tmp_path)
    ckptr = ocp.StandardCheckpointer()
    tree = ({"params": fetch_to_host(params)} if jax.process_count() == 1
            else {"params": params})
    ckptr.save(os.path.join(tmp_path, "params"), tree)
    ckptr.wait_until_finished()
    meta = {
        "format_version": FORMAT_VERSION,
        "kind": "params_only",
        "info": _jsonable(info or {}),
        "config": json.loads(cfg.to_json()),
    }
    with open(os.path.join(tmp_path, "metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)
    _atomic_replace(tmp_path, path)


def load_params_for_model(path: str, model_cfg) -> dict:
    """Restore model params from ANY checkpoint kind, adapting the scan layout.

    Accepts both converter-style params checkpoints
    (``save_params_checkpoint``, metadata ``kind: params_only``) and training
    checkpoints (``save_checkpoint`` — ``latest``/``best_model_*``/
    ``final_model``/``checkpoint_epoch_N``, full or ``params_only=True``), so
    ``train.init_checkpoint`` can warm-start a run from converted pretrained
    encoders OR from any previously trained model — the reference's
    continue-from-saved-model workflow (trainer_unfreeze.py loads its own
    ``model.load_state_dict`` artifacts the same way).

    The checkpoint's metadata records the scan_bottom it was saved with (the
    converter always writes the unrolled layout); if the target model uses a
    different layout the encoders are restacked via
    ``models.convert.restack_encoder_params``.
    """
    import dataclasses

    from speech_transcript_embeddings_tpu.models.convert import (
        restack_encoder_params,
    )
    from speech_transcript_embeddings_tpu.models.dual_encoder import (
        DualEncoderModel, init_params,
    )

    meta = load_metadata(path)
    saved_cfg = ExperimentConfig.from_json(json.dumps(meta["config"]))
    saved = saved_cfg.model
    saved_scan = (saved.text.scan_bottom, saved.audio.scan_bottom)
    target_scan = (model_cfg.text.scan_bottom, model_cfg.audio.scan_bottom)

    # abstract target in the SAVED layout (all other dims must match the target)
    saved_layout_cfg = dataclasses.replace(
        model_cfg,
        text=dataclasses.replace(model_cfg.text, scan_bottom=saved_scan[0]),
        audio=dataclasses.replace(model_cfg.audio, scan_bottom=saved_scan[1]))
    abstract = jax.eval_shape(
        lambda: init_params(DualEncoderModel(saved_layout_cfg),
                            jax.random.PRNGKey(0)))
    if meta.get("kind") == "params_only":
        params = restore_params_checkpoint(path, abstract)
    else:
        # training checkpoint: the state tree splits params into
        # trainable/frozen by the SAVED run's freeze labels — rebuild that
        # split abstractly, restore just those subtrees (partial restore skips
        # any optimizer state present), and merge back to one params dict
        from speech_transcript_embeddings_tpu.training import (
            optimizer as opt_lib,
        )
        labels = opt_lib.param_labels(abstract, saved_cfg.freeze,
                                      saved_layout_cfg)
        trainable_s, frozen_s = opt_lib.split_params(abstract, labels)
        trainable, frozen = restore_model_params(
            path, {"trainable": trainable_s, "frozen": frozen_s})
        params = opt_lib.merge_params(dict(trainable), dict(frozen))
    if saved_scan == target_scan:
        return params
    params = dict(params)
    params["text_encoder"] = restack_encoder_params(
        jax.tree.map(np.asarray, params["text_encoder"]),
        saved_scan[0], target_scan[0], model_cfg.text.num_layers)
    params["audio_encoder"] = restack_encoder_params(
        jax.tree.map(np.asarray, params["audio_encoder"]),
        saved_scan[1], target_scan[1], model_cfg.audio.num_layers)
    return params


def restore_params_checkpoint(path: str, abstract_params):
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    default = jax.sharding.SingleDeviceSharding(jax.devices()[0])

    def to_target(x):
        if isinstance(x, jax.ShapeDtypeStruct):
            sharding = x.sharding if x.sharding is not None else default
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        return x

    target = {"params": jax.tree.map(to_target, abstract_params)}
    return ckptr.restore(os.path.join(path, "params"), target)["params"]


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    if isinstance(obj, jax.Array):
        return np.asarray(obj).item() if obj.size == 1 else np.asarray(obj).tolist()
    return obj
