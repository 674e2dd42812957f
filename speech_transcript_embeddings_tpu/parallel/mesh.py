"""Device mesh and sharding rules.

The reference is single-GPU (``CUDA_VISIBLE_DEVICES=0``, trainer_unfreeze.py:12)
with no distributed layer at all (SURVEY.md §2); this module is the TPU-native
replacement: a 2-axis ``Mesh`` — ``data`` for batch parallelism over ICI (with
in-batch negatives all-gathered by XLA when the global InfoNCE loss is enabled) and
``model`` for tensor parallelism of the encoder matmuls.

Sharding is expressed as regex rules over flattened parameter paths →
``PartitionSpec``; everything unmatched is replicated. Under ``jit`` these
annotations steer GSPMD — correctness never depends on them.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

import jax
import numpy as np
from flax import traverse_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from speech_transcript_embeddings_tpu.config import MeshConfig


def make_mesh(cfg: MeshConfig, devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    num_model = max(cfg.num_model, 1)
    if n % num_model:
        raise ValueError(f"{n} devices not divisible by model={num_model}")
    num_data = cfg.num_data if cfg.num_data > 0 else n // num_model
    if num_data * num_model != n:
        devices = devices[: num_data * num_model]
    arr = np.asarray(devices).reshape(num_data, num_model)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


# (path regex, spec builder given the model axis name)
_RULES: List[Tuple[str, callable]] = [
    # attention projections: shard heads (output dim) / recombine on out-proj
    (r".*attention/(query|key|value)/kernel$",       lambda m: P(None, m)),
    (r".*attention/(query|key|value)/bias$",         lambda m: P(m)),
    (r".*attention/out/kernel$",                     lambda m: P(m, None)),
    (r".*(attn_q|attn_k|attn_v)/kernel$",            lambda m: P(None, m)),
    (r".*attn_out/kernel$",                          lambda m: P(m, None)),
    # FFN / projection MLPs: expand → shard cols, contract → shard rows
    (r".*(intermediate|dense_in)/kernel$",           lambda m: P(None, m)),
    (r".*(intermediate|dense_in)/bias$",             lambda m: P(m)),
    (r".*(output|dense_out)/kernel$",                lambda m: P(m, None)),
    # conformer conv module
    (r".*conv/pointwise1/kernel$",                   lambda m: P(None, m)),
    (r".*conv/pointwise2/kernel$",                   lambda m: P(m, None)),
    (r".*depthwise_kernel$",                         lambda m: P(None, None, m)),
    # big embedding tables: shard the vocab dimension
    (r".*word_embeddings/embedding$",                lambda m: P(m, None)),
]


def _spec_for(path: str, model_axis: str) -> P:
    for pattern, build in _RULES:
        if re.match(pattern, path):
            spec = build(model_axis)
            if "/bottom_stack/" in path:
                # scanned stacks carry a leading layer axis — never sharded
                spec = P(None, *spec)
            return spec
    return P()


def param_specs(params, model_axis: str = "model"):
    """Pytree of PartitionSpec matching ``params``."""
    flat = traverse_util.flatten_dict(params, sep="/")
    specs = {k: _spec_for(k, model_axis) for k in flat}
    return traverse_util.unflatten_dict(specs, sep="/")


def param_shardings(mesh: Mesh, params, model_axis: str = "model"):
    """Pytree of NamedSharding for placing ``params`` on ``mesh``."""
    return jax.tree.map(lambda spec: NamedSharding(mesh, spec),
                        param_specs(params, model_axis),
                        is_leaf=lambda x: isinstance(x, P))


def flat_param_shardings(mesh: Mesh, flat_params: dict,
                         model_axis: str = "model") -> dict:
    """NamedShardings for a flat ``{path: array}`` dict (TrainState layout)."""
    return {k: NamedSharding(mesh, _spec_for(k, model_axis)) for k in flat_params}


def opt_state_shardings(mesh: Mesh, opt_state, trainable: dict,
                        model_axis: str = "model"):
    """Shardings for an optax opt-state tree: leaves that live under a
    parameter's flat-path key with the parameter's shape (Adam mu/nu, MultiSteps
    gradient accumulators) follow that parameter's sharding; everything else
    (step counts, schedule state) is replicated.

    TP without this is TP in name only: the moments are param-sized, so
    replicating them forfeits the HBM saving of sharding the params.
    """
    from jax.tree_util import DictKey, tree_map_with_path

    flat_sh = flat_param_shardings(mesh, trainable, model_axis)
    shapes = {k: tuple(v.shape) for k, v in trainable.items()}
    rep = NamedSharding(mesh, P())

    def leaf_sharding(path, leaf):
        if hasattr(leaf, "shape"):
            for entry in reversed(path):
                if isinstance(entry, DictKey) and entry.key in shapes:
                    if tuple(leaf.shape) == shapes[entry.key]:
                        return flat_sh[entry.key]
                    break
        return rep

    return tree_map_with_path(leaf_sharding, opt_state)


def place_opt_state(mesh: Mesh, opt_state, trainable: dict,
                    model_axis: str = "model"):
    """device_put the opt-state with per-parameter shardings (see
    ``opt_state_shardings``); non-array leaves pass through untouched."""
    shardings = opt_state_shardings(mesh, opt_state, trainable, model_axis)
    return jax.tree.map(
        lambda a, s: jax.device_put(a, s) if hasattr(a, "shape") else a,
        opt_state, shardings)


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Batch arrays: shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(data_axis))


def shard_batch(mesh: Mesh, batch: dict, data_axis: str = "data") -> dict:
    s = batch_sharding(mesh, data_axis)
    return {k: jax.device_put(v, s) for k, v in batch.items()}


# ---- multi-host (multi-slice / multi-process) readiness ----------------------

def maybe_initialize_distributed(flag: bool) -> int:
    """Multi-host bring-up: call ``jax.distributed.initialize()`` (coordinator
    discovery via the standard TPU-VM env vars / megascale runtime) before the
    first backend touch, making ``jax.devices()`` span every host's chips so
    ``make_mesh`` builds one global mesh — DP/ICI within a slice, DCN across
    slices (SURVEY.md §5.8). No-op when ``flag`` is False or the runtime is
    already initialized. → number of participating processes."""
    if flag:
        try:
            jax.distributed.initialize()
        except (RuntimeError, ValueError) as e:   # already initialized / 1-proc
            import logging
            logging.getLogger(__name__).info(
                "jax.distributed.initialize skipped: %s", e)
    return jax.process_count()


def host_batch_slice(global_batch_size: int) -> Tuple[int, int]:
    """(this host's row offset, rows per host) of the GLOBAL batch.

    Each process transfers only the rows that live on its local chips: the
    training loop runs an identical seeded pipeline on every host (same
    shuffle, same bucketing — so batch composition agrees without any
    coordination) and slices each ASSEMBLED batch with this before placement.
    Host-side decode is therefore duplicated across hosts (accepted for now —
    docs/SCALING.md); sharding the example stream pre-decode is the upgrade
    when a real multi-host corpus run exists to validate against."""
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{n} processes")
    per = global_batch_size // n
    return jax.process_index() * per, per


def shard_batch_multihost(mesh: Mesh, host_batch: dict,
                          data_axis: str = "data") -> dict:
    """Assemble global device arrays from per-host batch shards.

    ``host_batch`` holds only this process's rows (``host_batch_slice`` of the
    global batch). ``jax.make_array_from_process_local_data`` lays each host's
    rows onto its own chips — the single-controller-per-host equivalent of
    ``shard_batch`` (which assumes every row is addressable locally and is
    wrong across hosts). With one process this degrades to exactly
    ``shard_batch``'s placement, which is how the CPU-mesh tests cover it."""
    s = batch_sharding(mesh, data_axis)
    return {
        k: jax.make_array_from_process_local_data(s, np.asarray(v))
        for k, v in host_batch.items()
    }
