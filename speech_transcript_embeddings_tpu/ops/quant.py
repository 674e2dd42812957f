"""Int8 dynamic quantization for the inference path (W8A8, per-channel).

TPU-native capability with no reference counterpart (the reference serves
fp32 torch on GPU — inference.py / cv_inference.py): the v5e MXU executes
int8×int8→int32 matmuls at twice the bf16 rate, and int8 weights halve the
HBM weight traffic that dominates small-batch serving. This module quantizes
every ``nn.Dense`` kernel consumed by the inference forward to int8 with a
per-output-channel scale, and swaps the Dense matmul for a dynamic
(per-token) int8×int8 ``dot_general`` via Flax method interception — no model
code changes, and the scan-stacked frozen-bottom layout quantizes unchanged
(the per-layer slices of ``kernel_q``/``kernel_scale`` ride ``nn.scan``'s
``variable_axes={'params': 0}`` like any other stacked leaf).

Scheme (standard dynamic W8A8):
  * weights:     ``q = round(w / s_w)`` with ``s_w = max|w| / 127`` reduced
    over the input axis (axis -2) — one scale per output channel (and per
    stacked layer).
  * activations: per-row ``s_x = max|x| / 127`` computed on the fly in f32.
  * matmul:      ``dot_general(x_q, w_q, preferred_element_type=int32)``,
    rescaled ``out = i32 * s_x * s_w + bias`` in f32, cast to the module
    dtype.

Everything that is not a Dense matmul (embedding gathers, LayerNorms, the
depthwise conv, attention score einsums, softmax) stays in the original
dtype — those are bandwidth- or VPU-bound, not MXU-bound.

Intended for inference only: the quantization is not straight-through — there
is no gradient path.
"""

from __future__ import annotations

from typing import Callable, FrozenSet, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

PathT = Tuple[str, ...]

# params smaller than this on either matmul axis gain nothing from int8 and
# lose the most accuracy (e.g. the [H/2, 1] attentive-pooling score head) —
# leave them in the original dtype.
MIN_QUANT_DIM = 32


def _module_path(module: nn.Module) -> PathT:
    return tuple(module.scope.path)  # type: ignore[union-attr]


def dense_param_paths(apply_fn: Callable, *example_args) -> FrozenSet[PathT]:
    """Abstractly trace ``apply_fn(*example_args)`` and record the module path
    of every ``nn.Dense`` call — the definitive set of params the int8
    interceptor can take over (anything else, e.g. the alignment head when it
    is unused by the traced forward, stays full-precision and runs normally).
    """
    paths = set()

    def recorder(next_fun, args, kwargs, context):
        if isinstance(context.module, nn.Dense) and context.module.scope is not None:
            paths.add(_module_path(context.module))
        return next_fun(*args, **kwargs)

    with nn.intercept_methods(recorder):
        jax.eval_shape(apply_fn, *example_args)
    return frozenset(paths)


def quantize_dense_params(params: dict, paths: FrozenSet[PathT]) -> dict:
    """Return a copy of ``params`` where each Dense kernel at ``paths`` is
    replaced by ``kernel_q`` (int8) + ``kernel_scale`` (f32, per output
    channel; leading stacked-layer axes preserved). Biases and every other
    leaf are untouched."""

    def rec(node: dict, prefix: PathT) -> dict:
        out = {}
        for key, val in node.items():
            here = prefix + (key,)
            if isinstance(val, dict):
                if here in paths and "kernel" in val:
                    w = jnp.asarray(val["kernel"], jnp.float32)
                    if min(w.shape[-2:]) < MIN_QUANT_DIM:
                        out[key] = dict(val)
                        continue
                    amax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)
                    scale = jnp.maximum(amax, 1e-12) / 127.0
                    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
                    new = {k: v for k, v in val.items() if k != "kernel"}
                    new["kernel_q"] = q
                    new["kernel_scale"] = jnp.squeeze(scale, axis=-2)
                    out[key] = new
                else:
                    out[key] = rec(val, here)
            else:
                out[key] = val
        return out

    return rec(params, ())


def int8_interceptor(next_fun, args, kwargs, context):
    """Flax method interceptor: replace the matmul of any ``nn.Dense`` whose
    params were quantized (``kernel_q`` present) with the dynamic int8 path.
    Unquantized modules fall through to the normal implementation."""
    mod = context.module
    if not (isinstance(mod, nn.Dense)
            and context.method_name == "__call__"
            and mod.has_variable("params", "kernel_q")):
        return next_fun(*args, **kwargs)
    # nn.Dense takes its input positionally today, but tolerate keyword calls
    # from future model code (dense(inputs=x))
    x = args[0] if args else kwargs["inputs"]
    wq = mod.get_variable("params", "kernel_q")        # [..., in, out] int8
    ws = mod.get_variable("params", "kernel_scale")    # [..., out] f32
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    out = jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((xq.ndim - 1,), (wq.ndim - 2,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = out.astype(jnp.float32) * sx * ws.astype(jnp.float32)
    if mod.use_bias:
        out = out + mod.get_variable("params", "bias").astype(jnp.float32)
    out_dtype = mod.dtype or jnp.promote_types(x.dtype, jnp.float32)
    return out.astype(out_dtype)


def intercept_int8():
    """Context manager activating the int8 Dense path during an apply/trace."""
    return nn.intercept_methods(int8_interceptor)
