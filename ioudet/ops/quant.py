"""int8 (w8a8) quantized inference for the conv stack (ref capability: the
reference has no quantized path — this is the TPU-native speed lever the
CUDA repo gets from TensorRT externally).

Design:
  * weights: per-OUTPUT-CHANNEL symmetric absmax int8, quantized from the
    fp32 params on the fly (kernels are tiny next to activations);
  * activations: per-TENSOR symmetric int8 — dynamic absmax per call by
    default, or STATIC per-layer scales from :func:`calibrate` (compile-time
    constants, no reduction);
  * conv runs int8 x int8 -> int32, then dequantizes with the combined
    scale and adds the fp bias.

Measured on the real v5e (round 3, relay latency amortized — see
docs/MODEL_ZOO.md "int8" section and tools/probe_int8_conv.py): XLA does
NOT engage the 2x int8 MXU rate (pure s8 conv == bf16 conv TOPS); the win
is HBM-bandwidth + cast-glue removal on the memory-bound layers.
End-to-end IoU-aware R-50 @ batch 16: bf16 158 img/s, dynamic int8 155
(net LOSS — absmax+requant glue), calibrated static int8 **187 img/s
(+19%)**.  Ship the calibrated path; dynamic is calibration-free fallback.

Integration is NON-INVASIVE via flax's ``nn.intercept_methods``: inside
:func:`quantize_calls`, every ``nn.Conv.__call__`` whose config we support
(stride/groups/int-or-SAME padding, no input dilation) is re-routed through
the quantized kernel while re-using the module's OWN params — no model
changes, any detector family, identical param tree.  1x1 output-prediction
convs stay un-quantized when ``skip`` matches their names (cls/reg/iou
logits are accuracy-critical).
"""

from __future__ import annotations

import contextlib
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _quantize_tensor(x: jnp.ndarray, scale=None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-tensor symmetric absmax -> (int8 values, fp32 scale).  A fixed
    ``scale`` (calibrated statically) skips the absmax reduce."""
    if scale is None:
        scale = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))),
                            1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel absmax over HWIO kernel -> (int8, (O,) scales)."""
    w = w.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / s), -127, 127)
    return q.astype(jnp.int8), s


def _supported(mod: nn.Conv) -> bool:
    if mod.input_dilation not in (None, 1, (1, 1)):
        return False
    if mod.mask is not None:
        return False
    pad = mod.padding
    return isinstance(pad, (int, str, tuple, list))


def quant_conv_call(mod: nn.Conv, x: jnp.ndarray,
                    act_scale=None) -> jnp.ndarray:
    """Quantized twin of nn.Conv.__call__ using the module's own params."""
    kh_kw = tuple(mod.kernel_size) if not isinstance(mod.kernel_size, int) \
        else (mod.kernel_size,) * (x.ndim - 2)
    in_features = x.shape[-1]
    kernel_shape = kh_kw + (in_features // mod.feature_group_count,
                            mod.features)
    kernel = mod.param("kernel", mod.kernel_init, kernel_shape,
                       mod.param_dtype)
    bias = (mod.param("bias", mod.bias_init, (mod.features,),
                      mod.param_dtype) if mod.use_bias else None)

    strides = mod.strides or (1,) * len(kh_kw)
    if isinstance(strides, int):
        strides = (strides,) * len(kh_kw)
    pad = mod.padding
    if isinstance(pad, int):
        pad = tuple((pad, pad) for _ in kh_kw)
    elif isinstance(pad, (list, tuple)) and pad and isinstance(pad[0], int):
        pad = tuple((p, p) for p in pad)
    dil = mod.kernel_dilation or (1,) * len(kh_kw)
    if isinstance(dil, int):
        dil = (dil,) * len(kh_kw)

    xq, sx = _quantize_tensor(x, act_scale)
    wq, sw = _quantize_weight(kernel)
    out = jax.lax.conv_general_dilated(
        xq, wq, window_strides=strides, padding=pad,
        rhs_dilation=dil, feature_group_count=mod.feature_group_count,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = out.astype(jnp.float32) * (sx * sw)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(mod.dtype or jnp.float32)


def make_interceptor(skip: Sequence[str] = ("retina_cls", "retina_reg",
                                            "retina_iou", "conv_logits",
                                            "rpn_cls", "rpn_reg"),
                     act_scale=None, collector=None):
    """Interceptor quantizing every supported nn.Conv call except modules
    whose name (or parent name) matches ``skip``.

    ``act_scale``: replaces the per-call absmax reduce with a calibrated
    static activation scale — a scalar applied everywhere, or a dict keyed
    by module path string ("/".join(mod.path)) from :func:`calibrate`
    (measured on v5e: the per-call absmax reduce costs ~15% end-to-end
    throughput; static scales recover it).

    ``collector``: a dict; when given, convs run UN-quantized but each
    supported conv records its input absmax (traced scalar) under its path
    — the capture half of :func:`calibrate`."""

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (isinstance(mod, nn.Conv)
                and context.method_name == "__call__"
                and _supported(mod)
                and not any(s in (mod.path[-1] if mod.path else "")
                            or (len(mod.path) > 1 and s in mod.path[-2])
                            for s in skip)):
            path = "/".join(mod.path)
            if collector is not None:
                collector[path] = jnp.max(
                    jnp.abs(args[0].astype(jnp.float32)))
                return next_fun(*args, **kwargs)
            scale = act_scale
            if isinstance(act_scale, dict):
                scale = act_scale.get(path)
            return quant_conv_call(mod, args[0], scale)
        return next_fun(*args, **kwargs)

    return interceptor


@contextlib.contextmanager
def quantize_calls(skip: Sequence[str] = ("retina_cls", "retina_reg",
                                          "retina_iou", "conv_logits",
                                          "rpn_cls", "rpn_reg"),
                   act_scale=None):
    """Context manager: any flax ``apply`` executed inside runs its convs
    int8 (w8a8; dynamic absmax by default, static with ``act_scale`` — a
    scalar or a per-path dict from :func:`calibrate`).  Example::

        with quantize_calls():
            dets, labels = det.apply({"params": p}, img, ...,
                                     method=det.simple_test)
    """
    with nn.intercept_methods(make_interceptor(skip, act_scale)):
        yield


def calibrate(apply_fn, batches,
              skip: Sequence[str] = ("retina_cls", "retina_reg",
                                     "retina_iou", "conv_logits",
                                     "rpn_cls", "rpn_reg"),
              margin: float = 1.0) -> dict:
    """Per-layer static activation scales for w8a8 inference.

    Runs ``apply_fn(batch)`` — a callable executing the model's flax apply
    EAGERLY (not under jit: the collector must read concrete absmax values;
    calibration is a one-off offline pass) — over ``batches`` and returns
    ``{module_path: absmax_over_batches * margin / 127}`` for every
    supported conv, consumable as ``quantize_calls(act_scale=scales)``.
    """
    import numpy as np

    maxima: dict = {}
    for b in batches:
        collector: dict = {}
        with nn.intercept_methods(
                make_interceptor(skip, collector=collector)):
            apply_fn(b)
        for k, v in collector.items():
            v = float(v)
            maxima[k] = max(maxima.get(k, 0.0), v)
    return {k: max(v * margin, 1e-8) / 127.0 for k, v in maxima.items()}
