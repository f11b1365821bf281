"""Shared model building blocks (ref capability: mmdet/models/utils/
(ConvModule, build_norm_layer, bias_init_with_prob, Scale)).

Design notes (TPU-first):
  * NHWC layout everywhere — the native layout for XLA:TPU convolutions
    (channels on the 128-lane minor dimension feeds the MXU directly).
  * ``dtype`` threads a bf16 compute policy through every block; parameters
    stay fp32 (flax's ``param_dtype``) — the TPU analog of the reference's
    fp16 apparatus without loss scaling.
  * Norm comes in three flavors: BN (train-mode batch stats), FrozenBN
    (inference-mode affine using running stats — what ``norm_eval=True``
    detection backbones actually run), and GN.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def bias_init_with_prob(prior_prob: float) -> float:
    """RetinaNet's focal-init: bias so initial fg prob ~= prior_prob."""
    return float(-math.log((1 - prior_prob) / prior_prob))


class FrozenBatchNorm(nn.Module):
    """BatchNorm that always uses stored running statistics (the semantics of
    the reference's ``norm_eval=True`` + frozen BN in detection backbones).
    Parameters: scale/bias (affine) + mean/var ("batch_stats"-like, stored as
    constants in ``params`` since they are never updated during detection
    training)."""

    features: int
    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    scale_init: Callable = nn.initializers.ones

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", self.scale_init, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (self.features,), jnp.float32)
        # fold into a single multiply-add; XLA fuses this into the conv
        inv = scale * jax.lax.rsqrt(var + self.epsilon)
        w = inv.astype(self.dtype)
        b = (bias - mean * inv).astype(self.dtype)
        return x * w + b


def build_norm(norm_cfg: Optional[dict], features: int, dtype=jnp.float32,
               name: Optional[str] = None, scale_init=None):
    """Norm factory keyed by config ``type`` (ref: build_norm_layer).
    Supported: BN (train-mode), FrozenBN, GN, SyncBN (== BN under pjit —
    batch stats reduce over the global batch via the mesh), None.
    ``scale_init`` overrides the affine scale init (zero_init_residual)."""
    if norm_cfg is None:
        return None
    t = norm_cfg["type"]
    si = scale_init or nn.initializers.ones
    if t in ("BN", "SyncBN"):
        return nn.BatchNorm(use_running_average=norm_cfg.get("eval", False),
                            momentum=0.9, epsilon=1e-5, dtype=dtype, name=name,
                            scale_init=si,
                            axis_name=norm_cfg.get("axis_name"))
    if t == "FrozenBN":
        return FrozenBatchNorm(features=features, dtype=dtype, name=name,
                               scale_init=si)
    if t == "GN":
        return nn.GroupNorm(num_groups=norm_cfg.get("num_groups", 32),
                            dtype=dtype, name=name, scale_init=si)
    raise KeyError(f"unknown norm type {t}")


_ACTS = {
    "relu": nn.relu,
    "swish": nn.swish,
    "gelu": nn.gelu,
    None: None,
}


class ConvWS(nn.Conv):
    """Weight-standardized convolution (ref: mmdet/models/utils/conv_ws.py
    (ConvWS2d, conv_ws_2d); "Micro-Batch Training with Batch-Channel
    Normalization and Weight Standardization").

    The kernel is standardized — zero mean, unit std over (H, W, I) per
    OUTPUT channel — before the convolution; always paired with GN in the
    reference's gn+ws configs.  Parameter names/shapes match nn.Conv
    ("kernel" HWIO, "bias"), so checkpoints interchange freely.
    """

    ws_eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        ndim = x.ndim - 2
        kh_kw = (tuple(self.kernel_size) if not isinstance(
            self.kernel_size, int) else (self.kernel_size,) * ndim)
        in_features = x.shape[-1]
        kernel_shape = kh_kw + (in_features // self.feature_group_count,
                                self.features)
        kernel = self.param("kernel", self.kernel_init, kernel_shape,
                            self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        k32 = kernel.astype(jnp.float32)
        red = tuple(range(k32.ndim - 1))  # (H, W, I)
        mean = jnp.mean(k32, axis=red, keepdims=True)
        std = jnp.std(k32, axis=red, keepdims=True)
        kernel = ((k32 - mean) / (std + self.ws_eps)).astype(
            self.dtype or kernel.dtype)

        strides = self.strides or (1,) * ndim
        if isinstance(strides, int):
            strides = (strides,) * ndim
        pad = self.padding
        if isinstance(pad, int):
            pad = tuple((pad, pad) for _ in kh_kw)
        elif isinstance(pad, (list, tuple)) and pad and \
                isinstance(pad[0], int):
            pad = tuple((p, p) for p in pad)
        dil = self.kernel_dilation or (1,) * ndim
        if isinstance(dil, int):
            dil = (dil,) * ndim
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype or x.dtype), kernel,
            window_strides=strides, padding=pad, rhs_dilation=dil,
            feature_group_count=self.feature_group_count,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


def conv_class(conv_cfg: Optional[dict]):
    """Conv factory keyed by config ``type`` (ref: build_conv_layer):
    None/"Conv" -> nn.Conv, "ConvWS" -> weight-standardized."""
    t = (conv_cfg or {}).get("type", "Conv")
    if t == "Conv":
        return nn.Conv
    if t == "ConvWS":
        return ConvWS
    raise KeyError(f"unknown conv type {t}")


class ConvModule(nn.Module):
    """conv (+ norm) (+ act) — the ubiquitous block (ref: ConvModule).

    Order is fixed conv->norm->act (the reference's default order tuple).
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    groups: int = 1
    use_bias: Optional[bool] = None
    conv_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    act: Optional[str] = "relu"
    dtype: Any = jnp.float32
    kernel_init: Callable = nn.initializers.variance_scaling(
        2.0, "fan_out", "truncated_normal")

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_bias = self.use_bias if self.use_bias is not None else self.norm_cfg is None
        conv_cls = conv_class(self.conv_cfg)
        x = conv_cls(self.features, self.kernel_size, strides=self.strides,
                     padding=self.padding, feature_group_count=self.groups,
                     use_bias=use_bias, dtype=self.dtype,
                     kernel_init=self.kernel_init, name="conv")(x)
        norm = build_norm(self.norm_cfg, self.features, self.dtype, name="norm")
        if norm is not None:
            if isinstance(norm, nn.BatchNorm):
                x = norm(x, use_running_average=not train)
            else:
                x = norm(x)
        if self.act is not None:
            x = _ACTS[self.act](x)
        return x


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor resize matching torch F.interpolate's floor indexing
    (src = floor(dst * in/out)).  NHWC.  Used by the FPN top-down path."""
    n, h, w, c = x.shape
    th, tw = size
    if th == 2 * h and tw == 2 * w:
        # exact x2: pure repeat (cheapest; the common pad-32 case)
        return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    rows = jnp.floor(jnp.arange(th) * (h / th)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(tw) * (w / tw)).astype(jnp.int32)
    return x[:, rows][:, :, cols]


def _adaptive_max_1d(x: jnp.ndarray, axis: int, out: int) -> jnp.ndarray:
    """torch adaptive_max_pool semantics along one axis: bin i spans
    [floor(i*S/out), ceil((i+1)*S/out)).  Bin geometry is computed at trace
    time (static shapes), so under jit this is one gather + masked max."""
    import numpy as np
    size = x.shape[axis]
    if size == out:
        return x
    starts = np.floor(np.arange(out) * size / out).astype(np.int64)
    ends = np.ceil((np.arange(out) + 1) * size / out).astype(np.int64)
    k = int((ends - starts).max())
    idx = starts[:, None] + np.arange(k)[None, :]          # (out, k)
    valid = idx < ends[:, None]
    idx = np.minimum(idx, size - 1)
    g = jnp.take(x, jnp.asarray(idx.reshape(-1)), axis=axis)
    g = jnp.moveaxis(g, axis, 0).reshape((out, k) + jnp.moveaxis(
        g, axis, 0).shape[1:])
    neg = jnp.asarray(-jnp.inf, g.dtype)
    mask = jnp.asarray(valid).reshape(
        (out, k) + (1,) * (g.ndim - 2))
    g = jnp.max(jnp.where(mask, g, neg), axis=1)
    return jnp.moveaxis(g, 0, axis)


def adaptive_max_pool(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """NHWC adaptive max pool matching torch F.adaptive_max_pool2d (exactly,
    incl. non-divisible sizes — variable bins, separable by axis)."""
    return _adaptive_max_1d(_adaptive_max_1d(x, 1, size[0]), 2, size[1])


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize matching torch F.interpolate(mode='bilinear',
    align_corners=False) — both use half-pixel source centers, which is
    jax.image.resize's convention.  NHWC; computed in fp32."""
    n, h, w, c = x.shape
    return jax.image.resize(x.astype(jnp.float32),
                            (n, size[0], size[1], c),
                            method="linear").astype(x.dtype)


class Scale(nn.Module):
    """Learnable scalar multiplier (ref: mmdet/models/utils/scale.py)."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        s = self.param("scale", nn.initializers.constant(self.init_value), ())
        return x * s
