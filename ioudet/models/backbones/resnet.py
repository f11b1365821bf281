"""ResNet backbone (ref: mmdet/models/backbones/resnet.py (ResNet, BasicBlock,
Bottleneck, make_res_layer)).

TPU-first design decisions vs the reference:
  * NHWC layout; convs map straight onto the MXU.
  * ``norm_eval=True`` detection semantics are implemented as FrozenBN —
    running stats folded into one fused multiply-add (XLA fuses it into the
    conv epilogue), which is both exactly the reference's eval-mode BN math
    and the fastest possible form on TPU.
  * ``frozen_stages`` applies ``lax.stop_gradient`` at stage boundaries
    (plus FrozenBN), reproducing requires_grad=False without optimizer
    machinery; weight decay on frozen params is masked in the optimizer.
  * 'pytorch' style bottlenecks (stride on the 3x3), the detection default.

Grouped convolution (``groups``/``base_width``) folds ResNeXt into the same
block via XLA ``feature_group_count`` — see resnext.py.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import BACKBONES
from ..utils.layers import build_norm, conv_class

_KINIT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _norm(norm_cfg, features, dtype, name, scale_init=None):
    return build_norm(norm_cfg or {"type": "FrozenBN"}, features, dtype, name,
                      scale_init=scale_init)


class _StemS2DConv(nn.Module):
    """7x7/s2 stem conv computed as space-to-depth(2) + 4x4/s1 conv.

    Bit-identical taps: output(y,x) = sum_k W[k] I[2y+k-3].  Writing input
    rows as u = 2v+p (p = parity), the receptive field spans v in [y-2,y+1]
    — a 4-tap stride-1 conv over the s2d grid with padding (2,1) whose
    kernel row (t, p) holds W[2t+p-1] (zero where k=-1 or 7).  The MXU sees
    contraction 4*4*4C on a quarter-size grid instead of 7*7*C at double
    resolution (the MLPerf-ResNet stem transform).  Measured neutral inside
    the fully fused detector program on v5e (XLA already handles the 7x7
    stem well there) but markedly faster as a standalone program; kept as
    the canonical TPU stem form.  The stored param is the ORIGINAL
    torch-layout (7,7,C,64) kernel, so converters/parity are unaffected.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        w = self.param("kernel", _KINIT, (7, 7, C, 64), jnp.float32)
        w = w.astype(self.dtype)
        j = x.reshape(B, H // 2, 2, W // 2, 2, C)
        j = j.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
        w8 = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))  # row r = k+1
        wr = w8.reshape(4, 2, 4, 2, C, 64)
        wr = wr.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * C, 64)
        return jax.lax.conv_general_dilated(
            j.astype(self.dtype), wr, window_strides=(1, 1),
            padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    conv_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    zero_init_residual: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        Conv = conv_class(self.conv_cfg)
        identity = x
        out = Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                   padding=1, use_bias=False, dtype=self.dtype,
                   kernel_init=_KINIT, name="conv1")(x)
        out = _norm(self.norm_cfg, self.planes, self.dtype, "bn1")(out)
        out = nn.relu(out)
        out = Conv(self.planes, (3, 3), padding=1, use_bias=False,
                   dtype=self.dtype, kernel_init=_KINIT, name="conv2")(out)
        out = _norm(self.norm_cfg, self.planes, self.dtype, "bn2",
                    scale_init=nn.initializers.zeros
                    if self.zero_init_residual else None)(out)
        if self.downsample:
            identity = Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                            use_bias=False, dtype=self.dtype,
                            kernel_init=_KINIT, name="downsample_conv")(x)
            identity = _norm(self.norm_cfg, self.planes, self.dtype,
                             "downsample_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int           # bottleneck width basis (64/128/256/512)
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 4   # only read when groups > 1 (ResNeXt)
    expansion: int = 4
    conv_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    zero_init_residual: bool = False
    # 'pytorch' (stride on the 3x3) vs 'caffe' (stride on the first 1x1) —
    # ref: mmdet/models/backbones/resnet.py (Bottleneck.__init__: style in
    # ('pytorch', 'caffe'); conv1_stride/conv2_stride swap).  The caffe form
    # is what the reference's GA / FCOS / C4 config families use.
    style: str = "pytorch"
    with_dcn: bool = False      # deformable 3x3 (ref: configs/dcn/* "dcn")
    dcn_modulated: bool = False  # DCNv2 (modulated)
    with_gcb: bool = False      # global-context block after conv3 (gcb)
    # GeneralizedAttention after conv2 (ref: configs/empirical_attention/*:
    # Bottleneck(gen_attention=...) applied post-norm2-relu, pre-conv3)
    gen_attention: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.groups == 1:
            width = self.planes
        else:
            # ResNeXt width rule (ref: mmdet/models/backbones/resnext.py)
            width = int((self.planes * (self.base_width / 64.0)) * self.groups)
        out_ch = self.planes * self.expansion
        identity = x
        Conv = conv_class(self.conv_cfg)

        # stride placement: pytorch on the 3x3, caffe on the first 1x1
        c1_stride = self.stride if self.style == "caffe" else 1
        c2_stride = 1 if self.style == "caffe" else self.stride

        out = Conv(width, (1, 1), strides=(c1_stride,) * 2, use_bias=False,
                   dtype=self.dtype, kernel_init=_KINIT, name="conv1")(x)
        out = _norm(self.norm_cfg, width, self.dtype, "bn1")(out)
        out = nn.relu(out)
        if self.with_dcn:
            # deformable 3x3 (ref: Bottleneck with dcn=dict(...)): offsets
            # (and masks for v2) from a zero-init conv on the input feature
            from ...ops.deform_conv import deform_conv2d
            noff = 27 if self.dcn_modulated else 18
            om = nn.Conv(noff, (3, 3), strides=(c2_stride,) * 2, padding=1,
                         kernel_init=nn.initializers.zeros,
                         dtype=self.dtype, name="conv2_offset")(out)
            offsets, mask = om[..., :18], None
            if self.dcn_modulated:
                mask = jax.nn.sigmoid(om[..., 18:])
            kernel = self.param(
                "conv2_kernel", _KINIT, (3, 3, width, width))
            out = deform_conv2d(out, offsets, kernel.astype(self.dtype),
                                mask=mask, stride=c2_stride)
        else:
            out = Conv(width, (3, 3), strides=(c2_stride,) * 2, padding=1,
                       feature_group_count=self.groups, use_bias=False,
                       dtype=self.dtype, kernel_init=_KINIT,
                       name="conv2")(out)
        out = _norm(self.norm_cfg, width, self.dtype, "bn2")(out)
        out = nn.relu(out)
        if self.gen_attention is not None:
            from ..plugins import GeneralizedAttention
            out = GeneralizedAttention(
                **{k: v for k, v in dict(self.gen_attention).items()
                   if k != "type"},
                dtype=self.dtype, name="gen_attention_block")(out)
        out = Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                   kernel_init=_KINIT, name="conv3")(out)
        out = _norm(self.norm_cfg, out_ch, self.dtype, "bn3",
                    scale_init=nn.initializers.zeros
                    if self.zero_init_residual else None)(out)
        if self.with_gcb:
            from ..plugins import ContextBlock
            out = ContextBlock(dtype=self.dtype, name="context_block")(out)

        if self.downsample:
            identity = Conv(out_ch, (1, 1), strides=(self.stride,) * 2,
                            use_bias=False, dtype=self.dtype,
                            kernel_init=_KINIT, name="downsample_conv")(x)
            identity = _norm(self.norm_cfg, out_ch, self.dtype,
                             "downsample_bn")(identity)
        return nn.relu(out + identity)


ARCH_SETTINGS = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


@BACKBONES.register_module
class ResNet(nn.Module):
    """Returns the tuple of stage outputs selected by ``out_indices``.

    Detection defaults mirror the reference configs: depth=50,
    num_stages=4, out_indices=(0,1,2,3), frozen_stages=1, FrozenBN.
    """

    depth: int = 50
    num_stages: int = 4
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    strides: Tuple[int, ...] = (1, 2, 2, 2)
    frozen_stages: int = -1
    # ref: ResNet(style='pytorch'|'caffe') — caffe bottlenecks stride on the
    # first 1x1; used by the GA / FCOS / C4 reference config families
    style: str = "pytorch"
    groups: int = 1
    base_width: int = 4
    conv_cfg: Optional[dict] = None  # dict(type="ConvWS") -> gn+ws family
    norm_cfg: Optional[dict] = None
    # ref: ResNet(zero_init_residual): zero the last norm scale per block so
    # residual branches start as identity (scratch/GN training aid)
    zero_init_residual: bool = False
    # per-stage plugin injection (ref: ResNet(dcn=..., stage_with_dcn=...,
    # gcb=..., stage_with_gcb=...) used by configs/dcn/* and configs/gcb/*)
    stage_with_dcn: Tuple[bool, ...] = (False, False, False, False)
    dcn_modulated: bool = False
    stage_with_gcb: Tuple[bool, ...] = (False, False, False, False)
    # per-stage BLOCK-index tuples (ref: stage_with_gen_attention =
    # [[], [], [0, 1, 2, 3, 4, 5], [0, 1, 2]] in empirical_attention cfgs)
    gen_attention: Optional[dict] = None
    stage_with_gen_attention: Tuple[Tuple[int, ...], ...] = ((), (), (), ())
    # MLPerf-style stem: run the 7x7/s2 conv as space-to-depth(2) + 4x4/s1.
    # Bit-identical arithmetic in isolation (same taps, zero-padded to the
    # 4x4 grid; see _StemS2DConv) and measured NEUTRAL inside the fused
    # detector program on v5e — and the closed-loop convergence test
    # REGRESSED with it enabled (AP50 0.88 -> 0.05 on the planted-box task,
    # reproducible, despite unit-level forward/grad equality) — so it stays
    # opt-in, default off.
    stem_space_to_depth: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, stage_blocks = ARCH_SETTINGS[self.depth]
        stage_blocks = stage_blocks[: self.num_stages]

        if self.stem_space_to_depth and self.conv_cfg is None \
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            # param tree stays conv1/kernel (7,7,C,64): converters unchanged
            x = _StemS2DConv(dtype=self.dtype, name="conv1")(x)
        else:
            x = conv_class(self.conv_cfg)(
                64, (7, 7), strides=(2, 2), padding=3,
                use_bias=False, dtype=self.dtype, kernel_init=_KINIT,
                name="conv1")(x)
        x = _norm(self.norm_cfg, 64, self.dtype, "bn1")(x)
        x = nn.relu(x)
        # torch maxpool(3, 2, pad=1): explicit -inf pad then VALID window
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outs = []
        expansion = 4 if block_cls is Bottleneck else 1
        in_ch = 64
        for i, num_blocks in enumerate(stage_blocks):
            planes = 64 * 2 ** i
            out_ch = planes * expansion
            for j in range(num_blocks):
                stride = self.strides[i] if j == 0 else 1
                # projection shortcut whenever shape changes (stride/channels)
                downsample = j == 0 and (stride != 1 or in_ch != out_ch)
                extra = {}
                if block_cls is Bottleneck:
                    ga = (self.gen_attention
                          if j in tuple(self.stage_with_gen_attention[i])
                          else None)
                    extra = dict(style=self.style,
                                 groups=self.groups,
                                 base_width=self.base_width,
                                 with_dcn=self.stage_with_dcn[i],
                                 dcn_modulated=self.dcn_modulated,
                                 with_gcb=self.stage_with_gcb[i],
                                 gen_attention=ga)
                x = block_cls(planes=planes, stride=stride, downsample=downsample,
                              conv_cfg=self.conv_cfg,
                              norm_cfg=self.norm_cfg,
                              zero_init_residual=self.zero_init_residual,
                              dtype=self.dtype,
                              name=f"layer{i + 1}_{j}", **extra)(x, train)
                in_ch = out_ch
            if i + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)
