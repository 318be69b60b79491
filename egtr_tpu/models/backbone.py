"""ResNet-50 backbone with frozen BatchNorm (flax.linen, NHWC).

TPU-native equivalent of the reference's timm backbone
(``DeformableDetrTimmConvEncoder``, model/deformable_detr.py:733-787) with
``DeformableDetrFrozenBatchNorm2d`` (:666-714). Outputs stages C3, C4, C5
(strides 8/16/32) for the multi-scale feature pyramid.

Frozen BN keeps the four torch buffers (weight/bias/running_mean/running_var)
as non-trainable params so released checkpoints convert 1:1; the folded
``x * scale + bias`` with eps inside the rsqrt matches
deformable_detr.py:711-713 exactly.

Freezing policy (deformable_detr.py:763-770): stem + layer1 params get zero
learning rate via the optimizer param-group mask (egtr_tpu/train/optim.py) —
the module itself is agnostic.
"""

from __future__ import annotations

import os
from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import lax


class StemConv(nn.Module):
    """The ResNet 7x7/s2 stem conv, computed as space-to-depth(2) + a
    4x4/s1 conv on 12 input channels.

    A direct 7x7 conv over 3 input channels starves the MXU's contraction
    dimension (K = 3 per tap); re-indexing the same MACs over 2x2
    subpixel blocks (K = 12) runs ~3x faster on TPU (the standard MLPerf
    ResNet formulation). The parameter keeps the reference's [7,7,3,64]
    layout/naming, so checkpoints convert 1:1; the 8x8-padded reshape to
    [4,4,12,64] happens in-graph and is numerically the identical sum,
    just reordered. Falls back to the plain conv for odd spatial dims, or
    when ``EGTR_PLAIN_STEM`` is set in the environment (A/B escape hatch:
    the s2d form wins on the conv itself but adds an input relayout whose
    cost is shape-dependent).
    """

    features: int = 64

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (7, 7, 3, self.features)).astype(x.dtype)
        B, H, W, C = x.shape
        if os.environ.get("EGTR_PLAIN_STEM") or H % 2 or W % 2:
            return lax.conv_general_dilated(
                x, kernel, window_strides=(2, 2), padding=((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # kernel taps at 2o-3+kh; left-pad to 8x8 so taps sit at
        # 2(o-2+a)+v with kh+1 = 2a+v — i.e. a 4x4 stride-1 conv over the
        # space-to-depth grid with padding (2, 1)
        k8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        k4 = (k8.reshape(4, 2, 4, 2, C, self.features)
              .transpose(0, 2, 1, 3, 4, 5)
              .reshape(4, 4, 4 * C, self.features))
        xs = (x.reshape(B, H // 2, 2, W // 2, 2, C)
              .transpose(0, 1, 3, 2, 4, 5)
              .reshape(B, H // 2, W // 2, 4 * C))
        return lax.conv_general_dilated(
            xs, k4, window_strides=(1, 1), padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics and affine params.

    y = x * scale + bias, scale = weight * rsqrt(running_var + 1e-5),
    bias = bias - running_mean * scale (reference deformable_detr.py:704-714).
    """

    features: int

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        scale = weight * (var + 1e-5) ** -0.5
        shift = bias - mean * scale
        return x * scale.astype(x.dtype) + shift.astype(x.dtype)


class Bottleneck(nn.Module):
    """torchvision/timm-style bottleneck v1.5 (stride on the 3x3 conv).

    ``dilation`` dilates the 3x3 conv (timm passes it as the block's
    ``first_dilation``; padding == dilation keeps the spatial size)."""

    width: int          # bottleneck width (e.g. 64 for layer1)
    stride: int = 1
    downsample: bool = False
    expansion: int = 4
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.width, (1, 1), use_bias=False, name="conv1")(x)
        out = FrozenBatchNorm(self.width, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.width, (3, 3), strides=(self.stride, self.stride),
            padding=[(self.dilation, self.dilation)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False, name="conv2",
        )(out)
        out = FrozenBatchNorm(self.width, name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.width * self.expansion, (1, 1), use_bias=False,
                      name="conv3")(out)
        out = FrozenBatchNorm(self.width * self.expansion, name="bn3")(out)
        if self.downsample:
            identity = nn.Conv(
                self.width * self.expansion, (1, 1),
                strides=(self.stride, self.stride), use_bias=False,
                name="downsample_conv",
            )(x)
            identity = FrozenBatchNorm(
                self.width * self.expansion, name="downsample_bn"
            )(identity)
        return nn.relu(out + identity)


class ResNet50(nn.Module):
    """ResNet v1.5 trunk returning (C3, C4, C5) feature maps, NHWC.

    Matches timm ``resnet50(features_only=True, out_indices=(2,3,4))``
    used by the reference (deformable_detr.py:748-756); ``blocks``
    selects the depth within the bottleneck family (resnet50 3-4-6-3,
    resnet101 3-4-23-3 — the config's ``backbone`` field). ``dilation=True``
    is timm's ``output_stride=16`` (the config's ``dilation`` flag,
    deformable_detr.py:144,751): layer4 keeps stride 16 — its first
    block's stride moves into dilation (first block's 3x3 stays
    dilation 1 = timm's ``first_dilation=prev_dilation``; later blocks
    dilate by 2) and the downsample conv drops its stride. Same params,
    so checkpoints convert 1:1 either way.
    """

    blocks: Sequence[int] = (3, 4, 6, 3)
    widths: Sequence[int] = (64, 128, 256, 512)
    out_stages: Sequence[int] = (2, 3, 4)  # C3, C4, C5 (1-indexed stages 2..4)
    dtype: jnp.dtype = jnp.float32
    dilation: bool = False

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        x = x.astype(self.dtype)
        # stem: 7x7/2 conv (space-to-depth form) + frozen BN + relu +
        # 3x3/2 maxpool
        x = StemConv(64, name="conv1")(x)
        x = FrozenBatchNorm(64, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = []
        for stage, (n_blocks, width) in enumerate(zip(self.blocks, self.widths)):
            dilate = self.dilation and stage == 3
            stride = 1 if stage == 0 or dilate else 2
            for b in range(n_blocks):
                x = Bottleneck(
                    width=width,
                    stride=stride if b == 0 else 1,
                    downsample=(b == 0),
                    dilation=2 if (dilate and b > 0) else 1,
                    name=f"layer{stage + 1}_{b}",
                )(x)
            if (stage + 1) in self.out_stages:
                outs.append(x)
        return tuple(outs)
