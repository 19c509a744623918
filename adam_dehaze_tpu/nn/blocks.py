"""Shared convolutional building blocks (flax.linen, NHWC).

TPU-native redesign of the reference block library
(reference: models/dehazing/base_model.py:4-78):

- `ConvBlock`: Conv -> BatchNorm -> activation. Bias is dropped when BN is on.
- `ResidualBlock`: two ConvBlocks + skip + ReLU.
- `AttentionBlock`: CBAM-style channel gating (avg+max pooled MLP) followed by
  spatial gating (channel mean/max -> 7x7 conv -> sigmoid). On TPU the spatial
  gate can run through a fused Pallas kernel (ops/pallas/cbam.py).
- `UpBlock`: ConvTranspose(4, stride 2) -> BN -> ReLU.

Layout is NHWC (TPU-preferred); compute dtype is configurable (bfloat16 for
the MXU) while parameters and BN statistics stay float32. BatchNorm matches
torch semantics: momentum 0.9 (torch's 0.1 "new-stat fraction"), eps 1e-5.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _pair(v: Union[int, Tuple[int, int]]) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def remat_twin(cls, static_argnums=(2,)):
    """`nn.remat` variant of a block class that PRESERVES flax auto-naming.

    nn.remat renames the transformed class ("CheckpointConvBlock"), which
    silently forks the parameter paths — a checkpoint trained without remat
    would no longer restore. Restoring `__name__` keeps the auto-name
    counters ("ConvBlock_0", ...) byte-identical to the plain class, so a
    remat-built model and a plain-built model share one parameter tree
    (pinned by tests/test_remat.py).

    Used for SELECTIVE remat (`tpu.remat: fullres`): branch models wrap only
    the blocks whose outputs are full-resolution — those interiors dominate
    HBM bytes (one (32, 256, 256, 96) bf16 tensor is 400 MB) and recompute
    from their own block inputs. Why structural rather than a
    checkpoint_name policy: `save_anything_except_these_names` was measured
    NOT to shed chain residuals — partial-eval just saves the excluded
    value's unnamed neighbor instead (same full-res byte count, DESIGN.md
    §15).

    MEASURED OUTCOME on v5e/XLA (logs/train_b{24,32}_fullres.log): it
    reduces AD residuals (pinned by test_remat.py) but INCREASES peak HBM
    (b24 16.16G vs plain fitting; b32 17.16G vs 16.25G plain) — XLA's own
    scheduler-level rematerialisation already handled these buffers, and
    the checkpoint boundaries add liveness (`remat_compressed` copies)
    instead of removing it. Kept as an opt-in knob with its tests because
    the result is compiler-version-dependent; for memory emergencies use
    `tpu.remat: true` (full remat).

    static_argnums=(2,) marks the `train` bool static (arg 0 is self)."""
    t = nn.remat(cls, static_argnums=static_argnums)
    t.__name__ = cls.__name__
    return t


class ConvBlock(nn.Module):
    """Conv -> optional BatchNorm -> optional activation
    (reference: base_model.py:4-24)."""
    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: int = 1
    padding: Optional[int] = None  # None -> k//2 ("same" for odd kernels)
    use_bn: bool = True
    activation: Optional[Callable] = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from adam_dehaze_tpu.ops.quant import conv_kwargs
        k = _pair(self.kernel_size)
        p = self.padding if self.padding is not None else k[0] // 2
        x = nn.Conv(
            self.features, k, strides=(self.stride, self.stride),
            padding=((p, p), (p, p)), use_bias=not self.use_bn,
            dtype=self.dtype, param_dtype=jnp.float32,
            **conv_kwargs(),  # int8 serving path (ops/quant.py), off by default
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, param_dtype=jnp.float32,
            )(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


class ResidualBlock(nn.Module):
    """Two ConvBlocks with an identity skip, final ReLU
    (reference: base_model.py:26-41)."""
    features: int
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = ConvBlock(self.features, self.kernel_size, dtype=self.dtype)(x, train)
        y = ConvBlock(self.features, self.kernel_size, activation=None,
                      dtype=self.dtype)(y, train)
        return nn.relu(y + residual)


class AttentionBlock(nn.Module):
    """CBAM-style channel + spatial attention (reference: base_model.py:43-78).

    Channel gate: sigmoid(MLP(avgpool(x)) + MLP(maxpool(x))), shared MLP as
    two bias-free 1x1 convs with a `reduction`-wide bottleneck. Spatial gate:
    sigmoid(conv7x7([mean_c(x'), max_c(x')])). When `use_pallas` is set the
    spatial-gate stencil runs as a fused Pallas kernel to avoid two extra
    HBM round-trips for the (mean, max) maps.
    """
    features: int
    reduction: int = 16
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        c = self.features
        hidden = max(c // self.reduction, 1)
        mlp = nn.Sequential([
            nn.Dense(hidden, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32),
            nn.relu,
            nn.Dense(c, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32),
        ])
        avg = jnp.mean(x, axis=(1, 2))
        mx = jnp.max(x, axis=(1, 2))
        channel_gate = jax.nn.sigmoid(mlp(avg) + mlp(mx))  # (n, c)

        spatial_w = self.param(
            "spatial_conv", nn.initializers.lecun_normal(), (7, 7, 2, 1), jnp.float32)
        if self.use_pallas:
            # One fused pass applies BOTH gates (channel + spatial): the
            # standalone channel-gate multiply's read+write of x-sized HBM
            # traffic disappears (ops/pallas/cbam.py).
            from adam_dehaze_tpu.ops.pallas.cbam import channel_spatial_gate
            return channel_spatial_gate(x, channel_gate,
                                        spatial_w.astype(self.dtype))
        x = x * channel_gate[:, None, None, :]
        stats = jnp.stack(
            [jnp.mean(x, axis=-1), jnp.max(x, axis=-1)], axis=-1)
        gate = jax.lax.conv_general_dilated(
            stats.astype(self.dtype), spatial_w.astype(self.dtype),
            window_strides=(1, 1), padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return x * jax.nn.sigmoid(gate)


class _SubpixelConvTranspose4x4(nn.Module):
    """Exact sub-pixel rewrite of ConvTranspose(4x4, stride 2, lax pad (2,2)).

    XLA lowers a stride-2 transposed conv to a conv over the 2x-input-dilated
    activation: >=75% of the MACs multiply inserted zeros, so the op runs far
    below MXU peak. Algebraically, each of the 4 output phases (a, b in
    {0, 1}) is a stride-1 2x2 correlation of the raw input:

        y[2m+a, 2n+b] = sum_{i,j} W[2i+1-a, 2j+1-b] . x[m+i, n+j]

    so the whole op is ONE dense conv with a (2, 2, cin, 4*cout) kernel
    (phase sub-kernels W[a::2, b::2]; flax's ConvTranspose applies the
    FLIPPED kernel, verified by impulse response) over the (1,1)-padded
    input, followed by per-phase shifted slices and a pixel-shuffle
    rearrange — identical output, 4x fewer MACs issued, MXU-friendly
    contraction (4*cin). Param tree matches nn.ConvTranspose exactly
    (kernel (4, 4, cin, cout) + bias), so checkpoints and the torch
    converters are unaffected.
    """
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (4, 4, cin, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features,), jnp.float32)
        # y[2p+a, 2q+b] = sum_{i,j} W[2i+a, 2j+b] . xpad[p+i+a? ...] — the
        # a=0 phase windows (x[p-1], x[p]) and a=1 windows (x[p], x[p+1])
        # are both 2-tap windows of the (1,1)-padded input at starts p and
        # p+1, so one conv over the padded input covers all four phases.
        phases = [w[a::2, b::2] for a in (0, 1) for b in (0, 1)]
        k2 = jnp.concatenate(phases, axis=-1)          # (2, 2, cin, 4*cout)
        yb = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k2.astype(self.dtype),
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (n, h+1, w+1, 4c)
        n, h, wd = x.shape[:3]
        co = self.features
        ph = [yb[:, a:a + h, b:b + wd, i * co:(i + 1) * co]
              for i, (a, b) in enumerate(
                  ((0, 0), (0, 1), (1, 0), (1, 1)))]
        y = jnp.stack(ph, axis=3).reshape(n, h, wd, 2, 2, co)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * wd, co)
        return y + b.astype(self.dtype)


class UpBlock(nn.Module):
    """ConvTranspose(4x4, stride 2, pad 1) -> BN -> ReLU: exact 2x upsample
    (reference: base_model.py:144-149).

    `subpixel=True` (default) computes the transposed conv via the exact
    sub-pixel decomposition above; `False` keeps the literal
    nn.ConvTranspose lowering (equivalence is regression-tested)."""
    features: int
    dtype: Dtype = jnp.float32
    subpixel: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        # lax pad = k - 1 - torch_pad = 2 reproduces torch
        # ConvTranspose2d(kernel=4, stride=2, padding=1): exact 2x upsample.
        # Bias kept despite the following BN for exact param parity with
        # torch ConvTranspose2d defaults (reference: base_model.py:146).
        if self.subpixel:
            x = _SubpixelConvTranspose4x4(
                self.features, dtype=self.dtype, name="ConvTranspose_0")(x)
        else:
            x = nn.ConvTranspose(
                self.features, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)),
                use_bias=True, dtype=self.dtype, param_dtype=jnp.float32,
            )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32)(x)
        return nn.relu(x)


def resize_bilinear(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Bilinear resize to (H, W), half-pixel centers (align_corners=False)."""
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, size[0], size[1], c), method="bilinear")


def resize_bilinear_align_corners(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Bilinear resize with align_corners=True grid mapping
    (out_i -> i * (in-1)/(out-1)) — torch nn.UpsamplingBilinear2d semantics
    (reference: medium_intensity.py:146,151, high_intensity.py:169,171).
    Static gathers + two lerps; jax.image.resize has no align-corners mode."""
    h, w = x.shape[1:3]
    oh, ow = size

    def axis(in_len: int, out_len: int):
        if out_len == 1:
            pos = jnp.zeros((1,), jnp.float32)
        else:
            pos = jnp.arange(out_len, dtype=jnp.float32) * (
                (in_len - 1) / (out_len - 1))
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, in_len - 1)
        return lo, hi, (pos - lo).astype(x.dtype)

    ylo, yhi, yf = axis(h, oh)
    xlo, xhi, xf = axis(w, ow)
    rows = (x[:, ylo] * (1.0 - yf)[None, :, None, None]
            + x[:, yhi] * yf[None, :, None, None])
    return (rows[:, :, xlo] * (1.0 - xf)[None, None, :, None]
            + rows[:, :, xhi] * xf[None, None, :, None])


# Remat twins (see remat_twin): identical parameter trees to the plain
# classes; interiors recompute in the backward pass. Branch models select
# these for their FULL-RESOLUTION block instances under tpu.remat=fullres.
ConvBlockR = remat_twin(ConvBlock)
ResidualBlockR = remat_twin(ResidualBlock)
AttentionBlockR = remat_twin(AttentionBlock)
UpBlockR = remat_twin(UpBlock)
