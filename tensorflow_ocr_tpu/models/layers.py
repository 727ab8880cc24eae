"""Shared layers: slim-style conv+BN+relu, explicit-pad strided conv, unpool.

TPU notes: convs run in bfloat16 (MXU) with float32 params and float32
BatchNorm statistics; ``unpool`` is the reference's 2x bilinear resize
(/root/reference/nets/model.py:14-15).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# ImageNet channel means, reference nets/model.py:18 (RGB order).
IMAGENET_MEANS = (123.68, 116.78, 103.94)

# Route 1x1 convs through dot_general (PointwiseConv) instead of nn.Conv.
# Measured on v5e @512x512 b32: the dot path makes the matmuls themselves
# faster but XLA inserts ~9.5 ms/step of layout copies at every conv<->dot
# boundary (conv layouts are {3,0,2,1}-tiled, dots want row-major), a net
# -8% step time. Kept as an experiment toggle; default off.
POINTWISE_DOT = False

# Route supported convs through the bare Pallas kernels
# (ops/pallas_conv.py). The kernels beat XLA's conv emitters up to 3.4x
# in isolation, but swapping them in WITHOUT the fused BN/relu dataflow
# regresses the full step 74->132 ms: XLA loses its conv+BN-stat
# fusions, pads/copies materialize, relu stops fusing. Default OFF;
# the integrated win ships via the fused bottleneck path
# (ops/pallas_fused.py), not this flag.
PALLAS_CONVS: bool | None = False


def _pallas_convs_enabled() -> bool:
    if PALLAS_CONVS is not None:
        return PALLAS_CONVS
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


class Conv2D(nn.Module):
    """nn.Conv-compatible conv that dispatches hot shapes to Pallas.

    Parameter tree is identical to nn.Conv ('kernel' (kh,kw,ci,co) +
    optional 'bias'), so checkpoints and the slim importer see no
    difference. Falls back to lax.conv_general_dilated for shapes the
    Pallas path does not cover (stride-2 3x3, dilations, odd tilings) and
    on CPU.
    """

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    # Space-to-depth rewrite of a strided conv (the standard TPU ResNet
    # root transform): a kh x kw / 2 conv on (H, W, C) becomes an
    # equivalent ceil((kh+1)/2) x ceil((kw+1)/2) / 1 conv on the 2x2
    # space-to-depth input (H/2, W/2, 4C), with the kernel rearranged at
    # trace time. The PARAMETER stays (kh, kw, C, Co), so checkpoints and
    # the slim importer are unaffected. Densifies the C=3 root conv
    # (3/128 MXU lanes -> 12) and quarters the spatial extent of the
    # largest conv input. Only used when strides == (2, 2) and H, W even.
    space_to_depth: bool = False

    def _s2d_conv(self, x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
        """Equivalent stride-1 conv on the 2x2 space-to-depth input.

        Derivation for the 7x7/2 root (pad 3/3): out[i,j] sums input rows
        2i-3..2i+3; embed the kernel in an 8x8 grid covering rows
        2i-4..2i+3 (w8[1:,1:] = w), which is exactly 4 consecutive 2-row
        blocks -> a 4x4 stride-1 conv over blocks with pad (2,1).
        """
        n, h, w, c = x.shape
        kh, kw = self.kernel
        co = self.features
        # pad kernel to even extents aligned to block boundaries
        ph, pw = (2 - kh % 2) % 2, (2 - kw % 2) % 2
        w8 = jnp.pad(kernel, ((ph, 0), (pw, 0), (0, 0), (0, 0)))
        bh, bw = (kh + ph) // 2, (kw + pw) // 2
        w4 = w8.reshape(bh, 2, bw, 2, c, co).transpose(0, 2, 1, 3, 4, 5)
        w4 = w4.reshape(bh, bw, 4 * c, co)
        x2 = x.reshape(n, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        x2 = x2.reshape(n, h // 2, w // 2, 4 * c)
        (pb_h, _), (pb_w, _) = self.padding
        # block-row padding: begin covers offset -(pb_h+ph)/2 blocks
        pad = (((pb_h + ph) // 2, (kh - 1 - pb_h) // 2),
               ((pb_w + pw) // 2, (kw - 1 - pb_w) // 2))
        return jax.lax.conv_general_dilated(
            x2, w4.astype(self.dtype), (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype,
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray, out_scale=None,
                 out_shift=None) -> jnp.ndarray:
        """out_scale/out_shift: optional per-output-channel affine FOLDED
        into the kernel (w' = w * scale, + shift after the conv) — used by
        ConvBN to fold frozen/running-stats BatchNorm into the conv so
        conv+BN+relu lower as one fusion (PERF.md §4.2: the materialized
        affine was 13 ms/step of the frozen-BN train step)."""
        cin = x.shape[-1]
        kh, kw = self.kernel
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, cin, self.features), jnp.float32,
        )
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
        if out_scale is not None:
            kernel = kernel * out_scale  # f32, broadcast over (kh,kw,ci,·)
        from tensorflow_ocr_tpu.ops import pallas_conv as PC

        xc = x.astype(self.dtype)
        wc = kernel.astype(self.dtype)
        if (self.space_to_depth and self.strides == (2, 2)
                and self.dilation == (1, 1)
                and not isinstance(self.padding, str)
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
            y = self._s2d_conv(xc, kernel)
        elif (_pallas_convs_enabled()
                and self.padding == "SAME"
                and PC.supported(x.shape, (kh, kw), self.strides,
                                 self.dilation, self.features)):
            y = PC.conv2d(xc, wc, self.strides)
        else:
            y = jax.lax.conv_general_dilated(
                xc, wc, self.strides, self.padding,
                rhs_dilation=self.dilation,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=self.dtype,
            )
        if bias is not None:
            y = y + bias.astype(self.dtype)
        if out_shift is not None:
            y = y + out_shift.astype(self.dtype)
        return y


def mean_image_subtraction(images: jnp.ndarray,
                           means: Sequence[float] = IMAGENET_MEANS) -> jnp.ndarray:
    """Reference nets/model.py:18-31."""
    m = jnp.asarray(means, images.dtype).reshape(1, 1, 1, len(means))
    return images - m


def unpool(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample (reference nets/model.py:14-15).

    Uses half-pixel-center bilinear (jax.image default). TF1.4's
    resize_bilinear used legacy corner-aligned scaling; the half-pixel
    variant is the modern, XLA-fusable choice and changes activations by
    <1px of spatial phase — documented deviation.
    """
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")


# Equality-mask 3x3/2 maxpool backward (the ResNet stem pool,
# resnet_v1.py:197). XLA lowers max-pool grad as SelectAndScatter (2.2
# ms/step of the frozen-BN train step, PERF.md); this custom VJP
# recomputes the routing with strided equality masks instead:
# dX[i] = sum over the <=9 windows containing i of dY[p]*(X[i]==Y[p]).
# MEASURED NEGATIVE on TPU v5e (PERF.md §4.3): 91.9 vs 72.9 ms/step
# batch-BN, 76.4 vs 57.4 frozen — the 9 strided pad/accumulate passes
# cost ~4x more HBM traffic than SelectAndScatter's inefficiency. Kept
# as a tested opt-in (OCR_FAST_MAXPOOL=1), default OFF. Subgradient
# note: on tied maxima the window's gradient is SPLIT EQUALLY among the
# tied elements (normalized by per-window tie count), where
# SelectAndScatter routes it all to the first; both are valid
# subgradients of max — an unnormalized equality mask would NOT be (it
# hands each tie the full gradient, summing to >1x, and ties are
# pervasive on post-relu zero plateaus).
def _fast_maxpool_enabled() -> bool:
    import os

    return os.environ.get("OCR_FAST_MAXPOOL", "0") in ("1", "true", "on")


@jax.custom_vjp
def max_pool_3x3s2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")


def _mp_fwd(x):
    y = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
    return y, (x, y)


def _mp_window_slices(x, y, pb_h, pb_w):
    """Yield, for each of the 9 window offsets, the aligned strided
    x-slice and the matching (p0, q0, nh, nw) output-window region."""
    n, h, w, c = x.shape
    ho, wo = y.shape[1], y.shape[2]
    for di in range(3):
        for dj in range(3):
            # input row index i = 2p + di - pb_h for output row p
            i0, j0 = di - pb_h, dj - pb_w
            p0 = max(0, -(i0 // 2)) if i0 < 0 else 0
            q0 = max(0, -(j0 // 2)) if j0 < 0 else 0
            i_start, j_start = 2 * p0 + i0, 2 * q0 + j0
            if i_start >= h or j_start >= w:
                continue
            nh = min(ho - p0, (h - i_start + 1) // 2)
            nw = min(wo - q0, (w - j_start + 1) // 2)
            if nh <= 0 or nw <= 0:
                continue
            xs = jax.lax.slice(
                x, (0, i_start, j_start, 0),
                (n, i_start + 2 * (nh - 1) + 1, j_start + 2 * (nw - 1) + 1,
                 c), (1, 2, 2, 1))
            yield xs, (i_start, j_start, p0, q0, nh, nw)


def _mp_bwd(res, g):
    x, y = res
    n, h, w, c = x.shape
    # SAME for k=3,s=2: pad_beg = 0 if dim even else 1 (TF convention:
    # pad_total = max((o-1)*2+3-d, 0), beg = pad_total//2).
    pb_h = 0 if h % 2 == 0 else 1
    pb_w = 0 if w % 2 == 0 else 1
    g = g.astype(x.dtype)
    # Pass 1: per-window tie count (>=1 everywhere: the max is attained),
    # so tied maxima SPLIT the gradient instead of each taking all of it.
    counts = jnp.zeros(y.shape, x.dtype)
    for xs, (_, _, p0, q0, nh, nw) in _mp_window_slices(x, y, pb_h, pb_w):
        ys = jax.lax.slice(y, (0, p0, q0, 0), (n, p0 + nh, q0 + nw, c))
        counts = counts.at[:, p0:p0 + nh, q0:q0 + nw, :].add(
            (xs == ys).astype(x.dtype))
    g = g / counts
    # Pass 2: route the normalized gradient to the arg-max elements.
    dx = jnp.zeros_like(x)
    for xs, (i_start, j_start, p0, q0, nh, nw) in _mp_window_slices(
            x, y, pb_h, pb_w):
        ys = jax.lax.slice(y, (0, p0, q0, 0), (n, p0 + nh, q0 + nw, c))
        gs = jax.lax.slice(g, (0, p0, q0, 0), (n, p0 + nh, q0 + nw, c))
        contrib = jnp.where(xs == ys, gs, jnp.zeros_like(gs))
        dx = dx.at[:, i_start:i_start + 2 * nh:2,
                   j_start:j_start + 2 * nw:2, :].add(contrib)
    return (dx,)


max_pool_3x3s2.defvjp(_mp_fwd, _mp_bwd)


def stem_max_pool(x: jnp.ndarray) -> jnp.ndarray:
    """The ResNet stem 3x3/2 SAME maxpool; OCR_FAST_MAXPOOL=1 opts into
    the equality-mask VJP (measured negative on v5e, PERF.md §4.3)."""
    if _fast_maxpool_enabled():
        return max_pool_3x3s2(x)
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")


class PointwiseConv(nn.Module):
    """1x1 convolution expressed as a dot_general.

    XLA's TPU convolution emitters tile 1x1 convs spatially
    (EmitAllBatchInSublanes), which profiles at 10-30x off the matmul
    roofline for the backward pass (dW is a plain [C_in, N*H*W] x
    [N*H*W, C_out] contraction). Lowering to dot_general routes both
    forward and backward through the MXU matmul path. Parameters keep
    nn.Conv's exact name and shape ((1, 1, C_in, C_out) 'kernel') so
    checkpoints and the slim importer are unaffected.
    """

    features: int
    strides: Tuple[int, int] = (1, 1)
    use_bias: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, cin, self.features),
            jnp.float32,
        )
        if self.strides != (1, 1):
            x = x[:, :: self.strides[0], :: self.strides[1], :]
        y = jax.lax.dot_general(
            x.astype(self.dtype),
            kernel[0, 0].astype(self.dtype),
            dimension_numbers=(((3,), (0,)), ((), ())),
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(self.dtype)
        return y


class BNParams(nn.Module):
    """nn.BatchNorm's exact variable tree (params scale/bias + batch_stats
    mean/var, same initializers) WITHOUT the elementwise computation.
    ConvBN's folded path reads these to bake the running-stats affine into
    the conv kernel; the train path's nn.BatchNorm under the same child
    name sees the identical tree."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32))
        return scale, bias, mean.value, var.value


class ConvBN(nn.Module):
    """slim.conv2d with BN+ReLU defaults (reference nets/model.py:100-104).

    BN decay 0.997 / eps 1e-5 / scale=True matches
    reference nets/model.py:94-99 & resnet_utils.py:209-254.

    When BN runs on running statistics (train=False: inference, or the
    freeze_bn fine-tune recipe), the affine is FOLDED into the conv
    kernel (w' = w·γ/√(σ²+ε), shift = β−μ·γ/√(σ²+ε)) so conv+BN+relu
    lower as a single fusion. Exact (the affine is linear in the conv
    output) and tree-identical; gradients flow through the fold to the
    same parameters. Measured: removes the 13 ms/step multiply_add pass
    of the frozen-BN train step (PERF.md §4.2).
    """

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    use_bn: bool = True
    activation: Optional[Any] = nn.relu
    explicit_pad: bool = False  # conv2d_same semantics for stride>1
    space_to_depth: bool = False  # see Conv2D.space_to_depth
    dtype: Any = jnp.bfloat16
    bn_momentum: float = 0.997
    bn_epsilon: float = 1e-5
    # BN compute dtype. bf16 keeps the conv->BN->relu chain fusable and
    # halves activation HBM traffic; running stats stay f32 via param_dtype.
    bn_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kh, kw = self.kernel
        fold_bn = self.use_bn and not train and not POINTWISE_DOT
        if fold_bn:
            scale, bn_bias, mean, var = BNParams(
                self.features, name="BatchNorm_0")()
            mul = scale * jax.lax.rsqrt(var + self.bn_epsilon)
            shift = bn_bias - mean * mul
            padding: Any = "SAME"
            if self.explicit_pad and (self.strides[0] > 1
                                      or self.strides[1] > 1):
                pad_beg = ((kh - 1) // 2, (kw - 1) // 2)
                pad_end = (kh // 2, kw // 2)
                padding = ((pad_beg[0], pad_end[0]),
                           (pad_beg[1], pad_end[1]))
            x = Conv2D(
                self.features, self.kernel, strides=self.strides,
                padding=padding, dilation=self.dilation, use_bias=False,
                dtype=self.dtype, space_to_depth=self.space_to_depth,
                name="Conv_0",
            )(x, out_scale=mul, out_shift=shift)
            if self.activation is not None:
                x = self.activation(x)
            return x
        if POINTWISE_DOT and (kh, kw) == (1, 1) and self.dilation == (1, 1):
            # dot_general path: the TPU conv emitters are far off the matmul
            # roofline for pointwise convs (see PointwiseConv). Param tree
            # path stays 'Conv_0/kernel' with the conv kernel shape.
            x = PointwiseConv(
                self.features, strides=self.strides,
                use_bias=not self.use_bn, dtype=self.dtype, name="Conv_0",
            )(x)
        else:
            padding: Any = "SAME"
            if self.explicit_pad and (self.strides[0] > 1 or self.strides[1] > 1):
                # resnet_utils.conv2d_same (reference nets/resnet_utils.py:
                # 77-123): fixed (k-1)//2 / k//2 padding + VALID,
                # stride-independent.
                pad_beg = ((kh - 1) // 2, (kw - 1) // 2)
                pad_end = (kh // 2, kw // 2)
                padding = ((pad_beg[0], pad_end[0]), (pad_beg[1], pad_end[1]))
            x = Conv2D(
                self.features,
                self.kernel,
                strides=self.strides,
                padding=padding,
                dilation=self.dilation,
                use_bias=not self.use_bn,
                dtype=self.dtype,
                space_to_depth=self.space_to_depth,
                name="Conv_0",
            )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=self.bn_epsilon,
                use_scale=True,
                use_bias=True,
                dtype=self.bn_dtype,
                param_dtype=jnp.float32,
            )(x)
            x = x.astype(self.dtype)
        if self.activation is not None:
            x = self.activation(x)
        return x
