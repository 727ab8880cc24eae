"""ResNet-v1 backbones (50/101/152/200) exporting the FCN feature pyramid.

Flax rebuild of the reference's slim fork (/root/reference/nets/resnet_v1.py,
nets/resnet_utils.py): classification head removed, ``pool2..pool5``
(stride 4/8/16/32) exported for the detection heads
(resnet_v1.py:196,210-216). Structure notes preserved from the reference:

- root block: 7x7/2 conv with conv2d_same explicit padding
  (resnet_utils.py:77-123) + 3x3/2 SAME max-pool; its output is ``pool2``.
- bottleneck units are slim-v1 style (resnet_v1.py:67-111): 1x1 -> 3x3
  (stride here) -> 1x1, projection shortcut on depth change, ReLU after add.
- strides sit on the LAST unit of each block (resnet_v1.py:246-255),
  so block1/2/3 end at stride 8/16/32 and block4 keeps stride 32.
- BN decay 0.997, eps 1e-5, scale=True (resnet_utils.py:209-254).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tensorflow_ocr_tpu.models.layers import ConvBN, stem_max_pool

# Fused Pallas bottleneck path (ops/pallas_fused.py): conv kernels with
# the previous BatchNorm+relu applied as a VMEM prologue and this conv's
# BN statistics accumulated as an epilogue. Opt-in (OCR_FUSED_BOTTLENECKS=1
# or set this to True): measured 377 vs 443 img/s/chip against XLA's
# lowering at b32/512 — the per-op custom-VJP dataflow is HBM-bound on
# the same algorithmic traffic, so it does not yet beat the fused XLA
# pipeline it replaces (see DESIGN.md "fused bottleneck path").
FUSED_BOTTLENECKS: bool | None = None


def _fused_enabled() -> bool:
    import os

    env = os.environ.get("OCR_FUSED_BOTTLENECKS")
    if env is not None:
        return env not in ("0", "false", "off")
    if FUSED_BOTTLENECKS is not None:
        return FUSED_BOTTLENECKS
    return False


class _Kernel(nn.Module):
    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape, jnp.float32
        )


class _BNVars(nn.Module):
    features: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32),
        )
        var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32),
        )
        return scale, bias, mean, var


class _ConvBNParams(nn.Module):
    """Parameter container matching ConvBN's tree exactly
    (<name>/Conv_0/kernel + <name>/BatchNorm_0/{scale,bias} and
    batch_stats mean/var), without computing anything itself."""

    cin: int
    cout: int
    kh: int = 1
    kw: int = 1

    @nn.compact
    def __call__(self):
        kernel = _Kernel((self.kh, self.kw, self.cin, self.cout),
                         name="Conv_0")()
        scale, bias, mean, var = _BNVars(self.cout, name="BatchNorm_0")()
        return kernel, scale, bias, mean, var


class FusedBottleneck(nn.Module):
    """Stride-1 bottleneck on the fused Pallas path (ops/pallas_fused.py).

    Dataflow keeps RAW conv outputs in HBM; each kernel applies the
    previous BN+relu as a prologue and emits its own BN statistics as an
    epilogue. The unit boundary (BN3 affine + residual add + relu) is one
    fused XLA elementwise pass. Parameter tree identical to Bottleneck.
    """

    depth: int
    depth_bottleneck: int
    dtype: Any = jnp.bfloat16
    bn_momentum: float = 0.997
    bn_epsilon: float = 1e-5

    def _affine(self, stats, count, scale, bias, mean_v, var_v, train):
        """(a, b) per channel from batch stats (train) or running stats."""
        if train:
            mu = stats[0] / count
            var = jnp.maximum(stats[1] / count - mu * mu, 0.0)
            if not self.is_initializing():
                m = self.bn_momentum
                mean_v.value = m * mean_v.value + (1 - m) * mu
                var_v.value = m * var_v.value + (1 - m) * var
        else:
            mu, var = mean_v.value, var_v.value
        r = jax.lax.rsqrt(var + self.bn_epsilon)
        a = scale * r
        b = bias - mu * a
        return jnp.stack([a, b])

    @nn.compact
    def __call__(self, o: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from tensorflow_ocr_tpu.ops import pallas_fused as PF

        depth_in = o.shape[-1]
        db, depth = self.depth_bottleneck, self.depth
        n, h, wd, _ = o.shape
        count = float(n * h * wd)

        k1, g1, be1, m1, v1 = _ConvBNParams(depth_in, db, name="conv1")()
        k2, g2, be2, m2, v2 = _ConvBNParams(db, db, 3, 3, name="conv2")()
        k3, g3, be3, m3, v3 = _ConvBNParams(db, depth, name="conv3")()

        dt = self.dtype
        o = o.astype(dt)
        ident = jnp.stack([jnp.ones((depth_in,), jnp.float32),
                           jnp.zeros((depth_in,), jnp.float32)])

        bm1 = PF.pick_bm(n * h * wd, depth_in, db)
        z1, s1 = PF.fused_conv1x1(o, ident, k1[0, 0].astype(dt), bm1)
        ab1 = self._affine(s1, count, g1, be1, m1, v1, train)

        th = PF.pick_th(h, wd, db, db)
        z2, s2 = PF.fused_conv3x3(z1, ab1, k2.reshape(9 * db, db).astype(dt), th)
        ab2 = self._affine(s2, count, g2, be2, m2, v2, train)

        bm3 = PF.pick_bm(n * h * wd, db, depth)
        z3, s3 = PF.fused_conv1x1(z2, ab2, k3[0, 0].astype(dt), bm3)
        ab3 = self._affine(s3, count, g3, be3, m3, v3, train)

        if depth_in != depth:
            ks, gs, bes, ms, vs = _ConvBNParams(depth_in, depth,
                                                name="shortcut")()
            bms = PF.pick_bm(n * h * wd, depth_in, depth)
            zs, ss = PF.fused_conv1x1(o, ident, ks[0, 0].astype(dt), bms)
            abs_ = self._affine(ss, count, gs, bes, ms, vs, train)
        else:
            zs, abs_ = o, jnp.stack(
                [jnp.ones((depth,), jnp.float32),
                 jnp.zeros((depth,), jnp.float32)])

        return PF.fused_boundary(z3, ab3, zs, abs_)

    @staticmethod
    def supported(o_shape, depth: int, depth_bottleneck: int) -> bool:
        from tensorflow_ocr_tpu.ops import pallas_fused as PF

        n, h, wd, cin = o_shape
        db = depth_bottleneck
        return (PF.supported(o_shape, (1, 1), db)
                and PF.supported((n, h, wd, db), (3, 3), db)
                and PF.supported((n, h, wd, db), (1, 1), depth)
                and PF.supported(o_shape, (1, 1), depth))

# Unit-fused ghost-BN path (ops/pallas_unit.py). Set by config
# (ModelConfig.bottleneck_impl="ghost") or OCR_GHOST_UNITS=1.
GHOST_BOTTLENECKS: bool = False


def _ghost_enabled() -> bool:
    import os

    env = os.environ.get("OCR_GHOST_UNITS")
    if env is not None:
        return env not in ("0", "false", "off")
    return GHOST_BOTTLENECKS


def set_bottleneck_impl(impl: str) -> None:
    """Select the ResNet bottleneck implementation: xla|fused|ghost."""
    global FUSED_BOTTLENECKS, GHOST_BOTTLENECKS
    if impl not in ("xla", "fused", "ghost"):
        raise ValueError(f"unknown bottleneck_impl {impl!r}")
    FUSED_BOTTLENECKS = impl == "fused"
    GHOST_BOTTLENECKS = impl == "ghost"


class GhostBottleneck(nn.Module):
    """Stride-1 bottleneck on the unit-fused ghost-BN path
    (ops/pallas_unit.py): the whole conv1-bn-conv2-bn-conv3-bn-residual
    unit runs band-local in one Pallas kernel per (image, row band),
    with per-(image, band) ghost statistics (Hoffer et al., 2017).

    Training uses the fused kernel; eval applies the running-stats
    affine through plain XLA ops (BN is a constant affine there).
    Parameter tree identical to Bottleneck.
    """

    depth: int
    depth_bottleneck: int
    dtype: Any = jnp.bfloat16
    bn_momentum: float = 0.997
    bn_epsilon: float = 1e-5

    @nn.compact
    def __call__(self, o: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from tensorflow_ocr_tpu.ops import pallas_unit as PU

        depth_in = o.shape[-1]
        db, depth = self.depth_bottleneck, self.depth
        n, h, wd, _ = o.shape
        proj = depth_in != depth
        dt = self.dtype

        k1, g1, be1, m1, v1 = _ConvBNParams(depth_in, db, name="conv1")()
        k2, g2, be2, m2, v2 = _ConvBNParams(db, db, 3, 3, name="conv2")()
        k3, g3, be3, m3, v3 = _ConvBNParams(db, depth, name="conv3")()
        if proj:
            ks, gs, bes, ms, vs = _ConvBNParams(depth_in, depth,
                                                name="shortcut")()

        o = o.astype(dt)
        w1 = k1[0, 0].astype(dt)
        w2 = k2.reshape(9 * db, db).astype(dt)
        w3 = k3[0, 0].astype(dt)

        if train:
            gh = PU.pick_gh(h, wd, depth_in, db, depth, proj=proj)
            gb1 = jnp.stack([g1, be1])
            gb2 = jnp.stack([g2, be2])
            gb3 = jnp.stack([g3, be3])
            if proj:
                out, s1, s2, s3, ss = PU.ghost_unit_proj(
                    o, w1, gb1, w2, gb2, w3, gb3, ks[0, 0].astype(dt),
                    jnp.stack([gs, bes]), gh, self.bn_epsilon)
            else:
                out, s1, s2, s3 = PU.ghost_unit_id(
                    o, w1, gb1, w2, gb2, w3, gb3, gh, self.bn_epsilon)
            if not self.is_initializing():
                cnt = float(n * h * wd)
                mom = self.bn_momentum

                def upd(mean_v, var_v, s):
                    s = jax.lax.stop_gradient(s)
                    mu = s[0] / cnt
                    var = jnp.maximum(s[1] / cnt - mu * mu, 0.0)
                    mean_v.value = mom * mean_v.value + (1 - mom) * mu
                    var_v.value = mom * var_v.value + (1 - mom) * var

                upd(m1, v1, s1)
                upd(m2, v2, s2)
                upd(m3, v3, s3)
                if proj:
                    upd(ms, vs, ss)
            return out

        # eval: running-stats affine, plain XLA (fuses fine)
        def aff(scale, bias, mean_v, var_v):
            r = jax.lax.rsqrt(var_v.value + self.bn_epsilon)
            a = scale * r
            return a, bias - mean_v.value * a

        def conv3x3(x, w):
            return jax.lax.conv_general_dilated(
                x, w.reshape(3, 3, db, db).astype(x.dtype), (1, 1),
                "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

        f32 = jnp.float32
        a1, b1 = aff(g1, be1, m1, v1)
        z1 = jnp.einsum("nhwc,cd->nhwd", o, w1)
        act1 = jnp.maximum(z1.astype(f32) * a1 + b1, 0.0).astype(dt)
        a2, b2 = aff(g2, be2, m2, v2)
        z2 = conv3x3(act1, k2)
        act2 = jnp.maximum(z2.astype(f32) * a2 + b2, 0.0).astype(dt)
        a3, b3 = aff(g3, be3, m3, v3)
        z3 = jnp.einsum("nhwc,cd->nhwd", act2, w3)
        if proj:
            as_, bs = aff(gs, bes, ms, vs)
            zs = jnp.einsum("nhwc,cd->nhwd", o, ks[0, 0].astype(dt))
            sc = zs.astype(f32) * as_ + bs
        else:
            sc = o.astype(f32)
        out = jnp.maximum(z3.astype(f32) * a3 + b3 + sc, 0.0)
        return out.astype(dt)

    @staticmethod
    def supported(o_shape, depth: int, depth_bottleneck: int) -> bool:
        from tensorflow_ocr_tpu.ops import pallas_unit as PU

        n, h, wd, cin = o_shape
        return PU.pick_gh(h, wd, cin, depth_bottleneck, depth,
                          proj=cin != depth) is not None


# (num_units,) per block for each variant (reference resnet_v1.py:237-344).
RESNET_UNITS = {
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
    200: (3, 24, 36, 3),
}


class Bottleneck(nn.Module):
    """slim resnet_v1 bottleneck (reference nets/resnet_v1.py:67-111).

    ``rate`` is the atrous rate applied to the 3x3 conv when an
    ``output_stride`` cap has converted further striding into dilation
    (reference nets/resnet_utils.py:125-206 stack_blocks_dense).
    """

    depth: int            # output channels
    depth_bottleneck: int
    stride: int
    rate: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        depth_in = x.shape[-1]
        if depth_in == self.depth:
            # subsample identity (resnet_utils.py:59-74)
            shortcut = x[:, :: self.stride, :: self.stride, :] if self.stride > 1 else x
        else:
            shortcut = ConvBN(
                self.depth, (1, 1), (self.stride, self.stride),
                activation=None, dtype=self.dtype, name="shortcut",
            )(x, train)
        y = ConvBN(self.depth_bottleneck, (1, 1), dtype=self.dtype, name="conv1")(x, train)
        y = ConvBN(
            self.depth_bottleneck, (3, 3), (self.stride, self.stride),
            dilation=(self.rate, self.rate),
            explicit_pad=True, dtype=self.dtype, name="conv2",
        )(y, train)
        y = ConvBN(self.depth, (1, 1), activation=None, dtype=self.dtype, name="conv3")(y, train)
        return nn.relu(shortcut + y)


class ResNetV1(nn.Module):
    """Backbone returning the pool2..pool5 pyramid dict.

    ``output_stride`` caps the total subsampling (relative to the input)
    with slim's stack_blocks_dense semantics (reference
    nets/resnet_utils.py:125-206, resnet_v1.py:183-186): once the
    accumulated stride hits the cap, later units run at stride 1 with
    their 3x3 convs dilated by the accumulated rate.
    """

    units: Sequence[int] = RESNET_UNITS[50]
    dtype: Any = jnp.bfloat16
    output_stride: int | None = None
    # Space-to-depth rewrite of the 7x7/2 root conv (layers.Conv2D
    # docstring). None = env OCR_S2D_STEM, default OFF: mathematically
    # equivalent (tests/test_s2d_stem.py) but measured 430 vs 439
    # img/s/chip at b32/512 on v5e — the materialized input
    # reshape/transpose costs more than the denser root conv saves
    # (PERF.md §4.1). Parameter tree unchanged either way.
    s2d_stem: bool | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        import os

        ep: Dict[str, jnp.ndarray] = {}
        s2d = self.s2d_stem
        if s2d is None:
            s2d = os.environ.get("OCR_S2D_STEM", "0") not in (
                "0", "false", "off")
        # root (resnet_v1.py:188-196). relu and max-pool commute (relu is
        # monotone, so maxpool(relu(z)) == relu(maxpool(z)) exactly, values
        # AND subgradients); pooling FIRST moves the stem relu pass and its
        # backward mask from the 256^2 map to the 4x smaller pooled map.
        # Measured A/B (bench.py, b32/512, PERF.md §4.7): frozen-BN
        # 573.6 -> 587.1 img/s (+2.4%) but batch-BN 444.3 -> 436.1
        # (-1.8%, the split BN-stats/relu fusion costs more than the
        # smaller relu saves), so the default follows the same switch as
        # the BN fold: pool-first when train=False (freeze_bn fine-tune +
        # every inference path), reference order when train=True.
        # OCR_POOL_BEFORE_RELU=0/1 forces either arm for A/Bs.
        env = os.environ.get("OCR_POOL_BEFORE_RELU", "auto")
        pool_first = (not train) if env in ("auto", "") else env in (
            "1", "true", "on")
        x = ConvBN(64, (7, 7), (2, 2), explicit_pad=True, dtype=self.dtype,
                   space_to_depth=s2d,
                   activation=None if pool_first else nn.relu,
                   name="conv1")(x, train)
        x = stem_max_pool(x)
        if pool_first:
            x = nn.relu(x)
        ep["pool2"] = x

        target = None
        if self.output_stride is not None:
            if self.output_stride % 4 or self.output_stride < 4:
                raise ValueError("output_stride must be a multiple of 4")
            # the root stack already subsampled by 4 (resnet_v1.py:183-186)
            target = self.output_stride // 4

        base_depths = (256, 512, 1024, 2048)
        bottlenecks = (64, 128, 256, 512)
        fused = _fused_enabled()
        ghost = _ghost_enabled()
        current, rate = 1, 1
        for b, (n_units, depth, depth_b) in enumerate(
            zip(self.units, base_depths, bottlenecks)
        ):
            for u in range(n_units):
                # stride 2 on the last unit of blocks 1-3 (resnet_v1.py:246-255)
                stride = 2 if (u == n_units - 1 and b < 3) else 1
                unit_rate = 1
                if target is not None and current == target:
                    # atrous from here on (resnet_utils.py:183-199)
                    unit_rate, rate = rate, rate * stride
                    stride = 1
                else:
                    current *= stride
                name = f"block{b + 1}_unit{u + 1}"
                if (ghost and stride == 1 and unit_rate == 1
                        and GhostBottleneck.supported(x.shape, depth,
                                                      depth_b)):
                    x = GhostBottleneck(
                        depth, depth_b, dtype=self.dtype, name=name,
                    )(x, train)
                elif (fused and stride == 1 and unit_rate == 1
                        and FusedBottleneck.supported(x.shape, depth, depth_b)):
                    x = FusedBottleneck(
                        depth, depth_b, dtype=self.dtype, name=name,
                    )(x, train)
                else:
                    x = Bottleneck(
                        depth, depth_b, stride, rate=unit_rate,
                        dtype=self.dtype, name=name,
                    )(x, train)
            if b == 0:
                ep["pool3"] = x
            elif b == 1:
                ep["pool4"] = x
        ep["pool5"] = x
        return ep


def resnet_v1(depth: int, dtype: Any = jnp.bfloat16,
              output_stride: int | None = None) -> ResNetV1:
    return ResNetV1(units=RESNET_UNITS[depth], dtype=dtype,
                    output_stride=output_stride)
