"""Fused conv+BN+ReLU Pallas kernels: the ResNet bottleneck compute path.

The step-time wall on v5e is NOT the matmul FLOPs — it is HBM passes over
the big early-layer activations. XLA's lowering of conv -> BatchNorm ->
relu -> conv materializes both the raw conv output (for BN backward) and
the activated output (the next conv's operand), runs BN statistics and
BN/relu gradients as separate full passes, and its conv emitters run
2-3x off the matmul roofline for the backward shapes (see
ops/pallas_conv.py for per-op measurements).

This module restructures the computation around RAW conv outputs:

    z1, s1 = conv1x1(o,  a=1,   b=0,  W1)     # prologue: relu(a*x+b)
    z2, s2 = conv3x3(z1, a(s1), b(s1), W2)    # epilogue: Σy, Σy² per ch.
    z3, s3 = conv1x1(z2, a(s2), b(s2), W3)
    o'     = relu(z3*a(s3)+b(s3) + shortcut)  # one fused XLA elementwise

Each kernel APPLIES the previous layer's BatchNorm as a per-channel
affine + relu prologue on the VMEM tile (never materializing the
activated tensor in HBM) and ACCUMULATES its own output's BN statistics
as an epilogue during the output write (never re-reading the output).
The backward kernels recompute the prologue from the saved raw tensors
and fold the statistics-gradient correction
``dy_eff = dy + ds1 + 2*y*ds2`` into their operand reads.

Forward HBM traffic per layer drops to read-input + write-output; the
backward to three reads + one write — within ~25% of the roofline.

The reference has no counterpart (TF1.4 fixed kernels, SURVEY.md §2.9);
this is the TPU-native replacement for its conv/BN stack.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from tensorflow_ocr_tpu.ops import pallas_common as PC


def set_interpret(value: bool) -> None:
    PC.set_interpret(value)


def pick_bm(m: int, ci: int, co: int) -> Optional[int]:
    for bm in (2048, 1024, 512, 256):
        if m % bm:
            continue
        if bm * (2 * ci + 2 * co) * 2 * 2 + ci * co * 2 <= (8 << 20):
            return bm
    return None


def pick_th(h: int, wd: int, ci: int, co: int) -> Optional[int]:
    for th in (64, 32, 16, 8):
        if h % th:
            continue
        # sized for the merged bwd kernel (worst case): x and dy halo tiles
        # each with left/right shifted copies, f32 accumulator + bf16 out,
        # f32 dw accumulator; 1.5x for pipelining of the streamed inputs.
        tiles = (th + 2) * wd * (ci + co) * 2 * 3
        outs = th * wd * (ci + co) * 4
        if tiles * 1.5 + outs + 9 * ci * co * 8 <= (10 << 20):
            return th
    return None


# --------------------------------------------------------------------------
# forward kernels
# --------------------------------------------------------------------------


def _prologue(x, ab):
    """relu(x*a + b) in f32, cast back to x.dtype. ab: (2, Ci) f32."""
    a = ab[0]
    b = ab[1]
    xn = jnp.maximum(x.astype(jnp.float32) * a + b, 0.0)
    return xn.astype(x.dtype)


def _zero_halo_rows(x, th: int):
    """Zero the out-of-bounds halo rows of a (th+2, W, C) tile.

    SAME-conv padding applies to the ACTIVATED tensor, but the raw input
    is padded BEFORE the affine+relu prologue — relu(0*a+b) = relu(b) is
    nonzero, so the physical pad rows (global row 0 for the first block,
    global row H+1 for the last) must be re-zeroed after the prologue.
    """
    jb = pl.program_id(1)
    nb = pl.num_programs(1)
    rid = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
    bad = ((rid == 0) & (jb == 0)) | ((rid == th + 1) & (jb == nb - 1))
    return jnp.where(bad, jnp.zeros_like(x), x)


def _f1x1_kernel(x_ref, ab_ref, w_ref, y_ref, s_ref):
    xn = _prologue(x_ref[:], ab_ref[:])
    y = jnp.dot(xn, w_ref[:], preferred_element_type=jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _():
        s_ref[:] = jnp.zeros_like(s_ref)

    s_ref[:] += jnp.stack([jnp.sum(y, 0), jnp.sum(y * y, 0)])


def _f1x1(x2, ab, w, bm: int):
    m, ci = x2.shape
    co = w.shape[-1]
    return pl.pallas_call(
        _f1x1_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((m, co), x2.dtype),
            jax.ShapeDtypeStruct((2, co), jnp.float32),
        ),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, ci), lambda i: (i, 0)),
            pl.BlockSpec((2, ci), lambda i: (0, 0)),
            pl.BlockSpec((ci, co), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((bm, co), lambda i: (i, 0)),
            pl.BlockSpec((2, co), lambda i: (0, 0)),
        ),
        interpret=PC.interpret(),
    )(x2, ab, w)


_taps = PC.taps


_tap_matmul = PC.tap_matmul


def _f3x3_kernel(x_ref, ab_ref, w_ref, y_ref, s_ref, *, th, wd, ci, co):
    xn = _zero_halo_rows(_prologue(x_ref[0], ab_ref[:]), th)
    y = _tap_matmul(_taps(xn, th, wd, ci), w_ref, ci)
    y_ref[0] = y.reshape(th, wd, co).astype(y_ref.dtype)

    @pl.when(pl.program_id(0) + pl.program_id(1) == 0)
    def _():
        s_ref[:] = jnp.zeros_like(s_ref)

    s_ref[:] += jnp.stack([jnp.sum(y, 0), jnp.sum(y * y, 0)])


def _f3x3(xp, ab, w2, th: int):
    n, hp, wd, ci = xp.shape
    h = hp - 2
    co = w2.shape[-1]
    kern = functools.partial(_f3x3_kernel, th=th, wd=wd, ci=ci, co=co)
    return pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((n, h, wd, co), xp.dtype),
            jax.ShapeDtypeStruct((2, co), jnp.float32),
        ),
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(th + 2), pl.Element(wd),
                 pl.Element(ci)),
                lambda i, j: (i, j * th, 0, 0)),
            pl.BlockSpec((2, ci), lambda i, j: (0, 0)),
            pl.BlockSpec((9 * ci, co), lambda i, j: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, th, wd, co), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((2, co), lambda i, j: (0, 0)),
        ),
        interpret=PC.interpret(),
    )(xp, ab, w2)


# --------------------------------------------------------------------------
# backward kernels
# --------------------------------------------------------------------------


def _dy_eff(dy, y, ds):
    """Fold the BN-statistics gradient into dy:
    s1 = Σy, s2 = Σy² ⇒ dy_eff = dy + ds1 + 2·y·ds2."""
    return (dy.astype(jnp.float32) + ds[0]
            + 2.0 * y.astype(jnp.float32) * ds[1]).astype(dy.dtype)


def _b1x1_kernel(x_ref, ab_ref, dy_ref, y_ref, ds_ref, wt_ref,
                 dx_ref, dab_ref, dw_ref):
    """Merged 1x1 backward: dw, dx, dab in ONE pass over the tiles."""
    xn = _prologue(x_ref[:], ab_ref[:])
    dye = _dy_eff(dy_ref[:], y_ref[:], ds_ref[:])

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        dab_ref[:] = jnp.zeros_like(dab_ref)

    dw_ref[:] += jax.lax.dot_general(
        xn, dye, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    g = jnp.dot(dye, wt_ref[:], preferred_element_type=jnp.float32)
    x = x_ref[:].astype(jnp.float32)
    pre = x * ab_ref[0] + ab_ref[1]
    mask = (pre > 0.0).astype(jnp.float32)
    gm = g * mask
    dx_ref[:] = (gm * ab_ref[0]).astype(dx_ref.dtype)
    dab_ref[:] += jnp.stack([jnp.sum(gm * x, 0), jnp.sum(gm, 0)])


def _b3x3_kernel(xp_ref, ab_ref, dyp_ref, yp_ref, ds_ref, wt_ref,
                 dx_ref, dab_ref, dw_ref, *, th, wd, ci, co):
    """Merged 3x3 backward: dw, dx, dab in ONE pass over the halo tiles."""
    xn = _zero_halo_rows(_prologue(xp_ref[0], ab_ref[:]), th)
    # halo pad rows carry dy=y=0, but dy_eff adds ds1 there — re-zero
    dye = _zero_halo_rows(_dy_eff(dyp_ref[0], yp_ref[0], ds_ref[:]), th)

    @pl.when(pl.program_id(0) + pl.program_id(1) == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        dab_ref[:] = jnp.zeros_like(dab_ref)

    x_taps = _taps(xn, th, wd, ci)
    dye_c = dye[1:th + 1].reshape(th * wd, co)
    dw_ref[:] += jnp.concatenate([
        jax.lax.dot_general(t, dye_c, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        for t in x_taps
    ], axis=0)

    g = _tap_matmul(_taps(dye, th, wd, co), wt_ref, co)
    x = xp_ref[0, 1:th + 1].astype(jnp.float32).reshape(th * wd, ci)
    pre = x * ab_ref[0] + ab_ref[1]
    mask = (pre > 0.0).astype(jnp.float32)
    gm = g * mask
    dx_ref[0] = (gm * ab_ref[0]).reshape(th, wd, ci).astype(dx_ref.dtype)
    dab_ref[:] += jnp.stack([jnp.sum(gm * x, 0), jnp.sum(gm, 0)])


# --------------------------------------------------------------------------
# custom_vjp layer ops
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_conv1x1(x, ab, w, bm: int):
    """y, stats = conv1x1(relu(x*a+b), w); stats = [Σy, Σy²] per channel.

    x (N,H,W,Ci) bf16; ab (2,Ci) f32; w (Ci,Co).
    Returns y (N,H,W,Co), stats (2,Co) f32.
    """
    n, h, wd, ci = x.shape
    y2, s = _f1x1(x.reshape(-1, ci), ab, w, bm)
    return y2.reshape(n, h, wd, -1), s


def _fused_conv1x1_fwd(x, ab, w, bm):
    y, s = fused_conv1x1(x, ab, w, bm)
    return (y, s), (x, ab, w, y)


def _fused_conv1x1_bwd(bm, res, cts):
    x, ab, w, y = res
    dy, ds = cts
    n, h, wd, ci = x.shape
    co = w.shape[-1]
    m = n * h * wd
    x2 = x.reshape(m, ci)
    dy2 = dy.reshape(m, co)
    y2 = y.reshape(m, co)
    wt = jnp.swapaxes(w, 0, 1).astype(dy.dtype)
    dx2, dab, dw = pl.pallas_call(
        _b1x1_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((m, ci), x.dtype),
            jax.ShapeDtypeStruct((2, ci), jnp.float32),
            jax.ShapeDtypeStruct((ci, co), jnp.float32),
        ),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, ci), lambda i: (i, 0)),
            pl.BlockSpec((2, ci), lambda i: (0, 0)),
            pl.BlockSpec((bm, co), lambda i: (i, 0)),
            pl.BlockSpec((bm, co), lambda i: (i, 0)),
            pl.BlockSpec((2, co), lambda i: (0, 0)),
            pl.BlockSpec((co, ci), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((bm, ci), lambda i: (i, 0)),
            pl.BlockSpec((2, ci), lambda i: (0, 0)),
            pl.BlockSpec((ci, co), lambda i: (0, 0)),
        ),
        interpret=PC.interpret(),
    )(x2, ab, dy2, y2, ds, wt)
    return dx2.reshape(x.shape), dab, dw.astype(w.dtype)


fused_conv1x1.defvjp(_fused_conv1x1_fwd, _fused_conv1x1_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_conv3x3(x, ab, w2, th: int):
    """y, stats = conv3x3_same(relu(x*a+b), w); w2 is (9Ci, Co)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    return _f3x3(xp, ab, w2, th)


def _fused_conv3x3_fwd(x, ab, w2, th):
    y, s = fused_conv3x3(x, ab, w2, th)
    return (y, s), (x, ab, w2, y)


def _fused_conv3x3_bwd(th, res, cts):
    x, ab, w2, y = res
    dy, ds = cts
    n, h, wd, ci = x.shape
    co = w2.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    # dX path: full-conv of dy_eff with the flipped/transposed kernel
    wk = w2.reshape(3, 3, ci, co)
    wflip = jnp.swapaxes(wk[::-1, ::-1], 2, 3).reshape(9 * co, ci)
    dyp = jnp.pad(dy, ((0, 0), (1, 1), (0, 0), (0, 0)))
    yp = jnp.pad(y, ((0, 0), (1, 1), (0, 0), (0, 0)))
    halo = pl.BlockSpec(
        (pl.Element(1), pl.Element(th + 2), pl.Element(wd),
         pl.Element(co)),
        lambda i, j: (i, j * th, 0, 0))
    kern = functools.partial(_b3x3_kernel, th=th, wd=wd, ci=ci, co=co)
    dx, dab, dw = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((n, h, wd, ci), x.dtype),
            jax.ShapeDtypeStruct((2, ci), jnp.float32),
            jax.ShapeDtypeStruct((9 * ci, co), jnp.float32),
        ),
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(th + 2), pl.Element(wd),
                 pl.Element(ci)),
                lambda i, j: (i, j * th, 0, 0)),
            pl.BlockSpec((2, ci), lambda i, j: (0, 0)),
            halo,
            halo,
            pl.BlockSpec((2, co), lambda i, j: (0, 0)),
            pl.BlockSpec((9 * co, ci), lambda i, j: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, th, wd, ci), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((2, ci), lambda i, j: (0, 0)),
            pl.BlockSpec((9 * ci, co), lambda i, j: (0, 0)),
        ),
        interpret=PC.interpret(),
    )(xp, ab, dyp, yp, ds, wflip.astype(dy.dtype))
    return dx, dab, dw.astype(w2.dtype)


fused_conv3x3.defvjp(_fused_conv3x3_fwd, _fused_conv3x3_bwd)


# --------------------------------------------------------------------------
# residual-boundary kernel: relu(z*a + b + zs*as + bs)
# --------------------------------------------------------------------------
#
# The bottleneck unit boundary (BN3 affine + shortcut affine + add + relu)
# left to XLA cost more than the conv kernels themselves: the f32 upcasts,
# relu, casts, and the da/db reductions in its VJP each ran as separate
# full HBM passes. One kernel pair does fwd in read-2/write-1 and bwd in
# read-3/write-2 with the four affine gradients accumulated in VMEM.


def pick_bm_bnd(m: int, c: int, ntens: int = 3) -> Optional[int]:
    for bm in (4096, 2048, 1024, 512, 256):
        if m % bm:
            continue
        if bm * c * 2 * ntens * 2 <= (10 << 20):
            return bm
    return None


def _bnd_fwd_kernel(z_ref, ab_ref, zs_ref, abs_ref, o_ref):
    a = ab_ref[0]
    b = ab_ref[1]
    as_ = abs_ref[0]
    bs = abs_ref[1]
    pre = (z_ref[:].astype(jnp.float32) * a + b
           + zs_ref[:].astype(jnp.float32) * as_ + bs)
    o_ref[:] = jnp.maximum(pre, 0.0).astype(o_ref.dtype)


def _bnd_bwd_kernel(g_ref, z_ref, ab_ref, zs_ref, abs_ref,
                    dz_ref, dzs_ref, dab_ref, dabs_ref):
    a = ab_ref[0]
    b = ab_ref[1]
    as_ = abs_ref[0]
    bs = abs_ref[1]
    z = z_ref[:].astype(jnp.float32)
    zs = zs_ref[:].astype(jnp.float32)
    pre = z * a + b + zs * as_ + bs
    gm = g_ref[:].astype(jnp.float32) * (pre > 0.0).astype(jnp.float32)
    dz_ref[:] = (gm * a).astype(dz_ref.dtype)
    dzs_ref[:] = (gm * as_).astype(dzs_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dab_ref[:] = jnp.zeros_like(dab_ref)
        dabs_ref[:] = jnp.zeros_like(dabs_ref)

    gsum = jnp.sum(gm, 0)
    dab_ref[:] += jnp.stack([jnp.sum(gm * z, 0), gsum])
    dabs_ref[:] += jnp.stack([jnp.sum(gm * zs, 0), gsum])


@jax.custom_vjp
def fused_boundary(z, ab, zs, abs_):
    """relu(z*a + b + zs*as + bs): BN affines + residual add + relu.

    z, zs: (N,H,W,C) bf16 raw conv outputs (zs may be the previous unit's
    activated output with abs_=(1,0) for the identity shortcut).
    ab, abs_: (2, C) f32.
    """
    n, h, wd, c = z.shape
    m = n * h * wd
    bm = pick_bm_bnd(m, c)
    if bm is None:
        a = ab[0]
        b = ab[1]
        pre = (z.astype(jnp.float32) * a + b
               + zs.astype(jnp.float32) * abs_[0] + abs_[1])
        return jnp.maximum(pre, 0.0).astype(z.dtype)
    out = pl.pallas_call(
        _bnd_fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((m, c), z.dtype),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((2, c), lambda i: (0, 0)),
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((2, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, c), lambda i: (i, 0)),
        interpret=PC.interpret(),
    )(z.reshape(m, c), ab, zs.reshape(m, c), abs_)
    return out.reshape(z.shape)


def _fused_boundary_fwd(z, ab, zs, abs_):
    return fused_boundary(z, ab, zs, abs_), (z, ab, zs, abs_)


def _fused_boundary_bwd(res, g):
    z, ab, zs, abs_ = res
    n, h, wd, c = z.shape
    m = n * h * wd
    bm = pick_bm_bnd(m, c, ntens=5)
    if bm is None:
        zf = z.astype(jnp.float32)
        zsf = zs.astype(jnp.float32)
        pre = zf * ab[0] + ab[1] + zsf * abs_[0] + abs_[1]
        gm = g.astype(jnp.float32) * (pre > 0.0)
        gsum = jnp.sum(gm, (0, 1, 2))
        dab = jnp.stack([jnp.sum(gm * zf, (0, 1, 2)), gsum])
        dabs = jnp.stack([jnp.sum(gm * zsf, (0, 1, 2)), gsum])
        return ((gm * ab[0]).astype(z.dtype), dab,
                (gm * abs_[0]).astype(zs.dtype), dabs)
    dz, dzs, dab, dabs = pl.pallas_call(
        _bnd_bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((m, c), z.dtype),
            jax.ShapeDtypeStruct((m, c), zs.dtype),
            jax.ShapeDtypeStruct((2, c), jnp.float32),
            jax.ShapeDtypeStruct((2, c), jnp.float32),
        ),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((2, c), lambda i: (0, 0)),
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((2, c), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((2, c), lambda i: (0, 0)),
            pl.BlockSpec((2, c), lambda i: (0, 0)),
        ),
        interpret=PC.interpret(),
    )(g.reshape(m, c), z.reshape(m, c), ab, zs.reshape(m, c), abs_)
    return dz.reshape(z.shape), dab, dzs.reshape(zs.shape), dabs


fused_boundary.defvjp(_fused_boundary_fwd, _fused_boundary_bwd)


# --------------------------------------------------------------------------
# reference composition (for tests) + support predicate
# --------------------------------------------------------------------------


def reference_conv_bn_act(x, ab, w, kernel: Tuple[int, int]):
    """Unfused jnp composition with identical semantics, for testing."""
    a = ab[0].astype(jnp.float32)
    b = ab[1].astype(jnp.float32)
    xn = jnp.maximum(x.astype(jnp.float32) * a + b, 0.0).astype(x.dtype)
    kh, kw = kernel
    ci = x.shape[-1]
    wk = w.reshape(kh, kw, ci, -1) if w.ndim == 2 else w
    y = jax.lax.conv_general_dilated(
        xn, wk.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    yf = y.astype(jnp.float32)
    s = jnp.stack([jnp.sum(yf, (0, 1, 2)), jnp.sum(yf * yf, (0, 1, 2))])
    return y, s


def supported(x_shape, kernel: Tuple[int, int], co: int) -> bool:
    if len(x_shape) != 4:
        return False
    n, h, wd, ci = x_shape
    if kernel == (1, 1):
        return pick_bm(n * h * wd, ci, co) is not None
    if kernel == (3, 3):
        return wd % 8 == 0 and pick_th(h, wd, ci, co) is not None
    return False
