"""Pallas TPU convolution kernels for the model's hot shapes.

Why: XLA's TPU convolution emitters are far off roofline for this
workload's backward passes — measured on v5e at the ResNet block1 shapes
(batch 32, 512x512 input):

================  =======  ========  =========
op                XLA      Pallas    speedup
1x1 dX            3.37 ms  0.98 ms   3.4x
1x1 dW            1.71 ms  0.88 ms   1.9x
3x3 dX            2.76 ms  1.64 ms   1.7x
3x3 dW            2.28 ms  1.64 ms   1.4x
1x1 fwd           0.93 ms  0.92 ms   par
3x3 fwd (>=128c)  0.26 ms  0.26 ms   par
================  =======  ========  =========

Design (SURVEY.md §7 / pallas_guide.md):
- 1x1 convs are blocked matmuls over M = N*H*W rows; the weight gradient
  contracts over M (grid-accumulated f32 output block), which the XLA
  conv emitter instead tiles spatially with the batch (32) as the MXU
  contraction — the structural reason it is 2-3x off.
- 3x3 stride-1 SAME convs build the 9-tap im2col tile in VMEM (halo rows
  come from `pl.Element` windows over a (H+2)-padded input) and issue a
  single (th*W, 9*Ci) x (9*Ci, Co) MXU dot. dX is the same kernel with a
  flipped/transposed kernel; dW accumulates 9 tap-contractions.
- Everything falls back to `lax.conv_general_dilated` when a shape
  violates the tiling constraints (tile heights, VMEM budget) or when
  not running on TPU, so CPU tests and exotic shapes keep working.

The reference has no counterpart: its conv work was TF1.4's fixed CUDA
kernels (SURVEY.md §2.9).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from tensorflow_ocr_tpu.ops import pallas_common as PC


def set_interpret(value: bool) -> None:
    """Run kernels in interpreter mode (CPU tests); delegates to
    pallas_common so all Pallas modules share the one toggle."""
    PC.set_interpret(value)


def _pick_bm(m: int, c: int, co: int) -> Optional[int]:
    # VMEM budget: double-buffered (bm, c) + (bm, co) bf16 blocks + the
    # full (c, co) weight must stay well under the 16 MB scoped limit.
    for bm in (2048, 1024, 512, 256):
        if m % bm:
            continue
        if bm * (c + co) * 4 + c * co * 2 <= (8 << 20):
            return bm
    return None


def _pick_th(h: int, wd: int, ci: int) -> Optional[int]:
    # im2col tile (th*wd, 9*ci) bf16 must stay well under VMEM
    for th in (32, 16, 8):
        if h % th == 0 and th * wd * 9 * ci * 2 <= (4 << 20):
            return th
    return None


# --------------------------------------------------------------------------
# 1x1 kernels
# --------------------------------------------------------------------------


def _mm_kernel(x_ref, w_ref, o_ref):
    o_ref[:] = jnp.dot(x_ref[:], w_ref[:],
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _matmul_rows(x2, w2, bm: int):
    m, c = x2.shape
    co = w2.shape[-1]
    return pl.pallas_call(
        _mm_kernel,
        out_shape=jax.ShapeDtypeStruct((m, co), x2.dtype),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((c, co), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, co), lambda i: (i, 0)),
        interpret=PC.interpret(),
    )(x2, w2)


def _dw1_kernel(x_ref, dy_ref, o_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += jax.lax.dot_general(
        x_ref[:], dy_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dw_rows(x2, dy2, bm: int):
    m, c = x2.shape
    co = dy2.shape[-1]
    return pl.pallas_call(
        _dw1_kernel,
        out_shape=jax.ShapeDtypeStruct((c, co), jnp.float32),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((bm, co), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((c, co), lambda i: (0, 0)),
        interpret=PC.interpret(),
    )(x2, dy2)


# --------------------------------------------------------------------------
# 3x3 stride-1 SAME kernels
# --------------------------------------------------------------------------


def _im2col(x, th: int, wd: int, ci: int):
    """x (th+2, wd, ci) halo tile -> (th*wd, 9*ci) tap matrix."""
    zcol = jnp.zeros((th + 2, 1, ci), x.dtype)
    xl = jnp.concatenate([zcol, x[:, :-1, :]], axis=1)
    xr = jnp.concatenate([x[:, 1:, :], zcol], axis=1)
    cols = []
    for ky in range(3):
        for xs in (xl, x, xr):
            cols.append(xs[ky:ky + th].reshape(th * wd, ci))
    return jnp.concatenate(cols, axis=1)


def _conv3_kernel(x_ref, w_ref, o_ref, *, th, wd, ci, co):
    big = _im2col(x_ref[0], th, wd, ci)
    o_ref[0] = jnp.dot(
        big, w_ref[:], preferred_element_type=jnp.float32
    ).reshape(th, wd, co).astype(o_ref.dtype)


def _conv3(xp, w2, th: int):
    n, hp, wd, ci = xp.shape
    h = hp - 2
    co = w2.shape[-1]
    kern = functools.partial(_conv3_kernel, th=th, wd=wd, ci=ci, co=co)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, h, wd, co), xp.dtype),
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(th + 2), pl.Element(wd),
                 pl.Element(ci)),
                lambda i, j: (i, j * th, 0, 0)),
            pl.BlockSpec((9 * ci, co), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, wd, co), lambda i, j: (i, j, 0, 0)),
        interpret=PC.interpret(),
    )(xp, w2)


def _dw3_kernel(x_ref, dy_ref, o_ref, *, th, wd, ci, co):
    x = x_ref[0]
    dy = dy_ref[0].reshape(th * wd, co)
    zcol = jnp.zeros((th + 2, 1, ci), x.dtype)
    xl = jnp.concatenate([zcol, x[:, :-1, :]], axis=1)
    xr = jnp.concatenate([x[:, 1:, :], zcol], axis=1)

    @pl.when(pl.program_id(0) + pl.program_id(1) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    outs = []
    for ky in range(3):
        for xs in (xl, x, xr):
            tap = xs[ky:ky + th].reshape(th * wd, ci)
            outs.append(jax.lax.dot_general(
                tap, dy, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
    o_ref[:] += jnp.stack(outs).reshape(9 * ci, co)


def _dw3(xp, dy, th: int):
    n, hp, wd, ci = xp.shape
    h = hp - 2
    co = dy.shape[-1]
    kern = functools.partial(_dw3_kernel, th=th, wd=wd, ci=ci, co=co)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((9 * ci, co), jnp.float32),
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(th + 2), pl.Element(wd),
                 pl.Element(ci)),
                lambda i, j: (i, j * th, 0, 0)),
            pl.BlockSpec((1, th, wd, co), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((9 * ci, co), lambda i, j: (0, 0)),
        interpret=PC.interpret(),
    )(xp, dy)
    return out.reshape(3, 3, ci, co)


# --------------------------------------------------------------------------
# custom_vjp convs
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _conv1x1_p(x, w, stride: int, bm: int):
    n, h, wd, c = x.shape
    if stride > 1:
        x = x[:, ::stride, ::stride, :]
        n, h, wd, c = x.shape
    y = _matmul_rows(x.reshape(n * h * wd, c), w, bm)
    return y.reshape(n, h, wd, w.shape[-1])


def _conv1x1_fwd(x, w, stride, bm):
    return _conv1x1_p(x, w, stride, bm), (x, w)


def _conv1x1_bwd(stride, bm, res, dy):
    x, w = res
    n, h, wd, c = x.shape
    xs = x[:, ::stride, ::stride, :] if stride > 1 else x
    ns, hs, ws, _ = xs.shape
    m = ns * hs * ws
    dy2 = dy.reshape(m, -1)
    dw = _dw_rows(xs.reshape(m, c), dy2, bm).astype(w.dtype)
    dxs = _matmul_rows(dy2, jnp.swapaxes(w, 0, 1).astype(dy.dtype), bm)
    dxs = dxs.reshape(ns, hs, ws, c).astype(x.dtype)
    if stride > 1:
        dx = jnp.zeros_like(x).at[:, ::stride, ::stride, :].set(dxs)
    else:
        dx = dxs
    return dx, dw


_conv1x1_p.defvjp(_conv1x1_fwd, _conv1x1_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv3x3_p(x, w2, th: int):
    """w2 is the (9*Ci, Co) tap-matrix form of the (3,3,Ci,Co) kernel."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    return _conv3(xp, w2, th)


def _conv3x3_fwd(x, w2, th):
    return _conv3x3_p(x, w2, th), (x, w2)


def _conv3x3_bwd(th, res, dy):
    x, w2 = res
    ci = x.shape[-1]
    co = w2.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    dw = _dw3(xp, dy, th).reshape(9 * ci, co).astype(w2.dtype)
    # dX: full conv of dy with the flipped, ci/co-swapped kernel
    wk = w2.reshape(3, 3, ci, co)
    wflip = jnp.swapaxes(wk[::-1, ::-1], 2, 3).reshape(9 * co, ci)
    dyp = jnp.pad(dy, ((0, 0), (1, 1), (0, 0), (0, 0)))
    dx = _conv3(dyp, wflip.astype(dy.dtype), th).astype(x.dtype)
    return dx, dw


_conv3x3_p.defvjp(_conv3x3_fwd, _conv3x3_bwd)


# --------------------------------------------------------------------------
# Public dispatch
# --------------------------------------------------------------------------


def supported(x_shape: Tuple[int, ...], kernel: Tuple[int, int],
              stride: Tuple[int, int], dilation: Tuple[int, int],
              co: int) -> bool:
    """Can the Pallas path handle this conv?"""
    if len(x_shape) != 4 or dilation != (1, 1):
        return False
    n, h, wd, ci = x_shape
    if kernel == (1, 1):
        sh, sw = stride
        if sh != sw or h % sh or wd % sw:
            return False
        m = n * (h // sh) * (wd // sw)
        return _pick_bm(m, ci, co) is not None
    if kernel == (3, 3) and stride == (1, 1):
        if wd % 8:  # block last-two dims constraint
            return False
        return _pick_th(h, wd, ci) is not None
    return False


def conv2d(x: jnp.ndarray, w: jnp.ndarray,
           stride: Tuple[int, int] = (1, 1)) -> jnp.ndarray:
    """Pallas conv for supported shapes. Caller checks `supported` first.

    x (N,H,W,Ci) bf16/f32; w (kh,kw,Ci,Co) same dtype as x.
    """
    kh, kw = w.shape[:2]
    if (kh, kw) == (1, 1):
        n, h, wd, ci = x.shape
        sh, sw = stride
        m = n * (h // sh) * (wd // sw)
        bm = _pick_bm(m, ci, w.shape[-1])
        return _conv1x1_p(x, w.reshape(w.shape[2], w.shape[3]), sh, bm)
    # 3x3 stride 1
    n, h, wd, ci = x.shape
    th = _pick_th(h, wd, ci)
    w2 = w.reshape(9 * ci, w.shape[-1])
    return _conv3x3_p(x, w2, th)
