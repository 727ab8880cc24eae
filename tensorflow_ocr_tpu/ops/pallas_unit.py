"""Unit-fused ghost-BN bottleneck: one kernel per (image, row band).

Exact batch-BatchNorm forces a global cross-batch reduction between every
conv in a bottleneck unit, so each intermediate activation must round-trip
HBM; that traffic — not matmul FLOPs — is the measured train-step wall
(~5.9 GB per block1 unit at b32/512, see DESIGN.md). This module removes
the global dependency with *ghost* normalization (Hoffer et al., 2017):
statistics are computed per (image, row-band) group, so the whole unit

    z1 = o @ W1;            act1 = relu(bn1(z1))
    z2 = conv3x3(act1);     act2 = relu(bn2(z2))
    z3 = act2 @ W3;         out  = relu(bn3(z3) + shortcut)

runs band-local in VMEM: the forward reads `o` once and writes `out`
once; the backward recomputes the band from `o`/`dout` in two sweeps and
chains every gradient (dW1..3, dgamma/dbeta, do) without materializing
any intermediate (~1.9 GB per block1 unit vs ~5.9 — a 3x algorithmic
traffic cut for ~1.7x extra matmul FLOPs).

Semantics (the kernel is the spec; `reference_ghost_unit` mirrors it):
- stats groups are the gh-row interior bands of each image; each band's
  conv halo rows are normalized with the owning band's affine
  (self-consistent, no seam zeros);
- the backward is EXACT (tested == jax.grad of the reference to f32
  precision): sweep 1 stores per-band affine/stat-correction tables and
  finishes the interior-only grads (dW2/dW3/dgb2/dgb3/shortcut); sweep 2
  rebuilds seam rows under the NEIGHBOUR band's affine from the stored
  tables and finishes do/dW1/dgb1, including the cross-band relu-mask
  terms at band seams;
- running statistics get the exact global [sum(z), sum(z^2)] per BN.

The reference's slim towers already use per-tower (shard) BN statistics
(reference/multigpu_train.py:70-133); ghost groups take the same idea to
its TPU-native limit. No counterpart exists in the reference (TF1 fixed
kernels); this is the SURVEY.md §2.9 native-code surface for training.
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


# --------------------------------------------------------------------------
# shared band math (used by fwd kernel, bwd kernel recompute, and the jnp
# reference so all three are bit-identical where exact)
# --------------------------------------------------------------------------


def _band_stats(z_int: jnp.ndarray) -> jnp.ndarray:
    """[sum, sum_sq] per channel over the interior rows, f32. z is bf16."""
    zf = z_int.astype(jnp.float32).reshape(-1, z_int.shape[-1])
    return jnp.stack([jnp.sum(zf, 0), jnp.sum(zf * zf, 0)])


def _affine_of(stats: jnp.ndarray, gb: jnp.ndarray, cnt: float,
               eps: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel (a, b) with out = z*a + b from ghost stats + gamma/beta."""
    mu = stats[0] / cnt
    var = jnp.maximum(stats[1] / cnt - mu * mu, 0.0)
    a = gb[0] * jax.lax.rsqrt(var + eps)
    return a, gb[1] - mu * a


_taps = PC.taps


_tap_matmul = PC.tap_matmul


def _zero_edge_rows(x, n_edge: int, jb, nb):
    """Zero the first/last `n_edge` rows when the band touches the image
    edge: image padding must be zero *post-activation*."""
    rows = x.shape[0]
    rid = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0)
    bad = ((rid < n_edge) & (jb == 0)) | ((rid >= rows - n_edge) &
                                          (jb == nb - 1))
    return jnp.where(bad, jnp.zeros_like(x), x)


def _stat_corr(dab: jnp.ndarray, stats: jnp.ndarray, gb: jnp.ndarray,
               cnt: float, eps: float):
    """Gradient flowing from (a, b) back into the band statistics.

    With a = g*r(var), b = be - mu*a and dab = [sum(gm*z), sum(gm)]:
    returns (c1, c2) so dz += c1 + 2*z*c2, plus (dg, dbe).
    """
    mu = stats[0] / cnt
    var = jnp.maximum(stats[1] / cnt - mu * mu, 0.0)
    r = jax.lax.rsqrt(var + eps)
    da, db = dab[0], dab[1]
    dg = r * (da - mu * db)
    dbe = db
    g = gb[0]
    dvar = -0.5 * g * r * r * r * (da - mu * db)
    dmu = -g * r * db
    c1 = (dmu - 2.0 * mu * dvar) / cnt
    c2 = dvar / cnt
    return c1, c2, dg, dbe


# --------------------------------------------------------------------------
# jnp reference (band-local semantics; ground truth for the kernels)
# --------------------------------------------------------------------------


def _mm(x, w):
    """x (..., ci) @ w (ci, co) with f32 accumulation, cast to x.dtype."""
    y = jnp.dot(x.reshape(-1, x.shape[-1]), w,
                preferred_element_type=jnp.float32)
    return y.reshape(x.shape[:-1] + (w.shape[-1],)).astype(x.dtype)


def reference_ghost_unit(o, w1, gb1, w2, gb2, w3, gb3, ws, gbs,
                         gh: int, eps: float = 1e-5):
    """Band-local ghost-BN bottleneck in plain jnp. Stats groups are the
    (image, gh-row band) pairs. Returns (out, s1, s2, s3, ss) with s* the
    global [sum, sum_sq] running-stat inputs (ss None for identity).

    ws/gbs None => identity shortcut. Differentiable: jax.grad of this is
    the exact ghost gradient (including cross-band halo terms).
    """
    n, h, wd, ci = o.shape
    db = w1.shape[1]
    co = w3.shape[1]
    nb = h // gh
    cnt = float(gh * wd)
    proj = ws is not None

    def one_band(oh, j):
        """oh: (gh+2, wd, ci) halo band of one image (image-edge rows of
        the pad are zero)."""
        z1 = _mm(oh, w1)
        s1 = _band_stats(z1[1:gh + 1])
        a1, b1 = _affine_of(s1, gb1, cnt, eps)
        act1 = jnp.maximum(z1.astype(jnp.float32) * a1 + b1, 0.0)
        edge = jnp.where(
            ((jnp.arange(gh + 2) == 0) & (j == 0))
            | ((jnp.arange(gh + 2) == gh + 1) & (j == nb - 1)),
            0.0, 1.0)[:, None, None]
        act1 = (act1 * edge).astype(oh.dtype)
        z2 = _tap_matmul(_taps(act1, gh, wd, db), w2.astype(act1.dtype),
                         db)
        z2 = z2.reshape(gh, wd, db).astype(oh.dtype)
        s2 = _band_stats(z2)
        a2, b2 = _affine_of(s2, gb2, cnt, eps)
        act2 = jnp.maximum(z2.astype(jnp.float32) * a2 + b2,
                           0.0).astype(oh.dtype)
        z3 = _mm(act2, w3)
        s3 = _band_stats(z3)
        a3, b3 = _affine_of(s3, gb3, cnt, eps)
        oc = oh[1:gh + 1]
        if proj:
            zs = _mm(oc, ws)
            ss = _band_stats(zs)
            as_, bs = _affine_of(ss, gbs, cnt, eps)
            sc = zs.astype(jnp.float32) * as_ + bs
        else:
            ss = jnp.zeros((2, co), jnp.float32)
            sc = oc.astype(jnp.float32)
        out = jnp.maximum(z3.astype(jnp.float32) * a3 + b3 + sc, 0.0)
        return out.astype(oh.dtype), s1, s2, s3, ss

    op = jnp.pad(o, ((0, 0), (1, 1), (0, 0), (0, 0)))
    bands = jnp.stack([op[:, j * gh:j * gh + gh + 2] for j in range(nb)],
                      axis=1)                       # (n, nb, gh+2, wd, ci)
    outs, s1, s2, s3, ss = jax.vmap(
        jax.vmap(one_band, in_axes=(0, 0)), in_axes=(0, None)
    )(bands, jnp.arange(nb))
    out = outs.reshape(n, h, wd, co)
    tot = lambda s: jnp.sum(s, axis=(0, 1))
    return out, tot(s1), tot(s2), tot(s3), (tot(ss) if proj else None)


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------


class _G:
    """Static geometry passed to kernels via functools.partial."""

    def __init__(self, gh, wd, ci, db, co, nb, eps, proj):
        self.gh, self.wd, self.ci, self.db, self.co = gh, wd, ci, db, co
        self.nb, self.eps, self.proj = nb, eps, proj
        self.cnt = float(gh * wd)


def _fwd_band(o, jb, g: "_G", w1, gb1, w2, gb2, w3, gb3, ws, gbs):
    """Shared fwd band math on a (gh+2, wd, ci) halo tile. Returns
    (out, s1, s2, s3, ss, intermediates...) — the kernel writes out/stats,
    the bwd kernel reuses the intermediates."""
    gh, wd, db, co = g.gh, g.wd, g.db, g.co
    z1 = _mm(o, w1)                                  # (gh+2, wd, db)
    s1 = _band_stats(z1[1:gh + 1])
    a1, b1 = _affine_of(s1, gb1, g.cnt, g.eps)
    act1 = jnp.maximum(z1.astype(jnp.float32) * a1 + b1, 0.0)
    act1 = _zero_edge_rows(act1, 1, jb, g.nb).astype(o.dtype)
    z2 = _tap_matmul(_taps(act1, gh, wd, db), w2, db)
    z2 = z2.reshape(gh, wd, db).astype(o.dtype)
    s2 = _band_stats(z2)
    a2, b2 = _affine_of(s2, gb2, g.cnt, g.eps)
    act2 = jnp.maximum(z2.astype(jnp.float32) * a2 + b2,
                       0.0).astype(o.dtype)
    z3 = _mm(act2, w3)
    s3 = _band_stats(z3)
    a3, b3 = _affine_of(s3, gb3, g.cnt, g.eps)
    oc = o[1:gh + 1]
    if g.proj:
        zs = _mm(oc, ws)
        ss = _band_stats(zs)
        as_, bs = _affine_of(ss, gbs, g.cnt, g.eps)
        sc = zs.astype(jnp.float32) * as_ + bs
    else:
        zs, ss = None, None
        sc = oc.astype(jnp.float32)
    out = jnp.maximum(z3.astype(jnp.float32) * a3 + b3 + sc,
                      0.0).astype(o.dtype)
    return out, s1, s2, s3, ss


def _unit_fwd_kernel(o_ref, w1_ref, gb1_ref, w2_ref, gb2_ref, w3_ref,
                     gb3_ref, *rest, g: "_G"):
    if g.proj:
        ws_ref, gbs_ref = rest[0], rest[1]
        out_ref, s1_ref, s2_ref, s3_ref, ss_ref = rest[2:]
        ws, gbs = ws_ref[:], gbs_ref[:]
    else:
        ws = gbs = ss_ref = None
        out_ref, s1_ref, s2_ref, s3_ref = rest
    jb = pl.program_id(1)
    out, s1, s2, s3, ss = _fwd_band(
        o_ref[0], jb, g, w1_ref[:], gb1_ref[:], w2_ref[:], gb2_ref[:],
        w3_ref[:], gb3_ref[:], ws, gbs)
    out_ref[0] = out

    @pl.when((pl.program_id(0) == 0) & (jb == 0))
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)
        s3_ref[:] = jnp.zeros_like(s3_ref)
        if g.proj:
            ss_ref[:] = jnp.zeros_like(ss_ref)

    s1_ref[:] += s1
    s2_ref[:] += s2
    s3_ref[:] += s3
    if g.proj:
        ss_ref[:] += ss


def _rep(c):
    return pl.BlockSpec((2, c), lambda i, j: (0, 0))


def _wspec(r, c):
    return pl.BlockSpec((r, c), lambda i, j: (0, 0))


def _unit_fwd(op2, w1, gb1, w2, gb2, w3, gb3, ws, gbs, gh: int,
              eps: float):
    """op2: (n, h+4, wd, ci) — o padded by 2 rows each side. The fwd
    bands read padded rows [j*gh+1, j*gh+gh+3)."""
    n, hp, wd, ci = op2.shape
    h = hp - 4
    db = w1.shape[1]
    co = w3.shape[1]
    nb = h // gh
    g = _G(gh, wd, ci, db, co, nb, eps, ws is not None)
    kern = functools.partial(_unit_fwd_kernel, g=g)
    halo = pl.BlockSpec(
        (pl.Element(1), pl.Element(gh + 2), pl.Element(wd),
         pl.Element(ci)),
        lambda i, j: (i, j * gh + 1, 0, 0))
    in_specs = [halo, _wspec(ci, db), _rep(db), _wspec(9 * db, db),
                _rep(db), _wspec(db, co), _rep(co)]
    args = [op2, w1, gb1, w2, gb2, w3, gb3]
    out_shapes = [
        jax.ShapeDtypeStruct((n, h, wd, co), op2.dtype),
        jax.ShapeDtypeStruct((2, db), jnp.float32),
        jax.ShapeDtypeStruct((2, db), jnp.float32),
        jax.ShapeDtypeStruct((2, co), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, gh, wd, co), lambda i, j: (i, j, 0, 0)),
        _rep(db), _rep(db), _rep(co),
    ]
    if g.proj:
        in_specs += [_wspec(ci, co), _rep(co)]
        args += [ws, gbs]
        out_shapes.append(jax.ShapeDtypeStruct((2, co), jnp.float32))
        out_specs.append(_rep(co))
    res = pl.pallas_call(
        kern,
        out_shape=tuple(out_shapes),
        grid=(n, nb),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=PC.interpret(),
    )(*args)
    if g.proj:
        out, s1, s2, s3, ss = res
    else:
        (out, s1, s2, s3), ss = res, None
    return out, s1, s2, s3, ss


# --------------------------------------------------------------------------
# backward: exact two-sweep recompute
#
# The BN backward's mean-subtraction term is the same order as the direct
# term, so halo rows (which belong to the NEIGHBOUR band's stats group)
# cannot reuse this band's correction. Sweep 1 recomputes each band,
# derives its per-channel affine (a, b) and stat-correction (c1, c2)
# tables, and finishes every gradient that only needs interior rows
# (dW2, dW3, dgb2, dgb3, shortcut). Sweep 2 recomputes again and builds
# the halo rows of dz3/dz2 from the NEIGHBOUR band's stored tables —
# making do/dW1/dgb1 exact as well. Tables are (nb+2)-padded with zeros
# so image-edge halo rows vanish without special cases.
# --------------------------------------------------------------------------


def _recompute_fwd(o, jb, g, w1, gb1_or_t1, w2, gb2, w3, from_t1: bool):
    """Shared recompute of z1/act1/z2/act2/z3 on a (gh+4, ...) halo tile.

    Sweep 1 derives BN1's affine from the band stats (gb1); sweep 2 reads
    it from the stored table (t1 = [a1, b1]) to skip the reduction.
    """
    gh, wd, db = g.gh, g.wd, g.db
    f32 = jnp.float32
    dt = o.dtype
    z1 = _mm(o, w1)                                  # (gh+4, wd, db)
    if from_t1:
        s1 = None
        a1, b1 = gb1_or_t1[0], gb1_or_t1[1]
    else:
        s1 = _band_stats(z1[2:gh + 2])
        a1, b1 = _affine_of(s1, gb1_or_t1, g.cnt, g.eps)
    act1 = jnp.maximum(z1.astype(f32) * a1 + b1, 0.0)
    act1 = _zero_edge_rows(act1, 2, jb, g.nb).astype(dt)
    z2 = _tap_matmul(_taps(act1, gh + 2, wd, db), w2, db)
    z2 = z2.reshape(gh + 2, wd, db).astype(dt)       # rows: o rows 1..gh+3
    z3_of = lambda act2: _mm(act2, w3)
    return z1, s1, a1, b1, act1, z2, z3_of


def _row_table(t3, gh: int):
    """Expand (3, 4, c) neighbour tables to per-row (gh+2, 1, c) arrays:
    row 0 <- prev band, rows 1..gh <- own, row gh+1 <- next band."""
    rid = jax.lax.broadcasted_iota(jnp.int32, (gh + 2, 1, 1), 0)
    out = []
    for k in range(4):
        own = t3[1, k][None, None, :]
        prev = t3[0, k][None, None, :]
        nxt = t3[2, k][None, None, :]
        v = jnp.where(rid == 0, prev, jnp.where(rid == gh + 1, nxt, own))
        out.append(v)
    return out                                       # [a, b, c1, c2]


def _bwd_sweep1_kernel(o_ref, dout_ref, w1_ref, gb1_ref, w2_ref,
                       gb2_ref, w3_ref, gb3_ref, w3t_ref, *rest,
                       g: "_G"):
    if g.proj:
        ws_ref, gbs_ref = rest[:2]
        (t1_ref, t2_ref, t3_ref, ts_ref, dw2_ref, dgb2_ref, dw3_ref,
         dgb3_ref, dws_ref, dgbs_ref) = rest[2:]
    else:
        (t1_ref, t2_ref, t3_ref, dw2_ref, dgb2_ref, dw3_ref,
         dgb3_ref) = rest
    gh, wd, ci, db, co = g.gh, g.wd, g.ci, g.db, g.co
    jb = pl.program_id(1)
    f32 = jnp.float32
    dt = o_ref.dtype

    o = o_ref[0]
    z1, s1, a1, b1, act1, z2, z3_of = _recompute_fwd(
        o, jb, g, w1_ref[:], gb1_ref[:], w2_ref[:], gb2_ref[:],
        w3_ref[:], from_t1=False)
    s2 = _band_stats(z2[1:gh + 1])
    a2, b2 = _affine_of(s2, gb2_ref[:], g.cnt, g.eps)
    act2 = jnp.maximum(z2.astype(f32) * a2 + b2, 0.0).astype(dt)
    z3 = z3_of(act2)                                 # (gh+2, wd, co)
    s3 = _band_stats(z3[1:gh + 1])
    a3, b3 = _affine_of(s3, gb3_ref[:], g.cnt, g.eps)
    oc2 = o[1:gh + 3]
    if g.proj:
        zs = _mm(oc2, ws_ref[:])
        ss = _band_stats(zs[1:gh + 1])
        as_, bs = _affine_of(ss, gbs_ref[:], g.cnt, g.eps)
        sc = zs.astype(f32) * as_ + bs
    else:
        sc = oc2.astype(f32)
    pre3 = z3.astype(f32) * a3 + b3 + sc
    gm3 = dout_ref[0].astype(f32) * (pre3 > 0.0).astype(f32)

    @pl.when((pl.program_id(0) == 0) & (jb == 0))
    def _():
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        dgb2_ref[:] = jnp.zeros_like(dgb2_ref)
        dw3_ref[:] = jnp.zeros_like(dw3_ref)
        dgb3_ref[:] = jnp.zeros_like(dgb3_ref)
        if g.proj:
            dws_ref[:] = jnp.zeros_like(dws_ref)
            dgbs_ref[:] = jnp.zeros_like(dgbs_ref)

    def corr_of(gm_int, z_int, stats, gb, dgb_ref):
        gi = gm_int.reshape(-1, gm_int.shape[-1])
        zi = z_int.astype(f32).reshape(-1, z_int.shape[-1])
        dab = jnp.stack([jnp.sum(gi * zi, 0), jnp.sum(gi, 0)])
        c1, c2, dg, dbe = _stat_corr(dab, stats, gb, g.cnt, g.eps)
        dgb_ref[:] += jnp.stack([dg, dbe])
        return c1, c2

    # BN3: interior dz3 is exact with the band's own correction
    gm3_int = gm3[1:gh + 1]
    z3_int = z3[1:gh + 1]
    c13, c23 = corr_of(gm3_int, z3_int, s3, gb3_ref[:], dgb3_ref)
    dz3_int = (gm3_int * a3 + c13
               + 2.0 * z3_int.astype(f32) * c23)
    t3_ref[0, 0] = jnp.stack([a3, b3, c13, c23])
    act2_int = act2[1:gh + 1].reshape(gh * wd, db)
    dz3b = dz3_int.astype(dt).reshape(gh * wd, co)
    dw3_ref[:] += jax.lax.dot_general(
        act2_int, dz3b, (((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    # conv3 -> BN2 (interior only)
    dact2_int = jnp.dot(dz3b, w3t_ref[:],
                        preferred_element_type=f32).reshape(gh, wd, db)
    z2_int = z2[1:gh + 1]
    gm2_int = dact2_int * (z2_int.astype(f32) * a2 + b2 > 0.0).astype(f32)
    c12, c22 = corr_of(gm2_int, z2_int, s2, gb2_ref[:], dgb2_ref)
    dz2_int = (gm2_int * a2 + c12 + 2.0 * z2_int.astype(f32) * c22)
    t2_ref[0, 0] = jnp.stack([a2, b2, c12, c22])
    t1_ref[0, 0] = jnp.stack([a1, b1])
    # conv2 weight grad (interior outputs; tap windows over act1 rows
    # 1..gh+3 align with the interior z2 rows)
    x_taps = _taps(act1[1:gh + 3], gh, wd, db)
    dz2b = dz2_int.astype(dt).reshape(gh * wd, db)
    dw2_ref[:] += jnp.concatenate([
        jax.lax.dot_general(t, dz2b, (((0,), (0,)), ((), ())),
                            preferred_element_type=f32)
        for t in x_taps
    ], axis=0)
    if g.proj:
        zs_int = zs[1:gh + 1]
        c1s, c2s = corr_of(gm3_int, zs_int, ss, gbs_ref[:], dgbs_ref)
        dzs_int = (gm3_int * as_ + c1s
                   + 2.0 * zs_int.astype(f32) * c2s)
        ts_ref[0, 0] = jnp.stack([as_, bs, c1s, c2s])
        dws_ref[:] += jax.lax.dot_general(
            oc2[1:gh + 1].reshape(gh * wd, ci),
            dzs_int.astype(dt).reshape(gh * wd, co),
            (((0,), (0,)), ((), ())), preferred_element_type=f32)


def _bwd_sweep2_kernel(o_ref, dout_ref, t1_ref, t2_ref, t3_ref,
                       gb1_ref, w1_ref, w2_ref, w3_ref, w1t_ref,
                       w2f_ref, w3t_ref, *rest, g: "_G"):
    if g.proj:
        ws_ref, ts_ref, wst_ref = rest[:3]
        do_ref, dw1_ref, dgb1_ref = rest[3:]
    else:
        do_ref, dw1_ref, dgb1_ref = rest
    gh, wd, ci, db, co = g.gh, g.wd, g.ci, g.db, g.co
    f32 = jnp.float32
    dt = o_ref.dtype

    jb = pl.program_id(1)
    o = o_ref[0]                                     # (gh+4, wd, ci)
    z1 = _mm(o, w1_ref[:])                           # (gh+4, wd, db)
    s1 = _band_stats(z1[2:gh + 2])
    a1, b1 = _affine_of(s1, gb1_ref[:], g.cnt, g.eps)
    t1n = t1_ref[0]                                  # (3, 2, db)
    z1f = z1.astype(f32)
    act1 = _zero_edge_rows(
        jnp.maximum(z1f * a1 + b1, 0.0), 2, jb, g.nb).astype(dt)
    # seam z2 rows: the neighbour's forward normalized the shared o rows
    # with ITS BN1 affine — rebuild those two rows under the neighbour's
    # (a1, b1). The zero-padded neighbour table makes image-edge rows
    # vanish (affine 0 -> act 0 -> z2 0 -> table-zero dz2).
    act1_prev = jnp.maximum(z1f[0:3] * t1n[0, 0] + t1n[0, 1],
                            0.0).astype(dt)
    act1_next = jnp.maximum(z1f[gh + 1:gh + 4] * t1n[2, 0] + t1n[2, 1],
                            0.0).astype(dt)
    w2 = w2_ref[:]
    z2_own = _tap_matmul(_taps(act1[1:gh + 3], gh, wd, db), w2, db)
    z2_prev = _tap_matmul(_taps(act1_prev, 1, wd, db), w2, db)
    z2_next = _tap_matmul(_taps(act1_next, 1, wd, db), w2, db)
    z2 = jnp.concatenate([
        z2_prev.reshape(1, wd, db),
        z2_own.reshape(gh, wd, db),
        z2_next.reshape(1, wd, db),
    ], axis=0).astype(dt)                            # (gh+2, wd, db)
    a2r, b2r, c12r, c22r = _row_table(t2_ref[0], gh)
    z2f = z2.astype(f32)
    act2 = jnp.maximum(z2f * a2r + b2r, 0.0).astype(dt)
    z3 = _mm(act2, w3_ref[:])                        # (gh+2, wd, co)
    a3r, b3r, c13r, c23r = _row_table(t3_ref[0], gh)
    oc2 = o[1:gh + 3]
    if g.proj:
        zs = _mm(oc2, ws_ref[:])
        asr, bsr, c1sr, c2sr = _row_table(ts_ref[0], gh)
        zsf = zs.astype(f32)
        sc = zsf * asr + bsr
    else:
        sc = oc2.astype(f32)
    z3f = z3.astype(f32)
    pre3 = z3f * a3r + b3r + sc
    gm3 = dout_ref[0].astype(f32) * (pre3 > 0.0).astype(f32)
    dz3 = gm3 * a3r + c13r + 2.0 * z3f * c23r
    dact2 = jnp.dot(dz3.astype(dt).reshape(-1, co), w3t_ref[:],
                    preferred_element_type=f32).reshape(gh + 2, wd, db)
    gm2 = dact2 * (z2f * a2r + b2r > 0.0).astype(f32)
    dz2 = gm2 * a2r + c12r + 2.0 * z2f * c22r
    dz2b = dz2.astype(dt)
    # Own-band conv1 chain must only see the OWN interior dz2 rows: the
    # seam dz2 rows flow through the neighbour's act1 (their affine and
    # relu mask), handled row-wise below.
    rid = jax.lax.broadcasted_iota(jnp.int32, (gh + 2, 1, 1), 0)
    dz2_own = jnp.where((rid == 0) | (rid == gh + 1),
                        jnp.zeros_like(dz2b), dz2b)
    dact1 = _tap_matmul(_taps(dz2_own, gh, wd, db), w2f_ref[:],
                        db).reshape(gh, wd, db)      # o rows 2..gh+2

    def rowconv(row, ky):
        """One full-conv output row from a single dz2 row via the ky tap
        block of the flipped kernel: sum_kx shift_kx(row) @ w2f[ky,kx]."""
        zc = jnp.zeros((1, db), dt)
        rl = jnp.concatenate([zc, row[:-1]], axis=0)
        rr = jnp.concatenate([row[1:], zc], axis=0)
        acc = None
        for kx, rx in enumerate((rl, row, rr)):
            part = jnp.dot(rx, w2f_ref[(ky * 3 + kx) * db:
                                       (ky * 3 + kx + 1) * db],
                           preferred_element_type=f32)
            acc = part if acc is None else acc + part
        return acc                                    # (wd, db) f32

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        dgb1_ref[:] = jnp.zeros_like(dgb1_ref)

    z1_int = z1f[2:gh + 2]
    gm1 = dact1 * (z1_int * a1 + b1 > 0.0).astype(f32)
    # own halo act1 rows (o rows jgh-1, jgh+gh) feed OWN z2 interior edge
    # rows: they contribute to this band's dgb1/dW1 (and, via conv1, to
    # the neighbour's do — which the neighbour mirrors back to us below).
    top_live = jnp.where(jb > 0, 1.0, 0.0)
    bot_live = jnp.where(jb < g.nb - 1, 1.0, 0.0)
    dact1_ht = rowconv(dz2_own[1], 2) * top_live     # o row jgh-1
    dact1_hb = rowconv(dz2_own[gh], 0) * bot_live    # o row jgh+gh
    gm1_ht = dact1_ht * (z1f[1] * a1 + b1 > 0.0).astype(f32)
    gm1_hb = dact1_hb * (z1f[gh + 2] * a1 + b1 > 0.0).astype(f32)
    gi = gm1.reshape(-1, db)
    zi = z1_int.reshape(-1, db)
    dab1 = jnp.stack([
        jnp.sum(gi * zi, 0) + jnp.sum(gm1_ht * z1f[1], 0)
        + jnp.sum(gm1_hb * z1f[gh + 2], 0),
        jnp.sum(gi, 0) + jnp.sum(gm1_ht, 0) + jnp.sum(gm1_hb, 0)])
    c11, c21, dg1, dbe1 = _stat_corr(dab1, s1, gb1_ref[:], g.cnt, g.eps)
    dgb1_ref[:] += jnp.stack([dg1, dbe1])
    dz1e = gm1 * a1 + c11 + 2.0 * z1_int * c21       # (gh, wd, db) f32
    dz1_halo_t = (gm1_ht * a1).astype(dt)
    dz1_halo_b = (gm1_hb * a1).astype(dt)
    o_int = o[2:gh + 2].reshape(gh * wd, ci)
    dz1_2d = dz1e.astype(dt).reshape(gh * wd, db)
    dw1_ref[:] += (
        jax.lax.dot_general(o_int, dz1_2d, (((0,), (0,)), ((), ())),
                            preferred_element_type=f32)
        + jax.lax.dot_general(o[1], dz1_halo_t, (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
        + jax.lax.dot_general(o[gh + 2], dz1_halo_b,
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=f32))
    # neighbour-band chains arriving at OUR interior edge rows: the seam
    # dz2 row through the NEIGHBOUR's act1 (their affine + relu mask).
    t1p_a, t1p_b = t1n[0, 0], t1n[0, 1]
    t1n_a, t1n_b = t1n[2, 0], t1n[2, 1]
    nb_top = (rowconv(dz2b[0], 0)
              * (z1f[2] * t1p_a + t1p_b > 0.0).astype(f32) * t1p_a)
    nb_bot = (rowconv(dz2b[gh + 1], 2)
              * (z1f[gh + 1] * t1n_a + t1n_b > 0.0).astype(f32) * t1n_a)
    row0 = jax.lax.broadcasted_iota(jnp.int32, (gh, 1, 1), 0)
    edge_add = (jnp.where(row0 == 0, nb_top[None], 0.0)
                + jnp.where(row0 == gh - 1, nb_bot[None], 0.0))
    dz1_do = (dz1e + edge_add).astype(dt).reshape(gh * wd, db)
    do = jnp.dot(dz1_do, w1t_ref[:], preferred_element_type=f32)
    if g.proj:
        dzs_int = (gm3 * asr + c1sr + 2.0 * zsf * c2sr)[1:gh + 1]
        do = do + jnp.dot(dzs_int.astype(dt).reshape(gh * wd, co),
                          wst_ref[:], preferred_element_type=f32)
    else:
        do = do + gm3[1:gh + 1].reshape(gh * wd, ci)
    do_ref[0] = do.reshape(gh, wd, ci).astype(do_ref.dtype)


def _flip_w2(w2, db: int):
    """(9db, db) tap-major kernel -> flipped-tap, channel-transposed
    (9db, db) layout for the full-conv in the backward."""
    wk = w2.reshape(3, 3, db, db)
    return jnp.swapaxes(wk[::-1, ::-1], 2, 3).reshape(9 * db, db)


def _tspec(k, c):
    """Element-indexed (prev, own, next) window of a band-padded table."""
    return pl.BlockSpec(
        (pl.Element(1), pl.Element(3), pl.Element(k), pl.Element(c)),
        lambda i, j: (i, j, 0, 0))


def _tout(k, c):
    return pl.BlockSpec((1, 1, k, c), lambda i, j: (i, j, 0, 0))


def _unit_bwd(op2, dout, w1, gb1, w2, gb2, w3, gb3, ws, gbs, gh: int,
              eps: float):
    """Exact two-sweep backward. Returns the grads in primal-arg order:
    (do, dw1, dgb1, dw2, dgb2, dw3, dgb3[, dws, dgbs])."""
    n, hp, wd, ci = op2.shape
    h = hp - 4
    db = w1.shape[1]
    co = w3.shape[1]
    nb = h // gh
    g = _G(gh, wd, ci, db, co, nb, eps, ws is not None)
    dt = op2.dtype
    f32 = jnp.float32
    dop = jnp.pad(dout, ((0, 0), (1, 1), (0, 0), (0, 0)))
    o_halo = pl.BlockSpec(
        (pl.Element(1), pl.Element(gh + 4), pl.Element(wd),
         pl.Element(ci)),
        lambda i, j: (i, j * gh, 0, 0))
    dy_halo = pl.BlockSpec(
        (pl.Element(1), pl.Element(gh + 2), pl.Element(wd),
         pl.Element(co)),
        lambda i, j: (i, j * gh, 0, 0))

    # ---- sweep 1: per-band tables + interior-exact grads ----------------
    k1 = functools.partial(_bwd_sweep1_kernel, g=g)
    in_specs = [o_halo, dy_halo, _wspec(ci, db), _rep(db),
                _wspec(9 * db, db), _rep(db), _wspec(db, co), _rep(co),
                _wspec(co, db)]
    args = [op2, dop, w1, gb1, w2, gb2, w3, gb3, jnp.swapaxes(w3, 0, 1)]
    out_shapes = [
        jax.ShapeDtypeStruct((n, nb, 2, db), f32),   # t1 [a1, b1]
        jax.ShapeDtypeStruct((n, nb, 4, db), f32),   # t2
        jax.ShapeDtypeStruct((n, nb, 4, co), f32),   # t3
    ]
    out_specs = [_tout(2, db), _tout(4, db), _tout(4, co)]
    if g.proj:
        in_specs += [_wspec(ci, co), _rep(co)]
        args += [ws, gbs]
        out_shapes.append(jax.ShapeDtypeStruct((n, nb, 4, co), f32))
        out_specs.append(_tout(4, co))
    out_shapes += [
        jax.ShapeDtypeStruct((9 * db, db), f32),
        jax.ShapeDtypeStruct((2, db), f32),
        jax.ShapeDtypeStruct((db, co), f32),
        jax.ShapeDtypeStruct((2, co), f32),
    ]
    out_specs += [_wspec(9 * db, db), _rep(db), _wspec(db, co), _rep(co)]
    if g.proj:
        out_shapes += [jax.ShapeDtypeStruct((ci, co), f32),
                       jax.ShapeDtypeStruct((2, co), f32)]
        out_specs += [_wspec(ci, co), _rep(co)]
    res1 = pl.pallas_call(
        k1, out_shape=tuple(out_shapes), grid=(n, nb),
        in_specs=in_specs, out_specs=tuple(out_specs),
        interpret=PC.interpret(),
    )(*args)
    if g.proj:
        t1, t2, t3, ts, dw2, dgb2, dw3, dgb3, dws, dgbs = res1
    else:
        (t1, t2, t3, dw2, dgb2, dw3, dgb3), ts = res1, None

    # ---- sweep 2: halo-exact do/dW1/dgb1 via neighbour tables -----------
    pad_t = lambda t: jnp.pad(t, ((0, 0), (1, 1), (0, 0), (0, 0)))
    k2 = functools.partial(_bwd_sweep2_kernel, g=g)
    in_specs = [o_halo, dy_halo, _tspec(2, db), _tspec(4, db),
                _tspec(4, co), _rep(db), _wspec(ci, db),
                _wspec(9 * db, db), _wspec(db, co), _wspec(db, ci),
                _wspec(9 * db, db), _wspec(co, db)]
    args = [op2, dop, pad_t(t1), pad_t(t2), pad_t(t3), gb1, w1, w2, w3,
            jnp.swapaxes(w1, 0, 1), _flip_w2(w2, db),
            jnp.swapaxes(w3, 0, 1)]
    if g.proj:
        in_specs += [_wspec(ci, co), _tspec(4, co), _wspec(co, ci)]
        args += [ws, pad_t(ts), jnp.swapaxes(ws, 0, 1)]
    res2 = pl.pallas_call(
        k2,
        out_shape=(
            jax.ShapeDtypeStruct((n, h, wd, ci), dt),
            jax.ShapeDtypeStruct((ci, db), f32),
            jax.ShapeDtypeStruct((2, db), f32),
        ),
        grid=(n, nb),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, gh, wd, ci), lambda i, j: (i, j, 0, 0)),
            _wspec(ci, db), _rep(db),
        ),
        interpret=PC.interpret(),
    )(*args)
    do, dw1, dgb1 = res2
    out = (do, dw1, dgb1, dw2, dgb2, dw3, dgb3)
    if g.proj:
        out += (dws, dgbs)
    return out


# --------------------------------------------------------------------------
# custom_vjp ops
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def ghost_unit_id(o, w1, gb1, w2, gb2, w3, gb3, gh: int, eps: float):
    """Identity-shortcut ghost-BN bottleneck unit.

    o (N,H,W,C) bf16 activated input; returns (out, s1, s2, s3) with s*
    the global [sum(z), sum(z^2)] per BN for running-stat updates (treated
    as non-differentiable side outputs).
    """
    op2 = jnp.pad(o, ((0, 0), (2, 2), (0, 0), (0, 0)))
    out, s1, s2, s3, _ = _unit_fwd(op2, w1, gb1, w2, gb2, w3, gb3,
                                   None, None, gh, eps)
    return out, s1, s2, s3


def _ghost_id_fwd(o, w1, gb1, w2, gb2, w3, gb3, gh, eps):
    op2 = jnp.pad(o, ((0, 0), (2, 2), (0, 0), (0, 0)))
    out, s1, s2, s3, _ = _unit_fwd(op2, w1, gb1, w2, gb2, w3, gb3,
                                   None, None, gh, eps)
    return (out, s1, s2, s3), (op2, w1, gb1, w2, gb2, w3, gb3)


def _ghost_id_bwd(gh, eps, res, cts):
    op2, w1, gb1, w2, gb2, w3, gb3 = res
    dout = cts[0]  # stats cotangents are running-stat-only: zero
    do, dw1, dgb1, dw2, dgb2, dw3, dgb3 = _unit_bwd(
        op2, dout, w1, gb1, w2, gb2, w3, gb3, None, None, gh, eps)
    return (do, dw1.astype(w1.dtype), dgb1, dw2.astype(w2.dtype), dgb2,
            dw3.astype(w3.dtype), dgb3)


ghost_unit_id.defvjp(_ghost_id_fwd, _ghost_id_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def ghost_unit_proj(o, w1, gb1, w2, gb2, w3, gb3, ws, gbs, gh: int,
                    eps: float):
    """Projection-shortcut ghost-BN bottleneck unit (first unit of a
    block). Returns (out, s1, s2, s3, ss)."""
    op2 = jnp.pad(o, ((0, 0), (2, 2), (0, 0), (0, 0)))
    return _unit_fwd(op2, w1, gb1, w2, gb2, w3, gb3, ws, gbs, gh, eps)


def _ghost_proj_fwd(o, w1, gb1, w2, gb2, w3, gb3, ws, gbs, gh, eps):
    op2 = jnp.pad(o, ((0, 0), (2, 2), (0, 0), (0, 0)))
    out = _unit_fwd(op2, w1, gb1, w2, gb2, w3, gb3, ws, gbs, gh, eps)
    return out, (op2, w1, gb1, w2, gb2, w3, gb3, ws, gbs)


def _ghost_proj_bwd(gh, eps, res, cts):
    op2, w1, gb1, w2, gb2, w3, gb3, ws, gbs = res
    dout = cts[0]
    (do, dw1, dgb1, dw2, dgb2, dw3, dgb3, dws, dgbs) = _unit_bwd(
        op2, dout, w1, gb1, w2, gb2, w3, gb3, ws, gbs, gh, eps)
    return (do, dw1.astype(w1.dtype), dgb1, dw2.astype(w2.dtype), dgb2,
            dw3.astype(w3.dtype), dgb3, dws.astype(ws.dtype), dgbs)


ghost_unit_proj.defvjp(_ghost_proj_fwd, _ghost_proj_bwd)


def pick_gh(h: int, wd: int, ci: int, db: int, co: int,
            proj: bool = False) -> Optional[int]:
    """Largest band height whose BACKWARD band fits comfortably in VMEM.

    Returns None when the unit's weights alone crowd out the activations
    (block4-scale channel counts) — callers fall back to the per-op path.
    """
    # weights + their transposes live in VMEM for the whole sweep
    w_all = (2 * ci * db + 2 * 9 * db * db + 2 * db * co) * 2
    if proj:
        w_all += 2 * ci * co * 2
    for gh in (32, 16, 8):
        if h % gh:
            continue
        act = (gh + 4) * wd * (2 * ci + 2 * db) * 2      # o/do + z1/act1
        # co-sized f32 chain temps stay live through the sweep (measured
        # on-chip: Mosaic's stack allocator barely reuses them): ~3 for
        # the identity unit (z3/gm3/dz3), ~6 with a projection shortcut
        # (plus zs/sc/pre).
        mids = ((gh + 2) * wd * co * 4 * (6 if proj else 3)
                + (gh + 2) * wd * db * 4 * 2)
        if act * 2 + mids + w_all <= (12 << 20):
            return gh
    return None
