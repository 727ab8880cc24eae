"""Shared helpers for the Pallas TPU kernels.

One source of truth for the 3x3 tap machinery and the interpret toggle
used by ops/pallas_conv.py, ops/pallas_fused.py, and ops/pallas_unit.py
(a tap-order or budget fix applied to one copy must not leave the others
stale). Per-module ``set_interpret`` functions delegate here so existing
test fixtures keep working.
"""

from __future__ import annotations

import jax.numpy as jnp

_INTERPRET = False


def set_interpret(value: bool) -> None:
    """Run all Pallas kernels in interpreter mode (CPU tests)."""
    global _INTERPRET
    _INTERPRET = bool(value)


def interpret() -> bool:
    return _INTERPRET


def taps(x, th: int, wd: int, c: int):
    """Nine (th*wd, c) row-slice views of a (th+2, wd, c) halo tile in
    (ky, kx) row-major tap order; only the two column-shifted copies
    (left/right) materialize — the row slices are free."""
    zcol = jnp.zeros((x.shape[0], 1, c), x.dtype)
    xl = jnp.concatenate([zcol, x[:, :-1, :]], axis=1)
    xr = jnp.concatenate([x[:, 1:, :], zcol], axis=1)
    out = []
    for ky in range(3):
        for xs in (xl, x, xr):
            out.append(xs[ky:ky + th].reshape(th * wd, c))
    return out


def tap_matmul(tap_list, w, c: int):
    """sum_k tap_list[k] @ w[k*c:(k+1)*c] accumulated on the MXU in f32.

    ``w`` is a (9c, co) tap-major weight matrix (= conv kernel
    .reshape(9c, co) with (ky, kx) row-major tap order)."""
    acc = None
    for k, t in enumerate(tap_list):
        part = jnp.dot(t, w[k * c:(k + 1) * c],
                       preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    return acc
