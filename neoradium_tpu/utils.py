"""Small math utilities shared across the framework.

Functional parity with the reference's ``neoradium/utils.py`` (dB/linear
conversion, MSE/NMSE metrics, hermitian transpose) plus JAX-native batched
linear interpolation used by the channel estimator (the reference defaults to
SciPy ``interp1d(kind='linear')`` — ``utils.py:29``; RBF kernels become
static device matmuls, see ``rx/chest.py``).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def toRadian(deg):
    return None if deg is None else np.float64(deg) * np.pi / 180.0


def toDegrees(rad):
    return None if rad is None else np.float64(rad) * 180.0 / np.pi


def toLinear(db):
    """dB -> linear power ratio (jit-safe for traced arrays)."""
    if isinstance(db, jnp.ndarray) and not isinstance(db, np.ndarray):
        return 10.0 ** (db / 10.0)
    return 10.0 ** (np.asarray(db, dtype=np.float64) / 10.0)


def toDb(x):
    """linear power ratio -> dB (jit-safe for traced arrays)."""
    if isinstance(x, jnp.ndarray) and not isinstance(x, np.ndarray):
        return 10.0 * jnp.log10(x)
    return 10.0 * np.log10(x)


def herm(x):
    """Hermitian (conjugate) transpose of the last two axes."""
    xp = jnp if isinstance(x, jnp.ndarray) else np
    return xp.swapaxes(xp.conj(x), -1, -2)


def getMse(h, hEst):
    xp = jnp if isinstance(hEst, jnp.ndarray) else np
    return xp.mean(xp.square(xp.abs(hEst - h)))


def getNmse(u, uEst):
    """Normalized MSE (goodness-of-fit convention, cf. reference utils.py:63-67)."""
    xp = jnp if isinstance(uEst, jnp.ndarray) else np
    uMean = u.mean()
    return xp.square(xp.abs(uEst - u)).sum() / xp.square(xp.abs(uMean - u)).sum()


def intToBits(n: int, length: int | None = None) -> np.ndarray:
    """Big-endian binary expansion of ``n`` as a uint8 array."""
    bits = [int(c) for c in bin(int(n))[2:]]
    if length is not None:
        bits = [0] * (length - len(bits)) + bits
    return np.asarray(bits, dtype=np.uint8)


def interp1d_batched(x: jnp.ndarray, y: jnp.ndarray, x_new: jnp.ndarray) -> jnp.ndarray:
    """Batched 1-D linear interpolation with linear extrapolation at both ends.

    Matches SciPy ``interp1d(kind='linear', fill_value='extrapolate')`` used by
    the reference channel estimator (reference utils.py:29).

    Args:
      x: (N,) strictly increasing sample positions (static or traced).
      y: (N, ...) values at ``x``; interpolation along axis 0.
      x_new: (M,) query positions.

    Returns:
      (M, ...) interpolated values.
    """
    n = x.shape[0]
    # Index of the left neighbor for each query; clip so that queries outside
    # [x[0], x[-1]] use the first/last segment -> linear extrapolation.
    idx = jnp.clip(jnp.searchsorted(x, x_new, side="right") - 1, 0, n - 2)
    x0 = x[idx]
    x1 = x[idx + 1]
    w = ((x_new - x0) / (x1 - x0)).astype(y.real.dtype)
    extra_dims = (1,) * (y.ndim - 1)
    w = w.reshape((-1,) + extra_dims)
    y0 = y[idx]
    y1 = y[idx + 1]
    return y0 + (y1 - y0) * w


def polar_interp1d_batched(x: jnp.ndarray, y: jnp.ndarray, x_new: jnp.ndarray) -> jnp.ndarray:
    """Magnitude/phase (polar) variant of :func:`interp1d_batched`.

    The phase is unwrapped along axis 0 before interpolation (reference
    utils.py:38-42).
    """
    theta = jnp.unwrap(jnp.angle(y), axis=0)
    r = jnp.abs(y)
    theta_new = interp1d_batched(x, theta, x_new)
    r_new = interp1d_batched(x, r, x_new)
    return r_new * (jnp.cos(theta_new) + 1j * jnp.sin(theta_new))


# ------------------------------------------------------------ pretty print
def format_properties(title: str, rows, indent: int = 0) -> str:
    """Reference-style property block (every reference class has a
    ``print(indent, title, getStr)`` pretty-printer; this is the shared
    layout helper for ours). ``rows`` is a list of (label, value) pairs —
    a value of None skips the row, a nested string (from another
    format_properties) is inlined as-is."""
    pad = indent * " "
    out = [f"{pad}{title}"]
    width = max((len(l) for l, v in rows
                 if v is not None and l is not None), default=0) + 1
    for label, value in rows:
        if value is None:
            continue
        s = str(value)
        if label is None:
            out.append(s)                      # nested pre-formatted block
        elif "\n" in s:
            first, *rest = s.split("\n")
            out.append(f"{pad}  {label + ':':{width + 1}s} {first}")
            out.extend(rest)                   # continuation rows carry pad
        else:
            out.append(f"{pad}  {label + ':':{width + 1}s} {s}")
    return "\n".join(out)


def print_properties(obj_print, indent=0, title=None, getStr=False):
    """Shared driver for the per-class ``print`` methods: ``obj_print``
    returns the formatted string; mirrors the reference's
    print(indent, title, getStr) convention."""
    s = obj_print(indent, title)
    if getStr:
        return s
    print(s)
