"""CRC computation per TS 38.212 §5.1, host (NumPy) and device (JAX) paths.

The six generator polynomials (CRC6/11/16/24A/24B/24C) are spec constants.

TPU design: CRC is a linear map over GF(2), so for a fixed message length L we
precompute once on the host the L x C matrix M with M[i] = x^(L-1-i+C) mod g(x).
On device, crc(bits) = (bits @ M) mod 2 — one MXU matmul, batched over any
number of streams. float32 accumulation is exact here because column sums are
bounded by L < 2^24.

Behavioral parity: reference ``neoradium/chancodebase.py`` (getCrc/checkCrc/
appendCrc); the matrix formulation is new (the reference uses a sequential
bitwise long division, chancodebase.py:83-128).
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

# Generator polynomials, MSB (x^C) first — TS 38.212 §5.1.
POLYS = {
    "6":   "1100001",
    "11":  "111000100001",
    "16":  "10001000000100001",
    "24A": "1100001100100110011111011",
    "24B": "1100000000000000001100011",
    "24C": "1101100101011000100010111",
}


def poly_bits(poly: str) -> np.ndarray:
    return np.array([int(c) for c in POLYS[poly]], dtype=np.uint8)


def crc_len(poly: str) -> int:
    return len(POLYS[poly]) - 1


def crc(bits: np.ndarray, poly: str) -> np.ndarray:
    """Host CRC of one (1-D) or many (2-D, one per row) bitstreams."""
    g = poly_bits(poly)
    c = len(g) - 1
    flat = bits.ndim == 1
    b = np.atleast_2d(bits).astype(np.uint8)
    m, n = b.shape
    reg = np.concatenate([b, np.zeros((m, c), dtype=np.uint8)], axis=1)
    for d in range(n):
        # Conditionally XOR the polynomial into streams whose leading bit is set
        reg[:, d:d + c + 1] ^= reg[:, d:d + 1] * g
    out = reg[:, n:]
    return out[0] if flat else out


def check_crc(bits: np.ndarray, poly: str):
    """True where the trailing CRC of each stream is consistent."""
    return np.count_nonzero(crc(bits, poly), axis=-1) == 0


def append_crc(bits: np.ndarray, poly: str) -> np.ndarray:
    return np.append(bits, crc(bits, poly), axis=-1)


@lru_cache(maxsize=64)
def crc_matrix(length: int, poly: str) -> np.ndarray:
    """(length, C) float32 GF(2) generator matrix: crc = bits @ M mod 2.

    Row i is x^(length-1-i+C) mod g(x), computed by iterating p -> p*x mod g.
    """
    g = poly_bits(poly)
    c = len(g) - 1
    glow = g[1:].astype(np.uint8)  # low C coefficients of g
    p = np.zeros(c, dtype=np.uint8)
    p[-1] = 1  # x^0; we start the iteration below to reach x^C first
    rows = np.empty((length, c), dtype=np.uint8)
    # Advance to x^C mod g
    for _ in range(c):
        p = _mulx(p, glow)
    for i in range(length):
        rows[length - 1 - i] = p
        p = _mulx(p, glow)
    return rows.astype(np.float32)


def _mulx(p: np.ndarray, glow: np.ndarray) -> np.ndarray:
    """(p(x) * x) mod g(x) for a C-bit remainder p (MSB first)."""
    carry = p[0]
    p = np.roll(p, -1)
    p[-1] = 0
    if carry:
        p = p ^ glow
    return p


def crc_device(bits: jnp.ndarray, mat: jnp.ndarray) -> jnp.ndarray:
    """Device CRC: ``bits`` (..., L) in {0,1}; ``mat`` from :func:`crc_matrix`."""
    s = jnp.matmul(bits.astype(jnp.float32), mat, preferred_element_type=jnp.float32)
    return jnp.mod(s, 2.0).astype(bits.dtype)


def append_crc_device(bits: jnp.ndarray, mat: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([bits, crc_device(bits, mat)], axis=-1)


def check_crc_device(bits: jnp.ndarray, mat: jnp.ndarray) -> jnp.ndarray:
    """True where the trailing CRC checks out. ``mat`` must be for the full length."""
    return jnp.count_nonzero(crc_device(bits, mat), axis=-1) == 0
