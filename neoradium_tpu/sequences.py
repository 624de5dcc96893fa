"""3GPP pseudo-random (Gold) sequence generation — TS 38.211 §5.2.1.

The length-31 Gold sequence c(n) = (x1(n+Nc) + x2(n+Nc)) mod 2 with Nc=1600,
where x1 has feedback polynomial x^31 + x^3 + 1 (fixed init x1(0)=1) and x2
has x^31 + x^3 + x^2 + x + 1 (init = binary expansion of cInit).

Design: scrambling/pilot sequences depend only on *configuration* (cInit is a
function of rnti/nID/slot/symbol — never of data), so they are generated
host-side with NumPy at config-build time, vectorized over a batch of cInit
values, and shipped to the device as constant arrays. The jitted compute path
only ever XORs against (or modulates) these constants.

Behavioral parity with reference ``neoradium/utils.py:70-94`` (goldSequence);
re-derived here from the spec recurrences and vectorized over cInit.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

_MASK31 = np.uint32(0x7FFFFFFF)
_NC_SKIP_STEPS = 51        # 51 blocks of 31 bits = 1581 bits; Nc = 1600 = 1581 + 19
_NC_BIT_OFFSET = 19        # c(0) is bit 19 (LSB-first) of the first post-skip word


def _step_x1(s: np.ndarray) -> np.ndarray:
    """Advance 31-bit x1 state(s) by one 31-bit block.

    Bit i of ``s`` (LSB first) holds x1(n+i); the result holds x1(n+31+i).
    Recurrence x1(n+31) = x1(n+3) XOR x1(n): the low 28 bits come directly
    from s^(s>>3); the top 3 bits additionally fold in freshly-computed bits,
    which the shifted-XOR below accounts for.
    """
    s = s ^ (s >> np.uint32(3))
    s = s ^ ((s << np.uint32(28)) & _MASK31)
    return s


def _step_x2(s: np.ndarray) -> np.ndarray:
    """Advance 31-bit x2 state(s) by one 31-bit block.

    Recurrence x2(n+31) = x2(n+3) ^ x2(n+2) ^ x2(n+1) ^ x2(n).
    """
    s = s ^ (s >> np.uint32(3)) ^ (s >> np.uint32(2)) ^ (s >> np.uint32(1))
    s = s ^ (((s << np.uint32(28)) ^ (s << np.uint32(29)) ^ (s << np.uint32(30))) & _MASK31)
    return s


@lru_cache(maxsize=8)
def _x1_skipped() -> int:
    """x1 state after the Nc fast-forward (fixed: x1 init is constant)."""
    s = np.uint32(1)
    for _ in range(_NC_SKIP_STEPS):
        s = _step_x1(s)
    return int(s)


def gold_sequence_batch(c_inits: np.ndarray, num_bits: int) -> np.ndarray:
    """Generate Gold sequences for a batch of cInit values.

    Args:
      c_inits: (M,) array-like of 31-bit initialization values.
      num_bits: sequence length n; returns c(0..n-1).

    Returns:
      (M, num_bits) uint8 array of sequence bits.
    """
    c_inits = np.atleast_1d(np.asarray(c_inits, dtype=np.uint32))
    m = c_inits.shape[0]

    x2 = c_inits.copy()
    for _ in range(_NC_SKIP_STEPS):
        x2 = _step_x2(x2)
    x1 = np.full(m, _x1_skipped(), dtype=np.uint32)

    # Number of 31-bit words needed to cover bits [_NC_BIT_OFFSET, offset+num_bits)
    num_words = -(-(_NC_BIT_OFFSET + num_bits) // 31)
    words = np.empty((m, num_words), dtype=np.uint32)
    for w in range(num_words):
        words[:, w] = x1 ^ x2
        x1 = _step_x1(x1)
        x2 = _step_x2(x2)

    # Unpack LSB-first: bit i of word w is stream position w*31 + i
    bits = (words[:, :, None] >> np.arange(31, dtype=np.uint32)) & np.uint32(1)
    stream = bits.reshape(m, num_words * 31)
    return stream[:, _NC_BIT_OFFSET:_NC_BIT_OFFSET + num_bits].astype(np.uint8)


def gold_sequence(c_init: int, num_bits: int) -> np.ndarray:
    """Single-cInit Gold sequence: (num_bits,) uint8."""
    return gold_sequence_batch(np.asarray([c_init]), num_bits)[0]
