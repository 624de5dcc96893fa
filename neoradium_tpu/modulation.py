"""QAM modulation and LLR demodulation — TS 38.211 §5.1 / §7.3.1.2.

Host side: constellation lookup tables built once per modulation order from
the spec's Gray-mapping recursion (TS 38.211 §5.1.2-5.1.7).

Device side (jitted, batched over arbitrary leading axes):
- ``modulate``: bits -> symbols via a single gather.
- ``llrs_from_symbols``: max-log (default) or exact log-sum-exp LLRs computed
  from squared distances to all 2^qm constellation points — a pure VPU
  elementwise + segmented-reduction pattern. Bit-partition index tensors are
  host-precomputed.

Behavioral parity: reference ``neoradium/modulation.py`` (Modem class); LLR
sign convention llr>0 => bit 0 more likely (modulation.py:202).
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

MOD_TO_QM = {"BPSK": 1, "QPSK": 2, "16QAM": 4, "64QAM": 6, "256QAM": 8, "1024QAM": 10}
_QM_SCALE = {1: 2, 2: 2, 4: 10, 6: 42, 8: 170, 10: 682}  # average-power normalizers


@lru_cache(maxsize=8)
def constellation(modulation: str) -> np.ndarray:
    """(2^qm,) complex128 constellation, index = big-endian bit pattern.

    Implements the nested Gray-mapping recursion of TS 38.211 §5.1.2-5.1.7:
    for each additional bit pair, the I/Q amplitude is reflected around a
    power-of-two offset depending on the earlier bits.
    """
    qm = MOD_TO_QM[modulation]
    scale = 1.0 / np.sqrt(_QM_SCALE[qm])
    points = np.empty(1 << qm, dtype=np.complex128)
    for v in range(1 << qm):
        b = [(v >> (qm - 1 - i)) & 1 for i in range(qm)]
        re, im = 1.0, 1.0
        for q in range(2, qm, 2):
            re = (1 << (q // 2)) - (1 - 2 * b[qm - q]) * re
            im = (1 << (q // 2)) - (1 - 2 * b[qm + 1 - q]) * im
        re *= 1 - 2 * b[0]
        im *= 1 - 2 * b[min(1, qm - 1)]
        points[v] = scale * (re + 1j * im)
    return points


@lru_cache(maxsize=8)
def bit_partition(modulation: str) -> np.ndarray:
    """(2, 2^(qm-1), qm) int32: [b, :, i] = constellation indices whose i-th bit is b."""
    qm = MOD_TO_QM[modulation]
    n = 1 << qm
    idx = np.arange(n)
    out = np.empty((2, n // 2 if qm > 0 else 1, qm), dtype=np.int32)
    for i in range(qm):
        bit_i = (idx >> (qm - 1 - i)) & 1
        out[0, :, i] = idx[bit_i == 0]
        out[1, :, i] = idx[bit_i == 1]
    return out


class Modem:
    """Stateless modulator/demodulator for one modulation scheme.

    Host tables are NumPy; ``modulate`` / ``llrs_from_symbols`` are
    jit-friendly JAX functions.
    """

    def __init__(self, modulation: str = "QPSK"):
        if modulation not in MOD_TO_QM:
            raise ValueError(f"Unsupported modulation {modulation!r}")
        self.modulation = modulation
        self.qm = MOD_TO_QM[modulation]
        self.constellation = constellation(modulation)
        self._partition = bit_partition(modulation)
        self._pow2 = (2 ** np.arange(self.qm - 1, -1, -1)).astype(np.int32)

    # -------------------------------------------------------------- TX
    def modulate(self, bits: jnp.ndarray) -> jnp.ndarray:
        """bits (..., n*qm) in {0,1} -> symbols (..., n) complex64."""
        qm = self.qm
        if bits.shape[-1] % qm:
            raise ValueError(
                f"bitstream length {bits.shape[-1]} must be a multiple of qm={qm}")
        shape = bits.shape[:-1] + (bits.shape[-1] // qm, qm)
        groups = bits.reshape(shape).astype(jnp.int32)
        sym_idx = jnp.sum(groups * jnp.asarray(self._pow2), axis=-1)
        const = jnp.asarray(self.constellation.astype(np.complex64))
        return const[sym_idx]

    # -------------------------------------------------------------- RX
    def llrs_from_symbols(self, symbols: jnp.ndarray, noise_var, use_max: bool = True) -> jnp.ndarray:
        """symbols (..., n) -> LLRs (..., n*qm); llr>0 means bit 0 more likely.

        ``noise_var`` may be a scalar or broadcastable to ``symbols`` (per-RE
        noise, e.g. after MMSE equalization scaling).
        """
        const = jnp.asarray(self.constellation.astype(np.complex64))
        d2 = jnp.square(jnp.abs(symbols[..., None] - const))      # (..., 2^qm)
        nv = jnp.asarray(noise_var, dtype=d2.dtype)
        if nv.ndim > 0:
            nv = nv[..., None]
        exponents = -d2 / nv
        part = jnp.asarray(self._partition)                        # (2, 2^(qm-1), qm)
        grouped = exponents[..., part]                             # (..., 2, 2^(qm-1), qm)
        if use_max:
            lls = jnp.max(grouped, axis=-2)
        else:
            lls = jax_logsumexp(grouped, axis=-2)
        llrs = lls[..., 0, :] - lls[..., 1, :]                     # (..., qm)
        return llrs.reshape(llrs.shape[:-2] + (-1,))

    def demodulate(self, symbols: jnp.ndarray, noise_var, use_max: bool = True) -> jnp.ndarray:
        """Hard-decision bits from LLRs (bit = 1 where llr <= 0)."""
        llrs = self.llrs_from_symbols(symbols, noise_var, use_max)
        return (llrs <= 0).astype(jnp.int8)


def jax_logsumexp(x, axis):
    m = jnp.max(x, axis=axis, keepdims=True)
    return (m + jnp.log(jnp.sum(jnp.exp(x - m), axis=axis, keepdims=True))).squeeze(axis)
