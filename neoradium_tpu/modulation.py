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
def pam_axis_tables(modulation: str):
    """Per-axis PAM decomposition of the Gray-mapped square constellation.

    The 38.211 mappings put even bit positions on I and odd ones on Q, so a
    max-log LLR separates exactly per axis (the other axis' best term cancels
    in the subtraction). Returns (levels (2^h,), subsets (h, 2, 2^(h-1)))
    where h = qm/2: levels[j] is the I amplitude for packed even bits j, and
    subsets[k, v] lists the level indices whose k-th bit is v. The Q axis
    uses the same tables (the spec's I/Q recursions are identical).
    """
    qm = MOD_TO_QM[modulation]
    if qm < 2:
        return None
    h = qm // 2
    pts = constellation(modulation)
    levels = np.empty(1 << h)
    for j in range(1 << h):
        # spread packed bits j into even positions of a constellation index
        v = 0
        for k in range(h):
            v |= ((j >> (h - 1 - k)) & 1) << (qm - 1 - 2 * k)
        levels[j] = pts[v].real
    # verify the separation on the full constellation
    for v in range(1 << qm):
        jI = int("".join(str((v >> (qm - 1 - 2 * k)) & 1) for k in range(h)), 2)
        jQ = int("".join(str((v >> (qm - 2 - 2 * k)) & 1) for k in range(h)), 2)
        assert pts[v].real == levels[jI] and pts[v].imag == levels[jQ]
    idx = np.arange(1 << h)
    subsets = np.empty((h, 2, 1 << (h - 1)), dtype=np.int32)
    for k in range(h):
        bit = (idx >> (h - 1 - k)) & 1
        subsets[k, 0] = idx[bit == 0]
        subsets[k, 1] = idx[bit == 1]
    return levels, subsets


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

        TPU note: the max-log path uses the exact per-axis PAM decomposition
        (see pam_axis_tables) — 2*2^(qm/2) scalar distances and elementwise
        min-trees instead of 2^qm complex distances plus a (2, 2^(qm-1), qm)
        partition gather; mathematically identical, ~4-10x less work and no
        lane gathers.
        """
        if use_max and self.qm >= 2:
            return self._llrs_maxlog_pam(symbols, noise_var)
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

    def _llrs_maxlog_pam(self, symbols: jnp.ndarray, noise_var) -> jnp.ndarray:
        """Exact max-log LLRs via the per-axis PAM decomposition."""
        levels, subsets = pam_axis_tables(self.modulation)
        h = self.qm // 2
        x, y = jnp.real(symbols), jnp.imag(symbols)
        nv = jnp.asarray(noise_var, dtype=x.dtype)
        inv = 1.0 / nv
        dx = [jnp.square(x - jnp.asarray(a, x.dtype)) for a in levels]
        dy = [jnp.square(y - jnp.asarray(a, y.dtype)) for a in levels]

        def tree_min(arrs):
            while len(arrs) > 1:
                arrs = [jnp.minimum(arrs[i], arrs[i + 1]) if i + 1 < len(arrs)
                        else arrs[i] for i in range(0, len(arrs), 2)]
            return arrs[0]

        perBit = []
        for k in range(h):
            s0, s1 = subsets[k]
            for d in (dx, dy):  # bit 2k is on I, bit 2k+1 on Q
                m0 = tree_min([d[j] for j in s0])
                m1 = tree_min([d[j] for j in s1])
                perBit.append((m1 - m0) * inv)
        llrs = jnp.stack(perBit, axis=-1)                          # (..., n, qm)
        return llrs.reshape(llrs.shape[:-2] + (-1,))

    def demodulate(self, symbols: jnp.ndarray, noise_var, use_max: bool = True) -> jnp.ndarray:
        """Hard-decision bits from LLRs (bit = 1 where llr <= 0)."""
        llrs = self.llrs_from_symbols(symbols, noise_var, use_max)
        return (llrs <= 0).astype(jnp.int8)


def jax_logsumexp(x, axis):
    m = jnp.max(x, axis=axis, keepdims=True)
    return (m + jnp.log(jnp.sum(jnp.exp(x - m), axis=axis, keepdims=True))).squeeze(axis)
