"""5G NR LDPC coding chain — TS 38.212 §5.2.2 (segmentation), §5.3.2
(encoding), §5.4.2 (rate matching) — TPU-native design.

Host side (``LdpcConfig``): all parameter derivation (C, K, Zc, iLS, filler
count, Er split) and *every* index computation — cyclic-shift gathers for the
base-graph edges, the rate-match circular-buffer + interleaver permutation as
one flat gather, and its transpose as one scatter-add for rate recovery.
Everything is static for a fixed (transport block size, G, rv).

Device side: pure jitted functions, batched over arbitrary leading axes:
- ``encode``: double-diagonal parity solve expressed as static gathers + mod-2
  sums (int32 on the VPU).
- ``rate_match``: ONE gather.
- ``recover_rate``: ONE scatter-add (which also realizes HARQ soft combining
  when fed the previous soft buffer).
- ``decode``: layered min-sum belief propagation, vectorized over codewords x
  lifting lanes; the layer loop is a static unroll inside a
  ``lax.fori_loop`` over iterations. 0.75 min-sum normalization and 2*Zc
  puncture handling match the reference semantics (``ldpc.py:1529-1581``).

Behavioral parity: reference ``neoradium/ldpc.py`` (LdpcBase/LdpcEncoder/
LdpcDecoder); filler bits transmitted as 0 / decoded as LARGE_LLR
(ldpc.py:1026-1028, 1414-1418).
"""
from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from .tables import ldpc_base_graph_sets, ldpc_lifting_sets
from .. import crc as crc_mod

LARGE_LLR = 1e20
_K0_NUM = {1: [0, 17, 33, 56], 2: [0, 13, 25, 43]}  # TS 38.212 Table 5.4.2.1-2
_MOD2QM = {"BPSK": 1, "QPSK": 2, "16QAM": 4, "64QAM": 6, "256QAM": 8, "1024QAM": 10}


def select_lifting(kb: int, kPrime: float):
    """Minimum Zc over all sets with kb*Zc >= K' -> (iLS, Zc)."""
    best = (None, 10**9)
    for i, s in enumerate(ldpc_lifting_sets()):
        for z in s:
            if kb * z >= kPrime and z < best[1]:
                best = (i, z)
    return best


class LdpcConfig:
    """Static LDPC chain parameters + precomputed device index tables.

    Args:
      payloadSize: transport block size A in bits, *excluding* the 24-bit TB
        CRC (B = A + 24 internally, as in TS 38.212 §5.2.2).
      baseGraphNo: 1 or 2.
      modulation: one of BPSK..1024QAM (sets the rate-match interleaver qm).
      txLayers: number of transmission layers (Er granularity).
      targetRate: code rate used to derive G when ``g`` is None.
      g: total rate-matched bits for the TB; default ceil(A / targetRate).
      nRef: LBRM circular-buffer limit (0 = disabled).
    """

    def __init__(self, payloadSize: int, baseGraphNo: int = 1, modulation: str = "QPSK",
                 txLayers: int = 1, targetRate: float = 449 / 1024, g: int | None = None,
                 nRef: int = 0):
        if baseGraphNo not in (1, 2):
            raise ValueError("baseGraphNo must be 1 or 2")
        if modulation not in _MOD2QM:
            raise ValueError(f"Invalid modulation {modulation!r}")
        self.payloadSize = int(payloadSize)
        self.baseGraphNo = baseGraphNo
        self.modulation = modulation
        self.qm = _MOD2QM[modulation]
        self.txLayers = txLayers
        self.targetRate = targetRate
        self.nRef = nRef

        # ---- segmentation parameters (TS 38.212 §5.2.2)
        B = self.payloadSize + 24
        self.txBlockSize = B
        Kcb = 8448 if baseGraphNo == 1 else 3840
        self.maxCodeBlockSize = Kcb
        if B <= Kcb:
            L, C, Bp = 0, 1, B
        else:
            L = 24
            C = int(np.ceil(B / (Kcb - L)))
            Bp = B + C * L
        kPrime = Bp / C
        if baseGraphNo == 1:
            kb = 22
        elif B > 640:
            kb = 10
        elif B > 560:
            kb = 9
        elif B > 192:
            kb = 8
        else:
            kb = 6
        self.setIndex, self.liftingSize = select_lifting(kb, kPrime)
        z = self.liftingSize
        self.numCodeBlocks = C
        self.codeBlockSize = (22 if baseGraphNo == 1 else 10) * z  # K
        self.bitsPerCodeBlock = int(np.ceil(B / C)) + (24 if C > 1 else 0)
        self.numFillerBits = self.codeBlockSize - self.bitsPerCodeBlock

        # ---- base graph materialization (shift values mod Zc; -1 = no edge)
        sets = ldpc_base_graph_sets(baseGraphNo)
        bg = sets[:, :, self.setIndex].astype(np.int32)
        bg = np.where(bg >= 0, bg % z, -1)
        self.baseGraph = bg                           # (rows, cols)
        self.numParityRows, self.numCols = bg.shape   # (46, 68) or (42, 52)
        self.kCols = self.numCols - self.numParityRows  # 22 or 10
        self.nz = (self.numCols - 2) * z              # coded length (66z / 50z)

        # ---- rate matching (TS 38.212 §5.4.2)
        if g is None:
            g = int(np.ceil(self.payloadSize / targetRate))
        self.G = int(g)
        f = self.txLayers * self.qm
        gBase = int(np.ceil(self.G / f))
        erList = np.zeros(C, dtype=np.int64)
        erList[C - gBase % C if gBase % C else C:] = f
        erList += (gBase // C) * f
        self.cbLens = erList                          # Er per code block
        nCB = self.nz if nRef == 0 else min(self.nz, nRef)
        self.nCB = nCB
        self.sysLenNoFill = self.codeBlockSize - 2 * z - self.numFillerBits
        self.cirBufSize = nCB - self.numFillerBits

        self._rm_cache = {}

    # ------------------------------------------------------------ indices
    def k0(self, rv: int) -> int:
        if rv not in (0, 1, 2, 3):
            raise ValueError("rv must be one of 0, 1, 2, 3")
        return (_K0_NUM[self.baseGraphNo][rv] * self.nCB // self.nz) * self.liftingSize

    def rate_match_indices(self, rv: int = 0):
        """(cb_idx, buf_idx) int32 arrays of length G.

        Output bit p (global) comes from circBuf[cb_idx[p], buf_idx[p]], where
        circBuf is the filler-less circular buffer of size ``cirBufSize``.
        Includes the §5.4.2.2 qm-column interleaver.
        """
        key = ("rm", rv)
        if key not in self._rm_cache:
            qm, k0 = self.qm, self.k0(rv)
            cbs, bufs = [], []
            for r in range(self.numCodeBlocks):
                e = int(self.cbLens[r])
                t = np.arange(e)
                j = (t % qm) * (e // qm) + t // qm      # de-interleaved source pos
                bufs.append((j + k0) % self.cirBufSize)
                cbs.append(np.full(e, r))
            self._rm_cache[key] = (np.concatenate(cbs).astype(np.int32),
                                   np.concatenate(bufs).astype(np.int32))
        return self._rm_cache[key]

    @property
    def fillerRange(self):
        """Positions of filler bits within a K-bit code block."""
        return self.codeBlockSize - self.numFillerBits, self.codeBlockSize

    # ------------------------------------------------------------ helpers
    def circ_buffer_from_coded(self, coded):
        """coded (..., C, nz) -> filler-less circular buffer (..., C, cirBufSize).

        The coded block is the punctured codeword (first 2Zc bits removed);
        its systematic part spans [0, K-2z) and contains fillers at the end.
        """
        s = self.sysLenNoFill
        sysEnd = self.codeBlockSize - 2 * self.liftingSize
        return jnp.concatenate([coded[..., :s], coded[..., sysEnd:self.nCB]], axis=-1)


# ======================================================================
# Encoder
# ======================================================================
class LdpcEncoder:
    """Device LDPC encoder: TB CRC -> segmentation -> encode -> rate match."""

    def __init__(self, config: LdpcConfig):
        self.cfg = config
        c = config
        z = c.liftingSize
        # CRC matrices
        self._tb_crc_mat = jnp.asarray(crc_mod.crc_matrix(c.payloadSize, "24A"))
        if c.numCodeBlocks > 1:
            self._cb_crc_mat = jnp.asarray(
                crc_mod.crc_matrix(c.bitsPerCodeBlock - 24, "24B"))
        # Precompute shift gather indices for each base-graph row over the
        # first kCols+4 columns (enough for the full parity recursion).
        bg = c.baseGraph
        self._row_info = []
        for i, row in enumerate(bg):
            cols = np.where(row[:c.kCols + 4] >= 0)[0] if i >= 4 else \
                   np.where(row[:c.kCols] >= 0)[0]
            shifts = row[cols]
            idx = (shifts[:, None] + np.arange(z)[None, :]) % z   # (q, z)
            self._row_info.append((cols.astype(np.int32), jnp.asarray(idx)))
        # p0 unshift amount (double-diagonal column kCols appears with a
        # nonzero shift in exactly one of rows 1..2)
        s01 = bg[1, c.kCols]
        self._p0_shift = z - (bg[2, c.kCols] if s01 == -1 else s01)
        # extra gathers for rows 0..3 restricted to parity cols kCols..kCols+i
        self._diag_info = []
        for i in range(4):
            cols = np.where(bg[i, c.kCols:c.kCols + 4] >= 0)[0] + c.kCols
            shifts = bg[i, cols]
            idx = (shifts[:, None] + np.arange(z)[None, :]) % z
            self._diag_info.append((cols.astype(np.int32), jnp.asarray(idx)))

    # ---------------------------------------------------------------- steps
    def segment(self, txBlock: jnp.ndarray) -> jnp.ndarray:
        """txBlock (..., A) -> code blocks (..., C, K) int8 (with CRCs+fillers)."""
        c = self.cfg
        b = crc_mod.append_crc_device(txBlock.astype(jnp.float32), self._tb_crc_mat)
        perCB = int(np.ceil(c.txBlockSize / c.numCodeBlocks))
        pad = perCB * c.numCodeBlocks - c.txBlockSize
        if pad:
            b = jnp.pad(b, [(0, 0)] * (b.ndim - 1) + [(0, pad)])
        cbs = b.reshape(b.shape[:-1] + (c.numCodeBlocks, perCB))
        if c.numCodeBlocks > 1:
            cbs = crc_mod.append_crc_device(cbs, self._cb_crc_mat)
        if c.numFillerBits:
            cbs = jnp.pad(cbs, [(0, 0)] * (cbs.ndim - 1) + [(0, c.numFillerBits)])
        return cbs.astype(jnp.int8)

    def _shift_sum(self, x, cols, idx):
        """sum_j roll(x[..., cols[j], :], -shift_j) mod 2 -> (..., z)."""
        sub = x[..., cols, :]
        gathered = jnp.take_along_axis(
            sub, jnp.broadcast_to(idx, sub.shape), axis=-1)
        return jnp.sum(gathered, axis=-2) % 2

    def encode(self, codeBlocks: jnp.ndarray, puncture: bool = True) -> jnp.ndarray:
        """codeBlocks (..., C, K) -> coded (..., C, nz) (2Zc punctured)."""
        c = self.cfg
        z = c.liftingSize
        lead = codeBlocks.shape[:-1]
        x = codeBlocks.reshape(lead + (c.kCols, z)).astype(jnp.int32)
        pz = jnp.zeros(lead + (c.numParityRows, z), jnp.int32)
        x = jnp.concatenate([x, pz], axis=-2)          # (..., numCols, z)

        # rows 0..3 systematic sums
        s = [self._shift_sum(x, *self._row_info[i]) for i in range(4)]
        total = (s[0] + s[1] + s[2] + s[3]) % 2
        p0 = jnp.roll(total, -self._p0_shift, axis=-1)
        x = x.at[..., c.kCols, :].set(p0)
        for i in range(3):
            cols, idx = self._diag_info[i]
            pi = (s[i] + self._shift_sum(x, cols, idx)) % 2
            x = x.at[..., c.kCols + i + 1, :].set(pi)
        for r in range(4, c.numParityRows):
            cols, idx = self._row_info[r]
            pr = self._shift_sum(x, cols, idx)
            x = x.at[..., c.kCols + r, :].set(pr)

        coded = x.reshape(lead + (c.numCols * z,)).astype(jnp.int8)
        return coded[..., 2 * z:] if puncture else coded

    def rate_match(self, coded: jnp.ndarray, rv: int = 0) -> jnp.ndarray:
        """coded (..., C, nz) -> rate-matched bits (..., G)."""
        c = self.cfg
        circ = c.circ_buffer_from_coded(coded)         # (..., C, cirBufSize)
        cb_idx, buf_idx = c.rate_match_indices(rv)
        return circ[..., jnp.asarray(cb_idx), jnp.asarray(buf_idx)]

    def encode_tb(self, txBlock: jnp.ndarray, rv: int = 0) -> jnp.ndarray:
        """One-shot: payload (..., A) -> rate-matched bits (..., G)."""
        return self.rate_match(self.encode(self.segment(txBlock)), rv)


# ======================================================================
# Decoder
# ======================================================================
class LdpcDecoder:
    """Device LDPC decoder: rate recovery (+HARQ combine) -> layered min-sum
    decode -> CRC check & merge."""

    def __init__(self, config: LdpcConfig):
        self.cfg = config
        c = config
        z = c.liftingSize
        bg = c.baseGraph
        # Per-layer static data: columns, fwd/bwd shift gathers, ll slice.
        self._layers = []
        off = 0
        for row in bg:
            cols = np.where(row >= 0)[0]
            shifts = row[cols]
            fwd = (shifts[:, None] + np.arange(z)[None, :]) % z
            bwd = (np.arange(z)[None, :] - shifts[:, None]) % z
            self._layers.append(dict(
                cols=cols.astype(np.int32), fwd=jnp.asarray(fwd),
                bwd=jnp.asarray(bwd), off=off, q=len(cols)))
            off += len(cols)
        self._totalEdges = off
        self._tb_crc_mat = jnp.asarray(crc_mod.crc_matrix(c.txBlockSize, "24A"))
        if c.numCodeBlocks > 1:
            self._cb_crc_mat = jnp.asarray(
                crc_mod.crc_matrix(c.bitsPerCodeBlock, "24B"))

    # ---------------------------------------------------------------- steps
    def recover_rate(self, llrs: jnp.ndarray, rv: int = 0,
                     softBuffer: jnp.ndarray | None = None):
        """llrs (..., G) -> (recovered (..., C, nz), softBuffer (..., C, cirBuf)).

        HARQ soft combining: pass the previous transmission's ``softBuffer``
        and the new rv; LLRs accumulate into the same circular buffer
        (reference ldpc.py:1377-1412).
        """
        c = self.cfg
        cb_idx, buf_idx = c.rate_match_indices(rv)
        if softBuffer is None:
            softBuffer = jnp.zeros(llrs.shape[:-1] + (c.numCodeBlocks, c.cirBufSize),
                                   dtype=llrs.dtype)
        buf = softBuffer.at[..., jnp.asarray(cb_idx), jnp.asarray(buf_idx)].add(llrs)

        s = c.sysLenNoFill
        filler = jnp.full(buf.shape[:-1] + (c.numFillerBits,), LARGE_LLR, buf.dtype)
        tailLen = c.nz - c.nCB
        parts = [buf[..., :s], filler, buf[..., s:]]
        if tailLen:  # LBRM: untransmitted tail has zero LLR
            parts.append(jnp.zeros(buf.shape[:-1] + (tailLen,), buf.dtype))
        return jnp.concatenate(parts, axis=-1), buf

    def decode(self, recovered: jnp.ndarray, numIter: int = 5,
               onlyInfoBits: bool = True, outputBelief: bool = False):
        """Layered min-sum BP. recovered (..., C, nz) -> bits (..., C, K)."""
        c = self.cfg
        z = c.liftingSize
        lead = recovered.shape[:-1]
        rx = jnp.clip(recovered.astype(jnp.float32), -1e10, 1e10)
        r = jnp.concatenate(
            [jnp.zeros(lead + (2 * z,), jnp.float32), rx], axis=-1
        ).reshape(lead + (c.numCols, z))
        ll = jnp.zeros(lead + (self._totalEdges, z), jnp.float32)

        layers = self._layers

        def one_iteration(_, carry):
            r, ll = carry
            for L in layers:
                cols = L["cols"]
                sl = slice(L["off"], L["off"] + L["q"])
                r_sub = r[..., cols, :] - ll[..., sl, :]
                shifted = jnp.take_along_axis(
                    r_sub, jnp.broadcast_to(L["fwd"], r_sub.shape), axis=-1)
                sign = jnp.where(shifted < 0, -1.0, 1.0)
                parity = jnp.prod(sign, axis=-2, keepdims=True)
                mag = jnp.abs(shifted)
                min1 = jnp.min(mag, axis=-2, keepdims=True)
                amin = jnp.argmin(mag, axis=-2, keepdims=True)
                big = jnp.where(
                    jax.lax.broadcasted_iota(jnp.int32, mag.shape, mag.ndim - 2)
                    == amin, jnp.inf, mag)
                min2 = jnp.min(big, axis=-2, keepdims=True)
                mins = jnp.where(
                    jax.lax.broadcasted_iota(jnp.int32, mag.shape, mag.ndim - 2)
                    == amin, min2, min1)
                new_ll = mins * sign * parity
                new_ll = jnp.take_along_axis(
                    new_ll, jnp.broadcast_to(L["bwd"], new_ll.shape), axis=-1) * 0.75
                ll = ll.at[..., sl, :].set(new_ll)
                r = r.at[..., cols, :].set(r_sub + new_ll)
            return r, ll

        r, ll = jax.lax.fori_loop(0, numIter, one_iteration, (r, ll))
        beliefs = r.reshape(lead + (c.numCols * z,))
        if onlyInfoBits:
            beliefs = beliefs[..., :c.codeBlockSize]
        if outputBelief:
            return beliefs
        return (beliefs < 0).astype(jnp.int8)

    def check_crc_and_merge(self, decoded: jnp.ndarray):
        """decoded (..., C, K) -> (txBlockWithCrc (..., B), cbCrcOk (..., C))."""
        c = self.cfg
        noFill = decoded[..., :c.codeBlockSize - c.numFillerBits]
        if c.numCodeBlocks == 1:
            merged = noFill.reshape(noFill.shape[:-2] + (-1,))
            ok = crc_mod.check_crc_device(merged, self._tb_crc_mat)[..., None]
            return merged, ok
        ok = crc_mod.check_crc_device(noFill, self._cb_crc_mat)
        merged = noFill[..., :-24].reshape(noFill.shape[:-2] + (-1,))
        return merged, ok

    def decode_tb(self, llrs: jnp.ndarray, rv: int = 0, numIter: int = 5,
                  softBuffer: jnp.ndarray | None = None):
        """One-shot: LLRs (..., G) -> (payload (..., A), tbOk (...), buffer)."""
        c = self.cfg
        rec, buf = self.recover_rate(llrs, rv, softBuffer)
        decoded = self.decode(rec, numIter)
        merged, cbOk = self.check_crc_and_merge(decoded)
        tbOk = crc_mod.check_crc_device(merged, self._tb_crc_mat) & jnp.all(cbOk, axis=-1)
        return merged[..., :c.payloadSize], tbOk, buf
