"""5G NR LDPC coding chain — TS 38.212 §5.2.2 (segmentation), §5.3.2
(encoding), §5.4.2 (rate matching) — TPU-native design.

Host side (``LdpcConfig``): all parameter derivation (C, K, Zc, iLS, filler
count, Er split, k0/wrap geometry). Everything is static for a fixed
(transport block size, G, rv).

Device side: pure jitted functions, batched over arbitrary leading axes, all
in structure-of-arrays form — the lifting dimension Zc is the minor (lane)
axis, base-graph columns are separate arrays, cyclic shifts are static
``jnp.roll`` — so the whole chain is elementwise ops + contiguous reshapes
with NO gather/scatter (TPU lane-dim gathers and scatters are slow paths):
- ``encode``: double-diagonal parity solve as static rolls + mod-2 sums.
- ``rate_match``: circular buffer tiled over its wraps + one contiguous
  slice; the qm-column interleaver is a reshape/transpose.
- ``recover_rate``: the transpose de-interleave + zero-pad/(wraps, ncb)
  reshape/sum (which also realizes HARQ soft combining when fed the previous
  soft buffer).
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

    # ------------------------------------------------------------ printing
    def print(self, indent: int = 0, title: str | None = None,
              getStr: bool = False):
        """Reference-style property listing (LdpcBase.print, ldpc.py)."""
        from ..utils import format_properties
        s = format_properties(
            title or "LDPC Properties:",
            [("baseGraphNo", self.baseGraphNo),
             ("payloadSize (A)", self.payloadSize),
             ("txBlockSize (B)", self.txBlockSize),
             ("numCodeBlocks (C)", self.numCodeBlocks),
             ("codeBlockSize (K)", self.codeBlockSize),
             ("liftingSize (Zc)", self.liftingSize),
             ("setIndex (iLS)", self.setIndex),
             ("numFillerBits", self.numFillerBits),
             ("modulation", self.modulation),
             ("txLayers", self.txLayers),
             ("targetRate", f"{self.targetRate:.4f}"),
             ("G (rate-matched bits)", self.G),
             ("cirBufSize", self.cirBufSize)], indent)
        if getStr:
            return s
        print(s)

    def __repr__(self):
        return self.print(getStr=True)

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

    def covered_nz(self, rvs=(0,)):
        """Boolean (nz,): punctured-codeword positions that receive channel
        LLRs in at least one transmission at the given redundancy versions
        (union over code blocks / rvs; filler positions excluded — they get
        LARGE_LLR, not channel LLRs, but sit in high-degree systematic
        columns so they never matter for row pruning)."""
        covBuf = np.zeros(self.cirBufSize, bool)
        e = int(self.cbLens.max())
        for rv in rvs:
            k0 = self.k0(rv) % self.cirBufSize
            idx = (k0 + np.arange(min(e, self.cirBufSize))) % self.cirBufSize
            covBuf[idx] = True
        cov = np.zeros(self.nz, bool)
        s = self.sysLenNoFill
        sysEnd = self.codeBlockSize - 2 * self.liftingSize
        cov[:s] = covBuf[:s]
        cov[sysEnd:self.nCB] = covBuf[s:]
        return cov

    @lru_cache(maxsize=None)
    def active_rows(self, rvs=None):
        """Base-graph rows that can influence min-sum decoding when only the
        given redundancy versions were transmitted (``None`` = assume all
        positions may carry LLRs = keep every row).

        A row containing a degree-1 column (the NR extension parities,
        columns kCols+4..numCols-1 touch exactly one row each) whose Zc
        channel LLRs are ALL zero is provably inert under (layered) min-sum:
        that variable's belief always equals this row's own message, so its
        variable-to-check input is identically 0, the row's min1 is 0, and
        every message it sends to its other columns is exactly 0 at every
        iteration. Skipping such rows is bit-identical for the decoded
        codeBlockSize prefix — i.e. for ``decode(..., onlyInfoBits=True)``,
        which every in-repo caller uses; the pruned degree-1 extension
        columns themselves keep their (zero) channel LLR instead of
        receiving the skipped row's message, so full-codeword beliefs and
        ``is_valid_coded_block`` on them can differ from the unpruned
        decoder. Cross-checked in
        tests/test_ldpc.py::test_active_rows_pruning_exact. For the
        headline R=490/1024 config this prunes 20 of 46 layers (46 -> 26).
        """
        if rvs is None:
            return tuple(range(self.numParityRows))
        cov = self.covered_nz(tuple(rvs))
        bg = self.baseGraph
        colDeg = (bg >= 0).sum(axis=0)
        z = self.liftingSize
        rows = []
        for i, row in enumerate(bg):
            inert = False
            for ci in np.where(row >= 0)[0]:
                if colDeg[ci] == 1 and ci >= 2 \
                        and not cov[(ci - 2) * z:(ci - 1) * z].any():
                    inert = True
                    break
            if not inert:
                rows.append(i)
        return tuple(rows)

    # ------------------------------------------------------------ helpers
    def circ_buffer_from_coded(self, coded):
        """coded (..., C, nz) -> filler-less circular buffer (..., C, cirBufSize).

        The coded block is the punctured codeword (first 2Zc bits removed);
        its systematic part spans [0, K-2z) and contains fillers at the end.
        """
        s = self.sysLenNoFill
        sysEnd = self.codeBlockSize - 2 * self.liftingSize
        return jnp.concatenate([coded[..., :s], coded[..., sysEnd:self.nCB]], axis=-1)


def _gather_info(obj, cols, shifts):
    """(cols int32 array, (q, z) fwd-shift gather index array), cached on obj."""
    key = (tuple(cols), tuple(shifts))
    cache = getattr(obj, "_gather_cache", None)
    if cache is None:
        cache = obj._gather_cache = {}
    if key not in cache:
        z = obj.cfg.liftingSize
        idx = (np.asarray(shifts)[:, None] + np.arange(z)[None, :]) % z
        cache[key] = (np.asarray(cols, np.int32), idx.astype(np.int32))
    return cache[key]


# ======================================================================
# Encoder
# ======================================================================
class LdpcEncoder:
    """Device LDPC encoder: TB CRC -> segmentation -> encode -> rate match."""


    def print(self, indent: int = 0, title: str | None = None,
              getStr: bool = False):
        return self.cfg.print(indent, title or "LDPC Encoder Properties:", getStr)

    def __repr__(self):
        return self.print(getStr=True)

    def __init__(self, config: LdpcConfig):
        self.cfg = config
        c = config
        z = c.liftingSize
        # CRC matrices
        self._tb_crc_mat = jnp.asarray(crc_mod.crc_matrix(c.payloadSize, "24A"))
        if c.numCodeBlocks > 1:
            self._cb_crc_mat = jnp.asarray(
                crc_mod.crc_matrix(c.bitsPerCodeBlock - 24, "24B"))
        # Per-row static (cols, shifts) over the first kCols+4 columns
        # (enough for the full parity recursion). The encoder is structure-of-
        # arrays like the decoder: code blocks live as one (..., Zc) array per
        # base-graph column, cyclic shifts are static jnp.roll — no gathers.
        bg = c.baseGraph
        self._row_info = []
        for i, row in enumerate(bg):
            cols = np.where(row[:c.kCols + 4] >= 0)[0] if i >= 4 else \
                   np.where(row[:c.kCols] >= 0)[0]
            self._row_info.append((list(map(int, cols)),
                                   [int(s) for s in row[cols]]))
        # p0 unshift amount (double-diagonal column kCols appears with a
        # nonzero shift in exactly one of rows 1..2)
        s01 = bg[1, c.kCols]
        self._p0_shift = int(z - (bg[2, c.kCols] if s01 == -1 else s01))
        # rows 0..3 restricted to parity cols kCols..kCols+i
        self._diag_info = []
        for i in range(4):
            cols = np.where(bg[i, c.kCols:c.kCols + 4] >= 0)[0] + c.kCols
            self._diag_info.append((list(map(int, cols)),
                                    [int(s) for s in bg[i, cols]]))

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

    def encode(self, codeBlocks: jnp.ndarray, puncture: bool = True,
               impl: str = "auto") -> jnp.ndarray:
        """codeBlocks (..., C, K) -> coded (..., C, nz) (2Zc punctured).

        Structure-of-arrays double-diagonal parity solve: one (..., Zc) array
        per column, static rolls + mod-2 sums (reference ldpc.py:1066-1084).

        impl: 'soa' (TPU-optimal: many small fused elementwise ops),
          'dense' (gather-based: far cheaper for XLA CPU to compile and to
          dispatch eagerly), or 'auto' (soa unless the default backend is
          cpu). Both produce identical bits.
        """
        if impl == "auto":
            impl = "dense" if jax.default_backend() == "cpu" else "soa"
        if impl == "dense":
            return self._encode_dense(codeBlocks, puncture)
        c = self.cfg
        z = c.liftingSize
        lead = codeBlocks.shape[:-1]
        # int8 accumulation: row degrees are <= 20 so partial sums never
        # overflow, and the narrower lanes quarter the encoder's VPU/HBM
        # traffic vs int32
        xf = codeBlocks.astype(jnp.int8)
        xcols = [xf[..., ci * z:(ci + 1) * z] for ci in range(c.kCols)]
        xcols += [None] * c.numParityRows

        def shift_sum(cols, shifts):
            # not-yet-solved parity columns (None) are all-zero: skip them
            return sum(jnp.roll(xcols[ci], -sh, axis=-1)
                       for ci, sh in zip(cols, shifts)
                       if xcols[ci] is not None) % 2

        # rows 0..3 systematic sums
        s = [shift_sum(*self._row_info[i]) for i in range(4)]
        total = (s[0] + s[1] + s[2] + s[3]) % 2
        xcols[c.kCols] = jnp.roll(total, -self._p0_shift, axis=-1)
        for i in range(3):
            cols, shifts = self._diag_info[i]
            xcols[c.kCols + i + 1] = (s[i] + shift_sum(cols, shifts)) % 2
        for r in range(4, c.numParityRows):
            cols, shifts = self._row_info[r]
            xcols[c.kCols + r] = shift_sum(cols, shifts)

        coded = jnp.concatenate(xcols, axis=-1).astype(jnp.int8)
        return coded[..., 2 * z:] if puncture else coded

    def _encode_dense(self, codeBlocks: jnp.ndarray, puncture: bool) -> jnp.ndarray:
        """Gather/scatter formulation of encode (cheap to compile on CPU)."""
        c = self.cfg
        z = c.liftingSize
        lead = codeBlocks.shape[:-1]
        x = codeBlocks.reshape(lead + (c.kCols, z)).astype(jnp.int32)
        x = jnp.concatenate(
            [x, jnp.zeros(lead + (c.numParityRows, z), jnp.int32)], axis=-2)

        def shift_sum(cols, shifts):
            ci, idx = _gather_info(self, cols, shifts)
            sub = x[..., ci, :]
            g = jnp.take_along_axis(sub, jnp.broadcast_to(idx, sub.shape), axis=-1)
            # keep int32: under x64 jnp.sum promotes to int64, which would make
            # the .at[].set scatter below a lossy cast (FutureWarning → error)
            return (jnp.sum(g, axis=-2) % 2).astype(jnp.int32)

        s = [shift_sum(*self._row_info[i]) for i in range(4)]
        total = (s[0] + s[1] + s[2] + s[3]) % 2
        x = x.at[..., c.kCols, :].set(jnp.roll(total, -self._p0_shift, axis=-1))
        for i in range(3):
            pi = (s[i] + shift_sum(*self._diag_info[i])) % 2
            x = x.at[..., c.kCols + i + 1, :].set(pi)
        for r in range(4, c.numParityRows):
            x = x.at[..., c.kCols + r, :].set(shift_sum(*self._row_info[r]))

        coded = x.reshape(lead + (c.numCols * z,)).astype(jnp.int8)
        return coded[..., 2 * z:] if puncture else coded

    def rate_match(self, coded: jnp.ndarray, rv: int = 0) -> jnp.ndarray:
        """coded (..., C, nz) -> rate-matched bits (..., G).

        Per code block: tile the circular buffer over its wraps, take the
        contiguous [k0, k0+E) slice, then the qm-column interleaver is a
        reshape/transpose — contiguous ops only, no gather
        (reference ldpc.py:1093-1165).
        """
        c = self.cfg
        qm = c.qm
        circ = c.circ_buffer_from_coded(coded)         # (..., C, cirBufSize)
        ncb = c.cirBufSize
        k0 = c.k0(rv) % ncb
        outs = []
        for r in range(c.numCodeBlocks):
            e = int(c.cbLens[r])
            buf = circ[..., r, :]
            reps = -(-(k0 + e) // ncb)
            d = jnp.tile(buf, (1,) * (buf.ndim - 1) + (reps,))[..., k0:k0 + e]
            # interleave: stream[u*qm+v] = d[v*(e/qm)+u]
            d2 = d.reshape(d.shape[:-1] + (qm, e // qm))
            outs.append(jnp.swapaxes(d2, -1, -2).reshape(d.shape[:-1] + (e,)))
        return jnp.concatenate(outs, axis=-1)

    def encode_tb(self, txBlock: jnp.ndarray, rv: int = 0) -> jnp.ndarray:
        """One-shot: payload (..., A) -> rate-matched bits (..., G)."""
        return self.rate_match(self.encode(self.segment(txBlock)), rv)


# ======================================================================
# Decoder
# ======================================================================
class LdpcDecoder:
    """Device LDPC decoder: rate recovery (+HARQ combine) -> layered min-sum
    decode -> CRC check & merge."""


    def print(self, indent: int = 0, title: str | None = None,
              getStr: bool = False):
        return self.cfg.print(indent, title or "LDPC Decoder Properties:", getStr)

    def __repr__(self):
        return self.print(getStr=True)

    def __init__(self, config: LdpcConfig):
        self.cfg = config
        c = config
        z = c.liftingSize
        bg = c.baseGraph
        # Per-layer static data: column ids and cyclic shifts. The decoder is
        # structure-of-arrays: the belief vector lives as one (lead.., Zc)
        # array per base-graph column, and check-to-variable messages as one
        # per edge, so the layer loop is pure elementwise ops + static rolls
        # (no gather/scatter/stack) — ~2.7x over the take_along_axis/scatter
        # formulation on TPU (measured on the headline bench config).
        self._layers = [(list(map(int, np.where(row >= 0)[0])),
                         [int(s) for s in row[np.where(row >= 0)[0]]])
                        for row in bg]
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
        pieces, bufs = self._recover_pieces(llrs, rv, softBuffer)
        return (jnp.stack(pieces, axis=-2), jnp.stack(bufs, axis=-2))

    def _recover_pieces(self, llrs: jnp.ndarray, rv: int = 0,
                        softBuffer: jnp.ndarray | None = None):
        """Rate recovery as PER-CODE-BLOCK lists: ([C x (..., nz)],
        [C x (..., cirBuf)]) — same values as :meth:`recover_rate` without
        the (..., C, n) stacks. The stacked form puts C=4 second-minor,
        which XLA:TPU tile-pads 4x on ~300 MB/dispatch of intermediates at
        the headline batch (see decode's layout note); the hot
        decode_tb path stays on flat 2-D per-CB tensors end to end."""
        c = self.cfg
        qm, ncb = c.qm, c.cirBufSize
        k0 = c.k0(rv) % ncb
        # Per code block: de-interleave is a reshape/transpose, the circular-
        # buffer accumulation a zero-pad + (wraps, ncb) reshape + sum — all
        # contiguous ops, no scatter.
        bufs, off = [], 0
        for r in range(c.numCodeBlocks):
            e = int(c.cbLens[r])
            seg = llrs[..., off:off + e]
            off += e
            # d[v*(e/qm)+u] = seg[u*qm+v]
            s2 = seg.reshape(seg.shape[:-1] + (e // qm, qm))
            d = jnp.swapaxes(s2, -1, -2).reshape(seg.shape[:-1] + (e,))
            reps = -(-(k0 + e) // ncb)
            pad = [(0, 0)] * (d.ndim - 1) + [(k0, reps * ncb - k0 - e)]
            b = jnp.pad(d, pad).reshape(
                d.shape[:-1] + (reps, ncb)).sum(axis=-2)
            if softBuffer is not None:
                b = b + softBuffer[..., r, :]
            bufs.append(b)

        s = c.sysLenNoFill
        tailLen = c.nz - c.nCB
        pieces = []
        for b in bufs:
            filler = jnp.full(b.shape[:-1] + (c.numFillerBits,), LARGE_LLR,
                              b.dtype)
            parts = [b[..., :s], filler, b[..., s:]]
            if tailLen:  # LBRM: untransmitted tail has zero LLR
                parts.append(jnp.zeros(b.shape[:-1] + (tailLen,), b.dtype))
            pieces.append(jnp.concatenate(parts, axis=-1))
        return pieces, bufs

    def _quantize_int8(self, recovered: jnp.ndarray) -> jnp.ndarray:
        """Per-codeword 5-bit quantization of the recovered LLRs.

        scale = 31 / max|LLR| over the non-filler positions (the filler
        positions carry LARGE_LLR and map straight to +127). The small
        channel scale leaves headroom: beliefs accumulate in UNSATURATED
        int16 (bounded by channel + row-degree*127), which matters more
        than LLR resolution — a rejected earlier variant at full scale
        126 with int8-saturated beliefs failed to decode above the
        waterfall from saturation oscillation. Layered min-sum is
        scale-invariant, so the per-codeword scale costs nothing
        statistically; 5-bit LLRs match the 4-6 bit quantization of
        hardware LDPC decoders. The int8 decoder
        (decode(..., dtype='int8')) stores check messages as int8 (half
        the bf16 HBM traffic), computes in int16, and truncates the 0.75
        normalization toward zero ((3*m)>>2) — identical across the soa
        and dense impls (tests/test_ldpc.py::
        test_int8_decode_impls_agree_and_track_f32, a 24-block
        agreement/tracking check; not a full statistical BLER gate like
        the bf16 one)."""
        c = self.cfg
        # recovered is the PUNCTURED codeword (no leading 2*Zc), so the
        # filler block sits at sysLenNoFill, not at fillerRange's
        # K-coordinates
        s, f = c.sysLenNoFill, c.numFillerBits
        mask = np.ones(c.nz, bool)
        mask[s:s + f] = False
        rec = recovered.astype(jnp.float32)
        amax = jnp.max(jnp.where(jnp.asarray(mask), jnp.abs(rec), 0.0),
                       axis=-1, keepdims=True)
        q = jnp.clip(jnp.round(rec * (31.0 / jnp.maximum(amax, 1e-30))),
                     -127, 127).astype(jnp.int8)
        return jnp.where(jnp.asarray(mask), q, jnp.asarray(127, jnp.int8))

    def decode(self, recovered: jnp.ndarray, numIter: int = 5,
               onlyInfoBits: bool = True, outputBelief: bool = False,
               impl: str = "auto", dtype=jnp.float32, activeRvs=None):
        """Layered min-sum BP. recovered (..., C, nz) -> bits (..., C, K).

        Structure-of-arrays formulation (see __init__ note): beliefs are a
        tuple of per-column (..., Zc) arrays, check messages a tuple of
        per-edge arrays kept in check-side (shifted) coordinates; min1/min2/
        first-argmin are a sequential elementwise scan over the layer's
        columns. Bit-identical to the reference's layered schedule with 0.75
        normalization (ldpc.py:1529-1581) at the default float32.

        impl: 'soa' (TPU-optimal, ~2.7x over dense on TPU; but XLA CPU takes
          minutes to compile its thousands of small fused ops), 'dense'
          (take_along_axis/scatter form, CPU-friendly), or 'auto' (soa unless
          the default backend is cpu). Identical outputs.

        dtype: message/belief precision for the soa path. float32 (default)
          is bit-identical to the reference; bfloat16 halves the decoder's
          HBM traffic and roughly doubles VPU throughput at a negligible
          BLER cost — min-sum needs only magnitude ORDER, and bf16's 8-bit
          mantissa far exceeds the 4-6 bit LLR quantization of hardware
          LDPC decoders (bf16 shares float32's exponent range, so the
          LARGE_LLR/filler plumbing is unaffected). Cross-checked in
          tests/test_ldpc.py::test_bf16_decode_matches_f32_outcomes.

        activeRvs: tuple of redundancy versions whose transmissions fed
          ``recovered`` (rate-matching-aware row pruning — see
          LdpcConfig.active_rows). Bit-identical for the onlyInfoBits=True
          output used by every in-repo caller; with onlyInfoBits=False the
          pruned degree-1 extension-parity positions differ from the
          unpruned decoder (they keep the zero channel LLR), so pass
          activeRvs=None when the full codeword is needed. None = no
          pruning assumption.
        """
        isInt8 = jnp.dtype(dtype) == jnp.int8
        if impl == "auto":
            impl = "dense" if jax.default_backend() == "cpu" else "soa"
        active = self.cfg.active_rows(
            tuple(activeRvs) if activeRvs is not None else None)
        if impl == "dense":
            if isinstance(recovered, (list, tuple)):
                recovered = jnp.stack(recovered, axis=-2)
            return self._decode_dense(recovered, numIter, onlyInfoBits,
                                      outputBelief, dtype, active)
        c = self.cfg
        z = c.liftingSize
        # ``recovered`` is (..., C, nz), a bare (nz,) vector, or a LIST of
        # C per-code-block (..., nz) arrays (the decode_tb hot path —
        # straight from _recover_pieces, so no (..., C, nz) tensor is ever
        # materialized between rate recovery and decode).
        squeezeC = False
        if isinstance(recovered, (list, tuple)):
            pieces = list(recovered)
        elif recovered.ndim == 1:
            pieces, squeezeC = [recovered], True
        else:
            pieces = [recovered[..., q, :] for q in range(recovered.shape[-2])]
        C = len(pieces)
        lead = pieces[0].shape[:-1]
        if isInt8:
            pieces = [self._quantize_int8(p).astype(jnp.int16) for p in pieces]
        else:
            pieces = [jnp.clip(p.astype(dtype), -1e10, 1e10) for p in pieces]
        # FLAT-FOLDED layout: the code-block axis folds into the Zc axis,
        # so each per-column / per-edge array is lead + (C*Zc,) (under the
        # sims' jit(vmap(decode)) the per-trial lead is empty, giving
        # (B, C*Zc) physical buffers). The unfolded lead+(C, Zc) layout
        # leaves C=4 as the second-minor dim and Zc=352 as the lane dim,
        # which XLA:TPU tile-pads ~4x (sublane 4->16, lane 352->384) on
        # every loop-carried belief/message buffer; the decode is HBM-bound
        # on exactly those buffers. Measured at the headline shape
        # (B=1536, C=4, Zc=352, bf16): 83.4 -> 57.4 ms/call, bit-identical
        # (the fold is pure data movement; cyclic shifts become per-block
        # concats through a transient (C, Zc) view).
        flat = lead + (C * z,)
        zero = jnp.zeros(flat, pieces[0].dtype)

        def rollz(x, s):
            s %= z
            if s == 0:
                return x
            y = x.reshape(lead + (C, z))
            return jnp.concatenate([y[..., s:], y[..., :s]],
                                   axis=-1).reshape(flat)

        # column ci of every code block side by side; the first 2*Zc
        # positions of each codeword are the punctured systematic columns
        # (zero channel LLR)
        rcols = tuple(
            zero if ci < 2 else
            jnp.concatenate([p[..., (ci - 2) * z:(ci - 1) * z]
                             for p in pieces], axis=-1)
            for ci in range(c.numCols))
        layers = [self._layers[i] for i in active]
        lls = tuple(tuple(jnp.zeros(flat, jnp.int8 if isInt8
                                    else pieces[0].dtype)
                          for _ in cols) for cols, _ in layers)

        def one_iteration(_, carry):
            rcols, lls = carry
            rcols, lls = list(rcols), list(lls)
            for li, (cols, shifts) in enumerate(layers):
                q = len(cols)
                ll = lls[li]
                if isInt8:
                    # int8 MESSAGE storage / int16 beliefs+arithmetic:
                    # messages truncate 0.75*min toward zero and clip at
                    # +-127; beliefs keep full int16 range (bounded by
                    # channel + degree*127 < 2^11, so no saturation
                    # oscillation) — see _quantize_int8 for the licensing
                    sub = [rollz(rcols[ci], s) - ll[j].astype(jnp.int16)
                           for j, (ci, s) in enumerate(zip(cols, shifts))]
                    one = jnp.ones((), jnp.int16)
                    inf = jnp.asarray(32767, jnp.int16)
                else:
                    sub = [rollz(rcols[ci], s) - ll[j]
                           for j, (ci, s) in enumerate(zip(cols, shifts))]
                    one = jnp.ones((), pieces[0].dtype)
                    inf = jnp.asarray(jnp.inf, pieces[0].dtype)
                sign = [jnp.where(s_ < 0, -one, one) for s_ in sub]
                mag = [jnp.abs(s_) for s_ in sub]
                parity = sign[0]
                for s_ in sign[1:]:
                    parity = parity * s_
                # running (min1, min2, first-argmin) over the layer's columns
                min1, min2 = mag[0], jnp.full_like(mag[0], inf)
                amin = jnp.zeros_like(mag[0], jnp.int32)
                for j in range(1, q):
                    m = mag[j]
                    isNew = m < min1
                    min2 = jnp.where(isNew, min1, jnp.minimum(min2, m))
                    amin = jnp.where(isNew, j, amin)
                    min1 = jnp.where(isNew, m, min1)
                newll = []
                for j, (ci, s) in enumerate(zip(cols, shifts)):
                    mins = jnp.where(amin == j, min2, min1)
                    if isInt8:
                        nl = jnp.minimum((mins * 3) >> 2, jnp.asarray(127, jnp.int16)) \
                            * sign[j] * parity
                        rcols[ci] = rollz(sub[j] + nl, z - s)
                        newll.append(nl.astype(jnp.int8))
                    else:
                        nl = mins * sign[j] * parity * 0.75
                        rcols[ci] = rollz(sub[j] + nl, z - s)
                        newll.append(nl)
                lls[li] = tuple(newll)
            return tuple(rcols), tuple(lls)

        rcols, lls = jax.lax.fori_loop(0, numIter, one_iteration, (rcols, lls))
        beliefs = jnp.concatenate(
            [r.reshape(lead + (C, z)) for r in rcols], axis=-1)
        if squeezeC:
            beliefs = beliefs[..., 0, :]
        if onlyInfoBits:
            beliefs = beliefs[..., :c.codeBlockSize]
        if outputBelief:
            return beliefs
        return (beliefs < 0).astype(jnp.int8)

    def _decode_dense(self, recovered, numIter, onlyInfoBits, outputBelief,
                      dtype=jnp.float32, active=None):
        """Gather/scatter formulation of decode (cheap to compile on CPU)."""
        c = self.cfg
        z = c.liftingSize
        isInt8 = jnp.dtype(dtype) == jnp.int8
        layers = [self._layers[i] for i in (
            active if active is not None else range(c.numParityRows))]
        lead = recovered.shape[:-1]
        if isInt8:
            rx = self._quantize_int8(recovered).astype(jnp.int16)
        else:
            rx = jnp.clip(recovered.astype(dtype), -1e10, 1e10)
        r = jnp.concatenate(
            [jnp.zeros(lead + (2 * z,), rx.dtype), rx], axis=-1
        ).reshape(lead + (c.numCols, z))
        offs, off = [], 0
        for cols, _ in layers:
            offs.append(off)
            off += len(cols)
        ll = jnp.zeros(lead + (off, z), jnp.int8 if isInt8 else rx.dtype)

        def one_iteration(_, carry):
            r, ll = carry
            for (cols, shifts), lo in zip(layers, offs):
                ci, fwd = _gather_info(self, cols, shifts)
                bwd = (np.arange(z)[None, :] - np.asarray(shifts)[:, None]) % z
                sl = slice(lo, lo + len(cols))
                if isInt8:
                    r_sub = r[..., ci, :] - ll[..., sl, :].astype(jnp.int16)
                else:
                    r_sub = r[..., ci, :] - ll[..., sl, :]
                shifted = jnp.take_along_axis(
                    r_sub, jnp.broadcast_to(fwd, r_sub.shape), axis=-1)
                # branches must be typed: two weak Python floats give f64
                # under x64, poisoning the .at[].set scatters below
                one = jnp.ones((), shifted.dtype)
                sign = jnp.where(shifted < 0, -one, one)
                parity = jnp.prod(sign, axis=-2, keepdims=True,
                                  dtype=sign.dtype)
                mag = jnp.abs(shifted)
                min1 = jnp.min(mag, axis=-2, keepdims=True)
                amin = jnp.argmin(mag, axis=-2, keepdims=True)
                iot = jax.lax.broadcasted_iota(jnp.int32, mag.shape, mag.ndim - 2)
                big = (jnp.asarray(32767, jnp.int16) if isInt8
                       else jnp.asarray(jnp.inf, mag.dtype))
                min2 = jnp.min(jnp.where(iot == amin, big, mag),
                               axis=-2, keepdims=True)
                mins = jnp.where(iot == amin, min2, min1)
                if isInt8:
                    # same int semantics as the soa path: message magnitude
                    # truncates 0.75*min toward zero and clips at 127;
                    # beliefs accumulate in int16, unsaturated
                    nlMag = jnp.minimum((mins * 3) >> 2, jnp.asarray(127, jnp.int16))
                    new_ll = jnp.take_along_axis(
                        nlMag * sign * parity,
                        jnp.broadcast_to(bwd, mag.shape), axis=-1)
                    ll = ll.at[..., sl, :].set(new_ll.astype(jnp.int8))
                    r = r.at[..., ci, :].set(r_sub + new_ll)
                else:
                    new_ll = mins * sign * parity
                    new_ll = jnp.take_along_axis(
                        new_ll, jnp.broadcast_to(bwd, new_ll.shape), axis=-1) * 0.75
                    ll = ll.at[..., sl, :].set(new_ll)
                    r = r.at[..., ci, :].set(r_sub + new_ll)
            return r, ll

        r, ll = jax.lax.fori_loop(0, numIter, one_iteration, (r, ll))
        beliefs = r.reshape(lead + (c.numCols * z,))
        if onlyInfoBits:
            beliefs = beliefs[..., :c.codeBlockSize]
        if outputBelief:
            return beliefs
        return (beliefs < 0).astype(jnp.int8)

    def is_valid_coded_block(self, bits: jnp.ndarray) -> jnp.ndarray:
        """Parity check H.c = 0 for full codewords bits (..., numCols*Zc).

        Returns a (...) bool array. Deviation: the reference's
        isValidCodedBlock (ldpc.py:825-843) returns after checking only the
        FIRST base-graph row (`return True` is inside its loop); this version
        checks all rows.
        """
        c = self.cfg
        z = c.liftingSize
        x = bits.astype(jnp.int32)
        cols = [x[..., ci * z:(ci + 1) * z] for ci in range(c.numCols)]
        ok = None
        for colIds, shifts in self._layers:
            par = sum(jnp.roll(cols[ci], -s, axis=-1)
                      for ci, s in zip(colIds, shifts)) % 2
            rowOk = ~jnp.any(par, axis=-1)
            ok = rowOk if ok is None else (ok & rowOk)
        return ok

    def decode2(self, recovered, maxIter: int = 6, onlyInfoBits: bool = True,
                outputBelief: bool = False, alpha: float = 0.75,
                stopOnGoodParity: bool = True):
        """Host-side (NumPy) row-serial min-sum reference decoder with early
        parity exit — the analogue of the reference's undocumented ``decode2``
        (ldpc.py:1421-1494, "use this only for verification ... and
        debugging"). Row-serial scheduling is inherently sequential (46*Zc
        dependent steps per iteration), so it stays on host; use ``decode``
        for the TPU path.

        Args:
          recovered: (C, nz) rate-recovered LLRs (NumPy or JAX array).
        """
        c = self.cfg
        z = c.liftingSize
        rxs = np.concatenate(
            [np.zeros((c.numCodeBlocks, 2 * z)), np.asarray(recovered, np.float64)], 1)
        # flatten base graph to z-expanded rows once
        decoded = []
        for rx in rxs:
            rx = np.clip(rx, -1e10, 1e10)
            msgs = [np.zeros((len(cols), z)) for cols, _ in self._layers]
            for _ in range(maxIter):
                for li, (cols, shifts) in enumerate(self._layers):
                    for t in range(z):
                        idx = [ci * z + (t + s) % z for ci, s in zip(cols, shifts)]
                        vals = rx[idx] - msgs[li][:, t]
                        mags = np.abs(vals)
                        mi = int(np.argmin(mags))
                        m1 = mags[mi]
                        m2 = np.min(np.concatenate([mags[:mi], mags[mi + 1:]])) \
                            if len(mags) > 1 else np.inf
                        if m1 > 0:
                            sg = np.sign(vals)
                            out = np.prod(sg) * sg * m1
                            out[mi] = np.prod(sg) * sg[mi] * m2
                            new = out * alpha
                        elif m2 > 0:
                            new = np.zeros_like(vals)
                            new[mi] = np.prod(1 - 2 * (vals < 0)) * m2 * alpha
                        else:
                            new = np.zeros_like(vals)
                        msgs[li][:, t] = new
                        rx[idx] = vals + new
                if stopOnGoodParity and bool(np.asarray(
                        self.is_valid_coded_block(jnp.asarray((rx < 0) * 1)))):
                    break
            decoded.append(rx)
        decoded = np.float64(decoded)
        if onlyInfoBits:
            decoded = decoded[:, :c.codeBlockSize]
        if outputBelief:
            return decoded
        return np.int8(decoded < 0)

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

    def decode_tb_full(self, llrs: jnp.ndarray, rv: int = 0, numIter: int = 5,
                       softBuffer: jnp.ndarray | None = None,
                       dtype=jnp.float32, activeRvs="auto"):
        """LLRs (..., G) -> (payload (..., A), tbOk (...), cbOk (..., C), buffer).

        ``cbOk`` is the per-code-block CRC pass flag (reference
        ldpc.py checkCrcAndMerge semantics); ``tbOk`` additionally checks the
        transport-block CRC on the merged payload.

        activeRvs="auto": when there is no HARQ soft buffer the only channel
        LLRs are this transmission's, so rate-matching-aware row pruning at
        (rv,) applies (bit-identical, see LdpcConfig.active_rows); with a
        soft buffer the combined history is unknown here — no pruning unless
        the caller passes the history's rv tuple explicitly."""
        c = self.cfg
        if activeRvs == "auto":
            activeRvs = (rv,) if softBuffer is None else None
        # pieces path: per-code-block tensors flow straight from rate
        # recovery into the decoder's folded layout — the (..., C, nz)
        # stack (tile-padded 4x on TPU for C=4) is never materialized
        pieces, bufs = self._recover_pieces(llrs, rv, softBuffer)
        buf = jnp.stack(bufs, axis=-2)
        decoded = self.decode(pieces, numIter, dtype=dtype,
                              activeRvs=activeRvs)
        merged, cbOk = self.check_crc_and_merge(decoded)
        tbOk = crc_mod.check_crc_device(merged, self._tb_crc_mat) & jnp.all(cbOk, axis=-1)
        return merged[..., :c.payloadSize], tbOk, cbOk, buf

    def decode_tb(self, llrs: jnp.ndarray, rv: int = 0, numIter: int = 5,
                  softBuffer: jnp.ndarray | None = None, dtype=jnp.float32,
                  activeRvs="auto"):
        """One-shot: LLRs (..., G) -> (payload (..., A), tbOk (...), buffer)."""
        payload, tbOk, _, buf = self.decode_tb_full(llrs, rv, numIter,
                                                    softBuffer, dtype,
                                                    activeRvs)
        return payload, tbOk, buf
