"""5G NR Polar coding — TS 38.212 §5.3.1 (encoding), §5.4.1 (rate matching),
successive-cancellation list (SCL) decoding. Used for DCI / UCI / PBCH.

TPU design:
- ``PolarConfig`` (host): the full TS 38.212 parameter derivation — UCI/DCI/
  PBCH presets, segmentation, CRC selection, N selection, frozen/message/
  parity-check bit sets with puncturing/shortening, input (iIL), sub-block,
  and triangular coded-bit (iBIL) interleavers — all as static index arrays.
  The PC-bit cyclic register has a closed form (pc bit at n = XOR of prior
  non-pc bits at positions ≡ n mod 5), precomputed as a static mask matrix.
- Encoder (device): message scatter + PC mask matmul + u·G mod 2 (one int
  matmul on the MXU) + static rate-match gather.
- ``scl_decode`` (device): the SC tree is unrolled at trace time (static
  recursion over halves, 2N-1 nodes of fixed-shape ops); the list dimension
  L is static from the start (unused paths carry +inf cost), path fork/prune
  is a fixed-shape sort of 2L costs, and path bookkeeping is explicit gather
  permutations — no dynamic shapes anywhere (SURVEY.md §7 "hard parts").

Behavioral parity: reference ``neoradium/polar.py`` — parameter derivation
(initialize:298-446), encoder (encode:527-565, PC register :554-560),
rate match (rateMatch:567-604), SCL semantics (SclDecoder:606-720: path
cost -= min(0, llr) per bit, min-sum f, CRC-aided selection :970-977).

Deviations (documented reference bugs):
- Repetition rate recovery: reference recoverRate:914-916 indexes rows
  instead of columns (IndexError for any e >= N); we soft-combine repeated
  LLRs per column as intended.
- nPCwm=1 UCI configs: reference initialize:384 indexes a Python list with
  an ndarray (TypeError) — every such config crashes there; we compute the
  low-weight/high-reliability PC bit as specified.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .polar_tables import (POLAR_RELIABILITY, INPUT_INTERLEAVER,
                           SUBBLOCK_INTERLEAVER)
from .. import crc as crc_mod

LARGE_LLR = 1e20
_CRC_LENS = {"6": 6, "11": 11, "16": 16, "24A": 24, "24B": 24, "24C": 24}


def _ceil_log2(num: int) -> int:
    n, i = int(num) - 1, 1
    while n > 1:
        n >>= 1
        i += 1
    return i


class PolarConfig:
    """Static polar-chain parameters + index tables (host).

    Args mirror the reference PolarBase (polar.py:127-229): payloadSize (A),
    rateMatchedLen (E total), dataType in {'DCI','UCI','PBCH',None}; custom
    mode accepts iBIL/nMax/iIL/nPC/nPCwm/iSeg/crcPoly kwargs.
    """

    def __init__(self, payloadSize: int, rateMatchedLen: int,
                 dataType: str | None = None, **kwargs):
        self.dataType = dataType.lower() if dataType is not None else None
        if self.dataType is None:
            self.iBIL = kwargs.get("iBIL", False)
            self.nMax = kwargs.get("nMax", 10)
            self.iIL = kwargs.get("iIL", False)
            self.nPC = kwargs.get("nPC", 0)
            self.nPCwm = kwargs.get("nPCwm", 0)
            self.iSeg = kwargs.get("iSeg", False)
            self.crcPoly = kwargs.get("crcPoly", "11")
        elif self.dataType == "uci":
            self.iBIL, self.nMax, self.iIL = True, 10, False
        elif self.dataType in ("dci", "pbch"):
            self.nMax, self.iIL = 9, True
            self.nPC = self.nPCwm = 0
            self.iBIL = self.iSeg = False
            self.crcPoly = "24C"
        else:
            raise ValueError("'dataType' must be one of 'UCI', 'DCI', or 'PBCH'.")
        self._derive(payloadSize, rateMatchedLen)

    # ------------------------------------------------------------ derivation
    def print(self, indent: int = 0, title: str | None = None,
              getStr: bool = False):
        """Reference-style property listing (PolarBase.print, polar.py)."""
        from ..utils import format_properties
        s = format_properties(
            title or "Polar Coding Properties:",
            [("dataType", self.dataType),
             ("payloadSize (A)", getattr(self, "payloadSize", None)),
             ("rateMatchedLen (E)", getattr(self, "rateMatchedLen", None)),
             ("N (codeword length)", getattr(self, "N", None)),
             ("K (info + crc)", getattr(self, "K", None)),
             ("nMax", self.nMax),
             ("iIL", self.iIL),
             ("iBIL", self.iBIL),
             ("iSeg", getattr(self, "iSeg", None)),
             ("nPC", getattr(self, "nPC", None)),
             ("crcPoly", getattr(self, "crcPoly", None))], indent)
        if getStr:
            return s
        print(s)

    def __repr__(self):
        return self.print(getStr=True)

    def _derive(self, a: int, eTot: int):
        self.payloadSize = a = int(a)
        self.rateMatchedLen = eTot = int(eTot)

        if self.dataType == "uci":
            if a < 12:
                raise ValueError("Polar coding needs UCI payload size >= 12")
            self.iSeg = (a >= 360 and eTot >= 1088) or a >= 1013
            self.crcPoly = "6" if a < 20 else "11"
            l = int(self.crcPoly)
            k = ((a + 1) // 2 + l) if self.iSeg else (a + l)
            eR = eTot // (self.iSeg + 1)
            self.nPC = 3 if 17 < k < 26 else 0
            self.nPCwm = (1 if (17 < k < 26) and (eR - k + 3) > 192 else 0)
        else:
            l = _CRC_LENS[self.crcPoly] if self.crcPoly is not None else 0
            k = (((a + 1) // 2 + l) if self.iSeg else (a + l))
            eR = eTot // (self.iSeg + 1)
        self.rateMatchedBlockLen = eR
        self.codeBlockSize = k
        self.numCodeBlocks = 2 if self.iSeg else 1

        n1 = _ceil_log2(eR) - 1
        if k / eR >= 9 / 16.0:
            n1 += 1
        elif eR > (9 / 8) * (1 << n1):
            n1 += 1
        n2 = _ceil_log2(k / (1 / 8))
        n = max(min(n1, n2, self.nMax), 5)
        self.polarCodeSize = nn = 1 << n
        self.n = n

        # input interleaver (TS 38.212 §5.3.1.1)
        if self.iIL:
            d = 164 - k
            self.inInterleaveIndexes = np.asarray(
                [p - d for p in INPUT_INTERLEAVER if p >= d], np.int32)
        else:
            self.inInterleaveIndexes = None

        # sub-block interleaver (TS 38.212 §5.4.1.1)
        self.sbInterleaveIndexes = np.asarray(
            [SUBBLOCK_INTERLEAVER[(i << 5) // nn] * (nn >> 5) + i % (nn >> 5)
             for i in range(nn)], np.int32)
        jj = self.sbInterleaveIndexes

        # frozen / message sets with puncturing/shortening (§5.4.1.1/5.3.1.2)
        relSeq = POLAR_RELIABILITY[POLAR_RELIABILITY < nn]
        fTemp = set()
        if eR < nn:
            if k / eR <= 7.0 / 16:          # puncturing
                fTemp.update(jj[: nn - eR - 1].tolist())
                if eR >= 3.0 * nn / 4:
                    fTemp.update(range((3 * nn - 2 * eR + 3) // 4 - 1))
                else:
                    fTemp.update(range((9 * nn - 4 * eR + 15) // 16 - 1))
            else:                           # shortening
                fTemp.update(jj[eR:].tolist())
        # keep reliability order, take the K+nPC MOST reliable, then sort
        msg = [int(x) for x in relSeq if int(x) not in fTemp][-(k + self.nPC):]
        self.msgBits = sorted(msg)
        self.frozenBits = sorted(int(x) for x in relSeq
                                 if int(x) not in set(self.msgBits))

        # generator (for encoding as one matmul)
        g = np.asarray([[1]], np.uint8)
        for _ in range(n):
            g = np.kron(np.asarray([[1, 0], [1, 1]], np.uint8), g)
        self.generator = g

        # parity-check bits (§5.3.1.2)
        self.pcBits = []
        if self.nPC > 0:
            msgArr = np.asarray(self.msgBits, np.int64)
            self.pcBits = msgArr[: self.nPC - self.nPCwm].tolist()
            if self.nPCwm > 0:
                rest = msgArr[self.nPC - self.nPCwm:][::-1]
                idx = np.argsort(g[rest].sum(1), kind="stable")
                self.pcBits += rest[idx][::-1][: self.nPCwm].tolist()
            self.msgBits = [b for b in self.msgBits if b not in self.pcBits]
        # PC closed form: pc value at n = XOR of prior non-pc u[m], m ≡ n mod 5.
        # (reference's y-register, polar.py:554-560, never absorbs pc bits.)
        if self.pcBits:
            pcMask = np.zeros((len(self.pcBits), nn), np.uint8)
            nonPc = [m for m in range(nn) if m not in self.pcBits]
            for r, pcn in enumerate(sorted(self.pcBits)):
                for m in nonPc:
                    if m < pcn and m % 5 == pcn % 5:
                        pcMask[r, m] = 1
            self.pcMask = pcMask
            self.pcBitsSorted = sorted(self.pcBits)
        else:
            self.pcMask = None

        # triangular coded-bit interleaver (§5.4.1.3)
        if self.iBIL:
            if eR > 8192:
                raise ValueError(f"rate-matched length ({eR}) must be <= 8192")
            t = int(np.floor(np.sqrt(2 * eR)))
            if t * (t + 1) < 2 * eR:
                t += 1
            v = np.full((t, t), -1, np.int64)
            kk = 0
            for i in range(t):
                for j in range(t - i):
                    if kk < eR:
                        v[i][j] = kk
                    kk += 1
                if kk >= eR:
                    break
            flat = v[: i + 1].T.flatten()
            self.cbInterleaveIndexes = flat[flat >= 0].astype(np.int32)
        else:
            self.cbInterleaveIndexes = None

        # rate-match gather (encoder side), §5.4.1.2
        if eR >= nn:
            sel = np.asarray([x % nn for x in range(eR)], np.int32)
            self.rmMode = "repetition"
        elif k / eR <= 7.0 / 16:
            sel = np.arange(nn - eR, nn, dtype=np.int32)
            self.rmMode = "puncturing"
        else:
            sel = np.arange(eR, dtype=np.int32)
            self.rmMode = "shortening"
        rmIdx = self.sbInterleaveIndexes[sel]
        if self.iBIL:
            rmIdx = rmIdx[self.cbInterleaveIndexes]
        self.rateMatchIndexes = rmIdx                   # (eR,): coded -> output

        self.crcLen = _CRC_LENS[self.crcPoly] if self.crcPoly else 0


class PolarEncoder:
    """Device polar encoder: segment -> CRC -> interleave -> encode -> RM."""

    def __init__(self, config: PolarConfig):
        self.cfg = config
        c = config
        if c.crcPoly is not None:
            a = c.codeBlockSize - c.crcLen
            self._crc_mat = jnp.asarray(crc_mod.crc_matrix(a, c.crcPoly))

    def segment(self, txBlock: jnp.ndarray) -> jnp.ndarray:
        """txBlock (..., A) -> (..., C, K) int8 code blocks with CRC."""
        c = self.cfg
        a = txBlock.shape[-1]
        if a != c.payloadSize:
            raise ValueError(f"Expected payload of {c.payloadSize} bits, got {a}")
        if c.iSeg:
            if a % 2:
                txBlock = jnp.pad(txBlock, [(0, 0)] * (txBlock.ndim - 1) + [(1, 0)])
            cbs = txBlock.reshape(txBlock.shape[:-1] + (2, -1))
        else:
            cbs = txBlock[..., None, :]
        if c.crcPoly is not None:
            cbs = crc_mod.append_crc_device(cbs.astype(jnp.float32), self._crc_mat)
        return cbs.astype(jnp.int8)

    def encode(self, codeBlocks: jnp.ndarray) -> jnp.ndarray:
        """(..., C, K) -> (..., C, N) polar-coded blocks."""
        c = self.cfg
        nn = c.polarCodeSize
        if c.iIL:
            codeBlocks = codeBlocks[..., jnp.asarray(c.inInterleaveIndexes)]
        u = jnp.zeros(codeBlocks.shape[:-1] + (nn,), jnp.int32)
        u = u.at[..., jnp.asarray(np.asarray(c.msgBits, np.int32))].set(
            codeBlocks.astype(jnp.int32))
        if c.pcMask is not None:
            pcVals = (u @ jnp.asarray(c.pcMask.T, jnp.int32)) % 2
            u = u.at[..., jnp.asarray(np.asarray(c.pcBitsSorted, np.int32))].set(pcVals)
        x = (u @ jnp.asarray(c.generator, jnp.int32)) % 2
        return x.astype(jnp.int8)

    def rate_match(self, codeBlocks: jnp.ndarray) -> jnp.ndarray:
        """(..., C, N) -> (..., C*E) rate-matched bits (one static gather)."""
        c = self.cfg
        out = codeBlocks[..., jnp.asarray(c.rateMatchIndexes)]
        return out.reshape(out.shape[:-2] + (-1,))

    def encode_tb(self, txBlock: jnp.ndarray) -> jnp.ndarray:
        return self.rate_match(self.encode(self.segment(txBlock)))


# ======================================================================
# SCL decoder
# ======================================================================
def _relu(x):
    return jnp.maximum(x, 0.0)


def scl_decode(llrs: jnp.ndarray, frozenMask: np.ndarray, listSize: int = 8,
               useMinSum: bool = True):
    """Successive-cancellation list decode of one code block.

    Args:
      llrs: (N,) channel LLRs (positive = bit 0 more likely).
      frozenMask: static (N,) bool, True where the bit is frozen.
      listSize: static list size L.

    Returns:
      (uHats (L, N) int8 sorted by path cost, costs (L,)).
    """
    N = llrs.shape[-1]
    L = listSize
    frozen = np.asarray(frozenMask, bool)

    cost0 = jnp.full((L,), jnp.inf).at[0].set(0.0)
    uHat0 = jnp.zeros((L, N), jnp.int8)
    llrsL = jnp.broadcast_to(llrs[None, :], (L, N)).astype(jnp.float32)

    def block(llr, idx, carry):
        """llr (L, m) -> (xHat (L, m), perm (L,), carry)."""
        cost, uHat = carry
        m = llr.shape[-1]
        if m == 1:
            v = llr[:, 0]
            if frozen[idx]:
                cost = cost + _relu(-v)
                return jnp.zeros((L, 1), jnp.int8), jnp.arange(L), (cost, uHat)
            costs = jnp.concatenate([cost + _relu(-v), cost + _relu(v)])
            sel = jnp.argsort(costs)[:L]
            perm = sel % L
            bit = (sel >= L).astype(jnp.int8)
            uHat = uHat[perm].at[:, idx].set(bit)
            return bit[:, None], perm, (costs[sel], uHat)
        half = m // 2
        a, b = llr[:, :half], llr[:, half:]
        if useMinSum:
            left = (jnp.sign(a) * jnp.sign(b)
                    * jnp.minimum(jnp.abs(a), jnp.abs(b)))
        else:
            def f(x):
                return jnp.abs(jnp.log(jnp.tanh(jnp.abs(x / 2.0)) + 1e-12))
            left = jnp.sign(a) * jnp.sign(b) * f(f(a) + f(b))
        xl, permL, carry = block(left, idx, carry)
        aP, bP = a[permL], b[permL]
        right = (1 - 2 * xl.astype(jnp.float32)) * aP + bP
        xr, permR, carry = block(right, idx + half, carry)
        xHat = jnp.concatenate([xl[permR] ^ xr, xr], axis=1)
        return xHat, permL[permR], carry

    _, _, (cost, uHat) = block(llrsL, 0, (cost0, uHat0))
    order = jnp.argsort(cost)
    return uHat[order], cost[order]


class PolarDecoder:
    """Device polar decoder: rate recovery -> SCL -> CRC-aided selection."""

    def __init__(self, config: PolarConfig, sclListSize: int = 8,
                 useMinSum: bool = True):
        self.cfg = config
        self.listSize = sclListSize
        self.useMinSum = useMinSum
        c = config
        self._frozenMask = np.zeros(c.polarCodeSize, bool)
        self._frozenMask[np.asarray(c.frozenBits, np.int64)] = True
        if c.crcPoly is not None:
            self._crc_mat = jnp.asarray(
                crc_mod.crc_matrix(c.codeBlockSize, c.crcPoly))
        # static inverse interleavers (reference decoder initialize:866-880)
        self._sbInv = np.argsort(c.sbInterleaveIndexes).astype(np.int32)
        self._ilInv = (np.argsort(c.inInterleaveIndexes).astype(np.int32)
                       if c.iIL else None)
        self._cbInv = (np.argsort(c.cbInterleaveIndexes).astype(np.int32)
                       if c.iBIL else None)

    def recover_rate(self, llrs: jnp.ndarray) -> jnp.ndarray:
        """(..., C*E) LLRs -> (..., C, N) rate-recovered LLRs."""
        c = self.cfg
        nn, eR = c.polarCodeSize, c.rateMatchedBlockLen
        x = llrs.reshape(llrs.shape[:-1] + (c.numCodeBlocks, eR))
        if c.iBIL:
            x = x[..., jnp.asarray(self._cbInv)]
        if c.rmMode == "repetition":
            # soft-combine repeated LLRs (fixes reference recoverRate:914-916)
            buf = jnp.zeros(x.shape[:-1] + (nn,), x.dtype)
            cols = jnp.asarray(np.arange(eR, dtype=np.int32) % nn)
            buf = buf.at[..., cols].add(x)
        elif c.rmMode == "puncturing":
            buf = jnp.concatenate(
                [jnp.zeros(x.shape[:-1] + (nn - eR,), x.dtype), x], axis=-1)
        else:
            buf = jnp.concatenate(
                [x, jnp.full(x.shape[:-1] + (nn - eR,), LARGE_LLR, x.dtype)],
                axis=-1)
        return buf[..., jnp.asarray(self._sbInv)]

    def decode(self, rxLlrBlocks: jnp.ndarray):
        """(..., C, N) LLRs -> (payload (..., A) int8, crcErrors (...,) int32)."""
        c = self.cfg
        x = jnp.clip(rxLlrBlocks, -20, 20)

        def one_block(llr):
            uHats, costs = scl_decode(llr, self._frozenMask, self.listSize,
                                      self.useMinSum)
            msgs = uHats[:, jnp.asarray(np.asarray(c.msgBits, np.int32))]
            if c.iIL:
                msgs = msgs[:, jnp.asarray(self._ilInv)]
            if c.crcPoly is None:
                return msgs[0], jnp.int32(0)
            ok = crc_mod.check_crc_device(msgs.astype(jnp.float32),
                                          self._crc_mat)
            anyOk = jnp.any(ok)
            best = jnp.where(anyOk, jnp.argmax(ok), 0)
            msg = msgs[best][: c.codeBlockSize - c.crcLen]
            return msg, (~anyOk).astype(jnp.int32)

        lead = x.shape[:-2]
        flat = x.reshape((-1, c.numCodeBlocks, c.polarCodeSize))
        fn = jax.vmap(jax.vmap(one_block))
        msgs, errs = fn(flat)
        kOut = msgs.shape[-1]
        msgs = msgs.reshape(lead + (c.numCodeBlocks * kOut,))
        errs = errs.reshape(lead + (c.numCodeBlocks,)).sum(-1)
        payload = msgs[..., -c.payloadSize:]
        return payload.astype(jnp.int8), errs

    def decode_tb(self, llrs: jnp.ndarray):
        """One-shot: rate-matched LLRs (..., C*E) -> (payload, crcErrors)."""
        return self.decode(self.recover_rate(llrs))
