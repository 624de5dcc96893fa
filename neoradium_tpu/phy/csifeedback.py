"""CSI feedback — RI/PMI/CQI computation from an estimated channel.
TS 38.214 §5.2.2.2 (Type-1 single-panel / multi-panel codebooks).

TPU design: codebook enumeration and precoder construction are host-side
(config-static NumPy — the codebook is a constant (Ncb, Nt, Nl) tensor);
the per-RE post-precoding SINR over the WHOLE codebook is one batched SVD
einsum on device (``compute_sinr``), and the wideband/per-subband argmax
search reduces over static subband index sets. This mirrors the reference's
already-tensorized search (csifeedback.py:419-433) with the codebook batch
mapped onto the MXU.

Behavioral parity: reference ``neoradium/csifeedback.py`` — CsiReport
parameter surface (csifeedback.py:160-323), SINR (getSINR:419-433), CDM
neighbor dedup (removeNeighbors:405-417), subbands (436-447, Table
5.2.1.4-2), PMI search (bestPmiForRank:450-515), rank search
(getBestRank:517-537), CQI/PMI subband alignment (getCqiToPmiIdxes:539-561),
Type-1 SP codebook (type1SpIndexes:599-722, getType1SpPrecoder:724-1037),
Type-1 MP codebook (type1MpIndexes:1040-1097, getType1MpPrecoder:1099-1328),
CQI tables 1-4 (csifeedback.py:80-150).

Deviations (documented reference bugs):
- Type1MP codebookMode=2 enumeration: reference type1MpIndexes:1060-1066
  unpacks 6 loop variables from 7-element tuples and yields an undefined
  name (NameError) — broken for every such config; implemented per spec.
- Type1SP N2>1 precoders: the reference never flattens the (N1, N2) beam
  matrix v(l,m) into a port vector (csifeedback.py:579-583, 779-780 etc.),
  so every N2>1 codebook has the wrong shape and crashes in getSINR; we
  flatten to (numPorts, numLayers) per TS 38.214 §5.2.2.2.1.
- 2-port rank-2 enumeration: reference type1SpIndexes:617 iterates i1 over
  range(4) against a 2-character restriction slice (IndexError); and its
  2-port restriction test ``if pmiAllowed[i1]`` is always truthy (the
  characters '0'/'1' are both non-empty), ignoring the bitmap. We iterate
  the correct range and honor the bitmap.
- CQI selection from SINR (``getCQI``) is implemented here; the reference
  ships the CQI tables but its ``getEffectiveSINR`` is an empty stub
  (csifeedback.py:384-385) and no notebook computes CQI.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import toDb, toLinear

# TS 38.214 Tables 5.2.2.1-2..5: (modulation, codeRate*1024, efficiency)
CQI_TABLES = {
    1: [(None, None, None), ("QPSK", 78, 0.1523), ("QPSK", 120, 0.2344),
        ("QPSK", 193, 0.3770), ("QPSK", 308, 0.6016), ("QPSK", 449, 0.8770),
        ("QPSK", 602, 1.1758), ("16QAM", 378, 1.4766), ("16QAM", 490, 1.9141),
        ("16QAM", 616, 2.4063), ("64QAM", 466, 2.7305), ("64QAM", 567, 3.3223),
        ("64QAM", 666, 3.9023), ("64QAM", 772, 4.5234), ("64QAM", 873, 5.1152),
        ("64QAM", 948, 5.5547)],
    2: [(None, None, None), ("QPSK", 78, 0.1523), ("QPSK", 193, 0.3770),
        ("QPSK", 449, 0.8770), ("16QAM", 378, 1.4766), ("16QAM", 490, 1.9141),
        ("16QAM", 616, 2.4063), ("64QAM", 466, 2.7305), ("64QAM", 567, 3.3223),
        ("64QAM", 666, 3.9023), ("64QAM", 772, 4.5234), ("64QAM", 873, 5.1152),
        ("256QAM", 711, 5.5547), ("256QAM", 797, 6.2266), ("256QAM", 885, 6.9141),
        ("256QAM", 948, 7.4063)],
    3: [(None, None, None), ("QPSK", 30, 0.0586), ("QPSK", 50, 0.0977),
        ("QPSK", 78, 0.1523), ("QPSK", 120, 0.2344), ("QPSK", 193, 0.3770),
        ("QPSK", 308, 0.6016), ("QPSK", 449, 0.8770), ("QPSK", 602, 1.1758),
        ("16QAM", 378, 1.4766), ("16QAM", 490, 1.9141), ("16QAM", 616, 2.4063),
        ("64QAM", 466, 2.7305), ("64QAM", 567, 3.3223), ("64QAM", 666, 3.9023),
        ("64QAM", 772, 4.5234)],
    4: [(None, None, None), ("QPSK", 78, 0.1523), ("QPSK", 193, 0.3770),
        ("QPSK", 449, 0.8770), ("16QAM", 378, 1.4766), ("16QAM", 616, 2.4063),
        ("64QAM", 567, 3.3223), ("64QAM", 772, 4.5234), ("256QAM", 711, 5.5547),
        ("256QAM", 797, 6.2266), ("256QAM", 885, 6.9141), ("256QAM", 948, 7.4063),
        ("1024QAM", 853, 8.3321), ("1024QAM", 896, 8.7500), ("1024QAM", 948, 9.2578),
        (None, None, None)],
}
# AWGN spectral-efficiency SINR thresholds: eff = log2(1 + snr) inverted
_VALID_N1N2_SP = {"1-1", "2-1", "2-2", "4-1", "3-2", "6-1", "4-2", "8-1",
                  "4-3", "6-2", "12-1", "4-4", "8-2", "16-1"}
_VALID_NGN1N2_MP = {"2-2-1", "2-4-1", "4-2-1", "2-2-2", "2-8-1", "4-4-1",
                    "2-4-2", "4-2-2"}


def _validate(value, valids, what):
    if isinstance(valids, tuple):
        ok = valids[0] <= value <= valids[1]
    elif isinstance(valids, list):
        ok = value in valids
    else:
        ok = value == valids
    if not ok:
        raise ValueError(f"Invalid {what}: {value!r} (expected {valids})")


class CsiReport:
    """CSI report configuration + RI/PMI/CQI computation."""

    def __init__(self, csiRsConfig, **kwargs):
        self.reportId = kwargs.get("id", 0)
        self.csiRsConfig = csiRsConfig
        self.carrier = csiRsConfig.carrier
        for s in csiRsConfig.csiRsSetList:
            if s.csiType == "ZP":
                raise ValueError("ZP resources are not allowed in csiRsConfig")

        self.reportType = kwargs.get("reportType", "Periodic")
        _validate(self.reportType,
                  ["Periodic", "SpOnPUCCH", "SpOnPUSCH", "Aperiodic"],
                  "reportType")
        self.period = kwargs.get("period", 5)
        self.offset = kwargs.get("offset", 0)
        if self.reportType in ("Periodic", "SpOnPUCCH"):
            _validate(self.period, [5, 10, 20, 40, 80, 160, 320], "period")
        elif self.reportType == "SpOnPUSCH":
            _validate(self.period, [4, 5, 8, 10, 16, 20, 32, 40, 80, 160, 320],
                      "period")
        _validate(self.offset, (0, self.period - 1), "offset")

        self.quantity = kwargs.get("quantity", "CriRiPmiCqi")
        _validate(self.quantity,
                  ["CriRiPmiCqi", "CriRiLiPmiCqi", "CriRiI1", "CriRiCqi",
                   "CriRiI1Cqi", "CriRsrp", "SsbRIdxRsrp", "CriSinr",
                   "SsbIdxSinr"], "quantity")

        self.codebookType = kwargs.get("codebookType", "Type1SP")
        _validate(self.codebookType, ["Type1SP", "Type1MP", "Type2"],
                  "codebookType")

        txAntenna = kwargs.get("txAntenna", None)
        if txAntenna is None:
            self.n1 = kwargs.get("n1", None)
            self.n2 = kwargs.get("n2", None)
            self.ng = kwargs.get("ng", None)
            if self.codebookType == "Type1MP":
                if None in (self.n1, self.n2, self.ng):
                    raise ValueError("Type1MP needs ng/n1/n2 (or a txAntenna)")
            elif None in (self.n1, self.n2):
                raise ValueError("n1/n2 (or a txAntenna) must be specified")
            if self.ng is None:
                self.ng = 1
        else:
            from ..channels.antenna import AntennaPanel, AntennaArray
            if isinstance(txAntenna, AntennaPanel):
                if self.codebookType == "Type1MP":
                    raise ValueError("Single panel antenna with Type1MP codebook")
                self.ng = 1
                self.n2, self.n1 = txAntenna.shape
            elif isinstance(txAntenna, AntennaArray):
                self.ng = int(np.prod(txAntenna.shape))
                if self.ng > 1 and self.codebookType in ("Type1SP", "Type2"):
                    raise ValueError(
                        f"Multi-panel antenna with {self.codebookType} codebook")
                self.n2, self.n1 = txAntenna.panels[0][0].shape
            else:
                raise ValueError("Unsupported txAntenna class")

        if self.codebookType in ("Type1SP", "Type2"):
            # Type2 shares the single-panel N1-N2 supported set
            # (TS 38.214 Table 5.2.2.2.3-1 mirrors 5.2.2.2.1-2)
            if f"{self.n1}-{self.n2}" not in _VALID_N1N2_SP:
                raise ValueError(f"Invalid N1-N2 {self.n1}-{self.n2} "
                                 "(TS 38.214 Table 5.2.2.2.1-2)")
        else:
            if f"{self.ng}-{self.n1}-{self.n2}" not in _VALID_NGN1N2_MP:
                raise ValueError(f"Invalid Ng-N1-N2 {self.ng}-{self.n1}-{self.n2}"
                                 " (TS 38.214 Table 5.2.2.2.2-1)")

        if self.codebookType == "Type2":
            # Rel-15 Type II parameters (TS 38.214 §5.2.2.2.3). The
            # reference VALIDATES these kwargs and provides the i12
            # combinatorial helpers but its Type2 codebook/precoder is
            # commented out and getCodebook asserts
            # (csifeedback.py:285-293, 563-576, 1355-1457); here Type2 is
            # fully functional (precoder reconstruction + quantized PMI
            # search + CQI).
            self.numBeams = kwargs.get("numBeams", 2)
            if 2 * self.n1 * self.n2 == 4:
                _validate(self.numBeams, 2, "numBeams (when numPorts is 4)")
            _validate(self.numBeams, [2, 3, 4], "numBeams")
            self.pskSize = kwargs.get("pskSize", 4)
            _validate(self.pskSize, [4, 8], "pskSize")
            self.subbandAmp = bool(kwargs.get("subbandAmp", False))

        self.codebookMode = kwargs.get("codebookMode", 1)
        if self.ng == 4:
            _validate(self.codebookMode, 1, "codebookMode (when Ng is 4)")
        else:
            _validate(self.codebookMode, [1, 2], "codebookMode")
        self.o1 = 4
        self.o2 = 4 if self.n2 > 1 else 1
        self.numPorts = 2 * self.ng * self.n1 * self.n2
        self.ac = self.n1 * self.o1 * self.n2 * self.o2
        self.cbSubsetRestriction = kwargs.get(
            "cbSubsetRestriction", max(8, 2 * self.ac) * "1")
        self.cbSubsetRestrictionI2 = kwargs.get("cbSubsetRestrictionI2", 16 * "1")
        self.cbRiRestriction = kwargs.get("cbRiRestriction", 8 * "1")

        self.prgSize = kwargs.get("prgSize", None)
        if self.prgSize is not None and self.prgSize not in (0, 2, 4):
            raise ValueError("prgSize must be 0 (wideband), 2, or 4")
        numRbs = self.carrier.numRbs
        if numRbs < 24:
            sbVals = [0]
        elif numRbs < 73:
            sbVals = [4, 8]
        elif numRbs < 145:
            sbVals = [8, 16]
        else:
            sbVals = [16, 32]
        sb = kwargs.get("subbandSize", sbVals[0])
        _validate(sb, sbVals, "subbandSize")
        self.subbandSizePmi = kwargs.get("subbandSizePmi", sb)
        self.subbandSizeCqi = kwargs.get("subbandSizeCqi", sb)
        _validate(self.subbandSizePmi, sbVals, "subbandSizePmi")
        _validate(self.subbandSizeCqi, sbVals, "subbandSizeCqi")
        self.cqiTable = kwargs.get("cqiTable", 1)
        _validate(self.cqiTable, [1, 2, 3, 4], "cqiTable")
        self._cb_cache = {}

    # ------------------------------------------------------------ printing
    def print(self, indent: int = 0, title: str | None = None,
              getStr: bool = False):
        """Reference-style property listing (CsiReport.print,
        csifeedback.py)."""
        from ..utils import format_properties
        rows = [("reportId", self.reportId),
                ("reportType", self.reportType),
                ("period", self.period),
                ("offset", self.offset),
                ("quantity", self.quantity),
                ("codebookType", self.codebookType),
                ("n1 x n2", f"{self.n1} x {self.n2}"),
                ("o1 x o2", f"{self.o1} x {self.o2}"),
                ("ng", self.ng if self.codebookType == "Type1MP" else None),
                ("codebookMode", self.codebookMode),
                ("numPorts", self.numPorts),
                ("cbSubsetRestriction", self.cbSubsetRestriction),
                ("cbRiRestriction", self.cbRiRestriction)]
        if self.codebookType == "Type2":
            rows += [("numBeams", self.numBeams),
                     ("pskSize", self.pskSize),
                     ("subbandAmp", self.subbandAmp)]
        rows += [("prgSize", self.prgSize),
                 ("subbandSizePmi", self.subbandSizePmi),
                 ("subbandSizeCqi", self.subbandSizeCqi),
                 ("cqiTable", self.cqiTable)]
        s = format_properties(title or "CSI Report Properties:", rows, indent)
        if getStr:
            return s
        print(s)

    def __repr__(self):
        return self.print(getStr=True)

    # ----------------------------------------------------------- DFT beams
    def v(self, l, m, tilde=False):
        if tilde:
            ul = np.exp(4j * np.pi * l * np.arange(self.n1 // 2)
                        / (self.n1 * self.o1))
        else:
            ul = np.exp(2j * np.pi * l * np.arange(self.n1)
                        / (self.n1 * self.o1))
        um = np.exp(2j * np.pi * m * np.arange(self.n2) / (self.n2 * self.o2))
        return np.outer(ul, um)

    # ------------------------------------------------ Type-1 SP enumeration
    def _sp_k12(self, i13, tableFor34=False):
        """(k1, k2) per Table 5.2.2.2.1-3 (layers 2) / -4 (layers 3-4)."""
        o1, o2, n1, n2 = self.o1, self.o2, self.n1, self.n2
        if not tableFor34:
            if i13 == 0:
                return 0, 0
            if i13 == 1:
                return o1, 0
            if i13 == 2:
                if n1 > n2 and n2 > 1 or n1 == n2:
                    return 0, o2
                if n1 > 2 and n2 == 1:
                    return 2 * o1, 0
                return 0, 0
            if n1 > n2 and n2 > 1:
                return 2 * o1, 0
            if n1 == n2:
                return o1, o2
            if n1 > 2 and n2 == 1:
                return 3 * o1, 0
            return 0, 0
        if i13 == 0:
            return o1, 0
        if i13 == 1:
            if n2 == 1:
                return 2 * o1, 0
            return 0, o2
        if i13 == 2:
            if n2 == 1:
                return 3 * o1, 0
            return o1, o2
        if (n1, n2) == (6, 1):
            return 4 * o1, 0
        return 2 * o1, 0

    def _sp_i13len(self, numLayers):
        if numLayers == 2:
            return 2 if (self.n1 == 2 and self.n2 == 1) else 4
        if self.numPorts >= 16:
            return 4
        if (self.n1, self.n2) == (2, 1):
            return 1
        if (self.n1, self.n2) in ((4, 1), (2, 2)):
            return 3
        return 4

    def type1SpIndexes(self, numLayers):
        """Yields (i1=[i11,i12,i13], i2) — reference type1SpIndexes order."""
        bb1, bb2 = self.n1 * self.o1, self.n2 * self.o2
        restr = self.cbSubsetRestriction
        restrI2 = (self.cbSubsetRestrictionI2 if self.quantity == "CriRiI1Cqi"
                   else 16 * "1")

        def allowed(l, m):
            if self.numPorts in (16, 24, 32) and numLayers in (3, 4):
                return (restr[bb2 * (2 * l - 1) + m] == "1"
                        and restr[bb2 * (2 * l) + m] == "1"
                        and restr[bb2 * (2 * l + 1) + m] == "1")
            return restr[bb2 * l + m] == "1"

        def combs(*sizes):
            """Reference getCombs order: first listed loops slowest except the
            first two are swapped in the iteration nesting (getCombs:586-597).
            Practically: i (2nd arg) is the fastest-increasing of the first
            two. We reproduce by meshgrid semantics identical to reference."""
            lists = [list(range(s)) if isinstance(s, int) else s
                     for s in sizes][::-1]
            lists = [lists[1]] + [lists[0]] + lists[2:]
            n = len(lists)
            order = list(range(n - 1, 1, -1)) + [0, 1]
            return np.asarray(np.meshgrid(*lists)).T.reshape(-1, n)[:, order].tolist()

        if self.numPorts == 2:
            _validate(numLayers, [1, 2], "numLayers (2 ports)")
            if numLayers == 1:
                pmiAllowed = restr[-4:]
                for i1 in range(4):
                    if pmiAllowed[i1] == "1":
                        yield [i1, 0, 0], 0
            else:
                pmiAllowed = restr[-6:-4]
                for i1 in range(2):
                    if pmiAllowed[i1] == "1":
                        yield [i1, 0, 0], 0
            return

        if numLayers == 1:
            if self.codebookMode == 1:
                for i11, i12, i2 in combs(bb1, bb2, 4):
                    if allowed(i11, i12) and restrI2[i2] == "1":
                        yield [i11, i12, 0], i2
            elif self.n2 > 1:
                for i11, i12, i2 in combs(bb1 // 2, bb2 // 2, 16):
                    l, m = 2 * i11 + (i2 // 4) % 2, 2 * i12 + i2 // 8
                    if allowed(l, m) and restrI2[i2] == "1":
                        yield [i11, i12, 0], i2
            else:
                for i11, i2 in combs(bb1 // 2, 16):
                    l = 2 * i11 + i2 // 4
                    if allowed(l, 0) and restrI2[i2] == "1":
                        yield [i11, 0, 0], i2
            return

        if numLayers == 2:
            i13Len = self._sp_i13len(2)
            if self.codebookMode == 1:
                for i11, i12, i13, i2 in combs(bb1, bb2, i13Len, 2):
                    if allowed(i11, i12) and restrI2[i2] == "1":
                        yield [i11, i12, i13], i2
            elif self.n2 > 1:
                for i11, i12, i13, i2 in combs(bb1 // 2, bb2 // 2, i13Len, 8):
                    l, m = 2 * i11 + (i2 // 2) % 2, 2 * i12 + i2 // 4
                    if allowed(l, m) and restrI2[i2] == "1":
                        yield [i11, i12, i13], i2
            else:
                for i11, i13, i2 in combs(bb1 // 2, i13Len, 8):
                    l = 2 * i11 + i2 // 2
                    if allowed(l, 0) and restrI2[i2] == "1":
                        yield [i11, 0, i13], i2
            return

        if numLayers in (3, 4):
            i13Len = self._sp_i13len(numLayers)
            b1 = bb1 // 2 if self.numPorts >= 16 else bb1
            for i11, i12, i13, i2 in combs(b1, bb2, i13Len, 2):
                if allowed(i11, i12) and restrI2[i2] == "1":
                    yield [i11, i12, i13], i2
            return

        if numLayers in (5, 6):
            if self.n2 > 1:
                cc = combs(bb1, bb2, 2)
            elif self.n1 > 2:
                cc = combs(bb1, 1, 2)
            else:
                raise ValueError(f"Unsupported config for {numLayers} layers")
            for i11, i12, i2 in cc:
                if allowed(i11, i12) and restrI2[i2] == "1":
                    yield [i11, i12, 0], i2
            return

        if numLayers in (7, 8):
            if (self.n1, self.n2) == (4, 1):
                cc = combs(bb1 // 2, 1, 2)
            elif self.n1 > 4 and self.n2 == 1:
                cc = combs(bb1, 1, 2)
            elif (self.n1, self.n2) == (2, 2):
                cc = combs(bb1, bb2, 2)
            elif self.n1 > 2 and self.n2 == 2:
                cc = combs(bb1, bb2 // 2, 2)
            elif self.n1 > 2 and self.n2 > 2:
                cc = combs(bb1, bb2, 2)
            else:
                raise ValueError(f"Unsupported config for {numLayers} layers")
            for i11, i12, i2 in cc:
                if allowed(i11, i12) and restrI2[i2] == "1":
                    yield [i11, i12, 0], i2
            return
        raise ValueError(f"Unsupported number of layers {numLayers}")

    # --------------------------------------------------- Type-1 SP precoder
    def getType1SpPrecoder(self, numLayers, i1, i2):
        np_, bb1, bb2 = self.numPorts, self.n1 * self.o1, self.n2 * self.o2
        i11, i12, i13 = i1
        if np_ == 2:
            if numLayers == 1:
                cb = np.asarray([[[1], [1]], [[1], [1j]],
                                 [[1], [-1]], [[1], [-1j]]]) / np.sqrt(2)
                return cb[i11]
            cb = np.asarray([[[1, 1], [1, -1]], [[1, 1], [1j, -1j]]]) / 2
            return cb[i11]

        if numLayers == 1:
            if self.codebookMode == 1:
                l, m, n = i11, i12, i2
            elif self.n2 > 1:
                l = 2 * i11 + (i2 // 4) % 2
                m = 2 * i12 + i2 // 8
                n = i2 % 4
            else:
                l, m, n = 2 * i11 + i2 // 4, 0, i2 % 4
            vlm = self.v(l, m)
            phi = np.exp(1j * np.pi * n / 2)
            return np.concatenate([vlm, phi * vlm]).reshape(np_, 1) / np.sqrt(np_)

        if numLayers == 2:
            k1, k2 = self._sp_k12(i13)
            if self.codebookMode == 1:
                l, lp, m, mp, n = i11, i11 + k1, i12, i12 + k2, i2
            elif self.n2 > 1:
                l = 2 * i11 + (i2 // 2) % 2
                lp = l + k1
                m = 2 * i12 + i2 // 4
                mp = m + k2
                n = i2 % 2
            else:
                l = 2 * i11 + i2 // 2
                lp = l + k1
                m = mp = 0
                n = i2 % 2
            vlm, vlmp = self.v(l, m), self.v(lp, mp)
            phi = np.exp(1j * np.pi * n / 2)
            top = np.concatenate([vlm.reshape(-1, 1), vlmp.reshape(-1, 1)], -1)
            bot = np.concatenate([phi * vlm.reshape(-1, 1),
                                  -phi * vlmp.reshape(-1, 1)], -1)
            return np.concatenate([top, bot]) / np.sqrt(2 * np_)

        if numLayers in (3, 4):
            if np_ < 16:
                k1, k2 = self._sp_k12(i13, tableFor34=True)
                l, lp, m, mp, n = i11, i11 + k1, i12, i12 + k2, i2
                vlm = self.v(l, m).reshape(-1, 1)
                vlmp = self.v(lp, mp).reshape(-1, 1)
                phi = np.exp(1j * np.pi * n / 2)
                if numLayers == 3:
                    top = np.concatenate([vlm, vlmp, vlm], -1)
                    bot = np.concatenate([phi * vlm, phi * vlmp, -phi * vlm], -1)
                else:
                    top = np.concatenate([vlm, vlmp, vlm, vlmp], -1)
                    bot = np.concatenate([phi * vlm, phi * vlmp,
                                          -phi * vlm, -phi * vlmp], -1)
                return np.concatenate([top, bot]) / np.sqrt(numLayers * np_)
            l, m, p, n = i11, i12, i13, i2
            vt = self.v(l, m, tilde=True).reshape(-1, 1)
            phi = np.exp(1j * np.pi * n / 2)
            theta = np.exp(1j * np.pi * p / 4)
            if numLayers == 3:
                rows = [np.concatenate([vt, vt, vt], -1),
                        np.concatenate([theta * vt, -theta * vt, theta * vt], -1),
                        np.concatenate([phi * vt, phi * vt, -phi * vt], -1),
                        np.concatenate([theta * phi * vt, -theta * phi * vt,
                                        -theta * phi * vt], -1)]
            else:
                rows = [np.concatenate([vt, vt, vt, vt], -1),
                        np.concatenate([theta * vt, -theta * vt, theta * vt,
                                        -theta * vt], -1),
                        np.concatenate([phi * vt, phi * vt, -phi * vt,
                                        -phi * vt], -1),
                        np.concatenate([theta * phi * vt, -theta * phi * vt,
                                        -theta * phi * vt, theta * phi * vt], -1)]
            return np.concatenate(rows) / np.sqrt(numLayers * np_)

        phi = np.exp(1j * np.pi * i2 / 2)
        if numLayers in (5, 6):
            if self.n2 > 1:
                l, lp, ls = i11, i11 + self.o1, i11 + self.o1
                m, mp, ms = i12, i12, i12 + self.o2
            else:
                l, lp, ls = i11, i11 + self.o1, i11 + 2 * self.o1
                m = mp = ms = 0
            vlm = self.v(l, m).reshape(-1, 1)
            vlmp = self.v(lp, mp).reshape(-1, 1)
            vlms = self.v(ls, ms).reshape(-1, 1)
            if numLayers == 5:
                top = np.concatenate([vlm, vlm, vlmp, vlmp, vlms], -1)
                bot = np.concatenate([phi * vlm, -phi * vlm, vlmp, -vlmp, vlms], -1)
            else:
                top = np.concatenate([vlm, vlm, vlmp, vlmp, vlms, vlms], -1)
                bot = np.concatenate([phi * vlm, -phi * vlm, phi * vlmp,
                                      -phi * vlmp, vlms, -vlms], -1)
            return np.concatenate([top, bot]) / np.sqrt(numLayers * np_)

        # layers 7, 8
        if self.n2 == 1:
            l, l1, l2, l3 = (i11, i11 + self.o1, i11 + 2 * self.o1,
                             i11 + 3 * self.o1)
            m = m1 = m2 = m3 = 0
        else:
            l, l1, l2, l3 = i11, i11 + self.o1, i11, i11 + self.o1
            m, m1, m2, m3 = i12, i12, i12 + self.o2, i12 + self.o2
        vlm = self.v(l, m).reshape(-1, 1)
        vlm1 = self.v(l1, m1).reshape(-1, 1)
        vlm2 = self.v(l2, m2).reshape(-1, 1)
        vlm3 = self.v(l3, m3).reshape(-1, 1)
        if numLayers == 7:
            top = np.concatenate([vlm, vlm, vlm1, vlm2, vlm2, vlm3, vlm3], -1)
            bot = np.concatenate([phi * vlm, -phi * vlm, phi * vlm1, vlm2,
                                  -vlm2, vlm3, -vlm3], -1)
        else:
            top = np.concatenate([vlm, vlm, vlm1, vlm1, vlm2, vlm2, vlm3,
                                  vlm3], -1)
            bot = np.concatenate([phi * vlm, -phi * vlm, phi * vlm1,
                                  -phi * vlm1, vlm2, -vlm2, vlm3, -vlm3], -1)
        return np.concatenate([top, bot]) / np.sqrt(numLayers * np_)

    # ------------------------------------------------ Type-1 MP enumeration
    def type1MpIndexes(self, numLayers):
        if self.numPorts < 8:
            raise ValueError("Need at least 8 ports for Type1MP")
        bb1, bb2 = self.n1 * self.o1, self.n2 * self.o2
        restr = self.cbSubsetRestriction

        def lm_ok(l, m):
            if self.n2 == 1 and m > 0:
                return False
            return restr[bb2 * l + m] == "1"

        if numLayers == 1:
            i13Len = None
        elif numLayers == 2:
            i13Len = 2 if (self.n1 == 2 and self.n2 == 1) else 4
        elif (self.n1, self.n2) == (2, 1):
            i13Len = 1
        elif (self.n1, self.n2) in ((4, 1), (2, 2)):
            i13Len = 3
        else:
            i13Len = 4

        i2Range = range(4) if numLayers == 1 else range(2)
        i13Range = [0] if i13Len is None else range(i13Len)
        if self.codebookMode == 1:
            pRanges = [range(4)] * (self.ng - 1)
            for i11 in range(bb1):
                for i12 in range(bb2):
                    if not lm_ok(i11, i12):
                        continue
                    for i13 in i13Range:
                        for i14 in np.ndindex(*(4,) * (self.ng - 1)):
                            for i2 in i2Range:
                                yield [i11, i12, i13, list(i14)], [i2]
        else:
            for i11 in range(bb1):
                for i12 in range(bb2):
                    if not lm_ok(i11, i12):
                        continue
                    for i13 in i13Range:
                        for i141 in range(4):
                            for i142 in range(4):
                                for i20 in i2Range:
                                    for i21 in range(2):
                                        for i22 in range(2):
                                            yield ([i11, i12, i13,
                                                    [i141, i142]],
                                                   [i20, i21, i22])

    # --------------------------------------------------- Type-1 MP precoder
    def _mp_w(self, col, l, m, p, n):
        s = 1 if col == 1 else -1
        vlm = self.v(l, m).reshape(-1, 1)
        np_ = self.numPorts
        if self.codebookMode == 1:
            phiN = np.exp(1j * np.pi * n[0] / 2)
            if self.ng == 2:
                phiP1 = np.exp(1j * np.pi * p[0] / 2)
                return np.concatenate(
                    [vlm, s * phiN * vlm, phiP1 * vlm,
                     s * phiN * phiP1 * vlm]) / np.sqrt(np_)
            phiP = [np.exp(1j * np.pi * x / 2) for x in p]
            return np.concatenate(
                [vlm, s * phiN * vlm, phiP[0] * vlm, s * phiN * phiP[0] * vlm,
                 phiP[1] * vlm, s * phiN * phiP[1] * vlm, phiP[2] * vlm,
                 s * phiN * phiP[2] * vlm]) / np.sqrt(np_)
        p1, p2 = p
        n0, n1, n2 = n
        phiN0 = np.exp(1j * np.pi * n0 / 2)
        aP1 = np.exp(1j * np.pi * (p1 / 2 + 0.25))
        aP2 = np.exp(1j * np.pi * (p2 / 2 + 0.25))
        bN1 = np.exp(1j * np.pi * (n1 / 2 - 0.25))
        bN2 = np.exp(1j * np.pi * (n2 / 2 - 0.25))
        return np.concatenate([vlm, s * phiN0 * vlm, aP1 * bN1 * vlm,
                               s * aP2 * bN2 * vlm]) / np.sqrt(np_)

    def _mp_k12(self, i13, numLayers):
        o1, o2, n1, n2 = self.o1, self.o2, self.n1, self.n2
        if numLayers == 2:
            return self._sp_k12(i13)
        if i13 == 0:
            return o1, 0
        if i13 == 1:
            if n2 == 1:
                return 2 * o1, 0
            return 0, o2
        if i13 == 2:
            if n2 == 1:
                return 3 * o1, 0
            return o1, o2
        if (n1, n2) == (8, 1):
            return 4 * o1, 0
        return 2 * o1, 0

    def getType1MpPrecoder(self, numLayers, i1, i2):
        i11, i12, i13, i14 = i1
        if numLayers == 1:
            return self._mp_w(1, i11, i12, i14, i2)
        k1, k2 = self._mp_k12(i13, numLayers)
        l, lp, m, mp = i11, i11 + k1, i12, i12 + k2
        ws = [self._mp_w(1, l, m, i14, i2), self._mp_w(1, lp, mp, i14, i2),
              self._mp_w(2, l, m, i14, i2), self._mp_w(2, lp, mp, i14, i2)]
        if numLayers == 2:
            cols = [ws[0], ws[2]]
        elif numLayers == 3:
            cols = [ws[0], ws[1], ws[2]]
        else:
            cols = ws
        return np.concatenate(cols, axis=-1) / np.sqrt(numLayers)

    # ------------------------------------------------------------- Type II
    # TS 38.214 §5.2.2.2.3 (Rel-15 Type II, rank <= 2): W columns are
    # linear combinations of numBeams (L) orthogonal DFT beams per
    # polarization with quantized wideband amplitudes (3-bit, Table
    # 5.2.2.2.3-2), per-subband co-phases (N_psk), and optional subband
    # amplitudes (Table 5.2.2.2.3-3). The reference stubs all of this out
    # (getType2Precoder commented, getCodebook asserts); here it is
    # functional: index packing/unpacking, precoder reconstruction from
    # the PMI, and a quantized eigen-projection PMI search (the space is
    # far too large to enumerate as a codebook).
    _TYPE2_P1 = np.sqrt([0.0, 1 / 64, 1 / 32, 1 / 16, 1 / 8, 1 / 4, 1 / 2, 1.0])
    _TYPE2_P2 = np.sqrt([0.5, 1.0])

    def getType2n12(self, i12):
        """Combinatorial index i12 -> (n1[], n2[]) beam positions per the
        TS 38.214 §5.2.2.2.3 bijection i12 = sum_i C(N1N2-1-n_i, L-i).
        Beam flat index n = N1*n2 + n1 over the N1*N2 orthogonal set.

        Deviation: the reference's helpers are broken — its getType2I12
        (csifeedback.py:1349-1353) tuple-indexes the Python cxy list and
        raises TypeError on any call, and its getType2n12
        (csifeedback.py:1330-1347) reads cxy[x][y] which holds C(x, y+1)
        per the table's own column labels, an off-by-one against the spec
        formula. We implement the spec bijection (exhaustively verified:
        tools/dev/cmp_type2_idx.py)."""
        from math import comb
        L, n1n2 = self.numBeams, self.n1 * self.n2
        s, n1s, n2s = 0, [], []
        for i in range(L):
            y = L - i
            xStar = -1
            for x in range(y - 1, n1n2 - i):
                if i12 - s >= comb(x, y) and x > xStar:
                    xStar = x
            s += comb(xStar, y)
            n = n1n2 - 1 - xStar
            n1s.append(n % self.n1)
            n2s.append((n - n1s[-1]) // self.n1)
        return np.int32(n1s), np.int32(n2s)

    def getType2I12(self, n1, n2):
        """(n1[], n2[]) beam positions -> combinatorial index i12 (inverse
        of getType2n12; reference csifeedback.py:1349-1353). Beams must be
        sorted by ascending flat index n = N1*n2 + n1."""
        from math import comb
        n1n2 = self.n1 * self.n2
        n = self.n1 * np.asarray(n2) + np.asarray(n1)
        return int(sum(comb(n1n2 - 1 - int(n[i]), self.numBeams - i)
                       for i in range(self.numBeams)))

    def _type2_beams(self, q1, q2, n1s, n2s):
        """Unit-norm DFT beam matrix (N1*N2 ports per polarization, L)."""
        cols = [self.v(self.o1 * int(x1) + q1, self.o2 * int(x2) + q2).reshape(-1)
                for x1, x2 in zip(n1s, n2s)]
        return np.stack(cols, axis=-1) / np.sqrt(self.n1 * self.n2)

    def getType2Precoder(self, numLayers, i1, i2):
        """Reconstruct the (numPorts, numLayers) Type II precoder from PMI
        indices. i1 = (i11=[q1,q2], i12, i13=[per layer], i14=[per layer
        2L wideband-amplitude indices]); i2 = per layer (phases[2L]
        N_psk indices, k2[2L] subband-amplitude indices or None).
        Strongest coefficient i13_l has amplitude 1, phase 0 by
        construction. Columns unit-norm / sqrt(numLayers)."""
        (q1, q2), i12, i13, i14 = i1
        n1s, n2s = self.getType2n12(i12)
        B = self._type2_beams(q1, q2, n1s, n2s)          # (N1N2, L)
        L = self.numBeams
        cols = []
        for l in range(numLayers):
            ph, k2 = i2[l]
            p1 = self._TYPE2_P1[np.asarray(i14[l], int)]
            p2 = (self._TYPE2_P2[np.asarray(k2, int)] if k2 is not None
                  else np.ones(2 * L))
            c = p1 * p2 * np.exp(2j * np.pi * np.asarray(ph) / self.pskSize)
            w = np.concatenate([B @ c[:L], B @ c[L:]])
            nrm = np.linalg.norm(w)
            cols.append(w / (nrm if nrm > 0 else 1.0))
        return np.stack(cols, axis=-1) / np.sqrt(numLayers)

    def _type2_quantize(self, coef):
        """(2L,) complex coefficients -> (i13, i14, phases, amps ratio)
        with the strongest coefficient normalized to (1, 0deg)."""
        s = int(np.argmax(np.abs(coef)))
        cn = coef / coef[s] if coef[s] != 0 else coef
        amp = np.minimum(np.abs(cn), 1.0)
        k1 = np.argmin(np.abs(amp[:, None] - self._TYPE2_P1[None, :]), axis=1)
        k1[s] = 7                                        # strongest: p1 = 1
        ph = np.round(np.angle(cn) * self.pskSize / (2 * np.pi)).astype(int) \
            % self.pskSize
        ph[s] = 0
        return s, k1.astype(int), ph, amp

    def bestType2Pmi(self, channel, numLayers, noiseVar):
        """Quantized Type II PMI search: same return contract as
        bestPmiForRank — (pmi [i1, [i2 per subband]], precoders per
        subband, per-subband RE SINRs).

        Algorithm (the standard eigen-projection construction — the Type II
        space cannot be enumerated): (1) pick the beam-group rotation
        (q1, q2) and L orthogonal beams capturing the most wideband
        covariance power (summed over polarizations); (2) per layer,
        project the covariance eigenvectors onto the selected beam basis
        and quantize (3-bit wideband amplitudes, N_psk phases); (3) per
        PMI subband, re-project the subband eigenvectors (phase-aligned to
        the wideband ones) and re-quantize phases (and, with
        subbandAmp=True, the 1-bit subband amplitude of every non-strongest
        coefficient — the spec restricts subband amplitude reporting to the
        strongest K coefficients; reporting it for all is a superset).
        Precoders are reconstructed FROM the quantized indices
        (getType2Precoder), so the returned ws are exactly what a gNB
        would rebuild from this PMI."""
        if numLayers > 2:
            raise ValueError("Type2 supports numLayers <= 2")
        idxP0 = self._csirs_p0_res()
        hAtCsiRs = np.asarray(channel)[idxP0]            # (nRE, Nr, Nt)
        reIndexes = idxP0[1]
        nt = hAtCsiRs.shape[-1]
        half = nt // 2
        L = self.numBeams

        def cov(h):
            return np.einsum("nri,nrj->ij", h.conj(), h)

        def top_vecs(R, k):
            w, v = np.linalg.eigh(R)
            return v[:, ::-1][:, :k]                     # descending

        R = cov(hAtCsiRs)
        # ---- rotation + beam selection on the wideband covariance
        # all N1*N2 orthogonal beams in flat-n order (n = N1*n2 + n1)
        n1All = np.tile(np.arange(self.n1), self.n2)
        n2All = np.repeat(np.arange(self.n2), self.n1)
        best = None
        for q1 in range(self.o1):
            for q2 in range(self.o2):
                allB = self._type2_beams(q1, q2, n1All, n2All)
                pw = (np.einsum("pi,pq,qi->i", allB.conj(),
                                R[:half, :half], allB)
                      + np.einsum("pi,pq,qi->i", allB.conj(),
                                  R[half:, half:], allB)).real
                order = np.argsort(-pw)[:L]
                tot = pw[order].sum()
                if best is None or tot > best[0]:
                    best = (tot, q1, q2, np.sort(order))
        _, q1, q2, beamIdx = best
        # beamIdx are flat n = N1*n2 + n1 positions (ascending)
        n1s = (beamIdx % self.n1).astype(int)
        n2s = (beamIdx // self.n1).astype(int)
        i12 = self.getType2I12(n1s, n2s)
        B = self._type2_beams(q1, q2, n1s, n2s)          # (half, L)

        uWb = top_vecs(R, numLayers)
        coefWb = [np.concatenate([B.conj().T @ uWb[:half, l],
                                  B.conj().T @ uWb[half:, l]])
                  for l in range(numLayers)]
        i13, i14, phWb, ampWb = [], [], [], []
        for l in range(numLayers):
            s, k1, ph, amp = self._type2_quantize(coefWb[l])
            i13.append(s)
            i14.append(k1)
            phWb.append(ph)
            ampWb.append(amp)
        i1 = ([q1, q2], i12, i13, i14)

        # ---- per-subband co-phase (and optional subband amplitude)
        if self.prgSize is None:
            sbSize = self.subbandSizePmi if self.carrier.numRbs >= 24 else 0
        else:
            sbSize = self.prgSize
        sbRanges = (list(self.subbands(sbSize)) if sbSize
                    else [self.carrier.numRbs])
        i2s, ws, sbSinrs = [], [], []
        rb = 0
        for rbsInSb in sbRanges:
            inSb = np.where((reIndexes >= rb * 12)
                            & (reIndexes < (rb + rbsInSb) * 12))[0]
            if inSb.size == 0:
                raise ValueError("Subband has no CSI-RS REs")
            Rsb = cov(hAtCsiRs[inSb])
            uSb = top_vecs(Rsb, numLayers)
            i2 = []
            for l in range(numLayers):
                u = uSb[:, l]
                align = uWb[:, l].conj() @ u
                if abs(align) > 0:
                    u = u * np.exp(-1j * np.angle(align))
                c = np.concatenate([B.conj().T @ u[:half],
                                    B.conj().T @ u[half:]])
                sRef = i13[l]
                cn = c / c[sRef] if c[sRef] != 0 else c
                ph = np.round(np.angle(cn) * self.pskSize
                              / (2 * np.pi)).astype(int) % self.pskSize
                ph[sRef] = 0
                if self.subbandAmp:
                    ratio = np.abs(cn) / np.maximum(ampWb[l], 1e-12)
                    k2 = np.argmin(np.abs(ratio[:, None]
                                          - self._TYPE2_P2[None, :]), axis=1)
                    k2[sRef] = 1
                    i2.append((ph, k2.astype(int)))
                else:
                    i2.append((ph, None))
            i2s.append(i2)
            w = self.getType2Precoder(numLayers, i1, i2)
            ws.append(w)
            sbSinrs.append(np.asarray(self.compute_sinr(
                hAtCsiRs[inSb], w[None], noiseVar))[0])
            rb += rbsInSb
        return [i1, i2s], ws, sbSinrs

    # ---------------------------------------------------------- codebook
    def getCodebook(self, numLayers):
        if self.codebookType == "Type2":
            raise ValueError(
                "Type2 has no enumerable codebook (the PMI space is "
                "combinatorial x quantized amplitudes x per-subband "
                "phases); use bestType2Pmi / getBestRank, which search it "
                "directly")
        key = numLayers
        if key not in self._cb_cache:
            indexes, cb = [], []
            if self.codebookType == "Type1SP":
                for i1, i2 in self.type1SpIndexes(numLayers):
                    indexes.append([i1, i2])
                    cb.append(self.getType1SpPrecoder(numLayers, i1, i2))
            else:
                for i1, i2 in self.type1MpIndexes(numLayers):
                    indexes.append([i1, i2])
                    cb.append(self.getType1MpPrecoder(numLayers, i1, i2))
            self._cb_cache[key] = (indexes, np.asarray(cb))
        return self._cb_cache[key]

    # ---------------------------------------------------------- measurement
    @staticmethod
    def removeNeighbors(idx):
        """Pick one representative RE per cluster of adjacent CSI-RS REs.

        A CDM group occupies a contiguous block of REs (2 adjacent
        subcarriers by 1/2/4 adjacent OFDM symbols, TS 38.211 Table
        7.4.1.5.3-1), and the estimator averages within a group (meanCdm),
        so the measurement needs only one RE per block. Behavior matches
        reference csifeedback.py:405-417 (which erodes a bitmap): keep an
        RE iff it starts its horizontal run (no RE at k-1) and no other
        run-starter sits directly above it (l-1), i.e. the top-left member
        of each cluster. Returned in row-major (l, k) order like np.where.
        """
        pts = set(zip(idx[0].tolist(), idx[1].tolist()))
        starts = {(l, k) for (l, k) in pts if (l, k - 1) not in pts}
        keep = sorted(p for p in starts if (p[0] - 1, p[1]) not in starts)
        if not keep:
            return (np.asarray([], np.int64), np.asarray([], np.int64))
        ls, ks = map(np.asarray, zip(*keep))
        return (ls, ks)

    @staticmethod
    def compute_sinr(h, w, noiseVar):
        """Per-RE post-precoding SINR (reference getSINR:419-433), jnp.

        h: (n, Nr, Nt); w: (Ncb, Nt, Nl). Returns (Ncb, n, Nl)."""
        h = jnp.asarray(h)
        w = jnp.asarray(w, h.dtype)
        heff = jnp.einsum("nrt,ctl->cnrl", h, w)
        u, s, vH = jnp.linalg.svd(heff, full_matrices=True)
        noisyInvS = 1.0 / (jnp.abs(s) ** 2 + noiseVar)
        gamma = 1.0 / (noiseVar * (noisyInvS[..., None]
                                   * jnp.abs(vH) ** 2).sum(-2)) - 1
        return gamma.real

    def subbands(self, sbSize):
        rb = self.carrier.startRb
        endRb = rb + self.carrier.numRbs
        sb = 0
        while rb < endRb:
            if sb == 0:
                rbsInSb = sbSize - (rb % sbSize)
            elif rb + sbSize > endRb:
                rbsInSb = endRb % sbSize
            else:
                rbsInSb = sbSize
            yield rbsInSb
            rb, sb = rb + rbsInSb, sb + 1

    def _csirs_p0_res(self):
        entries = self.csiRsConfig.entries(0)
        ls = np.asarray([l for p, l, k, v in entries if p == 0 and v is not None])
        ks = np.asarray([k for p, l, k, v in entries if p == 0 and v is not None])
        return self.removeNeighbors((ls, ks))

    def bestPmiForRank(self, channel, numLayers, noiseVar):
        """(pmi [i1, [i2 per subband]], precoders, per-subband RE SINRs)."""
        if self.codebookType == "Type2":
            return self.bestType2Pmi(channel, numLayers, noiseVar)
        idxP0 = self._csirs_p0_res()
        hAtCsiRs = np.asarray(channel)[idxP0]               # (numREs, Nr, Nt)
        cbIndexes, codebook = self.getCodebook(numLayers)
        sinr = np.asarray(self.compute_sinr(hAtCsiRs, codebook, noiseVar))
        return self._pmi_select(sinr, cbIndexes, codebook, idxP0[1])

    def _pmi_select(self, sinr, cbIndexes, codebook, reIndexes):
        """Wideband + per-subband PMI selection from precomputed SINRs."""
        sumSinrs = sinr.sum((1, 2))
        best = int(sumSinrs.argmax())
        wbI1, wbI2 = cbIndexes[best]
        wbW = codebook[best]

        if self.prgSize is None:
            sbSize = self.subbandSizePmi if self.carrier.numRbs >= 24 else 0
        else:
            sbSize = self.prgSize
        if sbSize == 0:
            return [wbI1, [wbI2]], [wbW], [sinr[best]]

        i1Cb = [i for i, ci in enumerate(cbIndexes) if np.all(ci[0] == wbI1)]
        sbI2s, sbWs, sbSinrs = [], [], []
        rb = 0
        for sb, rbsInSb in enumerate(self.subbands(sbSize)):
            inSb = np.where((reIndexes >= rb * 12)
                            & (reIndexes < (rb + rbsInSb) * 12))[0]
            if inSb.size == 0:
                raise ValueError(f"Subband {sb} has no CSI-RS REs")
            sbSinr = sinr[:, inSb, :][i1Cb]
            bestSb = int(sbSinr.sum((1, 2)).argmax())
            gIdx = i1Cb[bestSb]
            sbI2s.append(cbIndexes[gIdx][1])
            sbWs.append(codebook[gIdx])
            sbSinrs.append(sbSinr[bestSb])
            rb += rbsInSb
        return [wbI1, sbI2s], sbWs, sbSinrs

    def getBestRank(self, channel, noiseVar):
        """Rank + PMI search as ONE batched device SINR call.

        The reference loops ranks, recomputing getSINR per rank
        (csifeedback.py:517-537); here the codebooks of every allowed rank
        are zero-padded to the max layer count and concatenated, so the SVD
        batch runs once for all (rank, codebook-entry) combinations.
        Zero-padded layers are exact null right-singular directions of the
        effective channel, so their SINR comes out exactly 0 and the real
        layers' SINRs are untouched; each rank's slice then goes through the
        same wideband/subband selection as bestPmiForRank.
        """
        l, k, nr, nt = np.asarray(channel).shape
        if nt != self.numPorts:
            raise ValueError("Channel Nt must match the configured numPorts")
        if self.codebookType == "Type1SP":
            maxRank = min(nr, nt, 8)
        elif self.codebookType == "Type2":
            maxRank = min(nr, 2)                 # reference csifeedback.py:523
        else:
            maxRank = min(nr, 4)
        ranks = [r for r in range(1, maxRank + 1)
                 if self.cbRiRestriction[-r] == "1"]
        if self.codebookType == "Type2":
            best = (-1e5, 0, None, None)
            for rank in ranks:
                pmi, ws, sbReSinr = self.bestType2Pmi(channel, rank, noiseVar)
                sbSinr = np.asarray([s.mean(0) for s in sbReSinr])
                rankSinr = (sbSinr.mean(0) * rank).sum()
                if rankSinr > best[0]:
                    best = (rankSinr, rank, pmi, sbReSinr)
            return best[1], best[2], best[3]
        idxP0 = self._csirs_p0_res()
        hAtCsiRs = np.asarray(channel)[idxP0]               # (numREs, Nr, Nt)
        cbs = [(r,) + tuple(self.getCodebook(r)) for r in ranks]
        maxNl = max(ranks)
        wPad = np.concatenate(
            [np.pad(cb, ((0, 0), (0, 0), (0, maxNl - cb.shape[2])))
             for _, _, cb in cbs])
        allSinr = np.asarray(self.compute_sinr(hAtCsiRs, wPad, noiseVar))
        best = (-1e5, 0, None, None)
        off = 0
        for rank, cbIndexes, codebook in cbs:
            sinr = allSinr[off:off + len(codebook), :, :rank]
            off += len(codebook)
            pmi, ws, sbReSinr = self._pmi_select(sinr, cbIndexes, codebook,
                                                 idxP0[1])
            sbSinr = np.asarray([s.mean(0) for s in sbReSinr])
            rankSinr = (sbSinr.mean(0) * rank).sum()
            if rankSinr > best[0]:
                best = (rankSinr, rank, pmi, sbReSinr)
        return best[1], best[2], best[3]

    def getCqiToPmiIdxes(self, pmiSbSize):
        numRbs = self.carrier.numRbs
        cqiSizes = ([numRbs] if self.subbandSizeCqi == 0
                    else list(self.subbands(self.subbandSizeCqi)))
        pmiSizes = [numRbs] if pmiSbSize == 0 else list(self.subbands(pmiSbSize))
        out = [[] for _ in cqiSizes]
        pmi, sumPmi, sumCqi = 0, pmiSizes[0], 0
        for cqi, cqiSize in enumerate(cqiSizes):
            out[cqi].append(pmi)
            sumCqi += cqiSize
            while True:
                if sumPmi == sumCqi:
                    pmi += 1
                    if pmi < len(pmiSizes):
                        sumPmi = pmiSizes[pmi]
                    sumCqi = 0
                    break
                if sumPmi > sumCqi:
                    break
                sumPmi += pmiSizes[pmi]
                pmi += 1
                out[cqi].append(pmi)
        return out

    # ----------------------------------------------------------------- CQI
    def getCQI(self, sbReSinrs):
        """CQI per subband + wideband from per-RE SINRs (spec-intended use of
        Tables 5.2.2.1-2..5: highest CQI whose efficiency <= channel
        capacity log2(1+sinr) of the effective SINR)."""
        table = CQI_TABLES[self.cqiTable]

        def cqi_of(sinrEff):
            eff = np.log2(1 + max(sinrEff, 0))
            best = 0
            for i in range(1, len(table)):
                if table[i][2] is not None and table[i][2] <= eff:
                    best = i
            return best

        pmiSbSize = (self.prgSize if self.prgSize is not None
                     else (self.subbandSizePmi if self.carrier.numRbs >= 24 else 0))
        cqiToPmi = self.getCqiToPmiIdxes(pmiSbSize)
        sbCqis = []
        for pmiIdxs in cqiToPmi:
            vals = np.concatenate([np.asarray(sbReSinrs[min(i, len(sbReSinrs) - 1)])
                                   .reshape(-1) for i in pmiIdxs])
            # effective SINR: geometric-mean capacity inversion
            eff = np.mean(np.log2(1 + np.maximum(vals, 0)))
            sbCqis.append(cqi_of(2 ** eff - 1))
        allVals = np.concatenate([np.asarray(s).reshape(-1) for s in sbReSinrs])
        eff = np.mean(np.log2(1 + np.maximum(allVals, 0)))
        wbCqi = cqi_of(2 ** eff - 1)
        return wbCqi, sbCqis

    def computeReport(self, channel, noiseVar):
        """Full CSI report honoring every validated ``quantity``.

        Args:
          channel: (L, K, Nr, numPorts) estimated channel for the CSI-RS
            resource, or a list/tuple of such channels — one per CSI-RS
            resource — over which CRI selects the strongest resource.
          noiseVar: estimated noise variance at the receiver.

        Quantities (TS 38.214 §5.2.1.4.2 vocabulary):
          - CriRiPmiCqi:   cri, rank, pmi, cqi, subbandCqis
          - CriRiLiPmiCqi: + li, the strongest-layer index w.r.t. the
            reported PMI/RI (TS 38.214 §5.2.2.2): argmax of the mean
            per-layer post-precoding SINR.
          - CriRiI1 / CriRiI1Cqi: wideband i1 only (i2 subset-restricted
            enumeration per type1SpIndexes).
          - CriRiCqi: rank + CQI without PMI.
          - CriRsrp / CriSinr: CSI-RSRP as the linear average of the port-0
            CSI-RS RE power over REs and rx branches (TS 38.215 §5.1.2),
            CSI-SINR as RSRP / noiseVar (TS 38.215 §5.1.5).

        Reference behavior note: the reference VALIDATES all these
        quantities (csifeedback.py:193-194) but never computes the LI/RSRP/
        SINR measurements (its getEffectiveSINR, csifeedback.py:383-384, is
        a stub); the measurements here fill that gap per the cited spec
        sections. SSB-based quantities would need an SSB model, which
        neither framework has — they raise NotImplementedError.
        """
        chans = (list(channel) if isinstance(channel, (list, tuple))
                 else [channel])
        idxP0 = self._csirs_p0_res()
        rsrps = [float(np.mean(np.abs(np.asarray(h)[idxP0][..., 0]) ** 2))
                 for h in chans]
        cri = int(np.argmax(rsrps))
        q = self.quantity
        if q.startswith("Ssb"):
            raise NotImplementedError(
                "SSB-based report quantities need an SSB model; use one of "
                "the Cri* quantities")
        if q == "CriRsrp":
            return dict(cri=cri, rsrp=rsrps[cri], rsrpDb=toDb(rsrps[cri]))
        if q == "CriSinr":
            sinr = rsrps[cri] / noiseVar
            return dict(cri=cri, sinr=sinr, sinrDb=toDb(sinr))
        rank, pmi, sbReSinr = self.getBestRank(chans[cri], noiseVar)
        rep = dict(cri=cri, rank=rank)
        if q in ("CriRiPmiCqi", "CriRiLiPmiCqi"):
            rep["pmi"] = pmi
        if q in ("CriRiI1", "CriRiI1Cqi"):
            rep["i1"] = pmi[0]
        if q == "CriRiLiPmiCqi":
            layerSinr = np.concatenate(
                [np.asarray(s) for s in sbReSinr]).mean(0)
            rep["li"] = int(np.argmax(layerSinr))
        if q != "CriRiI1":
            wbCqi, sbCqis = self.getCQI(sbReSinr)
            rep["cqi"] = wbCqi
            rep["subbandCqis"] = sbCqis
        return rep
