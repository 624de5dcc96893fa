"""PDSCH demodulation reference signals (DMRS) — TS 38.211 §7.4.1.1.

TPU design: DMRS depends only on configuration (ports, symbol positions,
scrambling identities, slot number) — never on payload data — so the entire
pilot grid is computed host-side with NumPy per (config, slot-in-frame) and
shipped to the device as a constant complex64 tensor. The jitted path merely
adds it to the data grid.

Behavioral parity: reference ``neoradium/dmrs.py`` (DMRS class): symbol
position tables 7.4.1.1.2-3/4, Wf/Wt OCC tables 7.4.1.1.2-1/2, cInit formula
(dmrs.py:514-515), beta from TS 38.214 Table 4.1-1 (dmrs.py:345), NO_DATA
marking of other/own CDM groups (dmrs.py:543-548).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..sequences import gold_sequence
from ..utils import toLinear

# TS 38.211 Table 7.4.1.1.2-3 (single-symbol) — lBar positions by [ld][additionalPos],
# 0 stands for l0. Index = PDSCH duration ld (0..14).
_POS_SINGLE_A = [
    [[], [], [], []], [[], [], [], []], [[], [], [], []],
    [[0], [0], [0], [0]], [[0], [0], [0], [0]], [[0], [0], [0], [0]],
    [[0], [0], [0], [0]], [[0], [0], [0], [0]],
    [[0], [0, 7], [0, 7], [0, 7]], [[0], [0, 7], [0, 7], [0, 7]],
    [[0], [0, 9], [0, 6, 9], [0, 6, 9]], [[0], [0, 9], [0, 6, 9], [0, 6, 9]],
    [[0], [0, 9], [0, 6, 9], [0, 5, 8, 11]],
    [[0], [0, 11], [0, 7, 11], [0, 5, 8, 11]],
    [[0], [0, 11], [0, 7, 11], [0, 5, 8, 11]],
]
_POS_SINGLE_B = [
    [[], [], [], []], [[], [], [], []],
    [[0], [0], [0], [0]], [[0], [0], [0], [0]], [[0], [0], [0], [0]],
    [[0], [0, 4], [0, 4], [0, 4]], [[0], [0, 4], [0, 4], [0, 4]],
    [[0], [0, 4], [0, 4], [0, 4]],
    [[0], [0, 6], [0, 3, 6], [0, 3, 6]],
    [[0], [0, 7], [0, 4, 7], [0, 4, 7]], [[0], [0, 7], [0, 4, 7], [0, 4, 7]],
    [[0], [0, 8], [0, 4, 8], [0, 3, 6, 9]],
    [[0], [0, 9], [0, 5, 9], [0, 3, 6, 9]], [[0], [0, 9], [0, 5, 9], [0, 3, 6, 9]],
    [[], [], [], []],
]
# TS 38.211 Table 7.4.1.1.2-4 (double-symbol)
_POS_DOUBLE_A = [
    [[], []], [[], []], [[], []], [[], []],
    [[0], [0]], [[0], [0]], [[0], [0]], [[0], [0]], [[0], [0]], [[0], [0]],
    [[0], [0, 8]], [[0], [0, 8]], [[0], [0, 8]],
    [[0], [0, 10]], [[0], [0, 10]],
]
_POS_DOUBLE_B = [
    [[], []], [[], []], [[], []], [[], []], [[], []],
    [[0], [0]], [[0], [0]], [[0], [0]],
    [[0], [0, 5]], [[0], [0, 5]],
    [[0], [0, 7]], [[0], [0, 7]],
    [[0], [0, 8]], [[0], [0, 8]],
    [[], []],
]


def _occ_tables(configType: int, portNo: int):
    """(wf[4], wt[2]) per TS 38.211 Tables 7.4.1.1.2-1/2.

    Both tables share the pattern: wf alternates sign with the port parity
    sub-index, wt with a port-dependent bit; the k' >= 2 half flips for the
    higher port groups.
    """
    if configType == 1:
        s = -1 if portNo % 2 else 1
        hi = portNo >= 8            # ports 8..15 flip the k' >= 2 half
        wt_neg = (portNo % 8) >= 4
    else:
        s = -1 if portNo % 2 else 1
        hi = portNo >= 12           # ports 12..23 flip the k' >= 2 half
        wt_neg = (portNo % 12) >= 6
    wf = [1, s, -1 if hi else 1, -s if hi else s]
    wt = [1, -1 if wt_neg else 1]
    return wf, wt


# TS 38.211 Table 7.4.1.2.2-1: PTRS RE offsets per (configType, port, offset)
_PTRS_REF_RES = {
    1: [[0, 2, 6, 8], [2, 4, 8, 10], [1, 3, 7, 9], [3, 5, 9, 11]],
    2: [[0, 1, 6, 7], [1, 6, 7, 0], [2, 3, 8, 9], [3, 8, 9, 2],
        [4, 5, 10, 11], [5, 10, 11, 4]],
}


class PtrsConfig:
    """Phase-tracking reference signals — TS 38.211 §7.4.1.2, TS 38.214
    §5.1.6.3.

    Host-side planning only (like DMRS): PTRS copies the port's first-DMRS-
    symbol value at each PTRS subcarrier across the PTRS symbols, with the
    EPRE boost of TS 38.214 Table 4.1-2.

    Parity: reference ``neoradium/dmrs.py`` PTRS (dmrs.py:554-796) —
    time/freq density direct or via MCS Tables 5.1.6.3-1/2 (dmrs.py:638-669),
    RE offset Table 7.4.1.2.2-1 (dmrs.py:118-135), symbol-set countdown from
    DMRS symbols (dmrs.py:700-709), EPRE boost (dmrs.py:770), first-DMRS-
    value copy (dmrs.py:774-796).
    """

    def __init__(self, **kwargs):
        self.mcsi = kwargs.get("mcsi", None)
        self.iMCS = kwargs.get("iMCS", None)
        self.nRBi = kwargs.get("nRBi", None)
        self._direct_time = kwargs.get("timeDensity", 1)
        self._direct_freq = kwargs.get("freqDensity", 2)
        if any(x is not None for x in (self.mcsi, self.iMCS, self.nRBi)):
            if any(x is None for x in (self.mcsi, self.iMCS, self.nRBi)):
                raise ValueError("mcsi, iMCS, and nRBi must all be given or all None")
            if not isinstance(self.mcsi, (list, tuple)) or len(self.mcsi) != 3:
                raise ValueError("mcsi must be a list of 3 values")
            if not isinstance(self.nRBi, (list, tuple)) or len(self.nRBi) != 2:
                raise ValueError("nRBi must be a list of 2 values")
        else:
            if self._direct_time not in (1, 2, 4):
                raise ValueError("timeDensity must be 1, 2, or 4")
            if self._direct_freq not in (2, 4):
                raise ValueError("freqDensity must be 2 or 4")
        self.reOffset = kwargs.get("reOffset", 0)
        if isinstance(self.reOffset, str):
            self.reOffset = {"00": 0, "01": 1, "10": 2, "11": 3}[self.reOffset]
        if self.reOffset not in (0, 1, 2, 3):
            raise ValueError("reOffset must be 0, 1, 2, or 3")
        self.portSet = kwargs.get("portSet", None)   # default: pxxch port 0
        self.epreRatio = kwargs.get("epreRatio", 0)
        if self.epreRatio not in (0, 1):
            raise ValueError("epreRatio must be 0 or 1")

    def densities(self, numRBs: int, numPxxchSyms: int):
        """(timeDensity, freqDensity); (0, 0) disables PTRS
        (TS 38.214 Tables 5.1.6.3-1/2)."""
        if self.mcsi is not None:
            if self.iMCS < self.mcsi[0]:
                return 0, 0
            t = 4 if self.iMCS < self.mcsi[1] else (2 if self.iMCS < self.mcsi[2] else 1)
            if numRBs < self.nRBi[0]:
                return 0, 0
            f = 2 if numRBs < self.nRBi[1] else 4
            return t, f
        t = self._direct_time
        if t >= numPxxchSyms:
            return 0, 0
        return t, self._direct_freq

    def sym_set(self, pxxchSymSet, dmrsSymSet, timeDensity: int):
        """PTRS symbol indices (reference countdown loop dmrs.py:700-709)."""
        out = []
        skip = 0
        dm = set(int(x) for x in dmrsSymSet)
        px = set(int(x) for x in pxxchSymSet)
        for s in range(int(pxxchSymSet[0]), int(pxxchSymSet[-1]) + 1):
            if s in dm:
                skip = timeDensity
            if skip == 0:
                if s in px:
                    out.append(s)
                skip = timeDensity
            skip -= 1
        return out

    def entries(self, pdschCfg, slotNo, slotMap):
        """[(p, l, k, value)] for one slot.

        PTRS values are beta * r(n): the RAW first-DMRS-symbol sequence value
        at the subcarrier, WITHOUT the DMRS OCC/beta weighting (reference
        dmrs.py:538-540 saves rawSymbols, not the weighted grid value).
        """
        dmrs = pdschCfg.dmrs
        ports = (self.portSet if self.portSet is not None
                 else pdschCfg.portSet[:1])
        numRBs = len(pdschCfg.prbSet)
        t, f = self.densities(numRBs, len(pdschCfg.symSet))
        if t == 0:
            return []
        dmrsSyms = dmrs.sym_set(pdschCfg.mappingType, pdschCfg.symSet,
                                pdschCfg.carrier.cpType)
        if len(dmrsSyms) == 0:
            return []
        symSet = self.sym_set(pdschCfg.symSet, dmrsSyms, t)
        beta = (toLinear([0, 3, 4.77, 6, 7, 7.78][len(ports)] / 2)
                if self.epreRatio == 0 else 1.0)
        l0vals = dmrs.raw_l0_values(pdschCfg.carrier, slotNo, pdschCfg.portSet,
                                    pdschCfg.mappingType, pdschCfg.symSet,
                                    slotMap)
        out = []
        for p, portNo in enumerate(pdschCfg.portSet):
            if portNo not in ports:
                continue
            refRE = _PTRS_REF_RES[dmrs.configType][portNo][self.reOffset]
            for l in symSet:
                rbs = sorted(slotMap[l])
                nRB = len(rbs)
                if nRB == 0:
                    continue
                if nRB % f == 0:
                    refRB = pdschCfg.rnti % f
                else:
                    refRB = pdschCfg.rnti % (nRB % f)
                for kc in range(refRE + 12 * refRB, 12 * nRB, 12 * f):
                    k = rbs[kc // 12] * 12 + kc % 12
                    out.append((p, l, k, beta * l0vals[p][k]))
        return out


@dataclass(frozen=True)
class DmrsConfig:
    """DMRS configuration for one PDSCH (frozen, hashable).

    All fields follow the reference parameter vocabulary (dmrs.py:195-347).
    """

    configType: int = 1
    symbols: int = 1             # 1 = single, 2 = double
    typeA1stPos: int = 2
    additionalPos: int = 0
    scID: int = 0
    nIDs: tuple = ()
    sameSeq: bool = True
    otherCdmGroups: tuple = ()
    epreRatioDb: float | None = None
    enhanced: bool = False

    def print(self, indent: int = 0, title: str | None = None,
              getStr: bool = False):
        """Reference-style property listing (DMRS.print, dmrs.py)."""
        from ..utils import format_properties
        s = format_properties(
            title or "DMRS Properties:",
            [("configType", self.configType),
             ("nIDs", list(self.nIDs)),
             ("scID", self.scID),
             ("sameSeq", int(self.sameSeq)),
             ("symbols", "Single" if self.symbols == 1 else "Double"),
             ("typeA1stPos", self.typeA1stPos),
             ("additionalPos", self.additionalPos),
             ("otherCdmGroups", list(self.otherCdmGroups) or None),
             ("epreRatioDb", f"{self.epre_ratio_db([0]):g} (dB)")],
            indent)
        if getStr:
            return s
        print(s)

    def __repr__(self):
        return self.print(getStr=True)

    def __post_init__(self):
        if self.configType not in (1, 2):
            raise ValueError("DMRS configType must be 1 or 2")
        if self.symbols not in (1, 2):
            raise ValueError("DMRS symbols must be 1 or 2")
        if self.typeA1stPos not in (2, 3):
            raise ValueError("typeA1stPos must be 2 or 3")
        if self.symbols == 1 and self.additionalPos not in range(4):
            raise ValueError("additionalPos must be in [0..3]")
        if self.symbols == 2 and self.additionalPos not in (0, 1):
            raise ValueError("additionalPos must be 0 or 1 for double-symbol DMRS")
        if self.scID not in (0, 1):
            raise ValueError("scID must be 0 or 1")

    # ------------------------------------------------------------- derived
    def cdm_groups(self, portSet):
        d = 2 if self.configType == 1 else 2
        m = 2 if self.configType == 1 else 3
        return [(p // 2) % m for p in portSet]

    def delta_shifts(self, portSet):
        g = self.cdm_groups(portSet)
        return g if self.configType == 1 else [2 * x for x in g]

    def dmrs_res(self) -> np.ndarray:
        """Per-RB RE offsets (before delta shift): TS 38.211 §7.4.1.1.2."""
        return np.arange(0, 11, 2) if self.configType == 1 else np.asarray([0, 1, 6, 7])

    def epre_ratio_db(self, portSet) -> float:
        if self.epreRatioDb is not None:
            return self.epreRatioDb
        allCdm = sorted(set(self.cdm_groups(portSet)) | set(self.otherCdmGroups))
        return [0.0, -3.0, -4.77][max(allCdm)]

    def sym_set(self, mappingType: str, pdschSymSet: np.ndarray, cpType: str) -> np.ndarray:
        """OFDM symbol indices carrying DMRS (TS 38.211 §7.4.1.1.2)."""
        pdschSymSet = np.asarray(pdschSymSet)
        if len(pdschSymSet) == 0:
            return np.asarray([], np.int32)
        if mappingType == "A":
            l0 = self.typeA1stPos
            ld = int(pdschSymSet[-1]) + 1
            if self.additionalPos == 3 and self.typeA1stPos != 2:
                raise ValueError("additionalPos=3 requires typeA1stPos=2")
            if ld in (2, 3) and self.typeA1stPos != 2:
                raise ValueError("ld in (2,3) requires typeA1stPos=2")
            table = _POS_SINGLE_A if self.symbols == 1 else _POS_DOUBLE_A
            lBar = np.asarray(table[ld][self.additionalPos], np.int32)
            syms = np.asarray([l0] + list(lBar[1:]), np.int32) if len(lBar) else lBar
        else:
            ld = int(pdschSymSet[-1]) - int(pdschSymSet[0]) + 1
            if ld == 7 and cpType != "normal":
                raise ValueError("ld=7 requires normal cyclic prefix")
            if ld == 6 and cpType != "extended":
                raise ValueError("ld=6 requires extended cyclic prefix")
            table = _POS_SINGLE_B if self.symbols == 1 else _POS_DOUBLE_B
            lBar = np.asarray(table[ld][self.additionalPos], np.int32)
            syms = lBar + int(pdschSymSet[0])
        if self.symbols == 2:
            syms = np.asarray([l + d for l in syms for d in (0, 1)], np.int32)
        keep = [i for i, l in enumerate(syms) if l in pdschSymSet]
        return syms[keep]

    def unused_res(self, portSet) -> list[int]:
        """REs in a DMRS RB still available for data (reference dmrs.py:443-455)."""
        base = self.dmrs_res()
        allCdm = sorted(set(self.cdm_groups(portSet)) | set(self.otherCdmGroups))
        noDataShifts = np.asarray(allCdm) * self.configType
        used = set(base.tolist())
        for s in self.delta_shifts(portSet):
            used.update((base + s).tolist())
        for s in noDataShifts:
            used.update((base + int(s)).tolist())
        return [x for x in range(12) if x not in used]

    def raw_l0_values(self, carrier, slotNo: int, portSet, mappingType: str,
                      pdschSymSet, slotMap) -> dict:
        """{portIdx: {k: r(n)}} raw sequence values at the FIRST DMRS symbol
        (used by PTRS — reference dmrs.py:538-540)."""
        symSet = self.sym_set(mappingType, pdschSymSet, carrier.cpType)
        if len(symSet) == 0:
            return {}
        base = self.dmrs_res()
        nRE = len(base)
        bitsPerRB = 2 * nRE
        offsetBits = carrier.startRb * bitsPerRB
        totalBits = offsetBits + carrier.numRbs * bitsPerRB
        cdmGroups = self.cdm_groups(portSet)
        deltas = self.delta_shifts(portSet)
        slotInFrame = carrier.slotNoInFrame(slotNo)
        l = int(symSet[0])
        out = {}
        for p, portNo in enumerate(portSet):
            if self.sameSeq:
                nCSID, lamBar = self.scID, 0
            else:
                nCSID = self.scID if cdmGroups[p] in (0, 2) else 1 - self.scID
                lamBar = cdmGroups[p]
            nId = self.nIDs[nCSID] if len(self.nIDs) > nCSID else carrier.cellId
            cInit = (((1 << 17) * (carrier.symbolsPerSlot * slotInFrame + l + 1)
                      * (2 * nId + 1) + (1 << 17) * (lamBar // 2)
                      + 2 * nId + nCSID) & 0x7FFFFFFF)
            bits = gold_sequence(cInit, totalBits)[offsetBits:].astype(np.float64)
            raw = (1 - 2 * bits.reshape(-1, 2)) / np.sqrt(2)
            raw = raw[:, 0] + 1j * raw[:, 1]
            vals = {}
            for rb in slotMap[l]:
                for reIdx, re in enumerate(base + deltas[p]):
                    vals[12 * rb + re] = raw[rb * nRE + reIdx]
            out[p] = vals
        return out

    # ------------------------------------------------------------- values
    def pilot_values(self, carrier, slotNo: int, portSet, mappingType: str,
                     pdschSymSet, slotMap) -> tuple:
        """Host-compute DMRS values + NO_DATA mask for one slot.

        Returns:
          values: list over (port, symbol) of (l, kIdx (nRE,), vals (nRE,) complex)
          noData: list of (p, l, k) triples to mark NO_DATA.
        """
        symSet = self.sym_set(mappingType, pdschSymSet, carrier.cpType)
        base = self.dmrs_res()
        nRE = len(base)
        bitsPerRB = 2 * nRE
        offsetBits = carrier.startRb * bitsPerRB
        totalBits = offsetBits + carrier.numRbs * bitsPerRB
        beta = toLinear(-self.epre_ratio_db(portSet) / 2)
        cdmGroups = self.cdm_groups(portSet)
        deltas = self.delta_shifts(portSet)
        allCdm = sorted(set(cdmGroups) | set(self.otherCdmGroups))
        noDataShifts = [self.configType * g for g in allCdm]
        slotInFrame = carrier.slotNoInFrame(slotNo)

        values, noData = [], []
        for p, portNo in enumerate(portSet):
            wf, wt = _occ_tables(self.configType, portNo)
            portREs = base + deltas[p]
            for li, l in enumerate(symSet):
                if self.sameSeq:
                    nCSID, lamBar = self.scID, 0
                else:
                    nCSID = self.scID if cdmGroups[p] in (0, 2) else 1 - self.scID
                    lamBar = cdmGroups[p]
                nId = self.nIDs[nCSID] if len(self.nIDs) > nCSID else carrier.cellId
                cInit = (((1 << 17) * (carrier.symbolsPerSlot * slotInFrame + l + 1)
                          * (2 * nId + 1) + (1 << 17) * (lamBar // 2)
                          + 2 * nId + nCSID) & 0x7FFFFFFF)
                bits = gold_sequence(cInit, totalBits)[offsetBits:].astype(np.float64)
                raw = (1 - 2 * bits.reshape(-1, 2)) / np.sqrt(2)
                raw = raw[:, 0] + 1j * raw[:, 1]
                lPrime = 0 if self.symbols == 1 else li % 2
                maxKprime = 4 if self.enhanced else 2
                ks, vs = [], []
                for rb in slotMap[l]:
                    for reIdx, re in enumerate(portREs):
                        kPrime = reIdx % maxKprime
                        ks.append(12 * rb + re)
                        vs.append(beta * wf[kPrime] * wt[lPrime] * raw[rb * nRE + reIdx])
                    for shift in noDataShifts:
                        for re in base:
                            noData.append((p, int(l), 12 * rb + re + shift))
                values.append((p, int(l), np.asarray(ks, np.int32),
                               np.asarray(vs, np.complex128)))
        return values, noData
