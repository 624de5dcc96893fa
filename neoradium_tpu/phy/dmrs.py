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
