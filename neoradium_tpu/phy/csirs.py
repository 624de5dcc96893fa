"""CSI reference signals — TS 38.211 §7.4.1.5.

TPU design: like DMRS, CSI-RS values depend only on (config, slot number) —
never on payload — so everything here is host-side planning: each
``CsiRs`` resource yields static (port, symbol, subcarrier, value) tuples
per slot that are baked into a constant pilot grid (or RESERVED/ZP masks)
at plan time. The jitted device path only ever sees the resulting arrays.

Behavioral parity: reference ``neoradium/csirs.py`` — locations Table
7.4.1.5.3-1 (csiRsLocations:88-108), CDM wf/wt Tables 7.4.1.5.3-2..5
(wFwTSequences:111-138), row inference from the freqMap bitmap
(getRow:328-366), slot gating (anythingForCurSlot:367-374), sequence
generation cInit (csirs.py:412-413), NZP/ZP population (populateGrid:
376-443), resource reservation (reserveGridResources:447-481), resource
sets and config aggregation (CsiRsSet:484, CsiRsConfig:697).
"""
from __future__ import annotations

import numpy as np

from ..sequences import gold_sequence
from ..utils import toLinear

# TS 38.211 Table 7.4.1.5.3-1: [ports, densities, cdmSize, klBar spec,
# cdmGroupIndexes, kPrimes, lPrimes]
CSIRS_LOCATIONS = [
    None,
    [1, [3], 1, "0000 4000 8000", [0, 0, 0], [0], [0]],
    [1, [1, .5], 1, "0000", [0], [0], [0]],
    [2, [1, .5], 2, "0000", [0], [0, 1], [0]],
    [4, [1], 2, "0000 2000", [0, 1], [0, 1], [0]],
    [4, [1], 2, "0000 0001", [0, 1], [0, 1], [0]],
    [8, [1], 2, "0300", [0, 1, 2, 3], [0, 1], [0]],
    [8, [1], 2, "0100 0101", [0, 1, 2, 3], [0, 1], [0]],
    [8, [1], 4, "0100", [0, 1], [0, 1], [0, 1]],
    [12, [1], 2, "0500", list(range(6)), [0, 1], [0]],
    [12, [1], 4, "0200", [0, 1, 2], [0, 1], [0, 1]],
    [16, [1, .5], 2, "0300 0301", list(range(8)), [0, 1], [0]],
    [16, [1, .5], 4, "0300", [0, 1, 2, 3], [0, 1], [0, 1]],
    [24, [1, .5], 2, "0200 0201 0210 0211", list(range(12)), [0, 1], [0]],
    [24, [1, .5], 4, "0200 0210", list(range(6)), [0, 1], [0, 1]],
    [24, [1, .5], 8, "0200", [0, 1, 2], [0, 1], [0, 1, 2, 3]],
    [32, [1, .5], 2, "0300 0301 0310 0311", list(range(16)), [0, 1], [0]],
    [32, [1, .5], 4, "0300 0310", list(range(8)), [0, 1], [0, 1]],
    [32, [1, .5], 8, "0300", [0, 1, 2, 3], [0, 1], [0, 1, 2, 3]],
]

# TS 38.211 Tables 7.4.1.5.3-2..5: (wf, wt) rows per CDM size
WF_WT = {
    1: [([1], [1])],
    2: [([1, 1], [1]), ([1, -1], [1])],
    4: [([1, 1], [1, 1]), ([1, -1], [1, 1]),
        ([1, 1], [1, -1]), ([1, -1], [1, -1])],
    8: [([1, 1], [1, 1, 1, 1]), ([1, -1], [1, 1, 1, 1]),
        ([1, 1], [1, -1, 1, -1]), ([1, -1], [1, -1, 1, -1]),
        ([1, 1], [1, 1, -1, -1]), ([1, -1], [1, 1, -1, -1]),
        ([1, 1], [1, -1, -1, 1]), ([1, -1], [1, -1, -1, 1])],
}


class CsiRs:
    """One CSI-RS resource (reference csirs.py:141-481 parameter surface)."""

    def __init__(self, **kwargs):
        self.resourceId = kwargs.get("resourceId", 0)
        self.offset = kwargs.get("offset", 0)
        self.numPorts = kwargs.get("numPorts", 1)
        if self.numPorts not in (1, 2, 4, 8, 12, 16, 24, 32):
            raise ValueError("numPorts must be in {1,2,4,8,12,16,24,32}")
        self.cdmSize = kwargs.get("cdmSize", min(self.numPorts, 2))
        if self.cdmSize not in (1, 2, 4, 8):
            raise ValueError("cdmSize must be in {1,2,4,8}")
        self.density = kwargs.get("density", 1)
        valid = ([1] if self.numPorts in (4, 8, 12)
                 else ([0.5, 1, 3] if self.numPorts == 1 else [0.5, 1]))
        if self.density not in valid:
            raise ValueError(f"density must be in {valid}")
        kMap = kwargs.get("freqMap", self._default_kmap())
        self.row, self.ks = self._infer_row(kMap)
        if self.row in (13, 14, 16, 17):
            self.ls = list(kwargs.get("symbols", [3, 9]))
            if len(self.ls) != 2:
                raise ValueError("Second CSI-RS symbol index is missing!")
            if self.ls[0] not in range(14) or self.ls[1] not in range(2, 13):
                raise ValueError("Invalid CSI-RS symbol indexes")
        else:
            self.ls = list(kwargs.get("symbols", [5]))[:1]
            if self.ls[0] not in range(14):
                raise ValueError("Invalid CSI-RS symbol index")
        self.powerDb = kwargs.get("powerDb", 0)
        self.scramblingID = kwargs.get("scramblingID", 0)
        self.mySet: CsiRsSet | None = None

    def print(self, indent: int = 0, title: str | None = None,
              getStr: bool = False):
        """Reference-style property listing (CsiRs.print, csirs.py)."""
        from ..utils import format_properties
        s = format_properties(
            title or "CSI-RS Properties:",
            [("resourceId", self.resourceId),
             ("row", self.row),
             ("numPorts", self.numPorts),
             ("cdmSize", self.cdmSize),
             ("density", self.density),
             ("offset", self.offset),
             ("subcarriers (k)", list(self.ks)),
             ("symbols (l)", list(self.ls)),
             ("powerDb", self.powerDb),
             ("scramblingID", self.scramblingID)], indent)
        if getStr:
            return s
        print(s)

    def __repr__(self):
        return self.print(getStr=True)

    def _default_kmap(self) -> str:
        return {1: "1000" if self.density == 3 else "000000001000",
                2: "001000", 4: "010", 8: "010100",
                12: "111111" if self.cdmSize == 2 else "101010",
                16: "110011", 24: "101010", 32: "110011"}[self.numPorts]

    def _infer_row(self, kMap: str):
        validNumKs, validLens = {
            1: ([1], [4]) if self.density == 3 else ([1], [12]),
            2: ([1], [6]), 4: ([1], [3, 6]), 8: ([2, 4], [6]),
            12: ([3, 6], [6]), 16: ([4], [6]), 24: ([3], [6]),
            32: ([4], [6])}[self.numPorts]
        numKs = sum(int(b) for b in kMap)
        if numKs not in validNumKs or len(kMap) not in validLens:
            raise ValueError("Invalid CSI-RS parameters "
                             "(TS 38.211 Table 7.4.1.5.3-1)")
        row = {1: 1 if self.density == 3 else 2, 2: 3,
               4: 4 if len(kMap) == 3 else 5,
               8: 6 if numKs == 4 else {2: 7, 4: 8}.get(self.cdmSize, -1),
               12: {2: 9, 4: 10}.get(self.cdmSize, -1),
               16: {2: 11, 4: 12}.get(self.cdmSize, -1),
               24: {2: 13, 4: 14, 8: 15}.get(self.cdmSize, -1),
               32: {2: 16, 4: 17, 8: 18}.get(self.cdmSize, -1)}[self.numPorts]
        if row < 0:
            raise ValueError("Invalid CSI-RS numPorts/cdmSize combination")
        n = len(kMap)
        if row in (1, 2):
            ks = [i for i in range(n) if kMap[n - i - 1] == "1"]
        elif row == 4:
            ks = [4 * i for i in range(n) if kMap[n - i - 1] == "1"]
        else:
            ks = [2 * i for i in range(n) if kMap[n - i - 1] == "1"]
        return row, ks

    # --------------------------------------------------------------- planning
    def active_in_slot(self, slotNo: int) -> bool:
        s = self.mySet
        if s.resourceType == "aperiodic":
            return s.active
        if s.resourceType == "semiPersistent" and not s.active:
            return False
        return (slotNo - self.offset) % s.period == 0

    def _kl_pairs(self):
        """[(j, kBar, lBar)] from the Table 7.4.1.5.3-1 'klBar' column."""
        _, _, _, klBarsStr, _, kPrimes, lPrimes = CSIRS_LOCATIONS[self.row]
        pairs = []
        for s in klBarsStr.split(" "):
            k1, kLast, lIdx, ll = (int(c) for c in s)
            if k1 > kLast:   # rows 1 and 4 shorthand
                pairs.append((self.ks[0] + k1, self.ls[lIdx] + ll))
            else:
                pairs += [(self.ks[kk], self.ls[lIdx] + ll)
                          for kk in range(k1, kLast + 1)]
        byL = {}
        for j, (kBar, lBar) in enumerate(pairs):
            byL.setdefault(lBar, []).append((j * (self.row != 1), kBar))
        return byL, kPrimes, lPrimes

    def entries(self, carrier, slotNo: int):
        """[(port, l, k, value)] for one slot ('value' None for ZP)."""
        if not self.active_in_slot(slotNo):
            return []
        s = self.mySet
        byL, kPrimes, lPrimes = self._kl_pairs()
        symsPerRB = 3 if self.row == 1 else len(kPrimes)
        bitsPerRB = 2 * symsPerRB
        totalRBs = s.startRb + s.numRbs
        totalRBsUsed = totalRBs if self.density in (1, 3) else (totalRBs + 1) // 2
        totalBits = totalRBsUsed * bitsPerRB
        beta = toLinear(self.powerDb / 2)
        alpha = int(np.round(2 * self.density) if self.numPorts > 1
                    else self.density)
        table = WF_WT[self.cdmSize]
        out = []
        slotInFrame = carrier.slotNoInFrame(slotNo)
        for lBar, jkBars in byL.items():
            for lPrime in lPrimes:
                l = lBar + lPrime
                raw = None
                if s.csiType == "NZP":
                    cInit = (((1 << 10)
                              * (carrier.symbolsPerSlot * slotInFrame + l + 1)
                              * (2 * self.scramblingID + 1)
                              + self.scramblingID) & 0x7FFFFFFF)
                    bits = gold_sequence(cInit, totalBits).astype(np.float64)
                    raw = (1 - 2 * bits.reshape(-1, 2)) / np.sqrt(2)
                    raw = raw[:, 0] + 1j * raw[:, 1]
                for n in range(s.startRb, s.startRb + s.numRbs):
                    if self.density < 1 and n % 2 == 1:
                        continue
                    for j, kBar in jkBars:
                        for kPrime in kPrimes:
                            mPrime = int(np.floor(n * alpha) + kPrime
                                         + np.floor(kBar * self.density / 12))
                            k = 12 * n + kBar + kPrime - 12 * carrier.startRb
                            for sIdx, (wfs, wts) in enumerate(table):
                                p = sIdx + j * self.cdmSize
                                if s.csiType == "ZP":
                                    out.append((p, l, k, None))
                                else:
                                    v = (beta * wfs[kPrime] * wts[lPrime]
                                         * raw[mPrime])
                                    out.append((p, l, k, v))
        return out

    def reserved_res(self, carrier, slotNo: int):
        """[(l, k)] REs to mark reserved on ALL ports (reference :447-481)."""
        if not self.active_in_slot(slotNo):
            return []
        s = self.mySet
        byL, kPrimes, lPrimes = self._kl_pairs()
        out = []
        for lBar, jkBars in byL.items():
            for lPrime in lPrimes:
                l = lBar + lPrime
                for n in range(s.startRb, s.startRb + s.numRbs):
                    if self.density < 1 and n % 2 == 1:
                        continue
                    for j, kBar in jkBars:
                        for kPrime in kPrimes:
                            out.append((l, 12 * n + kBar + kPrime
                                        - 12 * carrier.startRb))
        return out


class CsiRsSet:
    """A ZP or NZP CSI-RS resource set (reference csirs.py:484-701)."""

    _VALID_PERIODS = (4, 5, 8, 10, 16, 20, 32, 40, 64, 80, 160, 320, 640)

    def __init__(self, csiType: str, carrier, **kwargs):
        if csiType not in ("ZP", "NZP"):
            raise ValueError('csiType must be "ZP" or "NZP"')
        self.csiType = csiType
        self.carrier = carrier
        self.rsId = kwargs.get("rsId", 0)
        self.startRb = kwargs.get("startRb", carrier.startRb)
        self.numRbs = kwargs.get("numRbs", carrier.numRbs)
        if (self.startRb < carrier.startRb
                or self.startRb + self.numRbs > carrier.startRb + carrier.numRbs):
            raise ValueError("CSI-RS resources must be inside the bandwidth part")
        self.resourceType = kwargs.get("resourceType", "periodic")
        if self.resourceType not in ("aperiodic", "semiPersistent", "periodic"):
            raise ValueError("Invalid CSI-RS resourceType")
        self.period = kwargs.get("period", 4)
        if self.period not in self._VALID_PERIODS:
            raise ValueError(f"period must be one of {self._VALID_PERIODS}")
        self.active = kwargs.get("active", True)
        if csiType == "NZP":
            self.repetition = kwargs.get("repetition", True)
            self.trigOffset = kwargs.get("trigOffset", 0)
            if self.trigOffset not in range(5):
                raise ValueError("trigOffset must be in [0..4]")
            self.trs = kwargs.get("trs", False)
        self.csiRsList: list[CsiRs] = []
        self.addCsiRs(kwargs.get("csiRsList", [CsiRs(**kwargs)]))

    def print(self, indent: int = 0, title: str | None = None,
              getStr: bool = False):
        """Reference-style property listing (CsiRsSet.print, csirs.py)."""
        from ..utils import format_properties
        rows = [("csiType", self.csiType),
                ("rsId", self.rsId),
                ("resourceType", self.resourceType),
                ("period", getattr(self, "period", None)),
                ("startRb", self.startRb),
                ("numRbs", self.numRbs),
                ("numPorts", self.numPorts)]
        for r in self.csiRsList:
            rows.append((None, r.print(indent + 2, "CSI-RS Resource:",
                                       getStr=True)))
        s = format_properties(title or "CSI-RS Resource Set Properties:",
                              rows, indent)
        if getStr:
            return s
        print(s)

    def __repr__(self):
        return self.print(getStr=True)

    def addCsiRs(self, csiRsList):
        for csiRs in csiRsList:
            if csiRs.offset not in range(self.period):
                raise ValueError(f"offset must be in [0..{self.period - 1}]")
            csiRs.mySet = self
            self.csiRsList.append(csiRs)

    @property
    def numPorts(self):
        return max(r.numPorts for r in self.csiRsList)

    def entries(self, slotNo: int):
        if self.resourceType in ("aperiodic", "semiPersistent") and not self.active:
            return []
        return [e for r in self.csiRsList for e in r.entries(self.carrier, slotNo)]

    def reserved_res(self, slotNo: int):
        if self.resourceType in ("aperiodic", "semiPersistent") and not self.active:
            return []
        return [e for r in self.csiRsList
                for e in r.reserved_res(self.carrier, slotNo)]


class CsiRsConfig:
    """Aggregate CSI-RS configuration (list of sets; reference csirs.py:697)."""

    def __init__(self, csiRsSetList=(), **kwargs):
        self.csiRsSetList: list[CsiRsSet] = list(csiRsSetList)
        if not self.csiRsSetList:
            carrier = kwargs.pop("carrier", None)
            if carrier is not None:
                csiType = kwargs.pop("csiType", "NZP")
                self.csiRsSetList = [CsiRsSet(csiType, carrier, **kwargs)]

    def print(self, indent: int = 0, title: str | None = None,
              getStr: bool = False):
        """Reference-style property listing (CsiRsConfig.print, csirs.py)."""
        from ..utils import format_properties
        rows = [("Resource Sets", len(self.csiRsSetList)),
                ("numPorts", self.numPorts)]
        for s_ in self.csiRsSetList:
            rows.append((None, s_.print(indent + 2, "Resource Set:",
                                        getStr=True)))
        s = format_properties(title or "CSI-RS Configuration Properties:",
                              rows, indent)
        if getStr:
            return s
        print(s)

    def __repr__(self):
        return self.print(getStr=True)

    def addCsiResourceSets(self, sets):
        self.csiRsSetList += list(sets)

    @property
    def numPorts(self):
        return max((s.numPorts for s in self.csiRsSetList), default=0)

    @property
    def carrier(self):
        return self.csiRsSetList[0].carrier

    def entries(self, slotNo: int = 0):
        return [e for s in self.csiRsSetList for e in s.entries(slotNo)]

    def populate_host_grid(self, hg, slotNo: int = 0):
        """Write NZP values / ZP zeros into a HostGrid (plan time)."""
        for p, l, k, v in self.entries(slotNo):
            if hg.re_type_at(p, l, k) not in ("UNASSIGNED", "RESERVED"):
                raise ValueError(
                    f"CSI-RS RE ({p},{l},{k}) already allocated "
                    f"({hg.re_type_at(p, l, k)})")
            if v is None:
                hg.set(p, l, k, 0, "CSIRS_ZP")
            else:
                hg.set(p, l, k, v, "CSIRS_NZP")

    def reserve_host_grid(self, hg, slotNo: int = 0):
        """Mark all CSI-RS REs RESERVED on every port of a HostGrid."""
        P = hg.shape[0]
        for s in self.csiRsSetList:
            ret = "CSIRS_ZP" if s.csiType == "ZP" else "CSIRS_NZP"
            for l, k in s.reserved_res(slotNo):
                for p in range(P):
                    hg.set(p, l, k, 0, ret)

    def pilot_grid(self, slotNo: int = 0):
        """(numPorts, L, K) complex pilot values (0 where no CSI-RS)."""
        car = self.carrier
        P = self.numPorts
        g = np.zeros((P, car.symbolsPerSlot, car.numSubcarriers), np.complex128)
        for p, l, k, v in self.entries(slotNo):
            if v is not None:
                g[p, l, k] = v
        return g
