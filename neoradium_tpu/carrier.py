"""Carrier / bandwidth-part numerology math — TS 38.211 §4.2-4.4, §5.3.1.

``CarrierConfig`` is a frozen, hashable dataclass: pure numerology functions
of (numRbs, spacing, cpType). All timing tables (CP lengths, symbol lengths,
slot lengths) are derived eagerly on the host; slot counters are NOT stored
here — in the TPU design the slot number is an explicit loop variable/scan
carry, not object state (cf. reference ``carrier.py:396-398, 456-462``).

Behavioral parity: reference ``neoradium/carrier.py`` (BandwidthPart/Carrier):
fixed 30.72 Msps sample rate for all numerologies (carrier.py:31-34), nFFT
from subframe samples minus CP sum (carrier.py:147-150), normal-CP lengths
144/2^u (+16 on symbols 0 and 7*2^u) and extended 512/2^u (carrier.py:265-270).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import cached_property

import numpy as np

# Numerology constants (TS 38.211 §4.1)
TC = 1.0 / (480_000 * 4096)
KAPPA = 64
SAMPLE_RATE = int(round(1.0 / (TC * KAPPA)))  # 30,720,000 samples/s

_SCS_LIST = [15, 30, 60, 120, 240, 480, 960]  # kHz, numerology u = index


@dataclass(frozen=True)
class CarrierConfig:
    """A carrier with a single active bandwidth part (the common case).

    Args:
      numRbs: number of resource blocks (12 subcarriers each).
      spacing: subcarrier spacing in kHz (15..960) or numerology u (0..6).
      cpType: 'normal' or 'extended' (extended only valid for 60 kHz).
      startRb: first RB relative to CRB 0.
      cellId: physical cell id (used in default scrambling identities).
    """

    numRbs: int = 50
    spacing: int = 15
    cpType: str = "normal"
    startRb: int = 0
    cellId: int = 1

    def __post_init__(self):
        if self.spacing in _SCS_LIST:
            u = _SCS_LIST.index(self.spacing)
        elif self.spacing in range(7):
            u = self.spacing
            object.__setattr__(self, "spacing", _SCS_LIST[u])
        else:
            raise ValueError(f"Invalid spacing {self.spacing!r}")
        object.__setattr__(self, "cpType", self.cpType.lower())
        if self.cpType not in ("normal", "extended"):
            raise ValueError("cpType must be 'normal' or 'extended'")
        # TS 38.211 §4.2 / reference carrier.py:128-145: extended CP is only
        # defined for the 60 kHz subcarrier spacing (u=2).
        if self.cpType == "extended" and _SCS_LIST[u] != 60:
            raise ValueError("Extended CP is only supported for 60 kHz spacing")
        object.__setattr__(self, "_u", u)
        if self.numRbs >= self.nFFT // 12:
            raise ValueError(f"numRbs must be < nFFT/12 (= {self.nFFT // 12})")

    # ---------------------------------------------------------------- core
    @property
    def u(self) -> int:
        return self._u

    @property
    def sampleRate(self) -> int:
        return SAMPLE_RATE

    @property
    def symbolsPerSlot(self) -> int:
        return 14 if self.cpType == "normal" else 12

    @property
    def slotsPerSubFrame(self) -> int:
        return 1 << self.u

    @property
    def slotsPerFrame(self) -> int:
        return 10 * self.slotsPerSubFrame

    @property
    def symbolsPerSubFrame(self) -> int:
        return self.symbolsPerSlot * self.slotsPerSubFrame

    @property
    def numSubcarriers(self) -> int:
        return 12 * self.numRbs

    @property
    def bandwidth(self) -> float:
        return self.numSubcarriers * self.spacing * 1000.0

    def cpLen(self, symIdxInSubframe: int) -> int:
        """CP length in samples for a symbol index within the subframe."""
        if symIdxInSubframe >= self.symbolsPerSubFrame:
            raise ValueError("symbol index beyond subframe")
        if self.cpType == "normal":
            n = 144 >> self.u
            if symIdxInSubframe in (0, 7 << self.u):
                n += 16
            return n
        return 512 >> self.u

    @cached_property
    def cpLensSubframe(self) -> np.ndarray:
        """(symbolsPerSubFrame,) int32 CP lengths over one subframe."""
        return np.asarray([self.cpLen(l) for l in range(self.symbolsPerSubFrame)], np.int32)

    @property
    def nFFT(self) -> int:
        cp_total = int(np.sum([
            (144 >> self.u) + (16 if l in (0, 7 << self.u) else 0)
            if self.cpType == "normal" else (512 >> self.u)
            for l in range(self.symbolsPerSubFrame)
        ]))
        nfft = (SAMPLE_RATE // 1000 - cp_total) // self.symbolsPerSubFrame
        assert nfft & (nfft - 1) == 0, f"nFFT {nfft} not a power of 2"
        return int(nfft)

    @cached_property
    def symbolLensSubframe(self) -> np.ndarray:
        """(symbolsPerSubFrame,) total samples (CP + nFFT) per subframe symbol."""
        return self.cpLensSubframe + self.nFFT

    def slotLen(self, slotNoInSubFrame: int = 0) -> int:
        s = slotNoInSubFrame % self.slotsPerSubFrame
        ls = slice(s * self.symbolsPerSlot, (s + 1) * self.symbolsPerSlot)
        return int(self.symbolLensSubframe[ls].sum())

    def symLens(self, slotNoInSubFrame: int = 0) -> np.ndarray:
        """(symbolsPerSlot,) symbol lengths for a given slot within the subframe."""
        s = slotNoInSubFrame % self.slotsPerSubFrame
        start = s * self.symbolsPerSlot
        return self.symbolLensSubframe[start:start + self.symbolsPerSlot]

    def slotNoInFrame(self, slotNo: int) -> int:
        return slotNo % self.slotsPerFrame

    def slotNoInSubFrame(self, slotNo: int) -> int:
        return slotNo % self.slotsPerSubFrame

    @property
    def dataTimeRatio(self) -> float:
        return self.nFFT / self.symbolLensSubframe.mean()


    # ------------------------------------------------------------- printing
    def print(self, indent: int = 0, title: str | None = None,
              getStr: bool = False):
        """Reference-style property listing (BandwidthPart.print,
        carrier.py)."""
        from .utils import format_properties
        s = format_properties(
            title or "Bandwidth Part Properties:",
            [("Resource Blocks", f"{self.numRbs} RBs starting at "
              f"{self.startRb} ({self.numSubcarriers} subcarriers)"),
             ("Subcarrier Spacing", f"{self.spacing} kHz"),
             ("CP Type", self.cpType),
             ("Bandwidth", f"{self.numRbs * 12 * self.spacing / 1000:g} MHz"),
             ("symbolsPerSlot", self.symbolsPerSlot),
             ("slotsPerSubFrame", self.slotsPerSubFrame),
             ("nFFT", self.nFFT)], indent)
        if getStr:
            return s
        print(s)

    def __repr__(self):
        return self.print(getStr=True)

class Carrier:
    """A carrier holding one or more bandwidth parts + host-side counters.

    Mirrors the reference ``Carrier`` (carrier.py:313-471): an ordered list
    of bandwidth parts (our :class:`CarrierConfig` is the BandwidthPart
    equivalent) with one active at a time, plus the ``slotNo``/``frameNo``
    simulation counters. The counters are host-side bookkeeping ONLY —
    traced simulation loops carry slot numbers in their ``lax.scan`` carry
    instead (sim/harq.py pattern); device code keeps taking the active
    :class:`CarrierConfig` explicitly.

    Args:
      startRb, numRbs, cellId: carrier-wide parameters.
      bwps: explicit list of CarrierConfig bandwidth parts; when omitted a
        single BWP covering the whole carrier is created from the remaining
        kwargs (spacing, cpType).
      curBwpIndex: index of the initially active bandwidth part.
      dcLocation: DC subcarrier location (0..3299, or 3300 = outside).
    """

    _BWP_PASSTHROUGH = ("symbolsPerSlot", "slotsPerSubFrame", "slotsPerFrame",
                        "symbolsPerSubFrame", "spacing", "cpType", "nFFT",
                        "numSubcarriers", "sampleRate")

    def __init__(self, startRb: int = 0, numRbs: int = 50, cellId: int = 1,
                 bwps=None, curBwpIndex: int = 0, dcLocation: int = 0, **bwpKw):
        self.startRb = int(startRb)
        self.numRbs = int(numRbs)
        self.cellId = int(cellId)
        if bwps is None:
            bwps = [CarrierConfig(numRbs=numRbs, startRb=startRb,
                                  cellId=cellId, **bwpKw)]
        self.bwps = list(bwps)
        if not self.bwps:
            raise ValueError("Carrier needs at least one bandwidth part")
        if not all(isinstance(b, CarrierConfig) for b in self.bwps):
            raise ValueError("bwps must be CarrierConfig instances")
        if not 0 <= curBwpIndex < len(self.bwps):
            raise ValueError(f"curBwpIndex must be in [0, {len(self.bwps)})")
        self.curBwpIndex = int(curBwpIndex)
        if not 0 <= dcLocation <= 3300:
            raise ValueError("dcLocation must be in [0, 3300]")
        self.dcLocation = int(dcLocation)
        self.slotNo = 0
        self.frameNo = 0

    # ------------------------------------------------------------- BWPs
    @property
    def curBwp(self) -> CarrierConfig:
        return self.bwps[self.curBwpIndex]

    def addBwp(self, **kwargs) -> CarrierConfig:
        """Create a new bandwidth part on this carrier and return it."""
        kwargs.setdefault("numRbs", self.numRbs)
        kwargs.setdefault("startRb", self.startRb)
        kwargs.setdefault("cellId", self.cellId)
        bwp = CarrierConfig(**kwargs)
        self.bwps.append(bwp)
        return bwp

    def setCurBwp(self, index: int):
        """Switch the active bandwidth part (reference curBwpIndex)."""
        if not 0 <= index < len(self.bwps):
            raise ValueError(f"BWP index must be in [0, {len(self.bwps)})")
        self.curBwpIndex = int(index)

    def __getattr__(self, name):
        if name in Carrier._BWP_PASSTHROUGH:
            return getattr(self.curBwp, name)
        raise AttributeError(f"Carrier has no attribute {name!r}")

    # --------------------------------------------------------- counters
    def restart(self):
        self.slotNo = 0
        self.frameNo = 0

    def goNext(self):
        """Advance the slot counter; wraps frameNo every slotsPerFrame."""
        self.slotNo += 1
        if self.slotNo % self.curBwp.slotsPerFrame == 0:
            self.frameNo += 1

    @property
    def frameNoRel(self) -> int:
        return (self.frameNo
                + self.slotNo // self.curBwp.slotsPerFrame) % 1024

    @property
    def slotNoInFrame(self) -> int:
        return self.slotNo % self.curBwp.slotsPerFrame

    @property
    def slotNoInSubFrame(self) -> int:
        return self.slotNo % self.curBwp.slotsPerSubFrame

    # ------------------------------------------------------------- grid
    def createGrid(self, numPorts: int, useReDesc: bool = False):
        """Empty host planning grid on the active BWP (reference
        carrier.py:465-471)."""
        from .grid import HostGrid
        bwp = self.curBwp
        return HostGrid(numPorts, bwp.symbolsPerSlot, bwp.numSubcarriers,
                        useReDesc=useReDesc)

    def print(self, indent: int = 0, title: str | None = None,
              getStr: bool = False):
        """Reference-style property listing (Carrier.print, carrier.py)."""
        from .utils import format_properties
        rows = [("Cell Id", self.cellId),
                ("Bandwidth Parts", len(self.bwps)),
                ("Active BWP", self.curBwpIndex),
                ("frameNo", self.frameNo),
                ("slotNo", self.slotNo)]
        for i, bwp in enumerate(self.bwps):
            rows.append((None, bwp.print(indent + 2,
                                         f"Bandwidth Part {i}:",
                                         getStr=True)))
        s = format_properties(title or "Carrier Properties:", rows, indent)
        if getStr:
            return s
        print(s)

    def __repr__(self):
        return self.print(getStr=True)
