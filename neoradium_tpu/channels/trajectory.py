"""Trajectory data structures for ray-tracing channels — TR 38.901 §8.

``TrjPoint`` holds the multipath state (phase/delay/power/angles/bounces) at
one UE location; ``Trajectory`` is an ordered sequence of points, one per
slot after interpolation. These are host-side data containers (NumPy); the
device-facing per-point tensors are built by
:class:`neoradium_tpu.channels.trjchan.TrjChannel`.

Behavioral parity: reference ``neoradium/trjchan.py`` — TrjPoint path-info
layout and LOS/NLOS split (trjchan.py:55-206), path continuity matching
(matchPathInfo:270-307), Trajectory statistics/iteration (309-582).
"""
from __future__ import annotations

import numpy as np

from ..carrier import SAMPLE_RATE
from ..utils import toRadian

# pathInfo columns: 0:phase(deg) 1:delay(ns) 2:power(dB) 3:aoa 4:zoa 5:aod
# 6:zod (deg) 7:bounces
PATH_COLS = 8


class TrjPoint:
    """Multipath state at one point of a trajectory (reference trjchan.py:37)."""

    def __init__(self, xyz=(0, 0, 0), hasLos=-1, pathInfo=None, bsDist=0,
                 pathLoss=0, speed=None, sampleNo=0):
        self.xyz = np.asarray(xyz, np.float64)
        self.hasLos = int(hasLos)
        if pathInfo is None:
            pathInfo = np.empty((0, PATH_COLS))
        pathInfo = np.asarray(pathInfo, np.float64)
        if pathInfo.ndim == 2 and pathInfo.shape[1] == 7:
            # older scenarios without bounce info -> -1
            pathInfo = np.concatenate(
                [pathInfo, -np.ones((len(pathInfo), 1))], axis=1)
        self.pathInfo = pathInfo.reshape(-1, PATH_COLS)
        self.bsDist = float(bsDist)
        self.pathLoss = float(pathLoss)
        self.speed = (np.zeros(3) if speed is None
                      else np.asarray(speed, np.float64))
        self.sampleNo = int(sampleNo)

    # ------------------------------------------------------------ properties
    @property
    def numPaths(self):
        return len(self.pathInfo)

    @property
    def numNlosPaths(self):
        return self.numPaths - (1 if self.hasLos == 1 else 0)

    @property
    def time(self):
        return self.sampleNo / SAMPLE_RATE

    @property
    def linearSpeed(self):
        return float(np.sqrt(np.square(self.speed).sum()))

    def _col(self, i):
        return self.pathInfo[:, i]

    phases = property(lambda s: s._col(0))
    delays = property(lambda s: s._col(1))
    powers = property(lambda s: s._col(2))
    aoas = property(lambda s: s._col(3))
    zoas = property(lambda s: s._col(4))
    aods = property(lambda s: s._col(5))
    zods = property(lambda s: s._col(6))
    bounces = property(lambda s: s._col(7))

    def _los_val(self, i):
        if self.hasLos != 1:
            raise ValueError("This point has no LOS path")
        return self.pathInfo[0, i]

    losPhase = property(lambda s: s._los_val(0))
    losDelay = property(lambda s: s._los_val(1))
    losPower = property(lambda s: s._los_val(2))
    losAoa = property(lambda s: s._los_val(3))
    losZoa = property(lambda s: s._los_val(4))
    losAod = property(lambda s: s._los_val(5))
    losZod = property(lambda s: s._los_val(6))

    def _nlos(self, i):
        off = 1 if self.hasLos == 1 else 0
        return self.pathInfo[off:, i]

    nlosPhases = property(lambda s: s._nlos(0))
    nlosDelays = property(lambda s: s._nlos(1))
    nlosPowers = property(lambda s: s._nlos(2))
    nlosAoas = property(lambda s: s._nlos(3))
    nlosZoas = property(lambda s: s._nlos(4))
    nlosAods = property(lambda s: s._nlos(5))
    nlosZods = property(lambda s: s._nlos(6))

    # --------------------------------------------------------------- matching
    def matchPathInfo(self, nextPoint: "TrjPoint", maxDiff: float = 1):
        """Greedy best-match pairing of paths between consecutive points
        (reference matchPathInfo:270-307). Returns curToNext with -1 for
        unmatched paths of this point."""
        matchParams = [1, 2, 3, 4, 5, 6, 7]
        p0 = self.pathInfo[:, None, matchParams]
        p1 = nextPoint.pathInfo[None, :, matchParams]
        absDiff = np.abs(p0 - p1)                       # (n0, n1, 7)
        absDiff[:, :, 6] *= 100                         # boost bounce diffs
        corr = np.zeros_like(absDiff)
        corr[:, :, (2, 4)] = 360 * (absDiff[:, :, (2, 4)] > 180)
        absDiff = np.abs(absDiff - corr)
        dist = absDiff.max(-1)                          # Chebyshev distance
        n0, n1 = dist.shape
        curToNext = -np.ones(n0, np.int64)
        used = np.zeros(n1, bool)
        order = np.argsort(dist, axis=None)
        matched = 0
        for flat in order:
            i, j = divmod(int(flat), n1)
            if dist[i, j] > maxDiff:
                break
            if curToNext[i] != -1 or used[j]:
                continue
            curToNext[i] = j
            used[j] = True
            matched += 1
            if matched == min(n0, n1):
                break
        return curToNext


class Trajectory:
    """Ordered sequence of TrjPoints (reference trjchan.py:309-582)."""

    def __init__(self, points, carrierFreq):
        self.points = list(points)
        self.carrierFreq = carrierFreq
        self.curIdx = 0
        self.dist = 0
        nPaths = [p.numPaths for p in self.points]
        self.maxPaths = max(nPaths) if nPaths else 0
        self.minPaths = min(nPaths) if nPaths else 0
        self.avgPaths = float(np.mean(nPaths)) if nPaths else 0.0
        self.numLOS = sum(1 for p in self.points if p.hasLos == 1)
        self.numBlockage = sum(1 for p in self.points if p.numPaths == 0)
        self.maxSpeed = max((p.linearSpeed for p in self.points), default=0.0)

    def restart(self):
        self.curIdx = 0

    def goNext(self):
        self.curIdx += 1

    def print(self, indent: int = 0, title: str | None = None,
              getStr: bool = False):
        """Reference-style property listing (Trajectory.print,
        trjchan.py)."""
        from ..utils import format_properties
        s = format_properties(
            title or "Trajectory Properties:",
            [("numPoints", self.numPoints),
             ("carrierFreq", f"{self.carrierFreq / 1e9:g} GHz"),
             ("time", f"{self.time:.6g} seconds"),
             ("totalDist", f"{self.totalDist:.6g} meters"),
             ("Avg. Speed", f"{self.totalDist / self.time:.4g} m/s"
              if self.time else None),
             ("numLOS / blockage", f"{self.numLOS} / {self.numBlockage}"),
             ("paths (min/avg/max)",
              f"{self.minPaths} / {self.avgPaths:.2f} / {self.maxPaths}")],
            indent)
        if getStr:
            return s
        print(s)

    def __repr__(self):
        return self.print(getStr=True)

    def draw(self, ax=None):
        """Plot the trajectory's (x, y) path; the starting point is a red
        dot (reference trjchan.py:434-476). Requires matplotlib; returns
        the axes. ``DeepMimoData.drawMap(overlay=traj)`` draws the same
        path over the scenario map."""
        import matplotlib.pyplot as plt
        x = [p.xyz[0] for p in self.points]
        y = [p.xyz[1] for p in self.points]
        if ax is None:
            _, ax = plt.subplots()
        ax.grid()
        ax.scatter(x=x[0], y=y[0], c="r")
        ax.plot(x, y)
        ax.set_aspect("equal")
        return ax

    @property
    def isPointSet(self):
        return all(p.sampleNo == 0 for p in self.points[1:])

    @property
    def numPoints(self):
        return len(self.points)

    @property
    def remainingPoints(self):
        return self.numPoints - self.curIdx

    @property
    def cur(self):
        return self.points[self.curIdx]

    @property
    def time(self):
        return self.points[-1].time

    @property
    def totalDist(self):
        if self.dist == 0:
            for i in range(1, self.numPoints):
                self.dist += float(np.sqrt(np.square(
                    self.points[i - 1].xyz - self.points[i].xyz).sum()))
        return self.dist

    @property
    def losAngles(self):
        c = self.cur
        return toRadian([c.losAoa, c.losZoa, c.losAod, c.losZod])[:, None, None]

    @property
    def nlosAngles(self):
        c = self.cur
        return toRadian([c.nlosAoas, c.nlosZoas, c.nlosAods, c.nlosZods])[:, :, None]

    def __getattr__(self, name):
        if name in ("phases", "delays", "powers", "aoas", "zoas", "aods",
                    "zods", "bounces", "losPhase", "losDelay", "losPower",
                    "losAoa", "losZoa", "losAod", "losZod", "nlosPhases",
                    "nlosDelays", "nlosPowers", "nlosAoas", "nlosZoas",
                    "nlosAods", "nlosZods", "hasLos", "numPaths",
                    "numNlosPaths"):
            return getattr(self.cur, name)
        raise AttributeError(name)

    def __iter__(self):
        return iter(self.points)

    def __getitem__(self, idx):
        return self.points[idx]

    def __len__(self):
        return len(self.points)
