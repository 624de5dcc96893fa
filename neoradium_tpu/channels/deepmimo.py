"""DeepMIMO ray-tracing scenario ingestion and trajectory construction.

All host-side (file IO + NumPy): scenario loading (v1 legacy, v2/v3 .mat,
v4 .json+.mat formats), grid bookkeeping, random-walk trajectory generation,
and path-matched interpolation to one trajectory point per slot. The device
work happens downstream in :class:`~neoradium_tpu.channels.trjchan.TrjChannel`.

Behavioral parity: reference ``neoradium/deepmimo.py`` — loaders
(loadV1:162-253, loadV3:256-320, loadV4:350-445), grid coordinate helpers
(700-705), random grid walk with direction constraints
(getRandomGridTraj:707-803), slot-timed path-matched interpolation
(interpolateTrajectory:833-945), waypoint trajectories
(trajectoryFromPoints:1434-1487), channel dataset generator (getChanGen:
1489-1540). Plotting (drawMap/animateTrajectory/interactiveTrjPoints) is
provided when matplotlib is available.
"""
from __future__ import annotations

import json
import os

import numpy as np

from ..carrier import SAMPLE_RATE
from .trajectory import TrjPoint, Trajectory
from .trjchan import TrjChannel


class DeepMimoData:
    """Ray-tracing scenario dataset: a grid of TrjPoints with multipath info."""

    pathToScenarios = "/data/RayTracing/DeepMIMO/Scenarios/"

    def __init__(self, scenario: str | None = None, baseStationId=1, gridId=0,
                 _points=None, _meta=None):
        if scenario is None:
            # internal: synthetic dataset (tests / programmatic scenarios)
            self._init_from_points(_points, **(_meta or {}))
            return
        folder = self.pathToScenarios + scenario + "/"
        if not os.path.exists(folder):
            folder = os.path.expanduser("~") + self.pathToScenarios + scenario + "/"
        if not os.path.exists(folder):
            raise ValueError(f"Could not find the folder "
                             f"\"{self.pathToScenarios + scenario}/\"!")
        self.scenario = scenario
        self.baseStationId = baseStationId
        self.gridId = gridId
        if os.path.exists(folder + "params.mat"):
            self.loadV3(folder)
        elif os.path.exists(folder + "params.json"):
            self.loadV4(folder)
        elif os.path.exists(folder + f"{scenario}.params.mat"):
            self.loadV1(folder)
        else:
            raise ValueError(f"Unrecognized scenario format in {folder}")

    # ------------------------------------------------------------ construction
    @classmethod
    def setScenariosPath(cls, newPath: str):
        cls.pathToScenarios = newPath if newPath.endswith("/") else newPath + "/"

    @classmethod
    def fromPoints(cls, points, carrierFreq, bsXyz, gridSize, delta,
                   scenario="synthetic"):
        """Build a dataset from an explicit list of TrjPoints (row-major grid
        of gridSize=(nx, ny) with spacing delta=(dx, dy))."""
        return cls(None, _points=points,
                   _meta=dict(carrierFreq=carrierFreq, bsXyz=bsXyz,
                              gridSize=gridSize, delta=delta,
                              scenario=scenario))

    def _init_from_points(self, points, carrierFreq, bsXyz, gridSize, delta,
                          scenario):
        self.scenario = scenario
        self.version = 0
        self.carrierFreq = carrierFreq
        self.bsXyz = np.asarray(bsXyz, np.float64)
        self.allTrjPoints = list(points)
        self.gridSize = np.asarray(gridSize, np.int64)
        self.delta = np.asarray(delta, np.float64)
        self.numGridPoints = len(self.allTrjPoints)
        self.xyMin = self.allTrjPoints[0].xyz[:2]
        self.xyMax = self.allTrjPoints[-1].xyz[:2]
        self._stats()

    def _stats(self):
        n = [p.numPaths for p in self.allTrjPoints]
        self.maxPaths = max(n) if n else 0
        self.minPaths = min(n) if n else 0
        self.avgPaths = float(np.mean(n)) if n else 0.0
        self.numTotalBlockage = sum(1 for p in self.allTrjPoints
                                    if p.numPaths == 0)
        self.numLOS = sum(1 for p in self.allTrjPoints if p.hasLos == 1)

    # ----------------------------------------------------------------- loaders
    def print(self, indent: int = 0, title: str | None = None,
              getStr: bool = False):
        """Scenario summary (reference DeepMimoData.print /
        showScenarioInfo, deepmimo.py)."""
        import numpy as _np
        from ..utils import format_properties
        n = [p.numPaths for p in self.allTrjPoints]
        los = sum(1 for p in self.allTrjPoints if p.hasLos == 1)
        blk = sum(1 for p in self.allTrjPoints if p.numPaths == 0)
        s = format_properties(
            title or "DeepMIMO Scenario Properties:",
            [("scenario", self.scenario),
             ("version", self.version),
             ("carrierFreq", f"{self.carrierFreq / 1e9:g} GHz"),
             ("BS position", list(_np.round(self.bsXyz, 3))),
             ("grid size", f"{self.gridSize[0]} x {self.gridSize[1]}"),
             ("grid spacing", list(_np.round(self.delta, 3))),
             ("numGridPoints", self.numGridPoints),
             ("xy bounds", f"{list(_np.round(self.xyMin, 2))} .. "
              f"{list(_np.round(self.xyMax, 2))}"),
             ("paths (max)", self.maxPaths),
             ("LOS / blockage points", f"{los} / {blk}")], indent)
        if getStr:
            return s
        print(s)

    showScenarioInfo = print

    def __repr__(self):
        return self.print(getStr=True)

    def loadV1(self, folder: str):
        """Legacy per-file format (reference loadV1:162-253)."""
        import scipy.io
        scenario = self.scenario
        info = scipy.io.loadmat(folder + f"{scenario}.params.mat")
        self.version = 1
        self.carrierFreq = info["carrier_freq"][0][0]
        gridInfo = np.int64(info["user_grids"])
        gridId = int(self.gridId)
        if gridId >= len(gridInfo):
            raise ValueError(f"Invalid gridId {gridId}")
        usersPerGrid = [(gi[1] - gi[0] + 1) * gi[2] for gi in gridInfo]
        startRow, endRow, usersPerRow = gridInfo[gridId]
        self.numGridPoints = int(usersPerGrid[gridId])
        bs = self.baseStationId

        cir = scipy.io.loadmat(folder + f"{scenario}.{bs}.CIR.mat")["CIR_array_full"][0].tolist()
        dod = scipy.io.loadmat(folder + f"{scenario}.{bs}.DoD.mat")["DoD_array_full"][0].tolist()
        doa = scipy.io.loadmat(folder + f"{scenario}.{bs}.DoA.mat")["DoA_array_full"][0].tolist()
        loc = scipy.io.loadmat(folder + f"{scenario}.Loc.mat")["Loc_array_full"]
        txLoc = scipy.io.loadmat(folder + f"{scenario}.TX_Loc.mat")["TX_Loc_array_full"]
        self.bsXyz = txLoc[bs - 1][1:4]
        los = scipy.io.loadmat(folder + f"{scenario}.{bs}.LoS.mat")["LOS_tag_array_full"][0][1:]
        pl = scipy.io.loadmat(folder + f"{scenario}.{bs}.PL.mat")["PL_array_full"]
        distances, pathLosses = pl[:, 0], pl[:, 1]

        self.allTrjPoints = []
        userIdx, fileIdx = 0, 1
        for g in range(gridId + 1):
            for userId in range(1, int(usersPerGrid[g]) + 1):
                fileIdx += 1
                numPaths = int(cir[fileIdx])
                if g != gridId:
                    fileIdx += 4 * numPaths + 1
                    userIdx += 1
                    continue
                fileIdx += 1
                paths = []
                for _ in range(numPaths):
                    phase, delay, power = cir[fileIdx + 1: fileIdx + 4]
                    aod, zod, _p1 = dod[fileIdx + 1: fileIdx + 4]
                    aoa, zoa, _p2 = doa[fileIdx + 1: fileIdx + 4]
                    paths.append([phase, delay * 1e9, power, aoa, zoa, aod, zod])
                    fileIdx += 4
                xyz = loc[userIdx][1:4]
                self.allTrjPoints.append(TrjPoint(
                    xyz, int(los[userIdx]), np.asarray(paths).reshape(-1, 7),
                    distances[userIdx], pathLosses[userIdx]))
                userIdx += 1
        self.gridSize = np.asarray([usersPerRow, endRow - startRow + 1])
        self.xyMin = self.allTrjPoints[0].xyz[:2]
        self.xyMax = self.allTrjPoints[-1].xyz[:2]
        self.delta = (self.xyMax - self.xyMin) / (self.gridSize - 1)
        self._stats()

    def loadV3(self, folder: str):
        """V2/V3 .mat format (reference loadV3:256-320)."""
        import scipy.io
        params = scipy.io.loadmat(folder + "params.mat")
        self.carrierFreq = params["carrier_freq"][0][0]
        self.version = params["version"][0][0]
        gridInfo = params["user_grids"]
        gridId = int(self.gridId)
        if gridId >= len(gridInfo):
            raise ValueError(f"Invalid gridId {gridId}")
        usersPerGrid = [int((gi[1] - gi[0] + 1) * gi[2]) for gi in gridInfo]
        startRow, endRow, usersPerRow = np.int64(gridInfo[gridId])
        self.numGridPoints = usersPerGrid[gridId]
        ue = scipy.io.loadmat(
            folder + f"BS{self.baseStationId}_UE_0-{self.numGridPoints}.mat")
        self.allTrjPoints = []
        for i in range(self.numGridPoints):
            ch = ue["channels"][0][i][0][0][0]
            if ch.size == 0:
                paths, losFlag = np.empty((0, 7)), -1
            else:
                paths = np.asarray(ch.T, np.float64)
                losFlag = 1 if np.any(paths[:, 7] == 1) else 0
                paths = paths[:, :7].copy()
                paths[:, 1] *= 1e9
            rxLocs = ue["rx_locs"][i]
            self.allTrjPoints.append(TrjPoint(rxLocs[:3], losFlag, paths,
                                              rxLocs[3], rxLocs[4]))
        self.bsXyz = ue["tx_loc"][0]
        self.gridSize = np.asarray([int(usersPerRow), int(endRow)])
        self.xyMin = self.allTrjPoints[0].xyz[:2]
        self.xyMax = self.allTrjPoints[-1].xyz[:2]
        self.delta = (self.allTrjPoints[int(usersPerRow) + 1].xyz[:2]
                      - self.allTrjPoints[0].xyz[:2])
        self._stats()

    def loadV4(self, folder: str):
        """V4 .json + per-parameter .mat format (reference loadV4:350-445)."""
        import scipy.io
        with open(folder + "params.json") as f:
            meta = json.load(f)
        self.carrierFreq = meta["rt_params"]["frequency"]
        self.version = meta["version"]
        rxGrids, txs = {}, {}
        for i in range(100):
            key = f"txrx_set_{i}"
            if key not in meta["txrx_sets"]:
                break
            txrx = meta["txrx_sets"][key]
            if txrx["is_rx"] and not txrx["is_tx"]:
                rxGrids[txrx["name"]] = (txrx["id"], txrx["num_points"])
            if txrx["is_tx"]:
                fn = folder + f"tx_pos_t{txrx['id']:03d}_tx000_r{txrx['id']:03d}.mat"
                txs[txrx["name"]] = (txrx["id"],
                                     scipy.io.loadmat(fn)["tx_pos"][0])

        def find_id(given, default, dic):
            if isinstance(given, str) and given in dic:
                return given
            keys = sorted(dic.keys())
            if len(dic) == 1:
                return keys[0]
            try:
                num2key = {int("".join(c for c in k if c.isdigit())): k
                           for k in dic}
                if not isinstance(given, str) and given in num2key:
                    return num2key[given]
            except ValueError:
                pass
            if given == default:
                return keys[0]
            raise ValueError(f"Invalid id {given!r}; options: {keys}")

        self.gridId = find_id(self.gridId, 0, rxGrids)
        self.baseStationId = find_id(self.baseStationId, 1, txs)
        rxId, self.numGridPoints = rxGrids[self.gridId]
        txId, self.bsXyz = txs[self.baseStationId]
        names = ["phase", "delay", "power", "aoa_az", "aoa_el", "aod_az",
                 "aod_el", "inter", "rx_pos"]
        vals = {}
        for n in names:
            fn = folder + f"{n}_t{txId:03d}_tx000_r{rxId:03d}.mat"
            if not os.path.exists(fn):
                raise ValueError(f"File {fn} does not exist!")
            vals[n] = scipy.io.loadmat(fn)[n]
        self.allTrjPoints = []
        dx = dy = nx = None
        prev = None
        for i in range(self.numGridPoints):
            numPaths = int((~np.isnan(vals["phase"][i])).sum())
            if numPaths > 0:
                paths = np.stack([vals[n][i][:numPaths] for n in names[:-1]],
                                 axis=1).astype(np.float64)
                paths[:, 1] *= 1e9
            else:
                paths = np.empty((0, 8))
            xyz = vals["rx_pos"][i]
            losCount = int((vals["inter"][i] == 0).sum())
            losFlag = -1 if numPaths == 0 else (1 if losCount else 0)
            self.allTrjPoints.append(TrjPoint(
                xyz, losFlag, paths,
                np.sqrt(np.square(self.bsXyz - xyz).sum())))
            if prev is not None:
                d = xyz - prev
                if d[1] == 0:
                    dx = d[0] if dx is None else dx
                elif dy is None:
                    nx, dy = i, d[1]
            prev = xyz
        self.gridSize = np.asarray([nx, self.numGridPoints // nx])
        self.xyMin = self.allTrjPoints[0].xyz[:2]
        self.xyMax = self.allTrjPoints[-1].xyz[:2]
        self.delta = np.asarray([dx, dy])
        self._stats()

    # -------------------------------------------------------------- grid math
    def gridXyToIndex(self, gridXy):
        gridXy = np.asarray(gridXy)
        return gridXy[..., 0] + gridXy[..., 1] * self.gridSize[0]

    def xyToGridXy(self, xy):
        return np.int64((np.asarray(xy) - self.allTrjPoints[0].xyz[:2])
                        / self.delta + 0.5)

    def gridXyToXy(self, gridXy):
        idx = np.asarray([self.gridXyToIndex(gridXy)]).reshape(-1)
        return np.asarray([self.allTrjPoints[i].xyz[:2] for i in idx]).squeeze()

    # --------------------------------------------------------- random walks
    # Headings are indices into 45-degree steps CCW from +X; walls are
    # numbered 0=west(x=min), 1=south(y=min), 2=east(x=max), 3=north(y=max)
    # so that _WALLS_AHEAD[h] is the set of walls a heading runs toward.
    _HEADING_STEP = np.asarray([(1, 0), (1, 1), (0, 1), (-1, 1),
                                (-1, 0), (-1, -1), (0, -1), (1, -1)], np.int64)
    _WALLS_AHEAD = ({2}, {2, 3}, {3}, {0, 3}, {0}, {0, 1}, {1}, {1, 2})
    _DIR_HEADING = {"+X": 0, "+Y": 2, "-X": 4, "-Y": 6}

    def _step_allowed(self, pos, heading, bounds, segLen):
        """Is a segment ending at grid position ``pos`` with ``heading``
        inside the walk's safety margins?

        Decision semantics are parity-forced (bit-identical walks vs
        reference isBadMove, deepmimo.py:761-779, verified by
        tools/dev/cmp_deepmimo.py): a step is rejected when it leaves the
        bounds; when a diagonal heading points exactly into a corner (the
        two walls ahead — and no others — are within 2*segLen); or when a
        straight heading gets within segLen of the wall ahead.
        """
        margins = np.asarray([pos[0] - bounds[0, 0], pos[1] - bounds[0, 1],
                              bounds[1, 0] - pos[0], bounds[1, 1] - pos[1]])
        if margins.min() < 0:
            return False
        ahead = self._WALLS_AHEAD[heading]
        if len(ahead) == 2:                       # diagonal: corner check
            close = {w for w in range(4) if margins[w] < 2 * segLen}
            return close != ahead
        return margins[next(iter(ahead))] >= segLen

    def getRandomGridTraj(self, xyBounds, segLen, trajLen, xyStart=None,
                          prob=None, trajDir="All", rng=None):
        """Random walk on the scenario grid in ``segLen``-point segments.

        Each iteration draws one turn action (-1 right / 0 straight /
        +1 left, probabilities ``prob``) and commits a segment if the move
        passes :meth:`_step_allowed`; rejected draws are simply retried,
        which is what shapes the walk away from walls. In directed modes
        ('+X'/'-X'/'+Y'/'-Y') the heading may deviate at most 45 degrees
        from the main direction, so at the extreme headings the action set
        shrinks to 2 (with renormalized probabilities). Behavioral parity:
        reference getRandomGridTraj (deepmimo.py:707-803) — same RNG draw
        sequence, bit-identical trajectories (tools/dev/cmp_deepmimo.py).
        """
        if rng is None:
            rng = np.random.default_rng()
        if prob is not None and (len(prob) != 3 or abs(sum(prob) - 1) > 1e-9):
            raise ValueError("'prob' must be 3 probabilities summing to 1")
        lo = self.xyToGridXy(np.maximum(self.xyMin, xyBounds[0]))
        hi = self.xyToGridXy(np.minimum(self.xyMax, xyBounds[1]))
        bounds = np.asarray([lo, hi])
        maxDist = np.inf
        if not isinstance(trajLen, (int, np.integer)):
            maxDist, trajLen = trajLen, 100000000

        base = self._DIR_HEADING.get(trajDir)     # None for "All"
        heading = 0 if base is None else base
        if xyStart is not None:
            start = np.clip(self.xyToGridXy(xyStart),
                            lo + 2 * segLen, hi - 2 * segLen)
        else:
            start = bounds.mean(0).astype(np.int64)
            if base is None or trajDir == "+Y":
                start[1] = lo[1]                  # center bottom
            elif trajDir == "-Y":
                start[1] = hi[1]
            else:                                 # +-X: middle of a side
                start[0] = lo[0] if trajDir == "+X" else hi[0]
        if base is not None:
            # cap the walk so a directed trajectory can always finish
            ax = 0 if trajDir in ("+X", "-X") else 1
            room = (hi[ax] - start[ax] if trajDir in ("+X", "+Y")
                    else start[ax] - lo[ax])
            trajLen = min(trajLen, room - segLen)

        traj = [np.asarray(start, np.int64)]
        dist = 0.0
        while len(traj) < trajLen:
            if base is None:
                action = rng.choice([-1, 0, 1], p=prob)
            else:
                rel = (heading - base) % 8
                if rel == 1:                      # at max-left deviation
                    p2 = None if prob is None else (
                        prob[0] / (prob[0] + prob[1]),
                        prob[1] / (prob[0] + prob[1]))
                    action = rng.choice([-1, 0], p=p2)
                elif rel == 7:                    # at max-right deviation
                    p2 = None if prob is None else (
                        prob[1] / (prob[1] + prob[2]),
                        prob[2] / (prob[1] + prob[2]))
                    action = rng.choice([0, 1], p=p2)
                else:
                    action = rng.choice([-1, 0, 1], p=prob)
            nextHeading = (heading + int(action)) % 8
            step = self._HEADING_STEP[nextHeading]
            if not self._step_allowed(traj[-1] + segLen * step,
                                      nextHeading, bounds, segLen):
                continue
            traj.extend([traj[-1] + (s + 1) * step for s in range(segLen)])
            heading = nextHeading
            dist += self.delta[0] * segLen * float(np.hypot(*step))
            if dist > maxDist:
                break
        return np.asarray(traj[:trajLen])

    # ----------------------------------------------------------- interpolation
    # Azimuth-valued pathInfo columns (phase, AOA az, AOD az): interpolated on
    # the unwrapped circle, then re-wrapped to [-180, 180].
    _AZ_COLS = np.asarray([0, 3, 5])

    def _matched_endpoints(self, p0, p1):
        """Pair up the paths shared by two neighboring grid points.

        Returns ``(ends, los)`` where ``ends`` is a (2, c, 8) stack of the c
        matched pathInfo rows at each endpoint, with azimuth columns
        unwrapped jointly so linear interpolation takes the short way around
        the circle, and ``los`` is the interpolated-segment LOS flag.

        Protocol (parity-forced, golden-tested by tests/test_trjchan.py::
        test_deepmimo_interpolation_golden; reference deepmimo.py:884-906):
        a blocked endpoint (hasLos == -1) matches nothing; the match
        tolerance is the 1e9/c0-scaled diagonal of two grid cells; the
        segment counts as LOS only if the start point is LOS and either all
        of its paths survive the matching or the end point is LOS too.
        """
        if p0.hasLos < 0 or p1.hasLos < 0 or p0.numPaths == 0:
            return None, -1
        maxDiff = 2 * np.linalg.norm(self.delta) * 1e9 / 299792458
        match = p0.matchPathInfo(p1, maxDiff)
        keep0 = np.flatnonzero(match >= 0)
        if keep0.size == 0:
            return None, -1
        los = int(p0.hasLos == 1 and (p1.hasLos == 1
                                      or keep0.size == p0.numPaths))
        ends = np.stack([p0.pathInfo[keep0], p1.pathInfo[match[keep0]]])
        ends[:, :, self._AZ_COLS] = np.unwrap(ends[:, :, self._AZ_COLS],
                                              0.5, axis=0, period=360)
        return ends, los

    def interpolateTrajectory(self, idxTrajectory, speedMps, carrier):
        """One TrjPoint per slot-start via path-matched linear interpolation.

        Timing protocol (parity-forced; reference deepmimo.py:833-945,
        golden fixtures in tests/golden/deepmimo.npz): each grid segment's
        duration at ``speedMps`` is quantized to a whole number of subframes
        plus the nearest slot boundary within the fractional subframe, and a
        point is emitted at every slot start in the segment — endpoints
        included, with the shared boundary point owned by the earlier
        segment. Matched paths and the position are interpolated linearly in
        sample time (:meth:`_matched_endpoints`); when no paths match, the
        emitted points carry position only and hasLos = -1.
        """
        idx = np.asarray(idxTrajectory, np.int64)
        pts = [self.allTrjPoints[i] for i in idx]
        sps = carrier.slotsPerSubFrame
        slotStarts = np.concatenate(
            [[0], np.cumsum([carrier.slotLen(i) for i in range(sps)])]
        ).astype(np.int64)
        sfLen = int(carrier.sampleRate // 1000)

        # Slot-quantized segment timing, vectorized over all segments.
        xyz = np.stack([p.xyz for p in pts])
        segVec = np.diff(xyz, axis=0)
        nSubF = (np.sqrt(np.square(segVec).sum(-1)) * carrier.sampleRate
                 / (sfLen * speedMps))
        slotIdx = np.abs(slotStarts[None, :]
                         - (nSubF % 1)[:, None] * sfLen).argmin(-1)
        nSubI = nSubF.astype(np.int64)
        segSamples = nSubI * sfLen + slotStarts[slotIdx]
        nSteps = nSubI * sps + slotIdx               # slots per segment
        segBase = np.concatenate([[0], np.cumsum(segSamples)])
        segSpeed = segVec * carrier.sampleRate / segSamples[:, None]

        points = []
        for s in range(len(segVec)):
            # Slot-start sample offsets within the segment, both endpoints
            # included (0 .. segSamples[s]); generate a subframe too many and
            # truncate, which also covers the slotIdx == sps carry case.
            offs = (slotStarts[:-1][None, :]
                    + sfLen * np.arange(nSubI[s] + 2)[:, None]
                    ).ravel()[: nSteps[s] + 1]
            if s > 0:
                offs = offs[1:]      # boundary point owned by segment s-1
            ends, los = self._matched_endpoints(pts[s], pts[s + 1])
            frac = offs[:, None].astype(np.float64) / segSamples[s]
            pos = xyz[s] + segVec[s] * frac
            if ends is None:
                paths = [None] * len(offs)
            else:
                paths = ends[0] + (ends[1] - ends[0]) * frac[:, :, None]
                az = paths[:, :, self._AZ_COLS]
                paths[:, :, self._AZ_COLS] = (az - 360.0 * (az > 180)
                                              + 360.0 * (az < -180))
            bsDist = np.sqrt(np.square(pos - self.bsXyz).sum(-1))
            points += [TrjPoint(pos[k], los, paths[k], bsDist=bsDist[k],
                                speed=segSpeed[s],
                                sampleNo=int(offs[k] + segBase[s]))
                       for k in range(len(offs))]
        return Trajectory(points, self.carrierFreq)

    def getRandomTrajectory(self, xyBounds, segLen, carrier, trajLen=None,
                            trajTime=None, trajDist=None, xyStart=None,
                            prob=None, trajDir="All", speedMps=None, rng=None):
        """Random trajectory with per-slot interpolation (reference :945)."""
        if speedMps is None:
            speedMps = 14.0 if "indoor" not in self.scenario.lower() else 1.2
        if trajTime is not None:
            trajLen = trajTime * speedMps
        elif trajDist is not None:
            trajLen = float(trajDist)
        elif trajLen is None:
            raise ValueError("One of trajTime, trajDist, or trajLen is needed")
        gridTraj = self.getRandomGridTraj(xyBounds, segLen, trajLen, xyStart,
                                          prob, trajDir, rng)
        idx = self.gridXyToIndex(gridTraj)
        return self.interpolateTrajectory(idx, speedMps, carrier)

    def trajectoryFromPoints(self, points, carrier, speedMps=None):
        """Waypoint-line trajectories (reference trajectoryFromPoints:1434)."""
        if speedMps is None:
            speedMps = 14.0 if "indoor" not in self.scenario.lower() else 1.2
        traj = []
        for i in range(len(points) - 1):
            p1, p2 = self.xyToGridXy(np.asarray(points[i:i + 2]))
            dx, dy = p2 - p1
            xInc = int(np.sign(dx)) if dx else 1
            yInc = int(np.sign(dy)) if dy else 1

            def line(x=None, y=None):
                if x is not None:
                    return (p2[1] - p1[1]) * (x - p1[0]) / (p2[0] - p1[0]) + p1[1]
                return (p2[0] - p1[0]) * (y - p1[1]) / (p2[1] - p1[1]) + p1[0]

            if abs(dx) > abs(dy):
                traj += [[x, round(line(x=x))] for x in range(p1[0], p2[0], xInc)]
            else:
                traj += [[round(line(y=y)), y] for y in range(p1[1], p2[1], yInc)]
        traj.append(self.xyToGridXy(np.asarray(points[-1])).tolist())
        idx = self.gridXyToIndex(np.asarray(traj, np.int64))
        return self.interpolateTrajectory(idx, speedMps, carrier)

    # -------------------------------------------------------------- datasets
    def getChanGen(self, numChannels, carrier, xyBounds=None, segLen=2,
                   trajLen=50, speedMps=None, seed=0, **chanKw):
        """Generator of (L, K, Nr, Nt) channel matrices from random
        trajectories (reference getChanGen:1489-1540)."""
        rng = np.random.default_rng(seed)
        if xyBounds is None:
            xyBounds = np.asarray([self.xyMin, self.xyMax])
        count = 0
        while count < numChannels:
            traj = self.getRandomTrajectory(xyBounds, segLen, carrier,
                                            trajLen=trajLen, speedMps=speedMps,
                                            rng=rng)
            chan = TrjChannel(carrier, traj, **chanKw)
            for slot in range(traj.numPoints):
                if count >= numChannels:
                    return
                yield np.asarray(chan.channel_matrix(slotNo=slot))
                count += 1

    # ---------------------------------------------------------------- access
    def __getitem__(self, idx):
        return self.allTrjPoints[idx]

    def __iter__(self):
        return iter(self.allTrjPoints)

    def __len__(self):
        return len(self.allTrjPoints)

    # ---------------------------------------------------------------- drawing
    def drawMap(self, mapType="LOS-NLOS", overlay=None, figSize=6, ax=None):
        """Scenario map (LOS-NLOS / 1stPathDelays / 1stPathPowers) with an
        optional trajectory overlay; requires matplotlib."""
        import matplotlib.pyplot as plt
        nx, ny = self.gridSize
        vals = np.zeros(len(self.allTrjPoints))
        if mapType == "LOS-NLOS":
            vals = np.asarray([p.hasLos for p in self.allTrjPoints], float)
        elif mapType == "1stPathDelays":
            vals = np.asarray([p.delays[0] if p.numPaths else np.nan
                               for p in self.allTrjPoints])
        elif mapType == "1stPathPowers":
            vals = np.asarray([p.powers[0] if p.numPaths else np.nan
                               for p in self.allTrjPoints])
        else:
            raise ValueError(f"Unsupported mapType {mapType!r}")
        img = vals.reshape(ny, nx)
        if ax is None:
            _, ax = plt.subplots(figsize=(figSize, figSize * ny / max(nx, 1)))
        extent = [self.xyMin[0], self.xyMax[0], self.xyMin[1], self.xyMax[1]]
        im = ax.imshow(img, origin="lower", extent=extent, aspect="auto")
        ax.plot(*self.bsXyz[:2], "r^", markersize=10)
        if overlay is not None:
            if isinstance(overlay, Trajectory):
                xy = np.asarray([p.xyz[:2] for p in overlay])
            else:
                xy = np.asarray([self.allTrjPoints[i].xyz[:2]
                                 for i in np.asarray(overlay).reshape(-1)])
            ax.plot(xy[:, 0], xy[:, 1], "k.-", markersize=2)
        plt.colorbar(im, ax=ax)
        return ax

    def animateTrajectory(self, trajectory, numGraphs=0, graphCallback=None,
                          mapType="LOS-NLOS", pointsPerFrame=10,
                          fileName=None):
        """Animate a UE moving along ``trajectory`` on the scenario map, with
        up to 3 callback-drawn graphs below (reference deepmimo.py:1185-1320,
        including the callback protocol: ``graphCallback(request, ax,
        trajectory, points)`` with request "Config" once, then "Draw" per
        frame with the (previous, current) point indices).

        Returns a ``matplotlib.animation.FuncAnimation``; with ``fileName``
        also saves a GIF (PillowWriter)."""
        import matplotlib.pyplot as plt
        from matplotlib import animation
        if numGraphs > 3:
            raise ValueError("This function supports up to 3 graphs")
        figSize = (6, 4 + 4 * numGraphs / 3)
        if numGraphs > 0:
            fig, ax = plt.subplots(1 + numGraphs, 1, figsize=figSize,
                                   gridspec_kw={"height_ratios":
                                                [4] + numGraphs * [1]})
            axMap, axGraphs = ax[0], ax[1:]
        else:
            fig, axMap = plt.subplots(figsize=figSize)
            axGraphs = []
        self.drawMap(mapType, ax=axMap)
        point, = axMap.plot([], [], "bo", markersize=5)
        if numGraphs > 0:
            graphCallback("Config", axGraphs, trajectory)

        def animate(p):
            p0, p1 = (p - 1) * pointsPerFrame, p * pointsPerFrame
            x, y = trajectory.points[p1].xyz[:2]
            point.set_data([x], [y])
            if p > 0:
                axMap.plot([trajectory.points[p0].xyz[0], x],
                           [trajectory.points[p0].xyz[1], y],
                           "black", linewidth=1)
                if numGraphs > 0:
                    graphCallback("Draw", axGraphs, trajectory, (p0, p1))
            return (point,)

        plt.tight_layout()
        frameMs = 1000.0 * pointsPerFrame * trajectory.time / trajectory.numPoints
        anim = animation.FuncAnimation(
            fig, animate, frames=trajectory.numPoints // pointsPerFrame,
            interval=int(np.round(frameMs)), blit=True, repeat=False)
        plt.close()
        if fileName is not None:
            fps = int(min(np.round(1000.0 / frameMs), 30))
            anim.save(fileName, writer=animation.PillowWriter(fps=max(fps, 1)))
        return anim

    def interactiveTrjPoints(self, mapType="LOS-NLOS", backEnd=None,
                             figSize=6):
        """Pick trajectory points by clicking on the scenario map (reference
        deepmimo.py:1322-1433): left-click appends a point, right-click
        removes the last one, closing the window finishes. Returns the
        clicked (x, y) points as a float array — feed them to
        :meth:`trajectoryFromPoints`.

        Deviation: the reference generates a temp python file and runs it in
        a subprocess (deepmimo.py:1390-1427); we run the event loop
        in-process (``backEnd`` switches the matplotlib backend first when
        given), which behaves the same without the codegen round-trip."""
        import matplotlib
        if backEnd is not None:
            matplotlib.use(backEnd)
        import matplotlib.pyplot as plt
        titles = {"LOS-NLOS": "Map of LOS/NLOS paths",
                  "1stPathDelays": "Delay of first path (ns)",
                  "1stPathPowers": "Power of first path (dB)"}
        if mapType not in titles:
            raise ValueError(f"Unsupported mapType {mapType!r}")
        ax = self.drawMap(mapType, figSize=figSize)
        fig = ax.figure
        ax.set_title(titles[mapType] + "\nClick on the map to add trajectory "
                                       "points")
        points = []

        def onClick(event):
            x, y = event.xdata, event.ydata
            if x is None or y is None:
                return
            if event.button == 1:
                if points:
                    ax.plot([points[-1][0], x], [points[-1][1], y], "blue")
                else:
                    ax.plot(x, y, "bo")
                points.append((x, y))
            elif event.button == 3 and points:
                points.pop()
                if points:
                    ax.plot([points[-1][0], x], [points[-1][1], y], "grey")
            fig.canvas.draw_idle()

        fig.canvas.mpl_connect("button_press_event", onClick)
        plt.show(block=True)
        print(f"Done. {len(points)} points selected.")
        return np.float64(points)

    # Backward-compat alias: rounds 1-2 of this repo exposed the method with
    # the (misspelled relative to the reference) name interactiveTrajPoints.
    interactiveTrajPoints = interactiveTrjPoints
