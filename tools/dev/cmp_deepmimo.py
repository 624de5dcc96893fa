"""Dev-only: compare DeepMIMO trajectory machinery vs reference using a
synthetic scenario injected into both (reference via __new__)."""
import sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, "/root/reference")
from neoradium import Carrier
from neoradium.trjchan import TrjPoint as RefPoint
from neoradium.deepmimo import DeepMimoData as RefDmd
from neoradium import random as refrandom

from neoradium_tpu.carrier import CarrierConfig
from neoradium_tpu.channels.trajectory import TrjPoint
from neoradium_tpu.channels.deepmimo import DeepMimoData

rng = np.random.default_rng(5)
nx, ny = 30, 20
delta = np.array([0.4, 0.4])
bs = np.array([5.0, 5.0, 20.0])

def make_points(cls):
    pts = []
    for iy in range(ny):
        for ix in range(nx):
            xyz = np.array([ix * delta[0], iy * delta[1], 1.5])
            # smooth multipath field: params vary smoothly over the grid
            n = 4
            t = np.arange(n)
            pi = np.zeros((n, 8))
            pi[:, 0] = 10 * np.sin(0.1 * ix + t) + 5 * iy * 0.05
            pi[:, 1] = 100 + 5 * t + 0.5 * ix + 0.3 * iy
            pi[:, 2] = -5 - 2 * t - 0.01 * ix
            pi[:, 3] = 30 + 3 * t + 0.2 * ix
            pi[:, 4] = 80 + t
            pi[:, 5] = -40 + 5 * t + 0.1 * iy
            pi[:, 6] = 95 + t
            pi[:, 7] = -1
            pi[0, 7] = 0
            dist = np.sqrt(np.square(bs - xyz).sum())
            pts.append(cls(xyz, 1, pi, dist, 0))
    return pts

# reference instance via __new__ (no files)
ref = RefDmd.__new__(RefDmd)
ref.scenario = "synthetic"
ref.carrierFreq = 3.5e9
ref.bsXyz = bs
ref.allTrjPoints = make_points(RefPoint)
ref.gridSize = np.array([nx, ny])
ref.delta = delta
ref.numGridPoints = nx * ny
ref.xyMin = ref.allTrjPoints[0].xyz[:2]
ref.xyMax = ref.allTrjPoints[-1].xyz[:2]

mine = DeepMimoData.fromPoints(make_points(TrjPoint), 3.5e9, bs, (nx, ny), delta)

refCar = Carrier(numRbs=12, spacing=30)
car = CarrierConfig(numRbs=12, spacing=30)

# 1. interpolateTrajectory parity on a fixed index path
idx = [0, 2, 4, 4 + 2 * nx]
refTraj = ref.interpolateTrajectory(idx, 5.0, refCar.curBwp)
myTraj = mine.interpolateTrajectory(idx, 5.0, car)
assert refTraj.numPoints == myTraj.numPoints, (refTraj.numPoints, myTraj.numPoints)
for rp, mp in zip(refTraj, myTraj):
    assert np.abs(rp.xyz - mp.xyz).max() < 1e-9
    assert rp.sampleNo == mp.sampleNo, (rp.sampleNo, mp.sampleNo)
    assert np.abs(rp.speed - mp.speed).max() < 1e-9
    assert rp.hasLos == mp.hasLos
    assert np.abs(rp.pathInfo - mp.pathInfo).max() < 1e-8
print(f"interpolateTrajectory: {myTraj.numPoints} points match")

# 2. random grid trajectory parity (same PCG64 stream)
refrandom.setSeed(123)
myRng = np.random.default_rng(np.random.PCG64(123))
refGrid = ref.getRandomGridTraj(np.array([[0, 0], [12, 8]]), 2, 20, trajDir="+X")
myGrid = mine.getRandomGridTraj(np.array([[0, 0], [12, 8]]), 2, 20,
                                trajDir="+X", rng=myRng)
assert np.array_equal(refGrid, myGrid), (refGrid, myGrid)
print("getRandomGridTraj: identical walk with same PCG64 seed")

# 2b. every walk mode: directed +-X/+-Y, free "All", custom prob, xyStart,
#     and distance-valued trajLen — all must be bit-identical
cases = [dict(trajDir=d) for d in ("+X", "-X", "+Y", "-Y", "All")]
cases += [dict(trajDir="All", prob=(0.2, 0.5, 0.3)),
          dict(trajDir="+Y", prob=(0.1, 0.8, 0.1)),
          dict(trajDir="All", xyStart=np.array([2.0, 2.0])),
          dict(trajDir="All", trajLen=6.0)]
for i, kw in enumerate(cases):
    n = kw.pop("trajLen", 24)
    refrandom.setSeed(1000 + i)
    myRng = np.random.default_rng(np.random.PCG64(1000 + i))
    r = ref.getRandomGridTraj(np.array([[0, 0], [11, 7]]), 2, n, **kw)
    m = mine.getRandomGridTraj(np.array([[0, 0], [11, 7]]), 2, n,
                               rng=myRng, **kw)
    assert np.array_equal(r, m), (kw, r, m)
print(f"getRandomGridTraj: {len(cases)} mode/prob/start/distance cases identical")
print("DEEPMIMO MATCH OK")
