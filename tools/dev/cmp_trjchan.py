"""Dev-only: compare TrjChannel vs reference on synthetic trajectories."""
import sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, "/root/reference")
from neoradium import Carrier, AntennaPanel as RefPanel, Waveform
from neoradium.trjchan import TrjPoint as RefPoint, Trajectory as RefTraj, TrjChannel as RefChan

from neoradium_tpu.carrier import CarrierConfig
from neoradium_tpu.channels.antenna import AntennaPanel
from neoradium_tpu.channels.trajectory import TrjPoint, Trajectory
from neoradium_tpu.channels.trjchan import TrjChannel

rng = np.random.default_rng(9)

def synth_points(numPoints, numPaths, hasLos, slotSamples):
    pts_ref, pts_my = [], []
    for i in range(numPoints):
        n = numPaths
        pi = np.zeros((n, 8))
        # NLOS phases zero: the reference applies them in degrees (bug,
        # see trjchan.py docstring) so nonzero phases cannot match
        pi[:, 0] = 0.0
        pi[:, 1] = np.sort(rng.uniform(0, 800, n))       # delay ns
        pi[:, 2] = -rng.uniform(0, 25, n)                # power dB
        pi[:, 3] = rng.uniform(-180, 180, n)             # aoa
        pi[:, 4] = rng.uniform(30, 150, n)               # zoa
        pi[:, 5] = rng.uniform(-180, 180, n)             # aod
        pi[:, 6] = rng.uniform(30, 150, n)               # zod
        pi[:, 7] = -1
        if hasLos:
            pi[0, 7] = 0
        xyz = np.array([i * 0.5, 0.0, 1.5])
        speed = np.array([3.0, 1.0, 0.0])
        pts_ref.append(RefPoint(xyz, 1 if hasLos else 0, pi.copy(), 10.0, 0,
                                speed, i * slotSamples))
        pts_my.append(TrjPoint(xyz, 1 if hasLos else 0, pi.copy(), 10.0, 0,
                               speed, i * slotSamples))
    return pts_ref, pts_my

for hasLos in (False, True):
    refCar = Carrier(numRbs=12, spacing=30)
    slotSamples = int(refCar.curBwp.getSlotLen())
    pr, pm = synth_points(4, 6, hasLos, slotSamples)
    refTraj = RefTraj(pr, 3.5e9)
    myTraj = Trajectory(pm, 3.5e9)
    refCh = RefChan(refCar.curBwp, refTraj,
                    txAntenna=RefPanel([2, 2], polarization="x"),
                    rxAntenna=RefPanel([1, 2], polarization="|"))
    car = CarrierConfig(numRbs=12, spacing=30)
    myCh = TrjChannel(car, myTraj,
                      txAntenna=AntennaPanel((2, 2), polarization="x"),
                      rxAntenna=AntennaPanel((1, 2), polarization="|"))
    for slot in range(3):
        refH = refCh.getChannelMatrix()
        myH = np.asarray(myCh.channel_matrix(slotNo=slot))
        err = np.abs(myH - refH).max() / np.abs(refH).max()
        assert err < 1e-9, (hasLos, slot, err)
        refCh.goNext(); refCar.goNext()
    refCh.restart(); refCar.slotNo = 0

    nt = refCh.nrNt[1]
    sig = (rng.normal(size=(nt, slotSamples + refCh.getMaxDelay()))
           + 1j * rng.normal(size=(nt, slotSamples + refCh.getMaxDelay())))
    refY = refCh.applyToSignal(Waveform(sig)).waveform
    myY = np.asarray(myCh.apply_to_signal(sig, slotNo=0))
    err2 = np.abs(myY - refY).max() / np.abs(refY).max()
    assert err2 < 1e-9, (hasLos, err2)
    assert myCh.timing_offset(slotNo=0) == refCh.getTimingOffset()
    print(f"hasLos={hasLos}: H (3 slots) + TD apply + timing OK")
print("TRJCHAN MATCH OK")
