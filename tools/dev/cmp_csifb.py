"""Dev-only: compare CSI feedback vs reference (N2==1 configs; the reference
Type1SP precoder shapes are broken for N2>1 — never flattens v(l,m))."""
import sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, "/root/reference")
from neoradium import Carrier, CsiRsConfig as RefCsi
from neoradium.csifeedback import CsiReport as RefReport

from neoradium_tpu.carrier import CarrierConfig
from neoradium_tpu.phy.csirs import CsiRsConfig
from neoradium_tpu.phy.csifeedback import CsiReport

rng = np.random.default_rng(3)

for n1, n2, ports, layers in [(2, 1, 4, [1, 2]), (4, 1, 8, [1, 2, 3, 4]),
                              (8, 1, 16, [1, 2]), (1, 1, 2, [1])]:  # ref 2-port L=2 enum crashes (csifeedback.py:617)
    refCar = Carrier(numRbs=24, spacing=30)
    refCsi = RefCsi(bwp=refCar.curBwp, numPorts=ports)
    ref = RefReport(refCsi, n1=n1, n2=n2)
    car = CarrierConfig(numRbs=24, spacing=30)
    csi = CsiRsConfig(carrier=car, numPorts=ports)
    mine = CsiReport(csi, n1=n1, n2=n2)
    for nl in layers:
        refIdx, refCb = [], []
        for i1, i2 in ref.type1SpIndexes(nl):
            refIdx.append((tuple(i1), i2))
            refCb.append(ref.getType1SpPrecoder(nl, i1, i2))
        refCb = np.asarray(refCb)
        if refCb.ndim == 3 and refCb.shape[1] != ports:
            refCb = refCb.reshape(len(refIdx), ports, -1)
        myIdx, myCb = mine.getCodebook(nl)
        myIdxT = [(tuple(i1), i2) for i1, i2 in myIdx]
        assert myIdxT == refIdx, (n1, n2, nl, len(myIdxT), len(refIdx))
        err = np.abs(myCb - refCb).max()
        assert err < 1e-12, (n1, n2, nl, err)
        print(f"n1={n1} n2={n2} ports={ports} L={nl}: Ncb={len(myIdx)} OK")

# end-to-end rank/PMI search comparison (4 ports, n1=2 n2=1)
refCar = Carrier(numRbs=24, spacing=30)
refCsi = RefCsi(bwp=refCar.curBwp, numPorts=4)
ref = RefReport(refCsi, n1=2, n2=1)
car = CarrierConfig(numRbs=24, spacing=30)
csi = CsiRsConfig(carrier=car, numPorts=4)
mine = CsiReport(csi, n1=2, n2=1)
L, K = 14, 24*12
for trial in range(3):
    h = (rng.normal(size=(L, K, 4, 4)) + 1j*rng.normal(size=(L, K, 4, 4)))/np.sqrt(2)
    refRank, refPmi, refSinr = ref.getBestRank(h, 0.1)
    myRank, myPmi, mySinr = mine.getBestRank(h, 0.1)
    assert refRank == myRank, (refRank, myRank)
    assert str(refPmi) == str(myPmi), (refPmi, myPmi)
    for a, b in zip(refSinr, mySinr):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-6
    print(f"trial {trial}: rank={myRank} pmi i1={myPmi[0]} OK")
print("CSI FEEDBACK MATCH OK")
