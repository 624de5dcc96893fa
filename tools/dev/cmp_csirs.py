"""Dev-only: compare CSI-RS grid population vs reference."""
import sys
import numpy as np
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference")
from neoradium import Carrier, CsiRsConfig as RefCfg
from neoradium.csirs import CsiRsSet as RefSet, CsiRs as RefRs

from neoradium_tpu.carrier import CarrierConfig
from neoradium_tpu.phy.csirs import CsiRsConfig, CsiRsSet, CsiRs
from neoradium_tpu.grid import HostGrid

cases = [
    dict(numPorts=1, density=3),                      # row 1 (TRS)
    dict(numPorts=2),                                 # row 3
    dict(numPorts=4, freqMap="010"),                  # row 4
    dict(numPorts=8, cdmSize=4, freqMap="010100"[:6]),# row 8? freqMap 2 ks
    dict(numPorts=8),                                 # row 7 default
    dict(numPorts=12, cdmSize=4),                     # row 10
    dict(numPorts=16, cdmSize=4),                     # row 12
    dict(numPorts=24, cdmSize=8),                     # row 15
    dict(numPorts=32, cdmSize=2, density=0.5),        # row 16, half density
    dict(numPorts=1, density=1, powerDb=3, scramblingID=41, symbols=[9]),
]
for slotNo in (0, 4):
    for kw in cases:
        refCar = Carrier(numRbs=25, spacing=30)
        for _ in range(slotNo):
            refCar.goNext()
        ref = RefCfg(bwp=refCar.curBwp, **kw)
        refGrid = refCar.curBwp.createGrid(ref.numPorts)
        ref.populateGrid(refGrid)

        car = CarrierConfig(numRbs=25, spacing=30)
        cfg = CsiRsConfig(carrier=car, **kw)
        mine = cfg.pilot_grid(slotNo)
        assert mine.shape == refGrid.shape, (kw, mine.shape, refGrid.shape)
        err = np.abs(mine - refGrid.grid).max()
        assert err < 1e-12, (kw, slotNo, err)
        # RE type placement identical
        hg = HostGrid(*mine.shape)
        cfg.populate_host_grid(hg, slotNo)
        refTypes = refGrid.reTypeIds != 0
        assert np.array_equal(hg.reTypeIds != 0, refTypes), kw
print("CSIRS MATCH OK")
