"""Dev-only: compare PTRS grid population vs reference."""
import sys
import numpy as np
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference")
from neoradium import Carrier, PDSCH

from neoradium_tpu.carrier import CarrierConfig
from neoradium_tpu.phy.pdsch import PdschConfig

cases = [
    (dict(numRbs=25, spacing=30), dict(numLayers=1, modulation="16QAM", rnti=17),
     dict(configType=1), dict(timeDensity=1, freqDensity=2)),
    (dict(numRbs=25, spacing=30), dict(numLayers=2, modulation="16QAM", rnti=3),
     dict(configType=2, additionalPos=1), dict(timeDensity=2, freqDensity=4, reOffset=1)),
    # NOTE: mcsi/iMCS/nRBi configs crash in the reference (dmrs.py:643
    # raises when mcsi IS a list — inverted check); tested as roundtrip below.
    (dict(numRbs=51, spacing=30), dict(numLayers=2, modulation="64QAM", rnti=900),
     dict(configType=1, additionalPos=2),
     dict(timeDensity=2, freqDensity=2, portSet=[0, 1])),
    (dict(numRbs=10, spacing=30), dict(numLayers=1, modulation="QPSK", rnti=5),
     dict(), dict(timeDensity=4, freqDensity=2, epreRatio=1)),
]
for carkw, pkw, dkw, tkw in cases:
    refCar = Carrier(**carkw)
    refP = PDSCH(refCar.curBwp, **pkw)
    refP.setDMRS(**dkw)
    refP.setPTRS(**tkw)
    refG = refP.getGrid()

    car = CarrierConfig(**carkw)
    p = PdschConfig(car, **pkw)
    p.setDMRS(**dkw)
    p.setPTRS(**tkw)
    plan = p.plan(0)

    refPtrs = refG.reTypeIds == refG.retNameToId["PTRS"]
    myPtrs = plan.reTypeIds == 4  # RET["PTRS"]
    assert np.array_equal(refPtrs, myPtrs), (tkw, refPtrs.sum(), myPtrs.sum())
    err = np.abs(plan.pilotGrid.astype(np.complex128) - refG.grid).max()
    assert err < 1e-6, (tkw, err)
    print(tkw, "PTRS REs:", int(myPtrs.sum()), "OK")
print("PTRS MATCH OK")
