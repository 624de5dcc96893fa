"""Dev-only: compare LsChannelEstimator vs reference estimateChannelLS."""
import sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, "/root/reference")
from neoradium import Carrier, PDSCH

rng = np.random.default_rng(11)

for tag, carkw, pkw, dkw in [
    ("2L", dict(numRbs=25, spacing=30), dict(numLayers=2, modulation="QPSK"),
     dict(configType=2, additionalPos=2)),
    ("1L", dict(numRbs=12, spacing=15), dict(numLayers=1, modulation="16QAM"),
     dict()),
    ("4Ld", dict(numRbs=20, spacing=30), dict(numLayers=4, modulation="16QAM"),
     dict(configType=1, symbols=2)),
]:
    car = Carrier(**carkw)
    p = PDSCH(car.curBwp, **pkw)
    p.setDMRS(**dkw)
    g = p.getGrid()
    nl = pkw["numLayers"]
    nr = nl + 1
    L, K = g.shape[1], g.shape[2]
    h = (rng.normal(size=(L, K, nr, nl)) + 1j * rng.normal(size=(L, K, nr, nl))) / np.sqrt(2)
    rx = g.applyChannel(h)
    noisy = rx.grid + 0.02 * (rng.normal(size=rx.shape) + 1j * rng.normal(size=rx.shape))
    rxg = rx.clone(); rxg.grid = noisy

    refH, refNv = rxg.estimateChannelLS(p.dmrs)

    from neoradium_tpu.carrier import CarrierConfig
    from neoradium_tpu.phy.pdsch import PdschConfig
    from neoradium_tpu.rx.chest import LsChannelEstimator
    myCar = CarrierConfig(**carkw)
    myP = PdschConfig(myCar, **pkw)
    myP.setDMRS(**dkw)
    est = LsChannelEstimator(myP, slotNo=0)
    myH, myNv = est.estimate(np.asarray(noisy))
    myH = np.asarray(myH); myNv = float(myNv)
    err = np.abs(myH - refH).max() / np.abs(refH).max()
    print(f"{tag}: hEst rel err {err:.3e}  noiseVar ref {refNv:.6e} mine {myNv:.6e}")
    assert err < 1e-9, err
    # multi-CDM-group noiseVar differs slightly: reference uses stale portKs
    # (see chest.py module docstring)
    assert abs(myNv - refNv) / refNv < 1e-2, (myNv, refNv)
print("CHEST MATCH OK")
