"""Dev-only: compare CSI-RS-based LS estimation vs reference."""
import sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")
from neoradium import Carrier, CsiRsConfig as RefCsiCfg

from neoradium_tpu.carrier import CarrierConfig
from neoradium_tpu.phy.csirs import CsiRsConfig
from neoradium_tpu.rx.chest import LsChannelEstimator

rng = np.random.default_rng(13)
for kw, nr in [(dict(numPorts=8), 2), (dict(numPorts=4, freqMap="010"), 3),
               (dict(numPorts=2), 1), (dict(numPorts=16, cdmSize=4), 2)]:
    refCar = Carrier(numRbs=24, spacing=30)
    refCfg = RefCsiCfg(bwp=refCar.curBwp, **kw)
    nt = refCfg.numPorts
    refGrid = refCar.curBwp.createGrid(nt)
    refCfg.populateGrid(refGrid)
    L, K = refGrid.shape[1], refGrid.shape[2]
    h = (rng.normal(size=(L, K, nr, nt)) + 1j * rng.normal(size=(L, K, nr, nt))) / np.sqrt(2)
    rx = refGrid.applyChannel(h)
    noisy = rx.grid + 0.03 * (rng.normal(size=rx.shape) + 1j * rng.normal(size=rx.shape))
    rxg = rx.clone(); rxg.grid = noisy
    refH, refNv = rxg.estimateChannelLS(refCfg)

    car = CarrierConfig(numRbs=24, spacing=30)
    cfg = CsiRsConfig(carrier=car, **kw)
    est = LsChannelEstimator.from_csirs(cfg)
    myH, myNv = est.estimate(jnp.asarray(noisy))
    err = np.abs(np.asarray(myH) - refH).max() / np.abs(refH).max()
    nvErr = abs(float(myNv) - refNv) / refNv
    print(kw, "hEst err:", err, "nv:", refNv, float(myNv))
    assert err < 1e-9, err
    # multi-CDM-group noiseVar deviates (reference stale-portKs bug,
    # see chest.py docstring); single-group configs must match tightly
    tol = 1e-6 if kw.get("numPorts", 1) <= 2 else 0.1
    assert nvErr < tol, (float(myNv), refNv)
print("CSIRS CHEST MATCH OK")
