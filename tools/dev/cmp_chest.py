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
# ---- RBF / quadratic / 2-D interpolation variants (estimateChannelLsEx) ----
car = Carrier(numRbs=25, spacing=30)
p = PDSCH(car.curBwp, numLayers=2, modulation="QPSK")
p.setDMRS(configType=2, additionalPos=2)
g = p.getGrid()
L, K = g.shape[1], g.shape[2]
h = (rng.normal(size=(L, K, 3, 2)) + 1j * rng.normal(size=(L, K, 3, 2))) / np.sqrt(2)
rx = g.applyChannel(h)
noisy = rx.grid + 0.02 * (rng.normal(size=rx.shape) + 1j * rng.normal(size=rx.shape))
rxg = rx.clone(); rxg.grid = noisy

from neoradium_tpu.carrier import CarrierConfig
from neoradium_tpu.phy.pdsch import PdschConfig
from neoradium_tpu.rx.chest import LsChannelEstimator
myCar = CarrierConfig(numRbs=25, spacing=30)
myP = PdschConfig(myCar, numLayers=2, modulation="QPSK")
myP.setDMRS(configType=2, additionalPos=2)

for kernel, polarInt, int2d in [
        ("thin_plate_spline", False, False),
        ("thin_plate_spline", True, True),      # estimateChannelLsEx defaults
        ("multiquadric", False, False),
        ("quadratic", False, False),
        ("nearest", False, False),
]:
    # int2d with the reference's default neighbors=12 crashes in scipy
    # (singular local systems — see chest.py interp2d_matrix docstring);
    # the reference only works with neighbors=None there. Ours keeps the
    # default and falls back, so both sides must agree on neighbors=None.
    refH, refNv, _ = rxg.estimateChannelLsEx(
        p.dmrs, meanCdm=True, polarInt=polarInt, int2d=int2d, kernel=kernel,
        neighbors=None if int2d else 12)
    est = LsChannelEstimator(myP, slotNo=0, polarInt=polarInt, kernel=kernel,
                             int2d=int2d, neighbors=None if int2d else 12)
    myH, myNv = est.estimate(np.asarray(noisy))
    myH = np.asarray(myH); myNv = float(myNv)
    err = np.abs(myH - refH).max() / np.abs(refH).max()
    print(f"{kernel} polar={polarInt} int2d={int2d}: hEst rel err {err:.3e}"
          f"  noiseVar ref {refNv:.6e} mine {myNv:.6e}")
    # int2d solves a poorly-conditioned ~1.5k x 1.5k TPS system; extracting
    # the weight matrix vs solving per-value-vector agree to ~1e-9 only.
    assert err < (1e-7 if int2d else 1e-9), err
    assert abs(myNv - refNv) / refNv < 1e-2, (myNv, refNv)
print("CHEST MATCH OK")
