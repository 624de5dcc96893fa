"""Dev-only: compare the CDL channel ENSEMBLE statistics vs the reference.

The per-realization channel matrices are bit-exact given identical ray
coupling / initial phases (tests/test_channels.py), but the Monte-Carlo BLER
also depends on the *distribution* induced by each implementation's own RNG.
This script draws N independent realizations from both (each with its own
native randomness), computes scalar per-realization statistics

  * total mean power  mean|H|^2 over (L, K, nr, nt)
  * wideband 2-layer capacity  mean_K log2 det(I2 + snr/2 * G^H G),
    G = H_k F with F the wideband SVD precoder (what BLER actually sees)

and runs a two-sample KS test between the two samples of each statistic.
"""
import sys
import numpy as np
from scipy import stats

sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 300
SNR_DB = 9.0
snr = 10 ** (SNR_DB / 10)

# ---------------- reference ----------------
sys.path.insert(0, "/root/reference")
from neoradium import Carrier, PDSCH, AntennaPanel as RefPanel, CdlChannel as RefCdl

carrier = Carrier(numRbs=51, spacing=30)
bwp = carrier.curBwp
pdsch = PDSCH(bwp, interleavingBundleSize=0, numLayers=2,
              nID=carrier.cellId, modulation="16QAM")
pdsch.setDMRS(prgSize=0, configType=2, additionalPos=2)


def cap_stats(H, F):
    # H: (L, K, nr, nt) or (K, nr, nt); F: (nt, 2)
    H = np.asarray(H)
    if H.ndim == 4:
        H = H.reshape(-1, *H.shape[-2:])
    G = H @ F              # (LK, nr, 2)
    A = np.swapaxes(G.conj(), -1, -2) @ G          # (LK, 2, 2)
    I = np.eye(2)
    cap = np.mean(np.log2(np.abs(np.linalg.det(I + (snr / 2) * A))))
    return float(np.mean(np.abs(H) ** 2)), cap


refPow, refCap = [], []
for i in range(N):
    ch = RefCdl(bwp, "C", delaySpread=300, carrierFreq=4e9, dopplerShift=5,
                seed=1000 + i,
                txAntenna=RefPanel([2, 2], polarization="x"),
                rxAntenna=RefPanel([1, 1], polarization="x"))
    H = ch.getChannelMatrix()          # (L, K, nr, nt)
    F = pdsch.getPrecodingMatrix(np.asarray(H))
    p, c = cap_stats(H, np.asarray(F))
    refPow.append(p)
    refCap.append(c)
print(f"ref : pow mean {np.mean(refPow):.4f}+-{np.std(refPow):.4f}  "
      f"cap mean {np.mean(refCap):.4f}+-{np.std(refCap):.4f}")

# ---------------- ours ----------------
from neoradium_tpu.carrier import CarrierConfig
from neoradium_tpu.channels.antenna import AntennaPanel
from neoradium_tpu.channels.cdl import CdlChannel
from neoradium_tpu.phy.pdsch import PdschConfig

car = CarrierConfig(numRbs=51, spacing=30)
chan = CdlChannel(car, "C", delaySpread=300, carrierFreq=4e9, dopplerShift=5,
                  txAntenna=AntennaPanel((2, 2), polarization="x"),
                  rxAntenna=AntennaPanel((1, 1), polarization="x"))
mp = PdschConfig(car, numLayers=2, modulation="16QAM")
mp.setDMRS(configType=2, additionalPos=2)

myPow, myCap = [], []
for i in range(N):
    st = chan.init_state(jax.random.PRNGKey(77000 + i))
    H = np.asarray(chan.channel_matrix(st, 0))
    F = np.asarray(mp.precoding_matrix_traced(jnp.asarray(H)))
    p, c = cap_stats(H, F)
    myPow.append(p)
    myCap.append(c)
print(f"mine: pow mean {np.mean(myPow):.4f}+-{np.std(myPow):.4f}  "
      f"cap mean {np.mean(myCap):.4f}+-{np.std(myCap):.4f}")

for name, a, b in [("power", refPow, myPow), ("capacity", refCap, myCap)]:
    ks, p = stats.ks_2samp(a, b)
    print(f"KS {name:9s}: stat {ks:.4f}  p {p:.4f}  "
          f"{'OK' if p > 0.01 else 'MISMATCH'}")
