"""Dev-only: conditional-on-channel BLER comparison — our TX/RX chain driven
by REFERENCE-drawn channel realizations.

For N reference CDL seeds, compute the reference's precoded effective channel
G = H @ F and run our full freq-domain chain (encode/modulate/AWGN(useRxPower)
/MMSE/LLR/decode) with perfect CSI for M noise draws each.  If the resulting
ensemble BLER matches the reference's own counters (tests/golden/
bler_curve.npz) but differs from our-channel runs, the gap is in the channel
distribution; if it matches our-channel runs but not the reference counters,
the gap is in the conditional chain.
"""
import sys
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

N_CHAN = int(sys.argv[1]) if len(sys.argv) > 1 else 150
M_NOISE = int(sys.argv[2]) if len(sys.argv) > 2 else 8
SNR_DB = float(sys.argv[3]) if len(sys.argv) > 3 else 9.0

# ---------------- reference channels ----------------
sys.path.insert(0, "/root/reference")
from neoradium import Carrier, PDSCH, AntennaPanel as RefPanel, CdlChannel as RefCdl

carrier = Carrier(numRbs=51, spacing=30)
bwp = carrier.curBwp
rpdsch = PDSCH(bwp, interleavingBundleSize=0, numLayers=2,
               nID=carrier.cellId, modulation="16QAM")
rpdsch.setDMRS(prgSize=0, configType=2, additionalPos=2)

Gs = []
for i in range(N_CHAN):
    ch = RefCdl(bwp, "C", delaySpread=300, carrierFreq=4e9, dopplerShift=5,
                seed=1000 + i,
                txAntenna=RefPanel([2, 2], polarization="x"),
                rxAntenna=RefPanel([1, 1], polarization="x"))
    H = np.asarray(ch.getChannelMatrix())
    F = np.asarray(rpdsch.getPrecodingMatrix(H))
    Gs.append(H @ F)                       # (L, K, nr, nl)
Gs = jnp.asarray(np.stack(Gs), jnp.complex64)
print(f"built {N_CHAN} reference effective channels {Gs.shape}")

# ---------------- our chain ----------------
from neoradium_tpu.carrier import CarrierConfig
from neoradium_tpu.sim.link import PdschLinkSim

car = CarrierConfig(numRbs=51, spacing=30)
sim = PdschLinkSim(car, pdschKw=dict(numLayers=2, modulation="16QAM"),
                   dmrsKw=dict(configType=2, additionalPos=2),
                   codeRate=490 / 1024, domain="freq", decoderIter=8,
                   useRxPower=True)


def trial(key, G, snrDb):
    return sim.run_slot(key, snrDb, channel=G)


run = jax.jit(jax.vmap(jax.vmap(trial, in_axes=(0, None, None)),
                       in_axes=(0, 0, None)))
keys = jax.random.split(jax.random.PRNGKey(5), N_CHAN * M_NOISE)
keys = keys.reshape(N_CHAN, M_NOISE, 2)
m = jax.block_until_ready(run(keys, Gs, jnp.float32(SNR_DB)))
tbErr = int(m["blockErrors"].sum())
tbTot = int(m["blocks"].sum())
perChan = np.asarray(m["blockErrors"].sum(1)).ravel() / M_NOISE
print(f"our chain on ref channels @ {SNR_DB} dB: "
      f"TB-BLER {tbErr}/{tbTot} = {tbErr/tbTot:.4f}")
print(f"per-channel conditional BLER quartiles: "
      f"{np.percentile(perChan, [25, 50, 75])}")
cbE, cbT = int(m["cbErrors"].sum()), int(m["cbs"].sum())
print(f"CB-BLER {cbE}/{cbT} = {cbE/cbT:.4f}")
