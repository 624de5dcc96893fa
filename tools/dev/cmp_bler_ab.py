"""Dev-only A/B: identical chain, channels drawn from ours vs the reference.

Builds N effective channels G = H @ F(H) from (A) our CdlChannel with jax
randomness and (B) the reference CdlChannel with its RNG, then runs OUR
freq-domain chain (perfect CSI, useRxPower AWGN) for M noise draws on each.
Any BLER difference is then purely the channel ensemble.
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

from neoradium_tpu.carrier import CarrierConfig
from neoradium_tpu.channels.antenna import AntennaPanel
from neoradium_tpu.channels.cdl import CdlChannel
from neoradium_tpu.phy.pdsch import PdschConfig
from neoradium_tpu.sim.link import PdschLinkSim

car = CarrierConfig(numRbs=51, spacing=30)
chan = CdlChannel(car, "C", delaySpread=300, carrierFreq=4e9, dopplerShift=5,
                  txAntenna=AntennaPanel((2, 2), polarization="x"),
                  rxAntenna=AntennaPanel((1, 1), polarization="x"))
mp = PdschConfig(car, numLayers=2, modulation="16QAM")
mp.setDMRS(configType=2, additionalPos=2)

GsA = []
for i in range(N_CHAN):
    st = chan.init_state(jax.random.PRNGKey(77000 + i))
    H = chan.channel_matrix(st, 0)
    F = mp.precoding_matrix_traced(H)
    GsA.append(np.asarray(H @ F[None, None]))
GsA = jnp.asarray(np.stack(GsA), jnp.complex64)
print(f"A: built {N_CHAN} of OUR effective channels {GsA.shape}")

sim = PdschLinkSim(car, pdschKw=dict(numLayers=2, modulation="16QAM"),
                   dmrsKw=dict(configType=2, additionalPos=2),
                   codeRate=490 / 1024, domain="freq", decoderIter=8,
                   useRxPower=True)
run = jax.jit(jax.vmap(jax.vmap(
    lambda k, G, s: sim.run_slot(k, s, channel=G),
    in_axes=(0, None, None)), in_axes=(0, 0, None)))
keys = jax.random.split(jax.random.PRNGKey(5), N_CHAN * M_NOISE)
keys = keys.reshape(N_CHAN, M_NOISE, 2)
m = jax.block_until_ready(run(keys, GsA, jnp.float32(SNR_DB)))
eA, tA = int(m["blockErrors"].sum()), int(m["blocks"].sum())
print(f"A (our channels) @ {SNR_DB} dB: TB-BLER {eA}/{tA} = {eA/tA:.4f}")

# ---------------- B: reference channels, same chain ----------------
sys.path.insert(0, "/root/reference")
from neoradium import Carrier, PDSCH, AntennaPanel as RefPanel, CdlChannel as RefCdl

carrier = Carrier(numRbs=51, spacing=30)
bwp = carrier.curBwp
rpdsch = PDSCH(bwp, interleavingBundleSize=0, numLayers=2,
               nID=carrier.cellId, modulation="16QAM")
rpdsch.setDMRS(prgSize=0, configType=2, additionalPos=2)
GsB = []
for i in range(N_CHAN):
    ch = RefCdl(bwp, "C", delaySpread=300, carrierFreq=4e9, dopplerShift=5,
                seed=1000 + i,
                txAntenna=RefPanel([2, 2], polarization="x"),
                rxAntenna=RefPanel([1, 1], polarization="x"))
    H = np.asarray(ch.getChannelMatrix())
    F = np.asarray(rpdsch.getPrecodingMatrix(H))
    GsB.append(H @ F)
GsB = jnp.asarray(np.stack(GsB), jnp.complex64)
m = jax.block_until_ready(run(keys, GsB, jnp.float32(SNR_DB)))
eB, tB = int(m["blockErrors"].sum()), int(m["blocks"].sum())
print(f"B (ref channels) @ {SNR_DB} dB: TB-BLER {eB}/{tB} = {eB/tB:.4f}")

p = (eA + eB) / (tA + tB)
z = abs(eA / tA - eB / tB) / np.sqrt(max(p * (1 - p), 1e-9) * (1 / tA + 1 / tB))
print(f"z = {z:.2f}  ({'consistent' if z < 3 else 'ENSEMBLES DIFFER'})")

def cb(mm):
    return int(mm["cbErrors"].sum()), int(mm["cbs"].sum())
mA = jax.block_until_ready(run(keys, GsA, jnp.float32(SNR_DB)))
mB = jax.block_until_ready(run(keys, GsB, jnp.float32(SNR_DB)))
eA2, tA2 = cb(mA); eB2, tB2 = cb(mB)
print(f"CB-BLER A(ours) {eA2}/{tA2}={eA2/tA2:.4f}  B(ref) {eB2}/{tB2}={eB2/tB2:.4f}")
