"""Dev-only: statistical BLER-curve comparison vs the reference.

Runs the reference's PDSCH-BLER pipeline (CDL-C, 16QAM, R=490/1024,
freq-domain, perfect + LS estimation) for N slots per SNR point, and our
framework with the same configuration for a larger trial count, then
compares BLER estimates within binomial confidence bounds.
"""
import sys
import time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

NUM_REF_SLOTS = 60
NUM_MY_TRIALS = 240
SNRS = [3.0, 5.0, 7.0, 9.0]
CHEST = sys.argv[1] if len(sys.argv) > 1 else "perfect"

# ---------------- reference ----------------
sys.path.insert(0, "/root/reference")
from neoradium import Carrier, PDSCH, AntennaPanel as RefPanel, CdlChannel as RefCdl
from neoradium import random as refrandom
from neoradium.ldpc import LdpcEncoder

refBler = []
for snrDb in SNRS:
    refrandom.setSeed(123)
    carrier = Carrier(numRbs=51, spacing=30)
    bwp = carrier.curBwp
    pdsch = PDSCH(bwp, interleavingBundleSize=0, numLayers=2,
                  nID=carrier.cellId, modulation="16QAM")
    pdsch.setDMRS(prgSize=0, configType=2, additionalPos=2)
    enc = LdpcEncoder(baseGraphNo=1, modulation="16QAM", txLayers=2,
                      targetRate=490/1024)
    dec = enc.getDecoder()
    carrier.slotNo = 0
    blockErrors = totalBlocks = 0
    t0 = time.time()
    for slotNo in range(NUM_REF_SLOTS):
        # fresh channel realization per slot: sample the ENSEMBLE BLER like
        # our independent Monte-Carlo trials (the reference notebook's slot
        # loop at 5 Hz Doppler would sample ~one frozen realization)
        channel = RefCdl(bwp, "C", delaySpread=300, carrierFreq=4e9,
                         dopplerShift=5, seed=1000 + slotNo,
                         txAntenna=RefPanel([2, 2], polarization="x"),
                         rxAntenna=RefPanel([1, 1], polarization="x"))
        grid = pdsch.getGrid()
        tbs = pdsch.getTxBlockSize(490/1024)
        txBlock = refrandom.bits(tbs[0])
        numBits = pdsch.getBitSizes(grid)
        rm = enc.getRateMatchedCodeBlocks(txBlock, numBits[0])
        pdsch.populateGrid(grid, rm)
        idx = pdsch.getReIndexes(grid, "PDSCH")
        H = channel.getChannelMatrix()
        F = pdsch.getPrecodingMatrix(H)
        pre = grid.precode(F)
        rxGrid = pre.applyChannel(H).addNoise(snrDb=snrDb, useRxPower=True)
        if CHEST == "perfect":
            hEst = H @ F[None, ...]
        else:
            hEst, _ = rxGrid.estimateChannelLS(pdsch.dmrs, polarInt=False,
                                               kernel="linear")
        eqGrid, scales = rxGrid.equalize(hEst)
        llrs = pdsch.getLLRsFromGrid(eqGrid, idx, scales)
        rec = dec.recoverRate(llrs[0], tbs[0])
        decoded = dec.decode(rec, numIter=8)
        _, crcMatch = dec.checkCrcAndMerge(decoded)
        blockErrors += len(crcMatch) - sum(crcMatch)
        totalBlocks += len(crcMatch)
    refBler.append(blockErrors / totalBlocks)
    print(f"ref  SNR {snrDb}: BLER {refBler[-1]:.3f} ({time.time()-t0:.0f}s)")

# ---------------- ours ----------------
from neoradium_tpu.carrier import CarrierConfig
from neoradium_tpu.channels.antenna import AntennaPanel
from neoradium_tpu.channels.cdl import CdlChannel
from neoradium_tpu.sim.link import PdschLinkSim

car = CarrierConfig(numRbs=51, spacing=30)
chan = CdlChannel(car, "C", delaySpread=300, carrierFreq=4e9, dopplerShift=5,
                  txAntenna=AntennaPanel((2, 2), polarization="x"),
                  rxAntenna=AntennaPanel((1, 1), polarization="x"))
sim = PdschLinkSim(car, pdschKw=dict(numLayers=2, modulation="16QAM"),
                   dmrsKw=dict(configType=2, additionalPos=2),
                   codeRate=490/1024, domain="freq",
                   channelModel=chan, chEst=CHEST, decoderIter=8)
trial = jax.jit(jax.vmap(sim.make_trial_fn(), in_axes=(0, None)))
keys = jax.random.split(jax.random.PRNGKey(0), NUM_MY_TRIALS)
myBler = []
for snrDb in SNRS:
    m = jax.block_until_ready(trial(keys, jnp.float32(snrDb)))
    myBler.append(float(m["blockErrors"].sum()) / float(m["blocks"].sum()))
    print(f"mine SNR {snrDb}: BLER {myBler[-1]:.3f}")

# ---------------- compare (binomial z-test per point) ----------------
print(f"\n{'SNR':>5} {'ref':>7} {'mine':>7} {'z':>6}")
allOk = True
for s, pr, pm in zip(SNRS, refBler, myBler):
    p = (pr * NUM_REF_SLOTS + pm * NUM_MY_TRIALS) / (NUM_REF_SLOTS + NUM_MY_TRIALS)
    se = np.sqrt(max(p * (1 - p), 1e-9) * (1/NUM_REF_SLOTS + 1/NUM_MY_TRIALS))
    z = abs(pr - pm) / se
    ok = z < 3.0
    allOk &= ok
    print(f"{s:5.1f} {pr:7.3f} {pm:7.3f} {z:6.2f} {'OK' if ok else 'MISMATCH'}")
assert allOk, "BLER curves statistically inconsistent"
print(f"\nBLER CURVE MATCH OK ({CHEST} chEst)")
