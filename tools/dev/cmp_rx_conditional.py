"""Dev-only: run BOTH receivers on the IDENTICAL received grid.

Generates reference slots (reference channel + reference noise + reference
TX bits) at a given SNR, then feeds the exact same rxGrid / H / F / payload
to our receiver (perfect-CSI MMSE, max-log LLRs, layered min-sum).  Compares
per-code-block CRC outcomes slot by slot, and for the first diverging slot
dumps intermediate tensor differences (eqGrid, llrScales, LLRs).
"""
import sys
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

N_SLOTS = int(sys.argv[1]) if len(sys.argv) > 1 else 60
SNR_DB = float(sys.argv[2]) if len(sys.argv) > 2 else 9.0

sys.path.insert(0, "/root/reference")
from neoradium import Carrier, PDSCH, AntennaPanel as RefPanel, CdlChannel as RefCdl
from neoradium import random as refrandom
from neoradium.ldpc import LdpcEncoder

from neoradium_tpu.carrier import CarrierConfig
from neoradium_tpu.phy.pdsch import PdschConfig
from neoradium_tpu.rx.equalize import mmse_equalize

refrandom.setSeed(123)
carrier = Carrier(numRbs=51, spacing=30)
bwp = carrier.curBwp
pdsch = PDSCH(bwp, interleavingBundleSize=0, numLayers=2,
              nID=carrier.cellId, modulation="16QAM")
pdsch.setDMRS(prgSize=0, configType=2, additionalPos=2)
enc = LdpcEncoder(baseGraphNo=1, modulation="16QAM", txLayers=2,
                  targetRate=490 / 1024)
dec = enc.getDecoder()

car = CarrierConfig(numRbs=51, spacing=30)
mp = PdschConfig(car, numLayers=2, modulation="16QAM")
mp.setDMRS(configType=2, additionalPos=2)
plan = mp.plan(0)
from neoradium_tpu.coding.ldpc import LdpcConfig, LdpcDecoder
# NOTE: the reference's getTxBlockSize depends on dmrs.dataREs, which is
# only filled in by getGrid()/allocateResources — call getGrid() FIRST or
# the TBS comes out wrong (25608 instead of 30216 for this config).
pdsch.getGrid()
tbsRef = pdsch.getTxBlockSize(490 / 1024)[0]

myCfg = LdpcConfig(int(tbsRef), baseGraphNo=1, modulation="16QAM",
                   txLayers=2, targetRate=490 / 1024,
                   g=int(pdsch.getBitSizes(pdsch.getGrid())[0]))
myDec = LdpcDecoder(myCfg)

nDiff = 0
refCbE = myCbE = 0
shown = False
for slotNo in range(N_SLOTS):
    channel = RefCdl(bwp, "C", delaySpread=300, carrierFreq=4e9,
                     dopplerShift=5, seed=1000 + slotNo,
                     txAntenna=RefPanel([2, 2], polarization="x"),
                     rxAntenna=RefPanel([1, 1], polarization="x"))
    grid = pdsch.getGrid()
    txBlock = refrandom.bits(tbsRef)
    numBits = pdsch.getBitSizes(grid)
    rm = enc.getRateMatchedCodeBlocks(txBlock, numBits[0])
    pdsch.populateGrid(grid, rm)
    idx = pdsch.getReIndexes(grid, "PDSCH")
    H = channel.getChannelMatrix()
    F = pdsch.getPrecodingMatrix(H)
    pre = grid.precode(F)
    rxGrid = pre.applyChannel(H).addNoise(snrDb=SNR_DB, useRxPower=True)

    # ---------------- reference RX ----------------
    hEst = H @ F[None, ...]
    eqGrid, scales = rxGrid.equalize(hEst)
    llrs = pdsch.getLLRsFromGrid(eqGrid, idx, scales)
    rec = dec.recoverRate(llrs[0], tbsRef)
    decoded = dec.decode(rec, numIter=8)
    _, crcMatch = dec.checkCrcAndMerge(decoded)
    refOk = np.asarray(crcMatch, bool)

    # ---------------- our RX on the SAME rxGrid ----------------
    rx = jnp.asarray(np.asarray(rxGrid.grid), jnp.complex64)
    hEff = jnp.asarray(np.asarray(hEst), jnp.complex64)
    nv = jnp.float32(rxGrid.noiseVar)
    myEq, myScales = mmse_equalize(rx, hEff, nv)
    myLlrs = plan.extract_llrs(myEq, myScales, nv)
    recM, _ = myDec.recover_rate(myLlrs[0], 0, None)
    decM = myDec.decode(recM, numIter=8)
    _, myOk = myDec.check_crc_and_merge(decM)
    myOk = np.asarray(myOk, bool)

    refCbE += int((~refOk).sum())
    myCbE += int((~myOk).sum())
    if not np.array_equal(refOk, myOk):
        nDiff += 1
        if not shown:
            shown = True
            print(f"slot {slotNo}: ref cbOk {refOk.tolist()} vs mine "
                  f"{myOk.tolist()}")
            eqR = np.asarray(eqGrid.grid)
            eqM = np.asarray(myEq)
            print("  eqGrid rel err:",
                  np.abs(eqR - eqM).max() / max(np.abs(eqR).max(), 1e-12))
            sR = np.asarray(scales)
            sM = np.asarray(myScales)
            print("  scales rel err:",
                  np.abs(sR - sM).max() / max(np.abs(sR).max(), 1e-12))
            lR = np.asarray(llrs[0]).ravel()
            lM = np.asarray(myLlrs[0]).ravel()
            print("  llr shapes:", lR.shape, lM.shape)
            n = min(lR.size, lM.size)
            print("  llr rel err:",
                  np.abs(lR[:n] - lM[:n]).max() / max(np.abs(lR).max(), 1e-12))
            rR = np.asarray(rec).ravel()
            rM2 = np.asarray(recM).ravel()
            print("  recovered rel err:",
                  np.abs(rR[: rM2.size] - rM2).max() / max(np.abs(rR).max(), 1e-12))

print(f"\nslots with differing per-CB outcomes: {nDiff}/{N_SLOTS}")
print(f"total CB errors: ref {refCbE}  mine {myCbE} "
      f"(of {N_SLOTS * myCfg.numCodeBlocks})")
