"""HARQ throughput simulation (mirrors reference
Playground/PDSCH/PDSCH-Throughput.ipynb): IR-HARQ with 8 processes over a
slot sequence with slot-continuous CDL fading, vmapped over trials.

Run: python examples/pdsch_throughput_harq.py [numTrials] [numSlots]
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# Examples default to CPU for fast startup; set NR_TPU=1 to run on TPU.
if not os.environ.get("NR_TPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

import neoradium_tpu as nr
from neoradium_tpu.sim.harq import PdschHarqSim, HarqConfig


def main():
    numTrials = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    numSlots = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    carrier = nr.CarrierConfig(numRbs=51, spacing=30)
    chan = nr.CdlChannel(
        carrier, "C", delaySpread=300, carrierFreq=4e9, dopplerShift=5,
        txAntenna=nr.AntennaPanel((2, 2), polarization="x"),   # 8 TX
        rxAntenna=nr.AntennaPanel((1, 1), polarization="x"))   # 2 RX
    sim = nr.PdschLinkSim(carrier,
                          pdschKw=dict(numLayers=2, modulation="16QAM"),
                          dmrsKw=dict(configType=2, additionalPos=2),
                          codeRate=490 / 1024, domain="freq",
                          channelModel=chan, chEst="ls", decoderIter=6)
    hsim = PdschHarqSim(sim, HarqConfig(numProc=8, maxTries=4, harqType="IR"),
                        numSlots=numSlots)
    trial = jax.jit(jax.vmap(hsim.run_trial, in_axes=(0, None)))
    keys = jax.random.split(jax.random.PRNGKey(123), numTrials)
    print("SNR(dB)  Throughput(%)  BLER(%)  meanTries")
    for snrDb in (2.0, 6.0, 10.0, 14.0, 18.0):
        m = jax.block_until_ready(trial(keys, jnp.float32(snrDb)))
        s = PdschHarqSim.stats({k: np.asarray(v) for k, v in m.items()})
        print(f"{snrDb:7.1f}  {s['throughput']:13.2f}  {s['bler']:7.2f}"
              f"  {s['meanTries']:.2f}")


if __name__ == "__main__":
    main()
