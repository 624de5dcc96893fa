"""Adaptive BLER sweep, Perfect vs LS channel estimation (mirrors reference
Playground/PDSCH/PDSCH-BLER.ipynb; SURVEY.md §3.2).

The SnrScheduler picks informative SNR points; each point runs a batch of
Monte-Carlo trials as ONE jitted, vmapped function (shardable over a device
mesh with sim.sweep helpers).

Run: python examples/pdsch_bler_sweep.py [numTrials]
"""
import sys
import time

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


def main():
    numTrials = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    carrier = nr.CarrierConfig(numRbs=51, spacing=30)
    chan = nr.CdlChannel(
        carrier, "C", delaySpread=300, carrierFreq=4e9, dopplerShift=5,
        txAntenna=nr.AntennaPanel((2, 4), polarization="x"),
        rxAntenna=nr.AntennaPanel((1, 2), polarization="x"))

    results = {}
    for chEst in ("perfect", "ls"):
        sim = nr.PdschLinkSim(carrier,
                              pdschKw=dict(numLayers=2, modulation="16QAM"),
                              dmrsKw=dict(configType=2, additionalPos=2),
                              codeRate=490 / 1024, domain="freq",
                              channelModel=chan, chEst=chEst, decoderIter=8)
        trial = jax.jit(jax.vmap(sim.make_trial_fn(), in_axes=(0, None)))
        keys = jax.random.split(jax.random.PRNGKey(123), numTrials)
        sched = nr.SnrScheduler(snr0=6, step=1.0)
        print(f"\n--- chEst={chEst} ---")
        print("SNR(dB)  BLER(%)  BER(%)   time(s)")
        for snrDb in sched:
            t0 = time.time()
            m = jax.block_until_ready(trial(keys, jnp.float32(snrDb)))
            bler = 100 * float(m["blockErrors"].sum()) / float(m["blocks"].sum())
            ber = 100 * float(m["bitErrors"].sum()) / float(m["bits"].sum())
            print(f"{snrDb:7.1f}  {bler:7.2f}  {ber:7.3f}  {time.time()-t0:6.2f}")
            sched.setData(bler, ber)
        results[chEst] = sched.getSnrsAndData()

    for chEst, (snrs, blers, bers) in results.items():
        print(f"\n{chEst}: SNRs {snrs.tolist()}")
        print(f"{chEst}: BLER {blers.tolist()}")


if __name__ == "__main__":
    main()
