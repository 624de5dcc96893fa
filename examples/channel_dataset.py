"""ML channel-estimation dataset generation (mirrors reference
Playground/MLChEst/MLChestDataGen.ipynb): pairs of (noisy LS estimate,
true channel) from random CDL channels.

Run: python examples/channel_dataset.py [numChannels]
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


def main():
    numChannels = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    carrier = nr.CarrierConfig(numRbs=12, spacing=30)
    pdsch = nr.PdschConfig(carrier, numLayers=2, modulation="QPSK")
    pdsch.setDMRS(configType=2, additionalPos=2)
    plan = pdsch.plan(0)
    est = nr.LsChannelEstimator(pdsch)

    gen = nr.CdlChannel.getChanGen(
        numChannels, carrier, profiles="ABC", delaySpread=(10, 300),
        ueSpeed=(2, 15), seed=123,
        txAntenna=nr.AntennaPanel((1, 1), polarization="x"),
        rxAntenna=nr.AntennaPanel((1, 1), polarization="x"))

    key = jax.random.PRNGKey(0)
    noisyEsts, trueChans = [], []
    for i, H in enumerate(gen):
        F = pdsch.precoding_matrix_traced(jnp.asarray(H))
        Heff = np.asarray(jnp.asarray(H) @ F[None, None])
        pilots = plan.populate(jnp.zeros((plan.bitSizes[0],), jnp.int8))
        rx = nr.apply_channel_freq(nr.precode(
            jnp.asarray(plan.pilotGrid), F), jnp.asarray(H))
        key, k = jax.random.split(key)
        rx = rx + nr.PRNG.awgn_from_key(k, rx.shape, 0.05)
        hEst, _ = est.estimate(rx)
        noisyEsts.append(np.asarray(hEst))
        trueChans.append(Heff)
    x = np.stack(noisyEsts)
    y = np.stack(trueChans)
    nmse = np.sum(np.abs(x - y) ** 2) / np.sum(np.abs(y) ** 2)
    print(f"dataset: X {x.shape} (noisy LS), Y {y.shape} (true), "
          f"LS NMSE {nmse:.4f}")
    np.savez_compressed("chest_dataset.npz", x=x, y=y)
    print("saved to chest_dataset.npz")


if __name__ == "__main__":
    main()
