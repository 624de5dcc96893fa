"""ML channel estimation end-to-end: dataset -> train -> evaluate.

TPU-native equivalent of the reference's Playground/MLChEst notebooks
(MLChestDataGen / MLChestTrainTorch / MLChestEvaluateTorch): generate
(noisy LS estimate, true channel) pairs from random CDL channels, train the
ChEstNet residual CNN (flax/optax) to denoise the LS estimate, and compare
NMSE of raw LS vs the neural estimator.

Run: python examples/ml_chest_train.py [numChannels] [numEpochs]
(CPU by default; set NR_TPU=1 to train on the TPU.)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if not os.environ.get("NR_TPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

import neoradium_tpu as nr
from neoradium_tpu.ml import (make_train_state, train_epoch, evaluate,
                              predict, complex_to_image)


def make_dataset(numChannels: int, seed: int = 123):
    """(noisy LS estimates, true effective channels), one sample per
    (channel, rxAnt, layer) subchannel image."""
    carrier = nr.CarrierConfig(numRbs=12, spacing=30)
    pdsch = nr.PdschConfig(carrier, numLayers=2, modulation="QPSK")
    pdsch.setDMRS(configType=2, additionalPos=2)
    plan = pdsch.plan(0)
    est = nr.LsChannelEstimator(pdsch)
    gen = nr.CdlChannel.getChanGen(
        numChannels, carrier, profiles="ABC", delaySpread=(10, 300),
        ueSpeed=(2, 15), seed=seed,
        txAntenna=nr.AntennaPanel((2, 1), polarization="x"),
        rxAntenna=nr.AntennaPanel((1, 1), polarization="x"))

    key = jax.random.PRNGKey(seed)
    xs, ys = [], []
    for H in gen:
        H = jnp.asarray(H)
        F = pdsch.precoding_matrix_traced(H)
        hEff = np.asarray(H @ F[None, None])                  # (L, K, nr, nl)
        rx = nr.apply_channel_freq(nr.precode(jnp.asarray(plan.pilotGrid), F), H)
        key, k1, k2 = jax.random.split(key, 3)
        snrDb = float(jax.random.uniform(k1, minval=-5.0, maxval=5.0))
        sigma = nr.noise_std_for_grid_snr(snrDb, rx.shape[-3])
        hEst, _ = est.estimate(rx + nr.PRNG.awgn_from_key(k2, rx.shape, sigma))
        xs.append(np.asarray(hEst))
        ys.append(hEff)
    x = np.stack(xs)                                          # (N, L, K, nr, nl)
    y = np.stack(ys)
    n, L, K = x.shape[0], x.shape[1], x.shape[2]
    x = np.moveaxis(x.reshape(n, L, K, -1), -1, 1).reshape(-1, L, K)
    y = np.moveaxis(y.reshape(n, L, K, -1), -1, 1).reshape(-1, L, K)
    return complex_to_image(x), complex_to_image(y)


def main():
    numChannels = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    numEpochs = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    x, y = make_dataset(numChannels)
    nTrain = int(0.8 * len(x))
    xT, yT = jnp.asarray(x[:nTrain]), jnp.asarray(y[:nTrain])
    xV, yV = jnp.asarray(x[nTrain:]), jnp.asarray(y[nTrain:])
    print(f"dataset: {len(xT)} train / {len(xV)} val samples, "
          f"shape {x.shape[1:]}")

    batch = min(32, len(xT))
    key = jax.random.PRNGKey(0)
    state = make_train_state(key, x.shape[1:], numEpochs,
                             stepsPerEpoch=len(xT) // batch, lr=(1e-3, 1e-5))
    print("epoch   train MSE    val MSE")
    for ep in range(numEpochs):
        key, k = jax.random.split(key)
        state, trainLoss = train_epoch(state, xT, yT, batch, k)
        print(f"{ep + 1:5d}   {trainLoss:9.6f}  {evaluate(state, xV, yV):9.6f}")

    def nmse(est, ref):
        return float(np.sum(np.abs(est - ref) ** 2) / np.sum(np.abs(ref) ** 2))

    nnOut = np.asarray(predict(state, xV))
    lsNmse = nmse(np.asarray(xV), np.asarray(yV))
    nnNmse = nmse(nnOut, np.asarray(yV))
    print(f"val NMSE: raw LS {lsNmse:.4f} -> ChEstNet {nnNmse:.4f} "
          f"({10 * np.log10(lsNmse / max(nnNmse, 1e-12)):.1f} dB better)")


if __name__ == "__main__":
    main()
