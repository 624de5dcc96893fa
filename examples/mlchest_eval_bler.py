"""Self-refining receiver: ML channel estimation inside the e2e BLER loop.

TPU-native equivalent of the reference's
Playground/Research/SelfRefining/MLChEstEvaluateBLER.ipynb: train the
ChEstNet denoiser on (noisy LS, true channel) pairs, wrap it as a drop-in
estimator (``ml.chestnet.MlChannelEstimator``), and compare end-to-end
PDSCH BLER of LS vs ML-refined vs perfect channel estimation — the
network's NMSE win translating (or not) into link-level BLER is the whole
point of the composition.

Run: python examples/mlchest_eval_bler.py [numChannels] [numEpochs]
(CPU by default; NR_TPU=1 for TPU. Defaults are sized for a quick demo —
the reference's full experiment trains on 30 GB of data.)
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
from neoradium_tpu.ml import (MlChannelEstimator, complex_to_image,
                              make_train_state, train_epoch, predict)
from neoradium_tpu.rx.chest import LsChannelEstimator
from neoradium_tpu.sim.link import PdschLinkSim
from neoradium_tpu.sim.sweep import run_bler_sweep


def make_setup():
    carrier = nr.CarrierConfig(numRbs=12, spacing=30)
    pdschKw = dict(numLayers=2, modulation="QPSK")
    dmrsKw = dict(configType=2, additionalPos=2)
    mkChan = lambda: nr.CdlChannel(  # noqa: E731
        carrier, "C", delaySpread=300, carrierFreq=4e9, dopplerShift=5,
        txAntenna=nr.AntennaPanel((2, 1), polarization="x"),
        rxAntenna=nr.AntennaPanel((1, 1), polarization="x"))
    return carrier, pdschKw, dmrsKw, mkChan


def make_dataset(numChannels, carrier, pdschKw, dmrsKw, mkChan, seed=123):
    """(noisy LS estimate, true effective channel) images at ~5 dB."""
    pdsch = nr.PdschConfig(carrier, **pdschKw)
    pdsch.setDMRS(**dmrsKw)
    plan = pdsch.plan(0)
    est = LsChannelEstimator(pdsch)
    chan = mkChan()
    xs, ys = [], []
    for i in range(numChannels):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), i)
        k1, k2, k3 = jax.random.split(key, 3)
        state = chan.init_state(k1)
        H = chan.channel_matrix(state, 0)
        F = pdsch.precoder_from_mean(chan.mean_channel(state, 0))
        Heff = chan.effective_channel_matrix(state, 0, F)
        grid = plan.populate(jax.random.bernoulli(
            k2, 0.5, (plan.bitSizes[0],)).astype(jnp.int8))
        rx = nr.apply_channel_freq(grid, Heff)
        sigma = float(jnp.sqrt(jnp.var(rx) / nr.toLinear(5.0)))
        rx = rx + nr.PRNG.awgn_from_key(k3, rx.shape, sigma)
        hLs, _ = est.estimate(rx)
        for r in range(hLs.shape[-2]):
            for p in range(hLs.shape[-1]):
                xs.append(np.asarray(hLs[..., r, p]))
                ys.append(np.asarray(Heff[..., r, p]))
    return (jnp.asarray(complex_to_image(np.stack(xs))),
            jnp.asarray(complex_to_image(np.stack(ys))))


def main():
    numChannels = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    numEpochs = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    carrier, pdschKw, dmrsKw, mkChan = make_setup()

    print(f"dataset: {numChannels} channels ...")
    x, y = make_dataset(numChannels, carrier, pdschKw, dmrsKw, mkChan)
    state = make_train_state(jax.random.PRNGKey(0), x.shape[1:],
                             numEpochs, max(1, x.shape[0] // 16))
    for e in range(numEpochs):
        state, loss = train_epoch(state, x, y, 16,
                                  jax.random.fold_in(jax.random.PRNGKey(1), e))
    lsNmse = float(jnp.mean(jnp.abs(x - y) ** 2) / jnp.mean(jnp.abs(y) ** 2))
    mlNmse = float(jnp.mean((predict(state, x) - y) ** 2)
                   / jnp.mean(y ** 2))
    print(f"train NMSE: LS {nr.toDb(lsNmse):.1f} dB -> "
          f"ML {nr.toDb(mlNmse):.1f} dB")

    snrs = [2.0, 5.0, 8.0]
    trials = 48
    print(f"\ne2e BLER ({trials} trials/SNR):")
    print(f"{'SNR':>6} {'perfect':>9} {'LS':>9} {'ML':>9}")
    pdsch = nr.PdschConfig(carrier, **pdschKw)
    pdsch.setDMRS(**dmrsKw)
    estimators = {"perfect": "perfect", "ls": "ls",
                  "ml": MlChannelEstimator(LsChannelEstimator(pdsch), state)}
    curves = {}
    for name, chEst in estimators.items():
        sim = PdschLinkSim(
            carrier, pdschKw=dict(pdschKw), dmrsKw=dict(dmrsKw),
            codeRate=490 / 1024, domain="freq", channelModel=mkChan(),
            chEst=chEst)
        curves[name] = run_bler_sweep(sim.make_trial_fn(), snrs, trials,
                                      seed=9)["bler"]
    for i, s in enumerate(snrs):
        print(f"{s:6.1f} {curves['perfect'][i]:9.3f} "
              f"{curves['ls'][i]:9.3f} {curves['ml'][i]:9.3f}")


if __name__ == "__main__":
    main()
