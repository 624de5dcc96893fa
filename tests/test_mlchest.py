"""ChEstNet (flax) channel-estimation CNN: shape contract, identity start,
and that a couple of training epochs reduce the denoising loss on a tiny
synthetic set (reference Playground/MLChEst pipeline)."""
import numpy as np
import jax
import jax.numpy as jnp

from neoradium_tpu.ml import (make_train_state, train_epoch, evaluate,
                              predict, complex_to_image, image_to_complex)


def _toy_data(n=24, L=6, K=24, seed=0):
    rng = np.random.default_rng(seed)
    # smooth complex "channels" + noise
    base = rng.normal(size=(n, 1, 1)) + np.cumsum(
        0.08 * rng.normal(size=(n, L, K)), axis=-1)
    clean = base + 1j * np.cumsum(0.08 * rng.normal(size=(n, L, K)), axis=-1)
    noisy = clean + 0.3 * (rng.normal(size=clean.shape)
                           + 1j * rng.normal(size=clean.shape))
    return complex_to_image(noisy), complex_to_image(clean)


def test_chestnet_trains():
    x, y = _toy_data()
    xT, yT = jnp.asarray(x), jnp.asarray(y)
    state = make_train_state(jax.random.PRNGKey(0), x.shape[1:],
                             numEpochs=3, stepsPerEpoch=3, lr=1e-3)
    # global residual: untrained net starts exactly at the LS input
    out0 = predict(state, xT)
    assert out0.shape == xT.shape
    assert np.allclose(np.asarray(out0), x, atol=1e-6)

    loss0 = evaluate(state, xT, yT)
    key = jax.random.PRNGKey(1)
    for _ in range(3):
        key, k = jax.random.split(key)
        state, _ = train_epoch(state, xT, yT, batchSize=8, key=k)
    loss1 = evaluate(state, xT, yT)
    assert loss1 < loss0

    # complex <-> image round trip
    h = np.asarray(image_to_complex(jnp.asarray(x)))
    assert np.allclose(complex_to_image(h), x)


def test_ml_estimator_plugs_into_link_sim():
    """MlChannelEstimator satisfies PdschLinkSim's pluggable-estimator
    contract (chEst=<object with estimate()>): identical output shapes to
    LS, identity behavior when untrained (global residual starts at the LS
    input), and the e2e slot runs and counts. This is the reference's
    SelfRefining receiver composition (MLChEstEvaluateBLER.ipynb)."""
    import neoradium_tpu as nr
    from neoradium_tpu.ml import MlChannelEstimator
    from neoradium_tpu.rx.chest import LsChannelEstimator
    from neoradium_tpu.sim.link import PdschLinkSim

    car = nr.CarrierConfig(numRbs=12, spacing=30)
    chan = nr.CdlChannel(car, "C", delaySpread=300, carrierFreq=4e9,
                         dopplerShift=5,
                         txAntenna=nr.AntennaPanel((2, 1), polarization="x"),
                         rxAntenna=nr.AntennaPanel((1, 1), polarization="x"))
    pdschKw = dict(numLayers=2, modulation="QPSK")
    dmrsKw = dict(configType=2, additionalPos=2)
    pdsch = nr.PdschConfig(car, **pdschKw)
    pdsch.setDMRS(**dmrsKw)
    ls = LsChannelEstimator(pdsch)
    state = make_train_state(jax.random.PRNGKey(0),
                             (car.symbolsPerSlot, car.numSubcarriers, 2),
                             numEpochs=1, stepsPerEpoch=1, lr=1e-3)
    ml = MlChannelEstimator(ls, state)

    # untrained net == exact LS passthrough, same shapes
    key = jax.random.PRNGKey(3)
    rx = (jax.random.normal(key, (2, car.symbolsPerSlot, car.numSubcarriers))
          + 1j * jax.random.normal(key, (2, car.symbolsPerSlot,
                                         car.numSubcarriers))).astype(jnp.complex64)
    hL, nvL = ls.estimate(rx)
    hM, nvM = ml.estimate(rx)
    assert hM.shape == hL.shape
    assert np.allclose(np.asarray(hM), np.asarray(hL), atol=1e-5)
    assert float(nvM) == float(nvL)

    sim = PdschLinkSim(car, pdschKw=pdschKw, dmrsKw=dmrsKw,
                       codeRate=490 / 1024, domain="freq",
                       channelModel=chan, chEst=ml)
    out = sim.make_trial_fn()(jax.random.PRNGKey(11), jnp.float32(20.0))
    assert int(out["blocks"]) == 1 and int(out["bitErrors"]) >= 0
