"""HARQ throughput-anchor parity vs the reference notebook configuration.

Fixture ``tests/golden/harq_anchor.npz`` (tools/make_golden.py:harq_anchor)
holds TWO tiers:
  - the committed notebook output reproduced EXACTLY with the reference code
    (seed 123, 1000-slot continuous CDL-C 8x2 channel, 16 IR HARQ
    processes, perfect chEst, decoder numIter=2 — at 6 dB: txBits=30216000,
    throughput 10.80%, BLER 89.20%, meanTries 3.54), and
  - an 8-seed ENSEMBLE of such 1000-slot runs per SNR, which measures the
    anchor's own realization noise instead of guessing it.

Statistics: at 5 Hz Doppler a 1000-slot run spans only ~12 independent
channel windows and the per-window throughput at 6 dB is bimodal, so single
runs scatter widely — the measured ensemble std is ~5 points of throughput
at 6 dB (~4 at 10 dB). The quantitative gate is therefore a two-sample
z-test with EMPIRICAL variances on both sides: anchor SE from the 8-seed
ensemble, ours from the per-trial spread of the Monte-Carlo batch. The
sharp checks remain the STRUCTURAL ones (per-try success histogram shape,
meanTries, exact TBS -> txBits accounting), which pin the HARQ state
machine, rv sequence, soft-buffer combining, and per-try statistics.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neoradium_tpu.carrier import CarrierConfig
from neoradium_tpu.channels.antenna import AntennaPanel
from neoradium_tpu.channels.cdl import CdlChannel
from neoradium_tpu.sim.link import PdschLinkSim
from neoradium_tpu.sim.harq import PdschHarqSim, HarqConfig, harq_stats

pytestmark = pytest.mark.slow

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "harq_anchor.npz")
NUM_TRIALS = 24
NUM_SLOTS = 192


@pytest.fixture(scope="module")
def anchor():
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def ours():
    car = CarrierConfig(numRbs=51, spacing=30)
    ch = CdlChannel(car, "C", delaySpread=300, carrierFreq=4e9,
                    dopplerShift=5,
                    txAntenna=AntennaPanel((1, 4), polarization="x"),
                    rxAntenna=AntennaPanel((1, 1), polarization="+",
                                           beamWidth=(75, 360)),
                    rxOrientation=[0, 0, 0])
    sim = PdschLinkSim(car, pdschKw=dict(numLayers=2, modulation="16QAM"),
                       dmrsKw=dict(configType=2, additionalPos=2),
                       codeRate=490 / 1024, domain="freq", channelModel=ch,
                       chEst="perfect", decoderIter=2, useRxPower=True)
    hsim = PdschHarqSim(sim, HarqConfig(numProc=16, maxTries=4,
                                        harqType="IR"), numSlots=NUM_SLOTS)
    trial = jax.jit(jax.vmap(hsim.run_trial, in_axes=(0, None)))
    keys = jax.random.split(jax.random.PRNGKey(7), NUM_TRIALS)
    out = {}
    for snr in (6.0, 10.0):
        m = jax.block_until_ready(trial(keys, jnp.float32(snr)))
        m = {k: np.asarray(v) for k, v in m.items()}
        stats = harq_stats(m)
        # per-trial throughput/bler/meanTries for the empirical variance
        txB = m["txBits"].sum(-1).astype(float)
        rxB = m["rxBits"].sum(-1).astype(float)
        txBl = m["txBlocks"].sum(-1).astype(float)
        rxBl = m["rxBlocks"].sum(-1).astype(float)
        maxTries = m["txBlocks"].shape[-1]
        tries = ((m["rxBlocks"] * np.arange(maxTries)).sum(-1)
                 + m["numTimeouts"] * maxTries) \
            / np.maximum(rxBl + m["numTimeouts"], 1)
        stats["perTrial"] = np.stack(
            [100 * rxB / np.maximum(txB, 1),
             100 * (txBl - rxBl) / np.maximum(txBl, 1), tries], axis=1)
        out[snr] = stats
    return sim, out


def ref_stats(anchor, tag):
    return harq_stats({k: anchor[f"{tag}_{k}"]
                       for k in ("txBits", "rxBits", "txBlocks", "rxBlocks",
                                 "numTimeouts")})


def test_anchor_fixture_is_the_notebook_output(anchor):
    """The fixture must BE the committed notebook anchor (10.80% / 89.20%)."""
    s = ref_stats(anchor, "snr6")
    assert s["totalTxBits"] == 30216000
    assert round(s["throughput"], 2) == 10.80
    assert round(s["bler"], 2) == 89.20
    assert round(s["meanTries"], 2) == 3.54
    assert s["rxBlocksPerTry"][:2] == [0, 0]
    # ensemble sanity: seed-123 is its first row
    ens = anchor["snr6_ensemble"]
    assert ens.shape == (len(anchor["seeds"]), 3)
    assert round(float(ens[0, 0]), 2) == 10.80


def test_tbs_and_bit_accounting(ours):
    """Exact TBS parity: every transmission accounts 30216 bits."""
    sim, stats = ours
    assert sim.tbs == [30216]
    s = stats[6.0]
    assert s["totalTxBits"] == 30216 * s["totalTxBlocks"]
    assert s["totalTxBlocks"] == NUM_TRIALS * NUM_SLOTS


@pytest.mark.parametrize("snr,tag", [(6.0, "snr6"), (10.0, "snr10")])
def test_anchor_statistical_consistency(anchor, ours, snr, tag):
    """Two-sample z-gate with empirical variances on both sides.

    Anchor SE comes from the 8-seed reference ensemble (measured, not
    assumed); our SE from the per-trial spread of the Monte-Carlo batch.
    With the measured spreads this gates throughput/BLER at ~±6-8 absolute
    points (3 sigma) — tight enough to catch a 2x throughput regression at
    10 dB outright and a sign-consistent bias at both SNRs at 6 dB.
    """
    ens = anchor[f"{tag}_ensemble"]          # (seeds, 3): thr, bler, tries
    mine = ours[1][snr]["perTrial"]          # (trials, 3)
    for col, name, lim in ((0, "throughput", 3.0), (1, "bler", 3.0),
                           (2, "meanTries", 3.0)):
        ma, sa = float(ens[:, col].mean()), float(ens[:, col].std(ddof=1))
        mo, so = float(mine[:, col].mean()), float(mine[:, col].std(ddof=1))
        z = abs(ma - mo) / np.sqrt(sa ** 2 / len(ens) + so ** 2 / len(mine))
        assert z < lim, (snr, name, ma, mo, z)


def test_anchor_structural_agreement(anchor, ours):
    """Sharp shape checks: where in the try histogram successes occur."""
    _, stats = ours
    s6, s10 = stats[6.0], stats[10.0]
    # 6 dB: no success before the 3rd transmission on either side
    assert s6["rxBlocksPerTry"][0] == 0
    assert s6["rxBlocksPerTry"][1] <= 0.02 * max(s6["totalRxBlocks"], 1)
    assert s6["numTimeouts"] > 0
    # 10 dB: no first-try successes, bulk at the 2nd transmission
    assert s10["rxBlocksPerTry"][0] == 0
    assert s10["rxBlocksPerTry"][1] == max(s10["rxBlocksPerTry"])
    # monotone with SNR
    assert s10["throughput"] > s6["throughput"]
    assert s10["meanTries"] < s6["meanTries"]
