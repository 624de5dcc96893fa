"""HARQ throughput-anchor parity vs the reference notebook configuration.

Fixture ``tests/golden/harq_anchor.npz`` reproduces the committed output of
``Playground/PDSCH/PDSCH-Throughput.ipynb`` EXACTLY with the reference code
(tools/make_golden.py:harq_anchor; seed 123): 1000-slot continuous CDL-C
8x2 channel, 16 IR HARQ processes, perfect chEst, decoder numIter=2 —
at 6 dB: txBits=30216000, throughput 10.80%, BLER 89.20%, meanTries 3.54.

Statistics note: the anchor is ONE 1000-slot channel realization at 5 Hz
Doppler (coherence ~80 slots -> ~12 independent channel windows), and the
per-window throughput at 6 dB is bimodal (0% or 25%): the realization noise
of the anchor itself is ~±4% absolute (measured per-trial std 10.9% over
128-slot trials).  The quantitative gates below use 3-sigma bounds combining
the anchor's realization noise with our Monte-Carlo spread; the sharp checks
are the STRUCTURAL ones (per-try success histogram shape, meanTries, and the
exact TBS -> txBits accounting), which pin the HARQ state machine, rv
sequence, soft-buffer combining, and per-try statistics bookkeeping.
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
NUM_TRIALS = 16
NUM_SLOTS = 128


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
        out[snr] = harq_stats({k: np.asarray(v) for k, v in m.items()})
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


def test_tbs_and_bit_accounting(ours):
    """Exact TBS parity: every transmission accounts 30216 bits."""
    sim, stats = ours
    assert sim.tbs == [30216]
    s = stats[6.0]
    assert s["totalTxBits"] == 30216 * s["totalTxBlocks"]
    assert s["totalTxBlocks"] == NUM_TRIALS * NUM_SLOTS


@pytest.mark.parametrize("snr,tag", [(6.0, "snr6"), (10.0, "snr10")])
def test_anchor_statistical_consistency(anchor, ours, snr, tag):
    ref = ref_stats(anchor, tag)
    mine = ours[1][snr]
    # 3-sigma combined bounds (see module docstring): anchor realization
    # noise ~4 + our 16-trial spread ~2.7 -> ~14.5 absolute on percentages.
    assert abs(mine["throughput"] - ref["throughput"]) < 14.5, (mine, ref)
    assert abs(mine["bler"] - ref["bler"]) < 14.5, (mine, ref)
    assert abs(mine["meanTries"] - ref["meanTries"]) < 0.8, (mine, ref)


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
