"""Statistical BLER-curve parity gate vs the reference — the product claim.

Fixture ``tests/golden/bler_curve.npz`` holds the reference's error counters
from a 300-slot ensemble run per SNR point (fresh seeded CDL-C realization
per slot — an i.i.d. Bernoulli sample of the ensemble BLER, reference
pipeline per Playground/PDSCH/PDSCH-BLER.ipynb; generator:
tools/make_golden.py:bler_curve).  SNR points straddle each estimator's
TB-level waterfall so every point is statistically informative.

Our side runs the identical configuration (CDL-C 300ns, 4 GHz, 5 Hz Doppler,
8x2 antennas, 2 layers, 16QAM, R=490/1024, useRxPower AWGN, numIter=8) as
independent Monte-Carlo trials, and each point must agree with the reference
under a two-proportion z-test (z < 3) at BOTH the transport-block and the
code-block level.  A waterfall shift of ~0.3 dB turns this test red.

Statistics note: a TB's four code blocks occupy time quarters of the slot
and the 5 Hz channel is static across it, so their errors are ~90%
correlated (measured fate-sharing 3.6/4 CBs per failed TB on both sides).
The CB-level z-test therefore uses the fully-clustered design effect
(independent units = transport blocks, not code blocks); a naive
independent-Bernoulli variance would be ~3.5x overconfident and flag pure
sampling noise as mismatch.

Cross-implementation statistical consistency was additionally verified with
channel-ensemble KS tests (tools/dev/cmp_chan_ensemble.py: power/capacity
distributions, subband-selectivity spread), an A/B run of the identical
chain over both implementations' channel draws (tools/dev/cmp_bler_ab.py:
TB z = 1.4 at the waterfall center), our chain on reference-drawn channels
(tools/dev/cmp_bler_conditional.py: TB 0.503 / CB 0.468 vs reference
0.497 / 0.451 @ 9 dB), and a same-rxGrid receiver comparison
(tools/dev/cmp_rx_conditional.py: identical per-CB CRC outcomes on 40
slots).
"""
import os

import numpy as np
import pytest

from neoradium_tpu.carrier import CarrierConfig
from neoradium_tpu.channels.antenna import AntennaPanel
from neoradium_tpu.channels.cdl import CdlChannel
from neoradium_tpu.sim.link import PdschLinkSim
from neoradium_tpu.sim.sweep import run_bler_sweep

pytestmark = pytest.mark.slow

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "bler_curve.npz")
NUM_TRIALS = 128


@pytest.fixture(scope="module")
def fx():
    return np.load(GOLDEN)


def make_sim(chEst):
    car = CarrierConfig(numRbs=51, spacing=30)
    chan = CdlChannel(car, "C", delaySpread=300, carrierFreq=4e9,
                      dopplerShift=5,
                      txAntenna=AntennaPanel((2, 2), polarization="x"),
                      rxAntenna=AntennaPanel((1, 1), polarization="x"))
    return PdschLinkSim(car, pdschKw=dict(numLayers=2, modulation="16QAM"),
                        dmrsKw=dict(configType=2, additionalPos=2),
                        codeRate=490 / 1024, domain="freq", channelModel=chan,
                        chEst=chEst, decoderIter=8, useRxPower=True)


def two_prop_z(e1, n1, e2, n2, deff=1.0):
    """Two-proportion z; ``deff`` is the clustered design effect (scales
    both variances by deff, i.e. effective n = n/deff)."""
    p = (e1 + e2) / (n1 + n2)
    se = np.sqrt(max(p * (1 - p), 1e-12) * deff * (1 / n1 + 1 / n2))
    return abs(e1 / n1 - e2 / n2) / se


@pytest.mark.parametrize("chEst", ["perfect", "ls"])
def test_bler_curve_parity(fx, chEst):
    snrs = fx[f"{chEst}_snrs"]
    counts = fx[f"{chEst}_counts"]        # rows: tbErr, tbTot, cbErr, cbTot
    res = run_bler_sweep(make_sim(chEst).make_trial_fn(), list(snrs),
                         numTrials=NUM_TRIALS)
    cbPerTb = int(counts[0][3] // counts[0][1])
    for i, snr in enumerate(snrs):
        tbE, tbN, cbE, cbN = counts[i]
        zTb = two_prop_z(tbE, tbN, res["blockErrors"][i], res["blocks"][i])
        # CB errors are clustered within TBs (see module docstring): use the
        # full design effect m = CBs-per-TB (conservative: ICC <= 1).
        zCb = two_prop_z(cbE, cbN, res["cbErrors"][i], res["cbs"][i],
                         deff=cbPerTb)
        assert zTb < 3.0, (
            f"{chEst} @ {snr} dB TB-BLER mismatch: ref {tbE}/{tbN}="
            f"{tbE/tbN:.3f} vs ours {res['blockErrors'][i]}/{res['blocks'][i]}"
            f"={res['blockErrors'][i]/res['blocks'][i]:.3f} (z={zTb:.2f})")
        assert zCb < 3.0, (
            f"{chEst} @ {snr} dB CB-BLER mismatch: ref {cbE}/{cbN}="
            f"{cbE/cbN:.3f} vs ours {res['cbErrors'][i]}/{res['cbs'][i]}"
            f"={res['cbErrors'][i]/res['cbs'][i]:.3f} (z={zCb:.2f})")
        # monotone waterfall sanity on our side
    bler = [e / max(n, 1) for e, n in zip(res["blockErrors"], res["blocks"])]
    assert all(a >= b - 0.05 for a, b in zip(bler, bler[1:]))


# --------------------------------------------------------------------------
# TIME-domain channel path parity: same gate, through OFDM + fractional-delay
# filtering + timing sync (fixture: tools/make_golden.py:bler_curve_td,
# the MLChestDataGen.ipynb pipeline with the nFFT MATLAB noise convention).
# --------------------------------------------------------------------------
GOLDEN_TD = os.path.join(os.path.dirname(__file__), "golden",
                         "bler_curve_td.npz")


@pytest.mark.parametrize("chEst", ["perfect", "ls"])
def test_bler_curve_parity_time_domain(chEst):
    """TD pipeline (OFDM + FIR channel + sync) parity, perfect AND LS
    estimation — the LS case is exactly the reference MLChestDataGen.ipynb
    pipeline config (BASELINE.md row 2)."""
    fx = np.load(GOLDEN_TD)
    car = CarrierConfig(numRbs=51, spacing=30)
    chan = CdlChannel(car, "C", delaySpread=300, carrierFreq=4e9,
                      dopplerShift=5,
                      txAntenna=AntennaPanel((2, 2), polarization="x"),
                      rxAntenna=AntennaPanel((1, 1), polarization="x"))
    sim = PdschLinkSim(car, pdschKw=dict(numLayers=2, modulation="16QAM"),
                       dmrsKw=dict(configType=2, additionalPos=2),
                       codeRate=490 / 1024, domain="time", channelModel=chan,
                       chEst=chEst, decoderIter=8, useRxPower=False)
    res = run_bler_sweep(sim.make_trial_fn(), list(fx[f"{chEst}_snrs"]),
                         numTrials=NUM_TRIALS)
    counts = fx[f"{chEst}_counts"]
    cbPerTb = int(counts[0][3] // counts[0][1])
    for i, snr in enumerate(fx[f"{chEst}_snrs"]):
        tbE, tbN, cbE, cbN = counts[i]
        zTb = two_prop_z(tbE, tbN, res["blockErrors"][i], res["blocks"][i])
        zCb = two_prop_z(cbE, cbN, res["cbErrors"][i], res["cbs"][i],
                         deff=cbPerTb)
        assert zTb < 3.0, (
            f"TD @ {snr} dB TB-BLER: ref {tbE}/{tbN}={tbE/tbN:.3f} vs ours "
            f"{res['blockErrors'][i]}/{res['blocks'][i]}"
            f"={res['blockErrors'][i]/res['blocks'][i]:.3f} (z={zTb:.2f})")
        assert zCb < 3.0, (
            f"TD @ {snr} dB CB-BLER: ref {cbE}/{cbN}={cbE/cbN:.3f} vs ours "
            f"{res['cbErrors'][i]}/{res['cbs'][i]}"
            f"={res['cbErrors'][i]/res['cbs'][i]:.3f} (z={zCb:.2f})")


# --------------------------------------------------------------------------
# Second independent anchor: TDL-B 100ns 4x4 with Medium Kronecker MIMO
# correlation, 2 layers, 64QAM R=567/1024, perfect chEst — exercises the
# Kronecker correlation path and the 64QAM LLR chain end to end (fixture:
# tools/make_golden.py:bler_tdl4x4). Both sides draw their own channel
# ensembles; the gate is the clustered two-proportion z-test as above.
# --------------------------------------------------------------------------
def test_bler_parity_tdl_4x4_64qam():
    from neoradium_tpu.channels.tdl import TdlChannel
    fx = np.load(os.path.join(os.path.dirname(__file__), "golden",
                              "bler_tdl4x4.npz"))
    car = CarrierConfig(numRbs=51, spacing=30)
    chan = TdlChannel(car, "B", delaySpread=100, dopplerShift=5,
                      txAntennaCount=4, rxAntennaCount=4,
                      mimoCorrelation="Medium")
    sim = PdschLinkSim(car, pdschKw=dict(numLayers=2, modulation="64QAM"),
                       dmrsKw=dict(configType=2, additionalPos=2),
                       codeRate=567 / 1024, domain="freq", channelModel=chan,
                       chEst="perfect", decoderIter=8, useRxPower=True)
    snrs = list(fx["snrs"])
    res = run_bler_sweep(sim.make_trial_fn(), snrs, numTrials=NUM_TRIALS)
    counts = fx["counts"]
    cbPerTb = int(counts[0][3] // counts[0][1])
    for i, snr in enumerate(snrs):
        tbE, tbN, cbE, cbN = counts[i]
        zTb = two_prop_z(tbE, tbN, res["blockErrors"][i], res["blocks"][i])
        zCb = two_prop_z(cbE, cbN, res["cbErrors"][i], res["cbs"][i],
                         deff=cbPerTb)
        assert zTb < 3.0, (
            f"TDL4x4 @ {snr} dB TB mismatch: ref {tbE}/{tbN} vs ours "
            f"{res['blockErrors'][i]}/{res['blocks'][i]} (z={zTb:.2f})")
        assert zCb < 3.0, (
            f"TDL4x4 @ {snr} dB CB mismatch: ref {cbE}/{cbN} vs ours "
            f"{res['cbErrors'][i]}/{res['cbs'][i]} (z={zCb:.2f})")
    bler = [e / max(n, 1) for e, n in zip(res["blockErrors"], res["blocks"])]
    assert all(a >= b - 0.05 for a, b in zip(bler, bler[1:]))


# --------------------------------------------------------------------------
# Dual-codeword anchor: CDL-C 8x6, numLayers=6 (2 codewords x 3 layers),
# 16QAM R=490/1024, LS estimation — the only statistical gate through the
# 2-CW TX/RX split (fixture: tools/make_golden.py:bler_2cw; counters are
# per codeword, 2 TB trials per slot on both sides).
# --------------------------------------------------------------------------
def test_bler_parity_dual_codeword():
    fx = np.load(os.path.join(os.path.dirname(__file__), "golden",
                              "bler_2cw.npz"))
    car = CarrierConfig(numRbs=51, spacing=30)
    chan = CdlChannel(car, "C", delaySpread=300, carrierFreq=4e9,
                      dopplerShift=5,
                      txAntenna=AntennaPanel((2, 2), polarization="x"),
                      rxAntenna=AntennaPanel((1, 3), polarization="x"))
    sim = PdschLinkSim(car, pdschKw=dict(numLayers=6, modulation="16QAM"),
                       dmrsKw=dict(configType=2, additionalPos=2),
                       codeRate=490 / 1024, domain="freq", channelModel=chan,
                       chEst="ls", decoderIter=8, useRxPower=True)
    snrs = list(fx["snrs"])
    res = run_bler_sweep(sim.make_trial_fn(), snrs, numTrials=NUM_TRIALS)
    counts = fx["counts"]
    # cluster unit = SLOT: the two codewords share the channel realization
    # AND each CW's CBs share it; full design effect = CBs per slot
    cbPerSlot = int(counts[0][3] // (counts[0][1] // 2))
    for i, snr in enumerate(snrs):
        tbE, tbN, cbE, cbN = counts[i]
        # TB (codeword) errors also pair within a slot: deff = 2
        zTb = two_prop_z(tbE, tbN, res["blockErrors"][i], res["blocks"][i],
                         deff=2)
        zCb = two_prop_z(cbE, cbN, res["cbErrors"][i], res["cbs"][i],
                         deff=cbPerSlot)
        assert zTb < 3.0, (
            f"2CW @ {snr} dB TB mismatch: ref {tbE}/{tbN} vs ours "
            f"{res['blockErrors'][i]}/{res['blocks'][i]} (z={zTb:.2f})")
        assert zCb < 3.0, (
            f"2CW @ {snr} dB CB mismatch: ref {cbE}/{cbN} vs ours "
            f"{res['cbErrors'][i]}/{res['cbs'][i]} (z={zCb:.2f})")
