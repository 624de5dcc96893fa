"""Closed-loop CSI -> PDSCH link adaptation (sim/adaptive.py).

The reference leaves this loop open (its CQI path is a stub,
csifeedback.py:383-385); SURVEY.md §3.4 defines the CSI-report + PDSCH
composition that AdaptivePdschLink closes. Quick tier: one drop exercises
the full report -> rank/PMI/MCS -> delivered-bits plumbing and the MCS
monotonicity in SNR. Slow tier: the link-adaptation win — adaptive
throughput beats every fixed MCS across an SNR sweep over paired drops.
"""
import numpy as np
import jax
import pytest

import neoradium_tpu as nr
from neoradium_tpu.sim import AdaptivePdschLink


@pytest.fixture(scope="module")
def link():
    car = nr.CarrierConfig(numRbs=24, spacing=30)
    chan = nr.CdlChannel(
        car, "B", delaySpread=100, dopplerShift=20, carrierFreq=4e9,
        txAntenna=nr.AntennaPanel((1, 4), polarization="x"),
        rxAntenna=nr.AntennaPanel((1, 2), polarization="|"))
    return AdaptivePdschLink(
        car, chan, reportKw=dict(n1=4, n2=1, cqiTable=2),
        dmrsKw=dict(configType=2, additionalPos=1), chEst="ls")


def test_adaptive_drop_plumbing(link):
    """One drop: the report feeds rank/PMI/MCS; high SNR delivers the full
    TBS; the backed-off MCS choice is monotone in SNR; the precoder fold
    covers the carrier."""
    r = link.run_drop(7, 16.0, numTrials=4)
    assert r["mcs"] is not None and r["rank"] >= 1
    assert r["report"]["cqi"] >= 1 and "effSinr" in r["report"]
    assert r["bitsPerSlot"] == pytest.approx(float(np.mean(r["tbs"])), rel=0.5)
    assert r["bitsPerSlot"] > 0

    # same drop at a much lower SNR must not pick a higher efficiency
    lo = link.run_drop(7, -6.0, numTrials=4)
    from neoradium_tpu.phy.csifeedback import CQI_TABLES
    effs = {(m, c): e for m, c, e in CQI_TABLES[2][1:] if m is not None}
    if lo["mcs"] is not None:
        assert effs[lo["mcs"]] <= effs[r["mcs"]]


def test_fixed_mcs_paired_drops(link):
    """fixedMcs reuses the same channel drops (paired design) and the same
    reported rank/precoder, so the comparison isolates the MCS choice."""
    a = link.run_drop(3, 4.0, numTrials=4, fixedMcs=("QPSK", 449))
    b = link.run_drop(3, 4.0, numTrials=4, fixedMcs=("QPSK", 449))
    assert a["bitsPerSlot"] == b["bitsPerSlot"]          # deterministic
    assert a["rank"] == b["rank"]
    # QPSK-449 at 4 dB with rank-1 beamforming is far inside the waterfall
    assert a["bitsPerSlot"] == pytest.approx(np.mean(a["tbs"]), rel=1e-6)


@pytest.mark.slow
def test_adaptation_beats_fixed_mcs():
    """The closed loop's point: across an SNR range, CSI-driven MCS
    adaptation delivers more total throughput than ANY single fixed MCS —
    the aggressive fixed choice dies at low SNR, the conservative one caps
    at high SNR. Paired channel drops (same seed) make the comparison
    exact rather than statistical across channels; the margin required
    (>5%) is far above the noise-trial wobble at these operating points."""
    car = nr.CarrierConfig(numRbs=24, spacing=30)
    chan = nr.CdlChannel(
        car, "B", delaySpread=100, dopplerShift=20, carrierFreq=4e9,
        txAntenna=nr.AntennaPanel((1, 4), polarization="x"),
        rxAntenna=nr.AntennaPanel((1, 2), polarization="|"))
    link = AdaptivePdschLink(
        car, chan, reportKw=dict(n1=4, n2=1, cqiTable=2),
        dmrsKw=dict(configType=2, additionalPos=1), chEst="ls")
    snrs = (-8.0, -2.0, 4.0, 10.0, 16.0)
    adaptive = link.run(snrs, numDrops=4, numTrials=8, seed=1)
    tputA = sum(r["bitsPerSlot"] for r in adaptive)
    # adaptive never collapses at either end
    assert all(r["bitsPerSlot"] > 0 for r in adaptive)
    for mcs in [("QPSK", 449), ("16QAM", 616), ("64QAM", 466)]:
        fixed = link.run(snrs, numDrops=4, numTrials=8, seed=1, fixedMcs=mcs)
        tputF = sum(r["bitsPerSlot"] for r in fixed)
        assert tputA > 1.05 * tputF, (mcs, tputA, tputF)


def test_adaptive_with_type2_codebook():
    """The closed loop composes with the functional Type-2 codebook
    (bestPmiForRank delegates to the quantized Type-2 search): the
    beam-combining precoder reconstructs from the reported PMI and the
    loop delivers at high SNR."""
    car = nr.CarrierConfig(numRbs=24, spacing=30)
    chan = nr.CdlChannel(
        car, "B", delaySpread=100, dopplerShift=20, carrierFreq=4e9,
        txAntenna=nr.AntennaPanel((1, 4), polarization="x"),
        rxAntenna=nr.AntennaPanel((1, 2), polarization="|"))
    link = AdaptivePdschLink(
        car, chan,
        reportKw=dict(n1=4, n2=1, cqiTable=2, codebookType="Type2",
                      numBeams=2, pskSize=8),
        dmrsKw=dict(configType=2, additionalPos=1), chEst="ls")
    r = link.run_drop(3, 14.0, numTrials=4)
    assert r["mcs"] is not None and r["bitsPerSlot"] > 0
    i1 = r["report"]["pmi"][0]
    assert len(i1[0]) == 2 and isinstance(i1[1], int)   # i11=[q1,q2], i12
