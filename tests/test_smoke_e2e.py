"""Quick-tier end-to-end smoke: one AWGN PDSCH config, two SNR points.

The only e2e decode in the ``-m "not slow"`` tier — proves the full
TX->channel->RX->LDPC pipeline composes (the statistical BLER-parity and
HARQ suites are slow-tier; see tests/test_link_e2e.py)."""
import pytest

from neoradium_tpu.carrier import CarrierConfig
from neoradium_tpu.sim.link import PdschLinkSim
from neoradium_tpu.sim.sweep import run_bler_sweep


def test_awgn_e2e_smoke():
    sim = PdschLinkSim(CarrierConfig(numRbs=25, spacing=30),
                       pdschKw=dict(numLayers=1, modulation="QPSK"),
                       dmrsKw=dict(), codeRate=449 / 1024, domain="freq")
    res = run_bler_sweep(sim.make_trial_fn(), [1.0, 3.0], numTrials=4)
    assert res["bler"][0] == 1.0          # below the waterfall
    assert res["bler"][1] == 0.0          # above it
    assert res["ber"][1] == 0.0
