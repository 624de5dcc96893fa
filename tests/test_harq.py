"""HARQ entity tests: scan-based multi-process IR/CC retransmission.

Validated behaviors (reference harq.py semantics):
- high SNR: every block decodes on try 0, 100% throughput;
- low SNR: every process exhausts maxTries -> timeouts, 0% throughput;
- IR soft combining: mid SNR shows successes at try >= 1 (retransmission
  combining makes initially-failed blocks decodable).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neoradium_tpu.carrier import CarrierConfig
from neoradium_tpu.channels.antenna import AntennaPanel
from neoradium_tpu.channels.cdl import CdlChannel
from neoradium_tpu.sim.link import PdschLinkSim
from neoradium_tpu.sim.harq import PdschHarqSim, HarqConfig


@pytest.fixture(scope="module")
def harq_sim():
    car = CarrierConfig(numRbs=4, spacing=30)
    ch = CdlChannel(car, "C", delaySpread=100, dopplerShift=20,
                    txAntenna=AntennaPanel((2, 1), polarization="x"),
                    rxAntenna=AntennaPanel((1, 1), polarization="x"))
    sim = PdschLinkSim(car, pdschKw=dict(numLayers=2, modulation="16QAM"),
                       dmrsKw=dict(configType=2, additionalPos=1),
                       codeRate=490 / 1024, domain="freq",
                       channelModel=ch, chEst="perfect", decoderIter=6)
    hsim = PdschHarqSim(sim, HarqConfig(numProc=4, maxTries=4, harqType="IR"),
                        numSlots=16)
    trial = jax.jit(jax.vmap(hsim.run_trial, in_axes=(0, None)))
    return hsim, trial


def _stats(trial, keys, snr):
    m = trial(keys, jnp.float32(snr))
    return PdschHarqSim.stats({k: np.asarray(v) for k, v in m.items()})


def test_high_snr_first_try(harq_sim):
    hsim, trial = harq_sim
    s = _stats(trial, jax.random.split(jax.random.PRNGKey(0), 2), 30.0)
    assert s["throughput"] == 100.0
    assert s["txBlocksPerTry"][1] == 0          # no retransmissions


def test_low_snr_timeouts(harq_sim):
    hsim, trial = harq_sim
    s = _stats(trial, jax.random.split(jax.random.PRNGKey(0), 2), -15.0)
    assert s["throughput"] == 0.0
    # every process cycles through all 4 tries then times out
    assert s["txBlocksPerTry"] == [8, 8, 8, 8]
    assert s["numTimeouts"] == 8
    assert s["meanTries"] == 4.0


def test_ir_combining_recovers_blocks(harq_sim):
    """At mid SNR some blocks fail on try 0 but succeed after combining."""
    hsim, trial = harq_sim
    keys = jax.random.split(jax.random.PRNGKey(3), 8)
    for snr in (12.0, 9.0, 6.0):
        s = _stats(trial, keys, snr)
        if sum(s["rxBlocksPerTry"][1:]) > 0:
            return
    pytest.fail("no retransmission successes at any mid SNR")


def test_harq_config_validation():
    with pytest.raises(ValueError):
        HarqConfig(numProc=0)
    with pytest.raises(ValueError):
        HarqConfig(harqType="XX")
    assert HarqConfig(harqType="CC").rv_for_try(2) == 0
    assert HarqConfig(harqType="IR").rv_for_try(1) == 2


def test_dual_codeword_harq():
    """numLayers > 4 -> 2 codewords, each with its own HARQ state machine."""
    car = CarrierConfig(numRbs=4, spacing=30)
    ch = CdlChannel(car, "C", delaySpread=100, dopplerShift=20,
                    txAntenna=AntennaPanel((2, 2), polarization="x"),
                    rxAntenna=AntennaPanel((2, 2), polarization="x"))
    sim = PdschLinkSim(car, pdschKw=dict(numLayers=6, modulation="QPSK"),
                       dmrsKw=dict(configType=2, symbols=2),
                       codeRate=308 / 1024, domain="freq",
                       channelModel=ch, chEst="perfect", decoderIter=6)
    assert sim.pdsch.numCW == 2
    hsim = PdschHarqSim(sim, HarqConfig(numProc=2, maxTries=2, harqType="IR"),
                        numSlots=4)
    trial = jax.jit(hsim.run_trial)
    hi = trial(jax.random.PRNGKey(0), jnp.float32(30.0))
    s = PdschHarqSim.stats({k: np.asarray(v) for k, v in hi.items()})
    assert s["throughput"] == 100.0
    assert int(np.asarray(hi["txBlocks"]).sum()) == 8   # 4 slots x 2 CWs
    lo = trial(jax.random.PRNGKey(0), jnp.float32(-15.0))
    s = PdschHarqSim.stats({k: np.asarray(v) for k, v in lo.items()})
    assert s["throughput"] == 0.0
