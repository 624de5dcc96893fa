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


# --------------------------------------------------------------------------
# Standalone HarqEntity: pipeline-agnostic functional building block
# (reference harq.py:366-668 workflow outside any canned sim)
# --------------------------------------------------------------------------
from neoradium_tpu.coding.ldpc import LdpcConfig, LdpcEncoder, LdpcDecoder
from neoradium_tpu.sim.harq import (HarqEntity, RXSUCCESS, RXFAILED, TIMEOUT,
                                    harq_stats)


def _make_entity(numProc=2, maxTries=3, harqType="IR", tbs=800, g=2048):
    cfg = LdpcConfig(tbs, baseGraphNo=1, modulation="QPSK", txLayers=1,
                     targetRate=tbs / g, g=g)
    return HarqEntity([(LdpcEncoder(cfg), LdpcDecoder(cfg))],
                      HarqConfig(numProc=numProc, maxTries=maxTries,
                                 harqType=harqType))


def _run_custom_pipeline(ent, numSlots, noiseStd, seed=0, numIter=6):
    """A user-owned chain: BPSK-ish LLRs with AWGN, NO PdschLinkSim at all."""
    st = ent.init_state()
    key = jax.random.PRNGKey(seed)
    events = []
    for slot in range(numSlots):
        proc = slot % ent.cfg.numProc
        kP, kN, key = jax.random.split(key, 3)
        newP = [jax.random.bernoulli(kP, 0.5, (ent.tbs[0],)).astype(jnp.int8)]
        rm, payloads, tx = ent.tx_step(st, proc, newP)
        llr = ((1.0 - 2.0 * rm[0].astype(jnp.float32)) * 2.0
               + noiseStd * jax.random.normal(kN, rm[0].shape))
        st, out = ent.rx_step(st, proc, [llr], payloads, numIter=numIter)
        events.append(int(out["event"][0]))
    return st, events


def test_entity_clean_channel_all_first_try():
    ent = _make_entity()
    st, events = _run_custom_pipeline(ent, 6, noiseStd=0.01)
    assert events == [RXSUCCESS] * 6
    s = ent.stats(st)
    assert s["throughput"] == 100.0 and s["bler"] == 0.0
    assert s["txBlocksPerTry"] == [6, 0, 0]
    assert s["totalTxBits"] == 6 * ent.tbs[0]
    assert s["meanTries"] == 0.0


@pytest.mark.slow
def test_entity_dead_channel_timeouts():
    ent = _make_entity(numProc=2, maxTries=3)
    st, events = _run_custom_pipeline(ent, 12, noiseStd=100.0)
    assert events.count(TIMEOUT) == 4          # 12 slots / 3 tries
    assert events.count(RXFAILED) == 8
    s = ent.stats(st)
    assert s["throughput"] == 0.0 and s["bler"] == 100.0
    assert s["txBlocksPerTry"] == [4, 4, 4]
    assert s["numTimeouts"] == 4.0
    assert s["meanTries"] == 3.0


@pytest.mark.slow
def test_entity_ir_combining_recovers():
    """Mid noise: some first tries fail, soft combining recovers on re-TX."""
    ent = _make_entity(numProc=1, maxTries=4)
    for std in (3.2, 3.6, 4.0):
        st, events = _run_custom_pipeline(ent, 16, noiseStd=std, seed=3)
        s = ent.stats(st)
        if sum(s["rxBlocksPerTry"][1:]) > 0:
            assert events.count(RXFAILED) > 0
            return
    pytest.fail("no retransmission successes at any mid noise level")


@pytest.mark.slow
def test_entity_stats_and_event_helpers():
    ent = _make_entity(numProc=2, maxTries=3)
    st, _ = _run_custom_pipeline(ent, 6, noiseStd=100.0)
    txt = HarqEntity.format_stats(ent.stats(st))
    for field in ("txBits (per try)", "rxBlocks (per try)", "numTimeouts",
                  "throughput", "bler", "Average Num. Retries"):
        assert field in txt
    # event_log renders reference-style strings from an rx_step output
    st2 = ent.init_state()
    rm, payloads, _ = ent.tx_step(st2, 0, [jnp.zeros((ent.tbs[0],), jnp.int8)])
    llr = (1.0 - 2.0 * rm[0].astype(jnp.float32)) * 4.0
    _, out = ent.rx_step(st2, 0, [llr], payloads, numIter=6)
    lines = HarqEntity.event_log(out, slotNo=0)
    assert len(lines) == 1 and "RXSUCCESS" in lines[0]


def test_entity_matches_sim_under_scan():
    """The standalone entity IS PdschHarqSim's engine: a manual lax.scan
    using tx_step/rx_step must agree with the entity state statistics."""
    ent = _make_entity(numProc=2, maxTries=2)

    def trial(key):
        def step(carry, slot):
            st, key = carry
            kP, kN, key = jax.random.split(key, 3)
            newP = [jax.random.bernoulli(kP, 0.5,
                                         (ent.tbs[0],)).astype(jnp.int8)]
            rm, payloads, _ = ent.tx_step(st, slot % 2, newP)
            llr = ((1.0 - 2.0 * rm[0].astype(jnp.float32)) * 2.0
                   + 0.01 * jax.random.normal(kN, rm[0].shape))
            st, out = ent.rx_step(st, slot % 2, [llr], payloads, numIter=4)
            return (st, key), out["event"]
        (st, _), ev = jax.lax.scan(step, (ent.init_state(), key),
                                   jnp.arange(4))
        return st, ev

    st, ev = jax.jit(trial)(jax.random.PRNGKey(1))
    assert np.all(np.asarray(ev) == RXSUCCESS)
    assert harq_stats(st)["throughput"] == 100.0


def test_harq_time_domain():
    """HARQ scan with the TIME-domain channel path (OFDM + filtering + sync
    inside the scan) — the reference's canonical TD throughput pipeline."""
    car = CarrierConfig(numRbs=4, spacing=30)
    ch = CdlChannel(car, "C", delaySpread=100, dopplerShift=20,
                    txAntenna=AntennaPanel((2, 1), polarization="x"),
                    rxAntenna=AntennaPanel((1, 1), polarization="x"))
    sim = PdschLinkSim(car, pdschKw=dict(numLayers=2, modulation="QPSK"),
                       dmrsKw=dict(configType=2, additionalPos=1),
                       codeRate=308 / 1024, domain="time",
                       channelModel=ch, chEst="perfect", decoderIter=6)
    hsim = PdschHarqSim(sim, HarqConfig(numProc=2, maxTries=2), numSlots=4)
    hi = jax.jit(hsim.run_trial)(jax.random.PRNGKey(0), jnp.float32(30.0))
    s = PdschHarqSim.stats({k: np.asarray(v) for k, v in hi.items()})
    assert s["throughput"] == 100.0
    lo = jax.jit(hsim.run_trial)(jax.random.PRNGKey(0), jnp.float32(-25.0))
    s = PdschHarqSim.stats({k: np.asarray(v) for k, v in lo.items()})
    assert s["throughput"] == 0.0
