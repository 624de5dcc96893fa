"""TDL channel golden tests vs the reference (SOS phases injected so the
stochastic fading is deterministic). Covers NLOS with high correlation,
LOS (Rician first tap), and cross-polar Kronecker correlation, for both the
frequency channel matrix (2 slots) and time-domain application."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neoradium_tpu.carrier import CarrierConfig
from neoradium_tpu.channels.tdl import TdlChannel

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "tdl.npz")

CASES = {
    "a": dict(profile="A", delaySpread=100, dopplerShift=40,
              txAntennaCount=2, rxAntennaCount=2, mimoCorrelation="High"),
    "d": dict(profile="D", delaySpread=30, dopplerShift=10,
              txAntennaCount=1, rxAntennaCount=1),
    "x": dict(profile="B100", dopplerShift=400, txAntennaCount=4,
              rxAntennaCount=2, mimoCorrelation="Medium",
              polarization="CrossPolar", delaySpread=100),
}


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


def make_channel(tag, golden):
    kw = dict(CASES[tag])
    profile = kw.pop("profile")
    ch = TdlChannel(CarrierConfig(numRbs=12, spacing=30), profile, **kw,
                    sosPhases=(golden[f"{tag}_theta1"], golden[f"{tag}_theta2"]))
    return ch, ch.init_state(jax.random.PRNGKey(0))


@pytest.mark.parametrize("tag", list(CASES))
def test_channel_matrix(tag, golden):
    ch, state = make_channel(tag, golden)
    for slot in (0, 1):
        h = np.asarray(ch.channel_matrix(state, slotNo=slot))
        ref = golden[f"{tag}_h{slot}"]
        err = np.abs(h - ref).max() / np.abs(ref).max()
        assert err < 1e-9, (tag, slot, err)


@pytest.mark.parametrize("tag", list(CASES))
def test_apply_to_signal(tag, golden):
    ch, state = make_channel(tag, golden)
    y = np.asarray(ch.apply_to_signal(jnp.asarray(golden[f"{tag}_sig"]), state))
    ref = golden[f"{tag}_y"]
    err = np.abs(y - ref).max() / np.abs(ref).max()
    assert err < 1e-9, (tag, err)
    assert ch.getMaxDelay() == int(golden[f"{tag}_maxDelay"])


@pytest.mark.parametrize("tag", list(CASES))
def test_correlation_matrix(tag, golden):
    ch, _ = make_channel(tag, golden)
    cm = np.asarray(ch.correlationMatrix, np.float64)
    assert np.abs(cm - golden[f"{tag}_corMat"]).max() < 1e-12


def test_random_phases_vmap_and_continuity():
    """Random state batches under vmap; GMEDS1 fading is continuous in time."""
    ch = TdlChannel(CarrierConfig(numRbs=4, spacing=30), "C",
                    delaySpread=300, dopplerShift=100,
                    txAntennaCount=2, rxAntennaCount=2,
                    mimoCorrelation="Medium")
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    states = jax.vmap(ch.init_state)(keys)
    hs = jax.jit(jax.vmap(lambda s: ch.channel_matrix(s, slotNo=0)))(states)
    assert hs.shape[0] == 4 and not np.isnan(np.asarray(hs)).any()
    # continuity: gains at the end of slot 0 ~ gains at start of slot 1
    s0 = jax.tree.map(lambda x: x[0], states)
    g0 = np.asarray(ch.path_gains(s0, ch.gain_times(0)))
    g1 = np.asarray(ch.path_gains(s0, ch.gain_times(1)))
    assert np.abs(g0[-1] - g1[0]).max() < 1e-6   # same boundary sample time

def test_combined_profile_strings():
    ch = TdlChannel(CarrierConfig(numRbs=4, spacing=30), "B100-400")
    assert ch.dopplerShift == 400 and ch.delaySpread == 100
    with pytest.raises(ValueError):
        TdlChannel(CarrierConfig(numRbs=4, spacing=30), "Z9")
