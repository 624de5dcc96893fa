"""CSI-RS golden tests vs the reference: grid population (values + RE-type
placement) across table rows 1-18 configurations, slot gating, and the
CSI-RS branch of the LS channel estimator."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neoradium_tpu.carrier import CarrierConfig
from neoradium_tpu.grid import HostGrid
from neoradium_tpu.phy.csirs import CsiRs, CsiRsSet, CsiRsConfig
from neoradium_tpu.rx.chest import LsChannelEstimator

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "csirs.npz")

CASES = {
    "trs": dict(numPorts=1, density=3),
    "p2": dict(numPorts=2),
    "p4": dict(numPorts=4, freqMap="010"),
    "p8": dict(numPorts=8),
    "p8c4": dict(numPorts=8, cdmSize=4, freqMap="010100"),
    "p12": dict(numPorts=12, cdmSize=4),
    "p24": dict(numPorts=24, cdmSize=8),
    "p32h": dict(numPorts=32, cdmSize=2, density=0.5),
    "pwr": dict(numPorts=1, density=1, powerDb=3, scramblingID=41,
                symbols=[9]),
}


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


@pytest.mark.parametrize("tag", list(CASES))
@pytest.mark.parametrize("slotNo", [0, 4])
def test_pilot_grid_matches(tag, slotNo, golden):
    cfg = CsiRsConfig(carrier=CarrierConfig(numRbs=25, spacing=30),
                      **CASES[tag])
    mine = cfg.pilot_grid(slotNo)
    ref = golden[f"{tag}_{slotNo}_grid"]
    assert mine.shape == ref.shape
    assert np.abs(mine - ref).max() < 1e-12, (tag, slotNo)
    hg = HostGrid(*mine.shape)
    cfg.populate_host_grid(hg, slotNo)
    assert np.array_equal(hg.reTypeIds != 0,
                          golden[f"{tag}_{slotNo}_types"] != 0)


def test_slot_gating_period():
    cfg = CsiRsConfig(carrier=CarrierConfig(numRbs=4, spacing=30),
                      numPorts=2, period=8, offset=3)
    assert not cfg.entries(0)
    assert cfg.entries(3)
    assert cfg.entries(11)
    assert not cfg.entries(8)


def test_zp_and_reservation():
    car = CarrierConfig(numRbs=4, spacing=30)
    cfg = CsiRsConfig(carrier=car, csiType="ZP", numPorts=4, freqMap="010")
    hg = HostGrid(4, car.symbolsPerSlot, car.numSubcarriers)
    cfg.populate_host_grid(hg)
    assert (hg.reTypeIds == 6).any()        # CSIRS_ZP marked
    assert np.abs(hg.grid).max() == 0


def test_estimator_from_csirs(golden):
    cfg = CsiRsConfig(carrier=CarrierConfig(numRbs=24, spacing=30), numPorts=8)
    est = LsChannelEstimator.from_csirs(cfg)
    h, nv = jax.jit(est.estimate)(jnp.asarray(golden["est_noisy"]))
    ref = golden["est_hEst"]
    err = np.abs(np.asarray(h) - ref).max() / np.abs(ref).max()
    assert err < 1e-9, err
    # noiseVar approx (reference stale-portKs bug in multi-group configs)
    assert abs(float(nv) - float(golden["est_noiseVar"])) \
        / float(golden["est_noiseVar"]) < 0.1


def test_validation_errors():
    car = CarrierConfig(numRbs=4, spacing=30)
    with pytest.raises(ValueError):
        CsiRs(numPorts=3)
    with pytest.raises(ValueError):
        CsiRs(numPorts=4, density=0.5)
    with pytest.raises(ValueError):
        CsiRsSet("XX", car)
    with pytest.raises(ValueError):
        CsiRsSet("NZP", car, period=7)
