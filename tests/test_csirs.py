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


def test_pdsch_plan_skips_csirs_res():
    """PDSCH data allocation must avoid CSI-RS REs on every layer, keeping
    per-layer RE counts equal (reference pdsch.py:839-852 + csirs.py:447)."""
    from neoradium_tpu.carrier import CarrierConfig
    from neoradium_tpu.phy.pdsch import PdschConfig
    from neoradium_tpu.phy.csirs import CsiRsConfig
    from neoradium_tpu.grid import RET

    car = CarrierConfig(numRbs=12, spacing=30)
    csirs = CsiRsConfig(carrier=car, numPorts=4, period=4, offset=0)
    p0 = PdschConfig(car, numLayers=2, modulation="QPSK")
    p0.setDMRS(configType=2, additionalPos=1)
    p1 = PdschConfig(car, numLayers=2, modulation="QPSK", csiRsConfig=csirs)
    p1.setDMRS(configType=2, additionalPos=1)

    planActive = p1.plan(0)           # CSI-RS present in slot 0 (period 4)
    planGap = p1.plan(1)              # no CSI-RS in slot 1
    planNone = p0.plan(1)

    csirsRes = {(l, k) for _, l, k, _ in csirs.entries(0)}
    assert csirsRes, "fixture should place CSI-RS in slot 0"
    dataActive = set(zip(planActive.dataIndices[1].tolist(),
                         planActive.dataIndices[2].tolist()))
    assert not (dataActive & csirsRes)
    # CSI-RS REs marked on ALL ports
    for (l, k) in csirsRes:
        assert all(planActive.reTypeIds[p, l, k]
                   in (RET["CSIRS_NZP"], RET["CSIRS_ZP"])
                   for p in range(2))
    # equal REs per layer (layer mapping alignment)
    ports = planActive.dataIndices[0]
    counts = np.bincount(ports)
    assert counts.min() == counts.max()
    # slot without CSI-RS matches the no-CSI-RS config exactly
    assert planGap.bitSizes == planNone.bitSizes
    assert planActive.bitSizes[0] < planGap.bitSizes[0]
