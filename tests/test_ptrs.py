"""PTRS golden tests vs the reference: RE placement and values (raw
first-DMRS-symbol sequence with EPRE boost) across densities, offsets,
multi-port, and MCS-derived density (reference crashes on the MCS path —
dmrs.py:643 inverted type check — so that path is round-trip tested)."""
import os

import numpy as np
import pytest

from neoradium_tpu.carrier import CarrierConfig
from neoradium_tpu.grid import RET
from neoradium_tpu.phy.pdsch import PdschConfig
from neoradium_tpu.phy.dmrs import PtrsConfig

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "ptrs.npz")

CASES = {
    "t1": (dict(numRbs=25, spacing=30),
           dict(numLayers=1, modulation="16QAM", rnti=17),
           dict(configType=1), dict(timeDensity=1, freqDensity=2)),
    "t2": (dict(numRbs=25, spacing=30),
           dict(numLayers=2, modulation="16QAM", rnti=3),
           dict(configType=2, additionalPos=1),
           dict(timeDensity=2, freqDensity=4, reOffset=1)),
    "t3": (dict(numRbs=51, spacing=30),
           dict(numLayers=2, modulation="64QAM", rnti=900),
           dict(configType=1, additionalPos=2),
           dict(timeDensity=2, freqDensity=2, portSet=[0, 1])),
    "t4": (dict(numRbs=10, spacing=30),
           dict(numLayers=1, modulation="QPSK", rnti=5),
           dict(), dict(timeDensity=4, freqDensity=2, epreRatio=1)),
}


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


@pytest.mark.parametrize("tag", list(CASES))
def test_ptrs_matches_reference(tag, golden):
    carkw, pkw, dkw, tkw = CASES[tag]
    cfg = PdschConfig(CarrierConfig(**carkw), **pkw)
    cfg.setDMRS(**dkw)
    cfg.setPTRS(**tkw)
    plan = cfg.plan(0)
    refPtrs = golden[f"{tag}_types"] == 4      # reference PTRS type id
    assert np.array_equal(plan.reTypeIds == RET["PTRS"], refPtrs), tag
    err = np.abs(plan.pilotGrid.astype(np.complex128)
                 - golden[f"{tag}_grid"]).max()
    assert err < 1e-6, (tag, err)


def test_mcs_density_derivation():
    """MCS-based densities per TS 38.214 Tables 5.1.6.3-1/2 (the reference
    crashes on this path)."""
    p = PtrsConfig(mcsi=[2, 10, 20], iMCS=15, nRBi=[10, 40])
    assert p.densities(numRBs=50, numPxxchSyms=14) == (2, 4)
    assert p.densities(numRBs=20, numPxxchSyms=14) == (2, 2)
    assert p.densities(numRBs=5, numPxxchSyms=14) == (0, 0)   # disabled
    assert PtrsConfig(mcsi=[2, 10, 20], iMCS=1,
                      nRBi=[10, 40]).densities(50, 14) == (0, 0)


def test_data_avoid_ptrs():
    """PDSCH data REs never overlap PTRS REs."""
    cfg = PdschConfig(CarrierConfig(numRbs=10, spacing=30),
                      numLayers=1, modulation="QPSK")
    cfg.setDMRS(configType=1)
    cfg.setPTRS(timeDensity=1, freqDensity=2)
    plan = cfg.plan(0)
    p, l, k = plan.dataIndices
    assert not (plan.reTypeIds[p, l, k] == RET["PTRS"]).any()
    assert (plan.reTypeIds == RET["PTRS"]).sum() > 0


def test_validation():
    with pytest.raises(ValueError):
        PtrsConfig(timeDensity=3)
    with pytest.raises(ValueError):
        PtrsConfig(freqDensity=3)
    with pytest.raises(ValueError):
        PtrsConfig(reOffset=5)
    with pytest.raises(ValueError):
        PtrsConfig(mcsi=[1, 2, 3])    # missing iMCS/nRBi
