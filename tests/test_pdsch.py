"""PDSCH/DMRS tests against reference golden tensors: RE-type maps, DMRS pilot
values, grid population order, LLR extraction, TBS."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from neoradium_tpu.carrier import CarrierConfig
from neoradium_tpu.phy.pdsch import PdschConfig, ReservedRbSet

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

CASES = {
    "p1": (dict(numRbs=51, spacing=30), dict(numLayers=2, modulation="16QAM"),
           dict(configType=2, additionalPos=2), 0),
    "p2": (dict(numRbs=25, spacing=15), dict(numLayers=1, modulation="QPSK"),
           dict(), 0),
    "p3": (dict(numRbs=24, spacing=30), dict(numLayers=6, modulation="256QAM"),
           dict(configType=2, symbols=2), 1),
}


def _build(tag):
    carkw, pkw, dkw, slotNo = CASES[tag]
    cfg = PdschConfig(CarrierConfig(**carkw), **pkw)
    cfg.setDMRS(**dkw)
    return cfg, cfg.plan(slotNo)


@pytest.mark.parametrize("tag", list(CASES))
def test_pdsch_golden(tag):
    d = np.load(os.path.join(GOLDEN, "pdsch.npz"))
    cfg, plan = _build(tag)
    assert np.array_equal(plan.reTypeIds, d[f"{tag}_reTypeIds"])
    assert np.array_equal(np.array(cfg.getTxBlockSize(490 / 1024)), d[f"{tag}_tbs"])

    bits = [jnp.asarray(d[f"{tag}_bits{q}"]) for q in range(cfg.numCW)]
    grid = np.asarray(plan.populate(bits if cfg.numCW > 1 else bits[0]))
    assert np.abs(grid - d[f"{tag}_grid"]).max() < 1e-6

    llrs = plan.extract_llrs(jnp.asarray(d[f"{tag}_noisy"].astype(np.complex64)),
                             jnp.asarray(d[f"{tag}_scales"].astype(np.float32)), 0.005)
    for q in range(cfg.numCW):
        ref = d[f"{tag}_llrs{q}"]
        rel = np.abs(ref - np.asarray(llrs[q])).max() / np.abs(ref).max()
        assert rel < 1e-3


def test_pdsch_populate_extract_roundtrip():
    cfg, plan = _build("p1")
    rng = np.random.default_rng(3)
    bits = jnp.asarray(rng.integers(0, 2, (2, plan.bitSizes[0])).astype(np.int8))
    grid = plan.populate(bits)
    assert grid.shape == (2,) + plan.shape
    out = plan.hard_bits(grid, noiseVar=0.01)[0]
    assert np.array_equal(np.asarray(out), np.asarray(bits))


def test_reserved_rb_sets():
    cfg = PdschConfig(CarrierConfig(numRbs=25, spacing=30), numLayers=1,
                      modulation="QPSK",
                      reservedRbSets=[ReservedRbSet(14, rbs=[0, 1], symbols=[5, 6],
                                                    pattern=[0])])
    cfg.setDMRS()
    plan = cfg.plan(0)
    from neoradium_tpu.grid import RET
    # RBs 0-1 at symbols 5,6 reserved on all ports
    assert np.all(plan.reTypeIds[:, 5, :24] == RET["RESERVED"])
    assert np.all(plan.reTypeIds[:, 6, :24] == RET["RESERVED"])
    assert not np.any(plan.reTypeIds[:, 4, :24] == RET["RESERVED"])
    # bit budget reduced vs un-reserved config
    cfg2 = PdschConfig(CarrierConfig(numRbs=25, spacing=30), numLayers=1, modulation="QPSK")
    cfg2.setDMRS()
    assert plan.bitSizes[0] < cfg2.plan(0).bitSizes[0]


def test_pdsch_validation_errors():
    car = CarrierConfig(numRbs=25, spacing=30)
    with pytest.raises(ValueError):
        PdschConfig(car, numLayers=9)
    with pytest.raises(ValueError):
        PdschConfig(car, mappingType="C")
    with pytest.raises(ValueError):
        PdschConfig(car, symStart=13, symLen=4)  # type A: s+l > 14
    with pytest.raises(ValueError):
        PdschConfig(car, prgSize=3)
    with pytest.raises(ValueError):
        PdschConfig(car, interleavingBundleSize=5)
    # prbSet entries are 0-based PRB indices: numRbs itself is out of range
    with pytest.raises(ValueError):
        PdschConfig(car, prbSet=list(range(20, 26)))
    PdschConfig(car, prbSet=list(range(20, 25)))  # 24 == numRbs-1 is valid


def test_re_descriptors():
    """useReDesc parity: per-RE string descriptors (reference grid.py:187-191
    + pdsch.py:924-932 CW labels)."""
    cfg, plan = _build(list(CASES)[0])
    desc = plan.re_descriptors()
    assert desc.shape == plan.shape
    from neoradium_tpu.grid import RE_TYPES
    # every non-data RE keeps its type name; every data RE gets CW labels
    for name in ("DMRS",):
        mask = plan.reTypeIds == list(RE_TYPES).index(name)
        assert np.all(desc[mask] == name)
    dataMask = plan.reTypeIds == list(RE_TYPES).index("PDSCH")
    labels = desc[dataMask]
    assert all(lb.startswith("CW") for lb in labels)
    # labels enumerate the codeword symbol stream exactly once
    for q, fi in enumerate(plan.flatIdxPerCW):
        got = desc.reshape(-1)[fi]
        assert list(got) == [f"CW{q}-{i}" for i in range(len(fi))]


def test_gram_precoder_matches_svd_subspace():
    """The closed-form 2x2 Gram precoder (the Nr==2 fast path of
    precoding_matrix_traced) returns the SAME singular subspace and powers
    as the LAPACK-convention SVD — columns aligned up to a unit phase,
    orthonormal, preserving the singular values of the averaged channel."""
    cfg, _ = _build("p1")
    rng = np.random.default_rng(7)
    L, K, nr, nt = 4, 612, 2, 8
    H = jnp.asarray((rng.normal(size=(L, K, nr, nt))
                     + 1j * rng.normal(size=(L, K, nr, nt))).astype(np.complex64))
    Fg = np.asarray(cfg.precoding_matrix_traced(H, method="auto"))
    Fs = np.asarray(cfg.precoding_matrix_traced(H, method="svd"))
    assert Fg.shape == Fs.shape == (nt, 2)
    align = np.abs(np.einsum("ti,ti->i", np.conj(Fg), Fs)) * 2  # / (1/sqrt(2))^2
    assert np.all(align > 1 - 1e-4), align
    gram = np.einsum("ti,tj->ij", np.conj(Fg), Fg) * 2
    assert np.abs(gram - np.eye(2)).max() < 1e-4
    hMean = np.asarray(H).reshape(-1, nr, nt).mean(0)
    sv = np.linalg.svd(hMean, compute_uv=False)
    got = np.linalg.norm(hMean @ Fg, axis=0) * np.sqrt(2)
    assert np.allclose(np.sort(got)[::-1], sv[:2], rtol=1e-4)


def test_host_grid_re_desc():
    from neoradium_tpu.grid import HostGrid
    hg = HostGrid(1, 2, 4, useReDesc=True)
    hg.set(0, 0, 1, 1.0, "DMRS")
    hg.set(0, 1, 2, 0.5, "PDSCH", desc="CW0-7")
    assert hg.re_desc_at(0, 0, 1) == "DMRS"
    assert hg.re_desc_at(0, 1, 2) == "CW0-7"
    assert hg.re_desc_at(0, 0, 0) == "UNASSIGNED"
    with pytest.raises(ValueError):
        HostGrid(1, 2, 4).re_desc_at(0, 0, 0)
