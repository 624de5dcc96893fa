"""Foundation tests: Gold sequences, CRC, modulation, carrier math, OFDM.

Golden fixtures in tests/golden/ were produced by the reference implementation
(see tools/make_golden.py) — the same oracle strategy the reference uses
against MATLAB 5G Toolbox.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from neoradium_tpu.sequences import gold_sequence, gold_sequence_batch
from neoradium_tpu import crc as crc_mod
from neoradium_tpu.modulation import Modem
from neoradium_tpu.carrier import CarrierConfig, SAMPLE_RATE
from neoradium_tpu.ofdm import OfdmContext

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _load(name):
    return np.load(os.path.join(GOLDEN, name))


# ---------------------------------------------------------------- sequences
def test_gold_sequence_golden():
    d = _load("gold_crc.npz")
    got = gold_sequence_batch(d["cinits"], 2048)
    assert np.array_equal(got, d["gold"])


def test_gold_sequence_single():
    d = _load("gold_crc.npz")
    assert np.array_equal(gold_sequence(int(d["cinits"][2]), 500), d["gold"][2, :500])


# ---------------------------------------------------------------- CRC
@pytest.mark.parametrize("poly", ["6", "11", "16", "24A", "24B", "24C"])
def test_crc_golden(poly):
    d = _load("gold_crc.npz")
    got = crc_mod.crc(d["crc_in"], poly)
    assert np.array_equal(got, d[f"crc_{poly}"])


@pytest.mark.parametrize("poly", ["16", "24A", "24B"])
def test_crc_matrix_matches_host(poly):
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, (5, 1000)).astype(np.uint8)
    host = crc_mod.crc(bits, poly)
    mat = crc_mod.crc_matrix(1000, poly)
    dev = np.asarray(crc_mod.crc_device(jnp.asarray(bits), jnp.asarray(mat)))
    assert np.array_equal(host, dev)


def test_crc_append_check_roundtrip():
    rng = np.random.default_rng(4)
    bits = rng.integers(0, 2, (3, 128)).astype(np.uint8)
    with_crc = crc_mod.append_crc(bits, "24A")
    assert np.all(crc_mod.check_crc(with_crc, "24A"))
    corrupted = with_crc.copy()
    corrupted[:, 5] ^= 1
    assert not np.any(crc_mod.check_crc(corrupted, "24A"))
    # device check
    mat = crc_mod.crc_matrix(with_crc.shape[-1], "24A")
    ok = np.asarray(crc_mod.check_crc_device(jnp.asarray(with_crc), jnp.asarray(mat)))
    assert np.all(ok)


# ---------------------------------------------------------------- modulation
@pytest.mark.parametrize("mod", ["BPSK", "QPSK", "16QAM", "64QAM", "256QAM", "1024QAM"])
def test_modulation_golden(mod):
    d = _load("modulation.npz")
    m = Modem(mod)
    assert np.allclose(m.constellation, d[f"{mod}_const"])
    syms = np.asarray(m.modulate(jnp.asarray(d[f"{mod}_bits"])))
    assert np.allclose(syms, d[f"{mod}_syms"], atol=1e-6)
    noisy = jnp.asarray(d[f"{mod}_noisy"].astype(np.complex64))
    llrs = np.asarray(m.llrs_from_symbols(noisy, 0.02))
    assert np.allclose(llrs, d[f"{mod}_llrs"], rtol=3e-3, atol=3e-3)
    llrs_exact = np.asarray(m.llrs_from_symbols(noisy, 0.02, use_max=False))
    assert np.allclose(llrs_exact, d[f"{mod}_llrs_exact"], rtol=3e-3, atol=3e-3)


def test_modulate_demodulate_roundtrip():
    rng = np.random.default_rng(5)
    for mod in ["QPSK", "64QAM"]:
        m = Modem(mod)
        bits = rng.integers(0, 2, (3, 40 * m.qm)).astype(np.int8)
        syms = m.modulate(jnp.asarray(bits))
        back = np.asarray(m.demodulate(syms, 0.01))
        assert np.array_equal(back, bits)


# ---------------------------------------------------------------- carrier
def test_carrier_numerology():
    c = CarrierConfig(numRbs=25, spacing=30)
    assert c.u == 1 and c.nFFT == 1024 and c.symbolsPerSlot == 14
    assert c.slotsPerSubFrame == 2 and c.slotsPerFrame == 20
    assert SAMPLE_RATE == 30_720_000
    # CP lengths: long CP on symbols 0 and 14 of the subframe
    assert c.cpLen(0) == 88 and c.cpLen(1) == 72 and c.cpLen(14) == 88
    assert c.slotLen(0) == SAMPLE_RATE // 2000

    c15 = CarrierConfig(numRbs=52, spacing=15)
    assert c15.nFFT == 2048
    assert c15.slotLen(0) == SAMPLE_RATE // 1000

    ce = CarrierConfig(numRbs=20, spacing=60, cpType="extended")
    assert ce.symbolsPerSlot == 12
    assert all(cl == 512 // 4 for cl in ce.cpLensSubframe)


def test_carrier_validation():
    with pytest.raises(ValueError):
        CarrierConfig(numRbs=25, spacing=17)
    with pytest.raises(ValueError):
        CarrierConfig(numRbs=2000, spacing=15)
    with pytest.raises(ValueError):
        CarrierConfig(numRbs=25, spacing=30, cpType="bogus")
    # extended CP is only defined for 60 kHz (TS 38.211 §4.2)
    with pytest.raises(ValueError):
        CarrierConfig(numRbs=25, spacing=30, cpType="extended")
    with pytest.raises(ValueError):
        CarrierConfig(numRbs=25, spacing=15, cpType="extended")


# ---------------------------------------------------------------- OFDM
@pytest.mark.parametrize("tag", ["a", "b", "c"])
def test_ofdm_golden(tag):
    d = _load("ofdm.npz")
    numRbs, spacing, ext = d[f"{tag}_cfg"]
    c = CarrierConfig(numRbs=int(numRbs), spacing=int(spacing),
                      cpType="extended" if ext else "normal")
    ctx = OfdmContext(c, 0, 1)
    grid = jnp.asarray(d[f"{tag}_grid"])
    wf_none = np.asarray(ctx.modulate(grid, windowing=False))
    assert np.abs(wf_none - d[f"{tag}_wf_none"]).max() < 1e-5
    wf_std = np.asarray(ctx.modulate(grid, windowing=True))
    assert np.abs(wf_std - d[f"{tag}_wf_std"]).max() < 1e-5
    rx = np.asarray(ctx.demodulate(jnp.asarray(d[f"{tag}_wf_none"])))
    assert np.abs(rx - d[f"{tag}_rx"]).max() < 1e-4


def test_ofdm_loopback_nmse():
    """Mirror of the reference's cdlTiming loopback check (NMSE ~ 1e-13 at f32)."""
    from neoradium_tpu.utils import getNmse
    rng = np.random.default_rng(6)
    c = CarrierConfig(numRbs=25, spacing=30)
    ctx = OfdmContext(c)
    grid = (rng.normal(size=(8, 14, 300)) + 1j * rng.normal(size=(8, 14, 300))).astype(np.complex64)
    out = ctx.demodulate(ctx.modulate(jnp.asarray(grid), windowing=False))
    nmse = float(getNmse(jnp.asarray(grid), out))
    assert nmse < 1e-10


def test_ofdm_batched_leading_axes():
    c = CarrierConfig(numRbs=25, spacing=30)
    ctx = OfdmContext(c)
    rng = np.random.default_rng(7)
    grid = (rng.normal(size=(3, 2, 14, 300)) + 1j * rng.normal(size=(3, 2, 14, 300))).astype(np.complex64)
    wf = ctx.modulate(jnp.asarray(grid))
    assert wf.shape == (3, 2, ctx.numSamples)
    rx = ctx.demodulate(wf)
    assert rx.shape == grid.shape


# --------------------------------------------------------------------------
# Multi-BWP Carrier (reference carrier.py:313-471)
# --------------------------------------------------------------------------
def test_carrier_multi_bwp():
    from neoradium_tpu import Carrier, CarrierConfig
    car = Carrier(numRbs=51, spacing=30, cellId=7)
    assert len(car.bwps) == 1 and car.curBwp.numRbs == 51
    assert car.symbolsPerSlot == 14 and car.slotsPerSubFrame == 2
    bwp2 = car.addBwp(numRbs=24, spacing=60)
    assert len(car.bwps) == 2 and bwp2.cellId == 7
    car.setCurBwp(1)
    assert car.curBwp is bwp2 and car.slotsPerSubFrame == 4
    # counters
    car.setCurBwp(0)
    for _ in range(car.slotsPerFrame + 1):
        car.goNext()
    assert car.frameNo == 1 and car.slotNoInFrame == 1
    car.restart()
    assert car.slotNo == 0 and car.frameNo == 0
    # grid on the active BWP
    g = car.createGrid(2, useReDesc=True)
    assert g.shape == (2, 14, 51 * 12)
    assert g.re_desc_at(0, 0, 0) == "UNASSIGNED"
    # explicit BWP list
    car2 = Carrier(bwps=[CarrierConfig(numRbs=11), CarrierConfig(numRbs=12)],
                   curBwpIndex=1)
    assert car2.curBwp.numRbs == 12


def test_carrier_validation():
    from neoradium_tpu import Carrier
    with pytest.raises(ValueError):
        Carrier(bwps=[])
    with pytest.raises(ValueError):
        Carrier(curBwpIndex=3)
    with pytest.raises(ValueError):
        Carrier(dcLocation=9999)
    car = Carrier()
    with pytest.raises(ValueError):
        car.setCurBwp(5)
    with pytest.raises(AttributeError):
        car.bogusProperty


# ---------------------------------------------------------------- windowing
@pytest.mark.parametrize("spacing,cp", [(30, "normal"), (60, "extended")])
def test_standalone_apply_windowing_matches_fused(spacing, cp):
    """Waveform.applyWindowing (reference waveform.py:380-470) on an
    unwindowed modulate output equals modulate(windowing=True) exactly —
    both build the same overlap raised-cosine with the STD (TS 38.101 F.5)
    window length."""
    from neoradium_tpu.waveform import Waveform

    car = CarrierConfig(numRbs=24, spacing=spacing, cpType=cp)
    ofdm = OfdmContext(car)
    rng = np.random.default_rng(3)
    L, K = car.symbolsPerSlot, car.numSubcarriers
    grid = jnp.asarray(rng.normal(size=(2, L, K)) + 1j * rng.normal(size=(2, L, K)))
    cpLens = [int(c) for c in ofdm.tables["cpLens"]]
    wf = Waveform(ofdm.modulate(grid, windowing=False))
    out = wf.applyWindowing(cpLens, "STD", car).waveform
    assert np.array_equal(np.asarray(out),
                          np.asarray(ofdm.modulate(grid, windowing=True)))
    # parse paths: percentage / ratio / explicit length; oversize rejected
    for w in ("%25", "0.125", str(min(cpLens) // 2)):
        o = wf.applyWindowing(cpLens, w, car).waveform
        assert o.shape == out.shape
    with pytest.raises(ValueError):
        wf.applyWindowing(cpLens, str(min(cpLens) + 5), car)
    with pytest.raises(ValueError):
        wf.applyWindowing(cpLens, "1.5", car)


def test_mxu_fft_matches_xla():
    """The MXU matmul-DFT option (fftImpl='mxu') matches the XLA FFT
    path to f32 rounding for modulate + demodulate, including windowing,
    and round-trips the grid. 'auto' resolves to the XLA path (the only
    axon-runnable matmul precision measured slower — _mxu_fft note), so
    the parity suites remain bit-exact."""
    import jax
    from neoradium_tpu.ofdm import _mxu_fft, _use_mxu_fft

    car = CarrierConfig(numRbs=51, spacing=30)
    assert not _use_mxu_fft("auto", car.nFFT)   # auto = XLA (see _mxu_fft)
    assert _use_mxu_fft("mxu", car.nFFT)
    o1 = OfdmContext(car)
    o2 = OfdmContext(car, fftImpl="mxu")
    rng = np.random.default_rng(7)
    L, K = car.symbolsPerSlot, car.numSubcarriers
    g = jnp.asarray((rng.normal(size=(2, L, K))
                     + 1j * rng.normal(size=(2, L, K))).astype(np.complex64))
    for windowing in (False, True):
        wx = np.asarray(o1.modulate(g, windowing=windowing))
        wm = np.asarray(o2.modulate(g, windowing=windowing))
        assert np.abs(wm - wx).max() / np.abs(wx).max() < 1e-5
    r = np.asarray(o2.demodulate(o2.modulate(g, windowing=False)))
    assert np.abs(r - np.asarray(g)).max() < 1e-4
    # raw helper against numpy for both directions
    x = jnp.asarray((rng.normal(size=(3, car.nFFT))
                     + 1j * rng.normal(size=(3, car.nFFT))).astype(np.complex64))
    f = np.asarray(_mxu_fft(x, car.nFFT, inverse=False))
    assert np.abs(f - np.fft.fft(np.asarray(x), axis=-1)).max() \
        / np.abs(f).max() < 1e-5
    i = np.asarray(_mxu_fft(x, car.nFFT, inverse=True))
    assert np.abs(i - np.fft.ifft(np.asarray(x), axis=-1)).max() \
        / np.abs(i).max() < 1e-5
