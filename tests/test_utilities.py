"""Tests for auxiliary API-parity surfaces: antenna pattern analysis
(steering vectors / directivity verified vs the reference at 1e-6 in
tools/dev/cmp_antenna_pattern.py), the Waveform wrapper, cross-correlation
timing estimation, the RNG facade (all generator types incl. the
MATLAB-compatible RandomState stream), grid maps, and dataset generators."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")

from neoradium_tpu.carrier import CarrierConfig
from neoradium_tpu.channels.antenna import AntennaPanel, AntennaArray
from neoradium_tpu.channels.cdl import CdlChannel
from neoradium_tpu.grid import HostGrid
from neoradium_tpu.ofdm import OfdmContext
from neoradium_tpu.phy.csirs import CsiRsConfig
from neoradium_tpu.phy.pdsch import PdschConfig
from neoradium_tpu.random import RanGen, NrGen1
from neoradium_tpu.waveform import Waveform, estimate_timing_offset


def test_steering_vector_properties():
    p = AntennaPanel((2, 2), polarization="x")
    sv = p.getSteeringVector(np.asarray([90.0]), np.asarray([0.0, 45.0]))
    assert sv.shape == (8, 1, 2)
    assert np.allclose(np.abs(sv), 1.0)


def test_directivity_boresight_peak():
    """A 4x4 panel's directivity peaks near boresight (theta=90, phi=0)."""
    p = AntennaPanel((4, 4))
    theta = np.arange(60, 121, 2.0)
    phi = np.arange(-60, 61, 2.0)
    d = p.getDirectivity(theta, phi)
    it, ip = np.unravel_index(np.argmax(d), d.shape)
    assert abs(theta[it] - 90) <= 4 and abs(phi[ip]) <= 4
    assert d.max() > 15          # 16 elements + 8 dBi element gain


def test_array_pattern_api():
    arr = AntennaArray((1, 2), AntennaPanel((2, 2), polarization="|"))
    f = arr.getField((60, 121, 10), (0, 41, 10))
    assert f.shape == (7, 5)
    arr.drawRadiation(theta=90.0, phi=None, radiationType="Directivity")


def test_waveform_wrapper():
    car = CarrierConfig(numRbs=6, spacing=30)
    rng = np.random.default_rng(0)
    sig = rng.normal(size=(2, 2000)) + 1j * rng.normal(size=(2, 2000))
    w = Waveform(sig)
    assert w.pad(16).shape == (2, 2016)
    assert w.sync(10).shape == (2, 1990)
    n = w.addNoise(key=jax.random.PRNGKey(1), noiseVar=0.25)
    assert abs(n.noiseVar - 0.25) < 1e-9
    snr = 10.0
    m = w.addNoise(key=jax.random.PRNGKey(2), snrDb=10, carrier=car)
    assert m.noiseVar > 0


def test_timing_offset_recovers_delay():
    """Full-grid reference: xcorr recovers an inserted delay exactly."""
    car = CarrierConfig(numRbs=6, spacing=30)
    rng = np.random.default_rng(1)
    L, K = car.symbolsPerSlot, car.numSubcarriers
    grid = rng.normal(size=(1, L, K)) + 1j * rng.normal(size=(1, L, K))
    wf = np.asarray(OfdmContext(car).modulate(jnp.asarray(grid), windowing=False))
    delay = 37
    rx = np.zeros((1, wf.shape[1] + 64), complex)
    rx[:, delay:delay + wf.shape[1]] = wf
    rx += 0.01 * (rng.normal(size=rx.shape) + 1j * rng.normal(size=rx.shape))
    assert int(estimate_timing_offset(wf, rx)) == delay


def test_rng_facade():
    r1 = RanGen(RanGen.getGenerator(42))
    r2 = RanGen(RanGen.getGenerator(42))
    assert np.array_equal(r1.bits(64), r2.bits(64))
    # MATLAB-compatible stream (reference random.py:153-175 doc values)
    g = RanGen.getGenerator(np.random.RandomState(123))
    expect = [0.69646919, 0.28613933, 0.22685145, 0.55131477, 0.71946897]
    assert np.abs(g.random(size=5) - expect).max() < 1e-8
    # all bit-generator types accepted
    for bg in (np.random.MT19937(1), np.random.Philox(1), np.random.SFC64(1)):
        gg = RanGen.getGenerator(bg)
        assert gg.bits(8).shape == (8,)
    assert isinstance(RanGen.getGenerator(np.random.RandomState(5)), NrGen1)


def test_grid_draw_map():
    car = CarrierConfig(numRbs=4, spacing=30)
    cfg = PdschConfig(car, numLayers=1, modulation="QPSK")
    cfg.setDMRS(configType=1)
    hg = HostGrid(1, car.symbolsPerSlot, car.numSubcarriers)
    hg.reTypeIds = cfg.plan(0).reTypeIds.copy()
    ax = hg.drawMap(ports=[0])
    assert ax is not None


def test_ret_register_custom_types():
    # reference grid.py:257-268: up to 20 user-defined RE types
    from neoradium_tpu.grid import retRegister, RET, RE_TYPES
    rid = retRegister("SSB")
    assert RE_TYPES[rid] == "SSB" and RET["SSB"] == rid
    assert retRegister("ssb") == rid            # idempotent, case-folded
    hg = HostGrid(1, 14, 48)
    hg.set(0, 2, 5, 1 + 1j, "SSB")
    assert hg.re_type_at(0, 2, 5) == "SSB"
    assert hg.stats().get("SSB") == 1
    assert retRegister("PDSCH") == RET["PDSCH"]  # built-ins unchanged


def test_cdl_chan_gen_reproducible():
    car = CarrierConfig(numRbs=4, spacing=30)
    kw = dict(profiles="AC", seed=11)
    a = list(CdlChannel.getChanGen(3, car, **kw))
    b = list(CdlChannel.getChanGen(3, car, **kw))
    assert len(a) == 3
    for x, y in zip(a, b):
        assert np.array_equal(x, y)
    assert not np.allclose(a[0], a[1])      # different random channels


def test_pretty_printers():
    """Every major class carries the reference's print(indent, title,
    getStr) pretty-printer convention; smoke every one and check the
    shared layout helper."""
    import jax
    import numpy as np
    import neoradium_tpu as nr
    from neoradium_tpu.coding.ldpc import LdpcConfig, LdpcEncoder, LdpcDecoder
    from neoradium_tpu.coding.polar import PolarConfig
    from neoradium_tpu.sim.harq import HarqConfig, HarqEntity
    from neoradium_tpu.channels.trajectory import TrjPoint, Trajectory
    from neoradium_tpu.phy.dmrs import DmrsConfig

    car = nr.CarrierConfig(numRbs=24, spacing=30)
    pdsch = nr.PdschConfig(car, numLayers=2, modulation="16QAM")
    pdsch.setDMRS(configType=2, additionalPos=2)
    csi = nr.CsiRsConfig(carrier=car, numPorts=8)
    ldpcCfg = LdpcConfig(1000, 1, "QPSK", 1, 0.5)
    objs = [
        car, nr.Carrier(numRbs=24, spacing=30), pdsch,
        DmrsConfig(configType=2, additionalPos=2),
        nr.AntennaPanel((2, 2), polarization="x"),
        nr.CdlChannel(car, "C", delaySpread=300,
                      txAntenna=nr.AntennaPanel((2, 2), polarization="x"),
                      rxAntenna=nr.AntennaPanel((1, 1), polarization="x")),
        nr.TdlChannel(car, "B", delaySpread=100, txAntennaCount=2,
                      rxAntennaCount=2),
        csi, nr.CsiReport(csi, n1=4, n2=1),
        nr.CsiReport(csi, n1=4, n2=1, codebookType="Type2"),
        ldpcCfg, LdpcEncoder(ldpcCfg), LdpcDecoder(ldpcCfg),
        PolarConfig(32, 100, "uci"),
        HarqEntity([(LdpcEncoder(ldpcCfg), LdpcDecoder(ldpcCfg))],
                   HarqConfig()),
        Trajectory([TrjPoint(xyz=np.array([0.0, 0.0, 1.5])),
                    TrjPoint(xyz=np.array([1.0, 0.0, 1.5]),
                             sampleNo=30720)], 3.5e9),
    ]
    from neoradium_tpu.channels.trjchan import TrjChannel
    pi = np.asarray([[0.0, 100.0, -3.0, 10.0, 90.0, 20.0, 100.0, 1.0]])
    pts = [TrjPoint(xyz=np.array([float(i), 0.0, 1.5]), hasLos=0, pathInfo=pi,
                    speed=[3.0, 0.0, 0.0], sampleNo=i * car.slotLen(0))
           for i in range(3)]
    objs.append(TrjChannel(car, Trajectory(pts, 3.5e9),
                           txAntenna=nr.AntennaPanel((2, 1), polarization="x"),
                           rxAntenna=nr.AntennaPanel((1, 1), polarization="x")))
    for o in objs:
        s = o.print(getStr=True)
        assert isinstance(s, str) and "Properties:" in s and "\n  " in s, type(o)
        assert repr(o) == s
        # indent shifts every line
        s2 = o.print(indent=4, getStr=True)
        assert all(line.startswith("    ") for line in s2.splitlines() if line)
