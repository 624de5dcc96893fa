"""Trajectory channel + DeepMIMO tests.

Two tiers: self-consistency (shapes, continuity, TD==FD, blockage) and
committed reference-golden parity — channel matrices / TD application /
timing at 1e-9 and bit-identical walks+interpolation against fixtures from
``tools/make_golden.py`` (generators ``trjchan`` / ``deepmimo_golden``;
the dev scripts tools/dev/cmp_trjchan.py, cmp_deepmimo.py drive the same
comparisons against the live reference).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neoradium_tpu.carrier import CarrierConfig
from neoradium_tpu.channels.antenna import AntennaPanel
from neoradium_tpu.channels.trajectory import TrjPoint, Trajectory
from neoradium_tpu.channels.trjchan import TrjChannel
from neoradium_tpu.channels.deepmimo import DeepMimoData


def synth_points(numPoints, numPaths, hasLos, slotSamples, seed=9):
    rng = np.random.default_rng(seed)
    pts = []
    for i in range(numPoints):
        pi = np.zeros((numPaths, 8))
        pi[:, 0] = rng.uniform(-180, 180, numPaths)
        pi[:, 1] = np.sort(rng.uniform(0, 800, numPaths))
        pi[:, 2] = -rng.uniform(0, 25, numPaths)
        pi[:, 3] = rng.uniform(-180, 180, numPaths)
        pi[:, 4] = rng.uniform(30, 150, numPaths)
        pi[:, 5] = rng.uniform(-180, 180, numPaths)
        pi[:, 6] = rng.uniform(30, 150, numPaths)
        pi[:, 7] = -1
        if hasLos:
            pi[0, 7] = 0
        pts.append(TrjPoint([i * 0.5, 0, 1.5], 1 if hasLos else 0, pi, 10.0,
                            0, [3.0, 1.0, 0.0], i * slotSamples))
    return pts


@pytest.fixture(scope="module")
def channel():
    car = CarrierConfig(numRbs=6, spacing=30)
    pts = synth_points(6, 5, True, car.slotLen(0))
    traj = Trajectory(pts, 3.5e9)
    ch = TrjChannel(car, traj,
                    txAntenna=AntennaPanel((2, 1), polarization="x"),
                    rxAntenna=AntennaPanel((1, 1), polarization="x"))
    return car, traj, ch


def test_channel_matrix_shape_and_continuity(channel):
    car, traj, ch = channel
    h0 = np.asarray(ch.channel_matrix(slotNo=0))
    h1 = np.asarray(ch.channel_matrix(slotNo=1))
    L, K = car.symbolsPerSlot, car.numSubcarriers
    assert h0.shape == (L, K, 2, 4)
    assert not np.allclose(h0, h1)            # trajectory moves
    # Doppler continuity: correlation between consecutive slots is high
    c = np.abs(np.vdot(h0, h1)) / (np.linalg.norm(h0) * np.linalg.norm(h1))
    assert c > 0.5


def test_td_fd_equivalence(channel):
    """Time-domain application matches frequency-domain on a full slot."""
    from neoradium_tpu.ofdm import OfdmContext
    car, traj, ch = channel
    rng = np.random.default_rng(1)
    L, K = car.symbolsPerSlot, car.numSubcarriers
    grid = (rng.normal(size=(4, L, K)) + 1j * rng.normal(size=(4, L, K)))
    ofdm = OfdmContext(car)
    wf = ofdm.modulate(jnp.asarray(grid), windowing=False)
    wf = jnp.pad(wf, [(0, 0), (0, ch.getMaxDelay(0))])
    rx = ch.apply_to_signal(wf, slotNo=0)
    off = ch.timing_offset(slotNo=0)
    synced = rx[:, off:off + ofdm.numSamples]
    rxGrid = np.asarray(ofdm.demodulate(synced))
    H = np.asarray(ch.channel_matrix(slotNo=0))
    fd = np.einsum("lkrt,tlk->rlk", H, grid)
    nmse = np.sum(np.abs(rxGrid - fd) ** 2) / np.sum(np.abs(fd) ** 2)
    assert nmse < 1e-3, nmse                  # reference invariant (<1e-3)


def test_end_of_trajectory_raises(channel):
    car, traj, ch = channel
    with pytest.raises(ValueError):
        ch.channel_matrix(slotNo=traj.numPoints)


def test_blockage_zero_channel():
    car = CarrierConfig(numRbs=4, spacing=30)
    pts = [TrjPoint([0, 0, 1.5], -1, None, 10.0, 0, [1, 0, 0], 0)]
    ch = TrjChannel(car, Trajectory(pts, 3.5e9))
    h = np.asarray(ch.channel_matrix(slotNo=0))
    assert np.abs(h).max() == 0


def test_path_matching():
    slotSamples = 15360
    pts = synth_points(2, 5, False, slotSamples)
    curToNext = pts[0].matchPathInfo(pts[1], maxDiff=1e9)
    assert sorted(curToNext.tolist()) == [0, 1, 2, 3, 4]
    # identical points match identity
    same = pts[0].matchPathInfo(pts[0], maxDiff=1)
    assert np.array_equal(same, np.arange(5))


@pytest.fixture(scope="module")
def scenario():
    nx, ny = 24, 16
    delta = np.array([0.5, 0.5])
    bs = np.array([3.0, 3.0, 12.0])
    pts = []
    for iy in range(ny):
        for ix in range(nx):
            xyz = np.array([ix * delta[0], iy * delta[1], 1.5])
            n = 3
            t = np.arange(n)
            pi = np.zeros((n, 8))
            pi[:, 0] = 10 * np.sin(0.1 * ix + t)
            pi[:, 1] = 100 + 5 * t + 0.5 * ix
            pi[:, 2] = -5 - 2 * t
            pi[:, 3] = 30 + 3 * t + 0.2 * ix
            pi[:, 4] = 80 + t
            pi[:, 5] = -40 + 5 * t
            pi[:, 6] = 95 + t
            pi[:, 7] = -1
            pi[0, 7] = 0
            pts.append(TrjPoint(xyz, 1, pi,
                                np.sqrt(np.square(bs - xyz).sum())))
    return DeepMimoData.fromPoints(pts, 3.5e9, bs, (nx, ny), delta)


def test_random_trajectory_per_slot(scenario):
    car = CarrierConfig(numRbs=6, spacing=30)
    rng = np.random.default_rng(0)
    traj = scenario.getRandomTrajectory(
        np.array([[0.0, 0.0], [11.5, 7.5]]), 2, car, trajLen=12,
        speedMps=5.0, rng=rng)
    assert traj.numPoints > 12                # interpolated to per-slot points
    # per-slot timing: consecutive sampleNos differ by one slot length
    deltas = np.diff([p.sampleNo for p in traj.points])
    slotLens = {car.slotLen(i) for i in range(car.slotsPerSubFrame)}
    assert set(deltas.tolist()) <= slotLens
    # drive the channel a few slots
    ch = TrjChannel(car, traj)
    hs = [np.asarray(ch.channel_matrix(slotNo=s)) for s in range(3)]
    assert not np.isnan(np.stack(hs)).any()


def test_chan_gen(scenario):
    car = CarrierConfig(numRbs=4, spacing=30)
    gen = scenario.getChanGen(5, car, segLen=2, trajLen=8, speedMps=5.0, seed=1)
    hs = list(gen)
    assert len(hs) == 5
    assert hs[0].shape == (car.symbolsPerSlot, car.numSubcarriers, 1, 1)


def test_waypoint_trajectory(scenario):
    car = CarrierConfig(numRbs=4, spacing=30)
    traj = scenario.trajectoryFromPoints(
        [[0.5, 0.5], [5.0, 0.5], [5.0, 5.0]], car, speedMps=5.0)
    assert traj.numPoints > 10
    assert traj.totalDist > 8.0


def test_animate_trajectory(tmp_path, channel):
    """animateTrajectory parity (reference deepmimo.py:1185-1320): FuncAnimation
    over the scenario map, Config/Draw callback protocol, GIF export."""
    import matplotlib
    matplotlib.use("Agg")
    car, traj, ch = channel
    # build a small DeepMimoData-like grid from synthetic points
    pts = synth_points(12, 4, True, car.slotLen(0), seed=11)
    for i, p in enumerate(pts):
        p.xyz = np.asarray([float(i % 4), float(i // 4), 1.5])
    dm = DeepMimoData.__new__(DeepMimoData)
    dm.allTrjPoints = pts
    dm.gridSize = (4, 3)
    dm.xyMin, dm.xyMax = np.asarray([0.0, 0.0]), np.asarray([3.0, 2.0])
    dm.bsXyz = np.asarray([0.0, 0.0, 10.0])

    calls = []

    def cb(request, ax, trajectory, points=None):
        calls.append(request)
        assert len(ax) == 1
        if request == "Draw":
            assert points[1] - points[0] == 2

    gif = tmp_path / "trj.gif"
    anim = dm.animateTrajectory(traj, numGraphs=1, graphCallback=cb,
                                pointsPerFrame=2, fileName=str(gif))
    assert anim is not None
    assert calls[0] == "Config" and "Draw" in calls
    assert gif.exists() and gif.stat().st_size > 0


def test_interactive_traj_points_headless(channel):
    import matplotlib
    matplotlib.use("Agg")
    car, traj, ch = channel
    pts = synth_points(4, 3, True, car.slotLen(0), seed=12)
    dm = DeepMimoData.__new__(DeepMimoData)
    dm.allTrjPoints = pts
    dm.gridSize = (2, 2)
    dm.xyMin, dm.xyMax = np.asarray([0.0, 0.0]), np.asarray([1.0, 1.0])
    dm.bsXyz = np.asarray([0.0, 0.0, 10.0])
    out = dm.interactiveTrjPoints()           # Agg: window closes instantly
    assert dm.interactiveTrajPoints == dm.interactiveTrjPoints  # legacy alias
    assert out.shape[0] == 0
    with pytest.raises(ValueError):
        dm.interactiveTrjPoints(mapType="bogus")


def test_td_multislot_sim_with_trajectory():
    """Regression: TrjChannel once re-declared apply_to_signal without the
    base symMapSlot kwarg, so any domain='time' multislot/HARQ sim raised
    TypeError at trace time (sim/link.py td_channel_rx passes symMapSlot=r).

    Runs in a SUBPROCESS: compiling this program after the ~230 compiles of
    a full-suite run segfaults XLA:CPU inside backend_compile_and_load
    (reproduced twice at exactly this test on 2026-08-21; passes in any
    fresh process, including with the whole test file before it). Process
    isolation keeps the regression coverage without tripping the compiler
    bug.
    """
    import subprocess
    import sys
    script = """
import sys
sys.path.insert(0, {repo!r}); sys.path.insert(0, {tests!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from test_trjchan import synth_points
from neoradium_tpu.carrier import CarrierConfig
from neoradium_tpu.channels.antenna import AntennaPanel
from neoradium_tpu.channels.trajectory import Trajectory
from neoradium_tpu.channels.trjchan import TrjChannel
from neoradium_tpu.sim.link import PdschLinkSim
car = CarrierConfig(numRbs=6, spacing=30)
traj = Trajectory(synth_points(6, 5, True, car.slotLen(0)), 3.5e9)
ch = TrjChannel(car, traj,
                txAntenna=AntennaPanel((2, 1), polarization="x"),
                rxAntenna=AntennaPanel((1, 1), polarization="x"))
sim = PdschLinkSim(car, pdschKw=dict(numLayers=2, modulation="QPSK"),
                   domain="time", channelModel=ch, decoderIter=3)
out = jax.jit(sim.make_multislot_fn(2))(jax.random.PRNGKey(0),
                                        jnp.float32(30.0))
assert int(out["blocks"]) > 0
assert int(out["bitErrors"]) >= 0
print("OK")
""".format(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
           tests=os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, "-c", script], capture_output=True,
                       text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK" in r.stdout


# ======================================================================
# Reference golden parity (fixtures from tools/make_golden.py: trjchan /
# deepmimo_golden — the committed form of the dev parity scripts)
# ======================================================================
GOLDEN = __import__("os").path.join(__import__("os").path.dirname(__file__),
                                    "golden")


@pytest.mark.parametrize("tag", ["nlos", "los"])
def test_trjchan_golden_parity(tag):
    """Channel matrices over 3 slots, TD application, and timing offset
    match the reference TrjChannel at 1e-9 (reference trjchan.py:876-990)."""
    d = np.load(f"{GOLDEN}/trjchan.npz")
    car = CarrierConfig(numRbs=12, spacing=30)
    slotSamples = car.slotLen(0)
    pts = [TrjPoint([i * 0.5, 0.0, 1.5], 1 if tag == "los" else 0,
                    d[f"{tag}_pathInfo"][i], 10.0, 0, [3.0, 1.0, 0.0],
                    i * slotSamples) for i in range(4)]
    ch = TrjChannel(car, Trajectory(pts, 3.5e9),
                    txAntenna=AntennaPanel((2, 2), polarization="x"),
                    rxAntenna=AntennaPanel((1, 2), polarization="|"))
    for slot in range(3):
        h = np.asarray(ch.channel_matrix(slotNo=slot))
        ref = d[f"{tag}_h"][slot]
        err = np.abs(h - ref).max() / np.abs(ref).max()
        assert err < 1e-9, (tag, slot, err)
    y = np.asarray(ch.apply_to_signal(jnp.asarray(d[f"{tag}_sig"]), slotNo=0))
    err = np.abs(y - d[f"{tag}_y"]).max() / np.abs(d[f"{tag}_y"]).max()
    assert err < 1e-9, (tag, err)
    assert int(ch.timing_offset(slotNo=0)) == int(d[f"{tag}_offset"])


@pytest.fixture(scope="module")
def deepmimo_fixture():
    d = np.load(f"{GOLDEN}/deepmimo.npz")
    pts = [TrjPoint(d["xyz"][i], 1, d["pathInfo"][i], d["dist"][i], 0)
           for i in range(len(d["xyz"]))]
    dm = DeepMimoData.fromPoints(pts, 3.5e9, d["bsXyz"],
                                 tuple(d["gridSize"]), d["delta"])
    return d, dm


def test_deepmimo_interpolation_golden(deepmimo_fixture):
    """Path-matched per-slot interpolation is bit/1e-9 identical to the
    reference (reference deepmimo.py:833-945)."""
    d, dm = deepmimo_fixture
    car = CarrierConfig(numRbs=12, spacing=30)
    traj = dm.interpolateTrajectory([int(i) for i in d["interp_idx"]], 5.0, car)
    assert traj.numPoints == len(d["interp_xyz"])
    for i, p in enumerate(traj):
        assert np.abs(p.xyz - d["interp_xyz"][i]).max() < 1e-9
        assert p.sampleNo == int(d["interp_sampleNo"][i])
        assert np.abs(p.speed - d["interp_speed"][i]).max() < 1e-9
        assert p.hasLos == int(d["interp_hasLos"][i])
        assert np.abs(p.pathInfo - d["interp_pathInfo"][i]).max() < 1e-8


@pytest.mark.parametrize("tag,kw", [
    ("pX", dict(trajDir="+X")), ("mX", dict(trajDir="-X")),
    ("pY", dict(trajDir="+Y")), ("mY", dict(trajDir="-Y")),
    ("all", dict(trajDir="All")),
    ("prob", dict(trajDir="All", prob=(0.2, 0.5, 0.3))),
    ("dist", dict(trajDir="All", trajLen=6.0))])
def test_deepmimo_random_walk_golden(deepmimo_fixture, tag, kw):
    """Random grid walks are bit-identical to the reference under the same
    PCG64 stream (reference deepmimo.py:707-803; reference RNG seed n ==
    np.random.default_rng(np.random.PCG64(n)))."""
    d, dm = deepmimo_fixture
    kw = dict(kw)
    n = kw.pop("trajLen", 24)
    i = ["pX", "mX", "pY", "mY", "all", "prob", "dist"].index(tag)
    rng = np.random.default_rng(np.random.PCG64(1000 + i))
    walk = dm.getRandomGridTraj(np.array([[0, 0], [11, 7]]), 2, n,
                                rng=rng, **kw)
    assert np.array_equal(walk, d[f"walk_{tag}"]), tag


def test_trajectory_draw(channel):
    """Trajectory.draw (reference trjchan.py:434-476) renders the xy path
    with the start point marked; smoke-tested on the Agg backend."""
    import matplotlib
    matplotlib.use("Agg")
    _, traj, _ = channel
    ax = traj.draw()
    assert len(ax.lines) == 1 and len(ax.collections) == 1
    import matplotlib.pyplot as plt
    plt.close("all")
