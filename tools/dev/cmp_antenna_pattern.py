"""Dev-only: compare antenna pattern analysis vs reference."""
import sys
import numpy as np
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference")
import matplotlib
matplotlib.use("Agg")
from neoradium import AntennaPanel as RefPanel
from neoradium_tpu.channels.antenna import AntennaPanel

theta = np.arange(0, 180, 5.0)
phi = np.arange(-180, 180, 5.0)
for shape, pol in [([2, 2], "|"), ([4, 2], "x"), ([1, 4], "+")]:
    ref = RefPanel(shape, polarization=pol)
    mine = AntennaPanel(tuple(shape), polarization=pol)
    sv_r = ref.getSteeringVector(theta, phi)
    sv_m = mine.getSteeringVector(theta, phi)
    assert np.abs(sv_r - sv_m).max() < 1e-9, (shape, pol, "sv")
    f_r = ref.getField(theta, phi)
    f_m = mine.getField(theta, phi)
    assert np.abs(f_r - f_m).max() / np.abs(f_r).max() < 1e-9, (shape, pol, "field")
    p_r = ref.getPowerPattern(theta, phi)
    p_m = mine.getPowerPattern(theta, phi)
    assert np.abs(p_r - p_m).max() / np.abs(p_r).max() < 1e-9, (shape, pol, "pow")
    d_r = ref.getDirectivity(theta, phi)
    d_m = mine.getDirectivity(theta, phi)
    assert np.abs(d_r - d_m).max() < 1e-6, (shape, pol, "dir", np.abs(d_r - d_m).max())
    # beamformed with REAL weights: exact parity (w.T == w^H there)
    n = ref.getNumElements()
    rng = np.random.default_rng(0)
    wr = rng.normal(size=n)
    d_rw = ref.getDirectivity(theta, phi, weights=wr)
    d_mw = mine.getDirectivity(theta, phi, weights=wr)
    assert np.abs(d_rw - d_mw).max() < 1e-6, (shape, pol, "dirW-real")
    # complex weights: DOCUMENTED DEVIATION — the reference's w.svCov.w^T
    # integral is not Hermitian and goes negative (directivity clipped to
    # -120 dBi); ours uses w.svCov.w^H. Check ours is finite & sane where
    # the reference degenerates.
    wc = np.conj(mine.getSteeringVector(90.0, 30.0).reshape(-1)) / np.sqrt(n)
    d_mc = mine.getDirectivity(90.0, 30.0, weights=wc)
    assert np.all(np.isfinite(d_mc)) and float(np.max(d_mc)) > 0, (shape, pol, "dirW-cplx")
    print(shape, pol, "steering/field/power/directivity OK")
print("ANTENNA PATTERN MATCH OK")
