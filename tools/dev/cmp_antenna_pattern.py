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
    # beamformed
    n = ref.getNumElements()
    rng = np.random.default_rng(0)
    w = rng.normal(size=n) + 1j * rng.normal(size=n)
    d_rw = ref.getDirectivity(theta, phi, weights=w)
    d_mw = mine.getDirectivity(theta, phi, weights=w)
    assert np.abs(d_rw - d_mw).max() < 1e-6, (shape, pol, "dirW")
    print(shape, pol, "steering/field/power/directivity OK")
print("ANTENNA PATTERN MATCH OK")
