"""Dev-only: cross-validate SnrScheduler vs reference on synthetic curves."""
import sys
import numpy as np
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference")
from neoradium.snrhelper import SnrScheduler as RefSched
from neoradium_tpu.sim.snr import SnrScheduler as MySched

rng = np.random.default_rng(3)
for trial in range(30):
    mid = rng.uniform(-10, 10)
    width = rng.uniform(0.5, 6)
    snr0 = rng.uniform(-20, 25)
    step = rng.choice([0.2, 0.5, 1.0])
    def f(snr):
        return float(np.clip(100 * (1 - (snr - mid + width) / (2 * width)), 0, 100))
    a = RefSched(snr0=snr0, step=step)
    for s in a:
        a.setData(f(s))
    b = MySched(snr0=snr0, step=step)
    for s in b:
        b.setData(f(s))
    ra, rb = a.getSnrsAndData(), b.getSnrsAndData()
    assert np.allclose(ra[0], rb[0]), (trial, ra[0], rb[0])
    assert np.allclose(ra[1], rb[1]), trial
print("SNR SCHEDULER MATCH OK (30 random curves)")
