"""Antenna pattern analysis (mirrors reference Playground/Antenna notebooks):
element/panel directivity, steering, and radiation-pattern plots.

Run: python examples/antenna_patterns.py  (saves antenna_patterns.png)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if not os.environ.get("NR_TPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

import neoradium_tpu as nr


def main():
    # single 3GPP element (TR 38.901 Table 7.3-1 parabolic pattern)
    elem = nr.AntennaElement(beamWidth=(65, 65), maxAttenuation=30)
    print("Single element:")
    print(f"  boresight directivity: {float(np.max(elem.getDirectivity(90.0, 0.0))):.2f} dBi "
          f"(expected ~8 dBi for the 65deg 3GPP element)")

    # 4x4 panel, half-wavelength spacing
    panel = nr.AntennaPanel((4, 4), polarization="|")
    print(f"4x4 panel: {panel.getNumElements()} elements, "
          f"boresight directivity {float(np.max(panel.getDirectivity(90.0, 0.0))):.2f} dBi")

    # steering vector toward 30 deg azimuth
    sv = panel.getSteeringVector(90.0, 30.0)
    w = np.conj(np.asarray(sv).reshape(-1)) / np.sqrt(panel.getNumElements())
    d0 = float(np.max(panel.getDirectivity(90.0, 30.0, weights=w)))
    print(f"  steered to (theta=90, phi=30): directivity {d0:.2f} dBi")

    fig = plt.figure(figsize=(12, 4))
    ax1 = fig.add_subplot(1, 3, 1, projection="polar")
    elem.drawRadiation(theta=90.0, radiationType="Directivity", ax=ax1,
                       title="Element azimuth cut")
    ax2 = fig.add_subplot(1, 3, 2, projection="polar")
    panel.drawRadiation(theta=90.0, radiationType="Directivity", ax=ax2,
                        title="4x4 panel azimuth cut")
    ax3 = fig.add_subplot(1, 3, 3, projection="3d")
    panel.drawRadiation(radiationType="Directivity", ax=ax3,
                        title="4x4 panel 3-D pattern")
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "antenna_patterns.png")
    fig.savefig(out, dpi=100, bbox_inches="tight")
    print(f"saved {out}")


if __name__ == "__main__":
    main()
