"""DMRS / PTRS / CSI-RS resource mapping (mirrors reference
Playground/DMRS and Playground/CSI-RS notebooks): configure pilots, populate
a slot grid, print the RE-type statistics, and save the RE map plot.

Run: python examples/dmrs_ptrs_map.py  (saves dmrs_ptrs_map.png)
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
    carrier = nr.CarrierConfig(numRbs=24, spacing=30)
    csirs = nr.CsiRsConfig(carrier=carrier, numPorts=4, period=10, offset=0)
    pdsch = nr.PdschConfig(carrier, numLayers=2, modulation="16QAM",
                           symSet=range(2, 14), csiRsConfig=csirs)
    pdsch.setDMRS(configType=2, additionalPos=1, otherCdmGroups=(1,))
    pdsch.setPTRS(timeDensity=4, freqDensity=2)
    plan = pdsch.plan(0)

    from neoradium_tpu.grid import HostGrid, RE_TYPES
    host = HostGrid(*plan.shape)
    host.reTypeIds = plan.reTypeIds
    host.grid = np.asarray(plan.pilotGrid, np.complex128)
    print("RE-type statistics for one slot:")
    for name, count in sorted(host.stats().items()):
        print(f"  {name:12s} {count}")

    bits = nr.PRNG(0).bits(plan.bitSizes[0])
    grid = plan.populate(bits)
    print(f"grid: {grid.shape}, mean RE power "
          f"{float(np.mean(np.abs(np.asarray(grid))**2)):.3f}")

    ax = host.drawMap(ports=(0, 1))
    fig = (ax[0] if isinstance(ax, (list, tuple)) else ax).figure
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "dmrs_ptrs_map.png")
    fig.savefig(out, dpi=100, bbox_inches="tight")
    print(f"saved {out}")


if __name__ == "__main__":
    main()
