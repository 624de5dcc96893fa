"""Closed-loop CSI feedback -> PDSCH link adaptation (sim/adaptive.py).

Per channel drop: CSI-RS -> LS estimate -> RI/PMI/CQI report -> the
TRANSMITTER adapts: rank = RI, codebook precoder from PMI, modulation +
code rate from the (backed-off) CQI-table row -> Monte-Carlo PDSCH slots ->
delivered throughput. Compares against fixed-MCS transmission over the
SAME channel drops.

This closes a loop the reference leaves open: its CSI example
(Playground/CSI-RS) stops at the report (and its CQI computation is a
stub, reference csifeedback.py:383-385); SURVEY.md §3.4 defines the
composition with the §3.2 PDSCH sweep that this example realizes.

Run: python examples/csi_link_adaptation.py   (CPU; NR_TPU=1 for TPU)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if not os.environ.get("NR_TPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

import neoradium_tpu as nr
from neoradium_tpu.sim import AdaptivePdschLink


def main():
    carrier = nr.CarrierConfig(numRbs=24, spacing=30)
    chan = nr.CdlChannel(
        carrier, "B", delaySpread=100, dopplerShift=20, carrierFreq=4e9,
        txAntenna=nr.AntennaPanel((1, 4), polarization="x"),   # 8 tx ports
        rxAntenna=nr.AntennaPanel((1, 2), polarization="|"))   # 2 rx
    link = AdaptivePdschLink(
        carrier, chan, reportKw=dict(n1=4, n2=1, cqiTable=2),
        dmrsKw=dict(configType=2, additionalPos=1), chEst="ls")

    snrs = [-8.0, -2.0, 4.0, 10.0, 16.0]
    print("adaptive (rank/PMI/MCS from the CSI report):")
    res = link.run(snrs, numDrops=4, numTrials=8, seed=1)
    for r in res:
        picks = {f"{m[0]}-{m[1]}" for m in
                 (d["mcs"] for d in r["drops"]) if m}
        print(f"  {r['snrDb']:6.1f} dB: {r['bitsPerSlot']:8.0f} bits/slot"
              f"   MCS picks: {sorted(picks)}")

    for mcs in [("QPSK", 449), ("64QAM", 466)]:
        resF = link.run(snrs, numDrops=4, numTrials=8, seed=1, fixedMcs=mcs)
        line = "  ".join(f"{r['bitsPerSlot']:8.0f}" for r in resF)
        print(f"fixed {mcs[0]}-{mcs[1]:3d} bits/slot: {line}")

    tputA = sum(r["bitsPerSlot"] for r in res)
    print(f"\nadaptive total across the sweep: {tputA:.0f} bits/slot "
          f"(the fixed configurations each lose at one end of the range)")


if __name__ == "__main__":
    main()
