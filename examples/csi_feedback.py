"""CSI feedback pipeline (mirrors reference Playground/CSI-RS + csifeedback;
SURVEY.md §3.4): CSI-RS population -> channel + noise -> LS estimation from
CSI-RS -> RI/PMI/CQI report.

Run: python examples/csi_feedback.py
"""
import numpy as np
import jax
import jax.numpy as jnp

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# Examples default to CPU for fast startup; set NR_TPU=1 to run on TPU.
if not os.environ.get("NR_TPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

import neoradium_tpu as nr


def main():
    carrier = nr.CarrierConfig(numRbs=24, spacing=30)
    csiCfg = nr.CsiRsConfig(carrier=carrier, numPorts=8)
    report = nr.CsiReport(csiCfg, n1=4, n2=1, cqiTable=2)

    chan = nr.CdlChannel(
        carrier, "B", delaySpread=100, dopplerShift=20,
        txAntenna=nr.AntennaPanel((1, 4), polarization="x"),   # 8 ports
        rxAntenna=nr.AntennaPanel((1, 2), polarization="|"))
    state = chan.init_state(jax.random.PRNGKey(2))
    H = np.asarray(chan.channel_matrix(state))                 # (L, K, 2, 8)

    # transmit CSI-RS through the channel, estimate from the pilots
    pilots = jnp.asarray(csiCfg.pilot_grid(0))
    rx = nr.apply_channel_freq(pilots, jnp.asarray(H))
    noiseVar = 1e-3
    rx = rx + nr.PRNG.awgn_from_key(jax.random.PRNGKey(3), rx.shape,
                                    np.sqrt(noiseVar))
    est = nr.LsChannelEstimator.from_csirs(csiCfg)
    hEst, estNv = est.estimate(rx)

    r = report.computeReport(np.asarray(hEst), float(estNv))
    print(f"rank (RI) = {r['rank']}")
    print(f"PMI       = i1={r['pmi'][0]}, i2 per subband={r['pmi'][1]}")
    print(f"CQI       = {r['cqi']} (subbands: {r['subbandCqis']})")

    # other report quantities on the same estimate
    li = nr.CsiReport(csiCfg, n1=4, n2=1, cqiTable=2,
                      quantity="CriRiLiPmiCqi").computeReport(
        np.asarray(hEst), float(estNv))
    print(f"LI        = {li['li']} (strongest layer of rank {li['rank']})")
    rsrp = nr.CsiReport(csiCfg, n1=4, n2=1,
                        quantity="CriRsrp").computeReport(
        np.asarray(hEst), float(estNv))
    sinr = nr.CsiReport(csiCfg, n1=4, n2=1,
                        quantity="CriSinr").computeReport(
        np.asarray(hEst), float(estNv))
    print(f"CSI-RSRP  = {rsrp['rsrpDb']:.1f} dB (cri={rsrp['cri']})")
    print(f"CSI-SINR  = {sinr['sinrDb']:.1f} dB")

    # Rel-15 Type-2 codebook (functional here; the reference's is a stub):
    # L-beam linear combining with quantized amplitudes/phases
    rep2 = nr.CsiReport(csiCfg, n1=4, n2=1, cqiTable=2,
                        codebookType="Type2", numBeams=2, pskSize=8)
    r2 = rep2.computeReport(np.asarray(hEst), float(estNv))
    i1 = r2["pmi"][0]
    print(f"Type2     = rank {r2['rank']}, q=(i11)={i1[0]}, i12={i1[1]}, "
          f"CQI {r2['cqi']} (Type1SP CQI above: {r['cqi']})")


if __name__ == "__main__":
    main()
