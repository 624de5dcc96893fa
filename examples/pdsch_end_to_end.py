"""Canonical PDSCH end-to-end slot (mirrors reference
Playground/PDSCH/PDSCH-endToEnd.ipynb; SURVEY.md §3.1).

Walks the full TX->RX chain explicitly — TBS, LDPC encode, grid assembly
with DMRS, SVD precoding, OFDM, CDL fading, AWGN, sync, LS channel
estimation, MMSE equalization, LLRs, LDPC decode — using the library's
functional per-stage APIs (the packaged PdschLinkSim runs the same chain
as one jittable function).

Run: python examples/pdsch_end_to_end.py
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
    carrier = nr.CarrierConfig(numRbs=51, spacing=30)
    pdsch = nr.PdschConfig(carrier, numLayers=2, modulation="16QAM")
    pdsch.setDMRS(configType=2, additionalPos=2)
    plan = pdsch.plan(slotNo=0)

    chan = nr.CdlChannel(
        carrier, "C", delaySpread=300, carrierFreq=4e9, dopplerShift=5,
        txAntenna=nr.AntennaPanel((2, 4), polarization="x"),   # 16 TX
        rxAntenna=nr.AntennaPanel((1, 2), polarization="x"))   # 4 RX
    state = chan.init_state(jax.random.PRNGKey(0))

    # --- TX
    tbs = pdsch.getTxBlockSize(490 / 1024)[0]
    enc = nr.LdpcEncoder(nr.LdpcConfig(tbs, baseGraphNo=1, modulation="16QAM",
                                       txLayers=2, g=plan.bitSizes[0]))
    payload = nr.random.bits(tbs)
    rmBits = enc.encode_tb(jnp.asarray(payload))
    grid = plan.populate(rmBits)                             # (2, L, K) + DMRS

    H = chan.channel_matrix(state)                           # (L, K, 4, 16)
    F = pdsch.precoding_matrix_traced(H)                     # (16, 2)
    txGrid = nr.precode(grid, F)

    ofdm = nr.OfdmContext(carrier)
    wf = ofdm.modulate(txGrid)
    wf = jnp.pad(wf, [(0, 0), (0, chan.getMaxDelay())])

    # --- channel + noise
    rx = chan.apply_to_signal(wf, state)
    snrDb = 20.0
    w = nr.Waveform(rx).addNoise(key=jax.random.PRNGKey(1), snrDb=snrDb,
                                 carrier=carrier, useRxPower=True)
    synced = w.sync(int(chan.timing_offset(state)))

    # --- RX
    rxGrid = ofdm.demodulate(synced.waveform[:, :ofdm.numSamples])
    est = nr.LsChannelEstimator(pdsch)
    hEff, estNoiseVar = est.estimate(rxGrid)
    eqGrid, llrScales = nr.mmse_equalize(rxGrid, hEff, w.noiseVar * carrier.nFFT)
    llrs = plan.extract_llrs(eqGrid, llrScales, w.noiseVar * carrier.nFFT)[0]

    dec = nr.LdpcDecoder(enc.cfg)
    decoded, ok, _ = dec.decode_tb(llrs, numIter=8)
    ber = float(jnp.mean(decoded != jnp.asarray(payload)))
    print(f"SNR {snrDb} dB: TBS={tbs}, CRC {'OK' if bool(ok) else 'FAIL'}, "
          f"BER={ber:.2e}")


if __name__ == "__main__":
    main()
