"""Closed-loop CSI feedback -> PDSCH link adaptation.

Wires the CSI report (:class:`~neoradium_tpu.phy.csifeedback.CsiReport`)
back into the transmitter, per drop:

  channel drop -> CSI-RS -> [LS estimate] -> RI/PMI/CQI report ->
  rank = RI, codebook precoder from PMI, MCS from CQI (TS 38.214 CQI
  table row -> modulation + code rate) -> PDSCH Monte-Carlo slots at that
  configuration -> delivered-bit throughput.

This CLOSES a loop the reference leaves open: its notebooks compose the
CSI report (Playground/CSI-RS) and the PDSCH sweep (Playground/PDSCH)
manually and never feed PMI/CQI back into the transmitter — its CQI path
is a stub (reference csifeedback.py:383-385 getEffectiveSINR returns
None). SURVEY.md §3.4 defines the composition; this module implements it.

Design: the adaptation decision is HOST-side per channel drop (reports in
practice have a much longer period than a slot), while the Monte-Carlo
noise trials for the chosen configuration run as one jitted vmap with the
effective channel as a TRACED argument — one compilation per distinct
(rank, modulation, code rate) configuration, reused across drops and SNRs.

MCS selection uses the wideband CQI's table row directly: the CQI
definition (TS 38.214 §5.2.2.1: highest CQI whose TBS would be received
with BLER <= 0.1) makes the row's (modulation, codeRate) the transmit
choice a real scheduler would make from this report.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..carrier import CarrierConfig
from ..grid import apply_channel_freq
from ..phy.csifeedback import CsiReport, CQI_TABLES
from ..phy.csirs import CsiRsConfig
from ..random import PRNG
from ..rx.chest import LsChannelEstimator
from .link import PdschLinkSim


class AdaptivePdschLink:
    """CSI-driven adaptive PDSCH link over a stochastic fading channel.

    Args:
      carrier: CarrierConfig.
      channelModel: a ChannelBase-derived stochastic channel whose nt
        matches the CSI-RS port count.
      csiRsKw: kwargs for CsiRsConfig (numPorts defaults to the channel nt).
      reportKw: kwargs for CsiReport (n1/n2/cqiTable/...).
      dmrsKw: kwargs for the PDSCH DMRS of the data transmissions.
      chEst: 'perfect' (report computed on the true channel) or 'ls'
        (report computed on an LS estimate from the noisy CSI-RS RX).
      maxLayers: cap on the rank actually used for transmission (the
        report may still measure a higher rank; 2-codeword operation is
        exercised when the cap allows rank 5+).
      decoderIter / decoderDtype: LDPC decode settings for the data slots.

    The data slots use the frequency-domain path with the PMI codebook
    precoder folded into an effective channel (L, K, Nr, rank) that enters
    the jitted trial as a traced operand, and MMSE equalization with
    perfect knowledge of that effective channel — the estimation loop
    under test is the CSI one, not the per-slot DMRS one.
    """

    def __init__(self, carrier: CarrierConfig, channelModel, csiRsKw=None,
                 reportKw=None, dmrsKw=None, chEst: str = "ls",
                 maxLayers: int = 4, decoderIter: int = 5,
                 decoderDtype=None, cqiBackoffDb: float = 3.0):
        if chEst not in ("perfect", "ls"):
            raise ValueError("chEst must be 'perfect' or 'ls'")
        # Scheduler SNR margin: the CQI definition maps effective SINR to
        # the highest spectral efficiency at CHANNEL CAPACITY; a real code
        # at finite block length needs ~2-3 dB less efficiency for
        # BLER <= 0.1 (measured here: at -4 dB the capacity rule picks CQI
        # 8 while the BLER cliff sits between CQI 6 and 7). The margin is
        # applied at MCS selection; the reported CQI itself stays at the
        # spec capacity mapping.
        self.cqiBackoffDb = float(cqiBackoffDb)
        self.carrier = carrier
        self.chan = channelModel
        self.nr, self.nt = channelModel.nrNt
        self.csiRs = CsiRsConfig(carrier=carrier,
                                 **{"numPorts": self.nt, **(csiRsKw or {})})
        self.report = CsiReport(self.csiRs, **(reportKw or {}))
        if self.report.numPorts != self.nt:
            raise ValueError("CSI-RS ports must match the channel tx count")
        self.dmrsKw = dmrsKw or {}
        self.chEst = chEst
        self.maxLayers = maxLayers
        self.decoderIter = decoderIter
        self.decoderDtype = decoderDtype
        self._est = (LsChannelEstimator.from_csirs(self.csiRs)
                     if chEst == "ls" else None)
        self._pilots = np.asarray(self.csiRs.pilot_grid(0))
        self._sims: dict = {}     # (rank, modulation, rate1024) -> (sim, fn)

    # ------------------------------------------------------------- report
    def measure(self, state, snrDb: float, key):
        """One CSI measurement: returns (report dict incl. per-subband
        precoders ``ws``, true channel H (L, K, Nr, Nt), noiseVar)."""
        snr = float(10.0 ** (snrDb / 10.0))
        noiseVar = 1.0 / (snr * self.nr)
        H = self.chan.channel_matrix(state, 0)
        if self.chEst == "ls":
            rx = apply_channel_freq(jnp.asarray(self._pilots), H)
            rx = rx + PRNG.awgn_from_key(key, rx.shape, float(np.sqrt(noiseVar)))
            hMeas, _nvMeas = self._est.estimate(rx)
            hMeas = np.asarray(hMeas)
            # the report's SINRs use the KNOWN noise floor, not the
            # estimator's CIR-denoising noiseVar: that estimator (a
            # reference-parity behavior tuned for DMRS combs,
            # grid.py:811-837) reads ~channel power for sparse CSI-RS
            # pilot layouts, which would pin the CQI at its minimum. A
            # real UE's CSI-SINR likewise comes from a long-term noise
            # floor measurement, not a per-shot pilot residual.
        else:
            hMeas = np.asarray(H)
        rep = self.report.computeReport(hMeas, noiseVar)
        rank = min(int(rep["rank"]), self.maxLayers)
        pmi, ws, sbReSinr = self.report.bestPmiForRank(hMeas, rank, noiseVar)
        vals = np.concatenate([np.asarray(s).reshape(-1) for s in sbReSinr])
        effSinr = 2.0 ** np.mean(np.log2(1 + np.maximum(vals, 0))) - 1
        rep.update(txRank=rank, pmi=pmi, ws=ws, effSinr=float(effSinr))
        return rep, H, noiseVar

    # ------------------------------------------------------- configuration
    def _mcs_from_cqi(self, cqi: int):
        mod, rate1024, _ = CQI_TABLES[self.report.cqiTable][cqi]
        return (None if mod is None else (mod, rate1024))

    def _mcs_from_sinr(self, effSinr: float):
        """Highest CQI-table row whose efficiency fits the backed-off
        effective SINR (see cqiBackoffDb note)."""
        s = effSinr / 10.0 ** (self.cqiBackoffDb / 10.0)
        eff = np.log2(1 + max(s, 0))
        table = CQI_TABLES[self.report.cqiTable]
        best = None
        for row in table[1:]:
            if row[2] is not None and row[2] <= eff:
                best = (row[0], row[1])
        return best

    def _sim_for(self, rank: int, mod: str, rate1024: int):
        key = (rank, mod, rate1024)
        if key not in self._sims:
            sim = PdschLinkSim(
                self.carrier,
                pdschKw=dict(numLayers=rank, modulation=mod),
                dmrsKw=dict(self.dmrsKw), codeRate=rate1024 / 1024,
                domain="freq", numRx=self.nr,
                decoderIter=self.decoderIter, useRxPower=False,
                decoderDtype=self.decoderDtype)

            def fn(keys, snrDb, heff, _sim=sim):
                return jax.vmap(lambda k: _sim.run_slot(k, snrDb, heff))(keys)

            self._sims[key] = (sim, jax.jit(fn))
        return self._sims[key]

    def _effective_channel(self, H, ws):
        """Fold the per-subband codebook precoders into (L, K, Nr, rank)."""
        H = np.asarray(H)
        K = H.shape[1]
        if len(ws) == 1:
            F = np.broadcast_to(np.asarray(ws[0]), (K,) + np.asarray(ws[0]).shape)
        else:
            sbSize = (self.report.prgSize if self.report.prgSize is not None
                      else self.report.subbandSizePmi)
            reps = [12 * n for n in self.report.subbands(sbSize)]
            F = np.concatenate([np.broadcast_to(np.asarray(w), (n,) + np.asarray(w).shape)
                                for w, n in zip(ws, reps)])
            if F.shape[0] != K:
                raise ValueError("subband precoders do not cover the carrier")
        return jnp.asarray(np.einsum("lkrt,ktn->lkrn", H, F))

    # ------------------------------------------------------------- running
    def run_drop(self, key, snrDb: float, numTrials: int = 32,
                 fixedMcs: tuple | None = None):
        """One channel drop: CSI measurement + numTrials noise realizations
        at the selected (or ``fixedMcs``-forced) configuration.

        Returns a dict with the report, the chosen MCS, and
        ``bitsPerSlot`` — delivered (CRC-passing) information bits per
        slot averaged over the noise trials.
        """
        kChan, kCsi, kData = jax.random.split(jax.random.PRNGKey(key)
                                              if isinstance(key, int) else key, 3)
        state = self.chan.init_state(kChan)
        rep, H, _ = self.measure(state, snrDb, kCsi)
        mcs = (fixedMcs if fixedMcs is not None
               else self._mcs_from_sinr(rep["effSinr"]))
        out = dict(report=rep, mcs=mcs, rank=rep["txRank"])
        if mcs is None:          # CQI 0: out of range, no transmission
            out["bitsPerSlot"] = 0.0
            return out
        mod, rate1024 = mcs
        sim, fn = self._sim_for(rep["txRank"], mod, int(rate1024))
        heff = self._effective_channel(H, rep["ws"])
        keys = jax.random.split(kData, numTrials)
        m = fn(keys, jnp.float32(snrDb), heff)
        okBlocks = np.asarray(m["blocks"] - m["blockErrors"], np.float64)
        perCw = np.asarray(sim.tbs, np.float64)
        if len(sim.tbs) == 1:
            delivered = okBlocks * perCw[0]
        else:
            # blocks - blockErrors counts CRC-passing codewords; with two
            # codewords of (near-)equal TBS the mean TBS per passing block
            # is exact for equal sizes and a <1-bit approximation otherwise
            delivered = okBlocks * perCw.mean()
        out["bitsPerSlot"] = float(delivered.mean())
        out["tbs"] = [int(t) for t in sim.tbs]
        return out

    def run(self, snrDbs, numDrops: int = 8, numTrials: int = 32, seed: int = 0,
            fixedMcs: tuple | None = None):
        """Mean delivered bits/slot at each SNR over ``numDrops`` channel
        drops x ``numTrials`` noise trials. The drop keys depend only on
        (seed, snr index, drop index), so adaptive and fixed-MCS runs with
        the same seed see IDENTICAL channel drops — paired comparison."""
        results = []
        for i, snrDb in enumerate(snrDbs):
            tput, drops = 0.0, []
            for d in range(numDrops):
                k = jax.random.fold_in(jax.random.PRNGKey(seed), i * 1000 + d)
                r = self.run_drop(k, float(snrDb), numTrials, fixedMcs)
                drops.append(r)
                tput += r["bitsPerSlot"]
            results.append(dict(snrDb=float(snrDb),
                                bitsPerSlot=tput / numDrops, drops=drops))
        return results
