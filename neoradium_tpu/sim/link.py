"""End-to-end PDSCH link-level simulation — the framework's flagship pipeline.

One jitted, vmap-able function runs a full slot:

  payload bits -> TB CRC -> LDPC encode -> rate match -> scramble -> QAM ->
  layer map -> grid (+DMRS) -> [precode] -> OFDM modulate -> channel/AWGN ->
  OFDM demodulate -> [equalize] -> LLRs -> descramble -> rate recover ->
  LDPC decode -> CRC -> BER/BLER counters

Monte-Carlo design: the function is pure in (key, snrDb); trials are vmapped
and sharded over a device mesh (see sim/sweep.py). SNR enters as a traced
scalar so one compilation serves the whole sweep.

Mirrors the reference's canonical pipeline (SURVEY.md §3.1,
Playground/PDSCH/PDSCH-endToEnd.ipynb) with the MATLAB-convention SNR scaling
(noiseVar = 1/(Nr*nFFT*snr) in time domain, 1/(Nr*snr) in freq domain —
reference waveform.py:289, grid.py:1184).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..carrier import CarrierConfig
from ..coding.ldpc import LdpcConfig, LdpcEncoder, LdpcDecoder
from ..ofdm import OfdmContext
from ..phy.pdsch import PdschConfig
from ..random import PRNG
from ..grid import apply_channel_freq, precode
from ..rx.equalize import mmse_equalize
from ..rx.chest import LsChannelEstimator


class PdschLinkSim:
    """A configured PDSCH end-to-end link, ready to run Monte-Carlo slots.

    Args:
      carrier: CarrierConfig.
      pdschKw: kwargs for PdschConfig (numLayers, modulation, ...).
      dmrsKw: kwargs for DmrsConfig via setDMRS.
      codeRate: LDPC target code rate (TBS derived via TS 38.214 §5.1.3.2).
      slotNo: slot number (fixes DMRS sequences and reserved patterns).
      domain: 'time' (OFDM mod/demod + waveform AWGN) or 'freq' (grid AWGN).
      numRx: number of receive antennas (freq-domain channel path). If None,
        equals numLayers and the channel is identity (pure AWGN loopback,
        perfect chEst).
      decoderIter: LDPC decoder iterations.
    """

    def __init__(self, carrier: CarrierConfig, pdschKw: dict | None = None,
                 dmrsKw: dict | None = None, codeRate: float = 490 / 1024,
                 slotNo: int = 0, domain: str = "time", numRx: int | None = None,
                 decoderIter: int = 5, windowing: bool = False, seed: int = 0,
                 channelModel=None, chEst: str = "perfect",
                 useRxPower: bool = True, decoderDtype=None):
        if domain not in ("time", "freq"):
            raise ValueError("domain must be 'time' or 'freq'")
        # chEst: 'perfect', 'ls', or any object with an
        # estimate(rxGrid) -> (hEst, noiseVar) method (e.g. the ML-refined
        # ml.chestnet.MlChannelEstimator — the reference's SelfRefining
        # receiver composition, MLChEstEvaluateBLER.ipynb)
        customEst = not isinstance(chEst, str)
        if not customEst and chEst not in ("perfect", "ls"):
            raise ValueError("chEst must be 'perfect', 'ls', or an object "
                             "with an estimate() method")
        self.carrier = carrier
        self.domain = domain
        self.decoderIter = decoderIter
        # None -> float32 (bit-identical to the reference). "bfloat16" is the
        # TPU fast path: ~2x decoder VPU throughput / half the HBM traffic at
        # negligible BLER cost (see LdpcDecoder.decode docstring).
        import jax.numpy as _jnp
        self.decoderDtype = (_jnp.float32 if decoderDtype is None
                             else _jnp.dtype(decoderDtype))
        self._llrDtype = (_jnp.bfloat16 if self.decoderDtype == _jnp.int8
                          else self.decoderDtype)
        self.windowing = windowing
        self.channelModel = channelModel
        self.chEst = chEst
        self.useRxPower = useRxPower
        self.pdsch = PdschConfig(carrier, **(dict(pdschKw or {})))
        self.pdsch.setDMRS(**(dmrsKw or {}))
        self.plan = self.pdsch.plan(slotNo)
        self.slotNo = slotNo
        if channelModel is not None:
            numRx = channelModel.nrNt[0]
        self.numRx = numRx if numRx is not None else self.pdsch.numLayers
        self.codeRate = codeRate
        if customEst:
            self.estimator = chEst
            self.chEst = chEst = "custom"
        else:
            self.estimator = (LsChannelEstimator(self.pdsch, slotNo)
                              if (channelModel is not None and chEst == "ls")
                              else None)

        self.tbs = self.pdsch.getTxBlockSize(codeRate)
        self.ldpc = []
        for q in range(self.pdsch.numCW):
            cfg = LdpcConfig(self.tbs[q], baseGraphNo=1,
                             modulation=self.pdsch.modems[q].modulation,
                             txLayers=(self.pdsch.numLayers if self.pdsch.numCW == 1
                                       else [self.pdsch.numLayers // 2,
                                             self.pdsch.numLayers - self.pdsch.numLayers // 2][q]),
                             targetRate=codeRate, g=self.plan.bitSizes[q])
            self.ldpc.append((LdpcEncoder(cfg), LdpcDecoder(cfg)))
        self.ofdm = OfdmContext(carrier, carrier.slotNoInSubFrame(slotNo))
        self.rng = PRNG(seed)

    # ----------------------------------------------------------------- slot
    def run_slot(self, key: jax.Array, snrDb: jnp.ndarray,
                 channel: jnp.ndarray | None = None):
        """Run one full TX->RX slot. Returns a dict of scalar metrics.

        Args:
          key: jax PRNG key for this trial (payload bits + noise).
          snrDb: traced scalar SNR in dB (MATLAB convention, see module doc).
          channel: optional frequency-domain channel (L, K, Nr, Nt); when
            given, the grid passes through it and an MMSE equalizer with
            perfect CSI runs at the receiver.
        """
        plan, pdsch = self.plan, self.pdsch
        numCW = pdsch.numCW
        kBits, kNoise, kChan = jax.random.split(key, 3)
        snr = 10.0 ** (snrDb / 10.0)

        # TX
        payloads, rmBits = [], []
        for q in range(numCW):
            kq = jax.random.fold_in(kBits, q)
            payload = jax.random.bernoulli(kq, 0.5, (self.tbs[q],)).astype(jnp.int8)
            payloads.append(payload)
            rmBits.append(self.ldpc[q][0].encode_tb(payload))
        grid = plan.populate(rmBits if numCW > 1 else rmBits[0])   # (Nl, L, K)

        chan = self.channelModel
        Heff = None
        if chan is not None:
            # stochastic fading channel: fresh realization per trial
            state = chan.init_state(kChan)
            if pdsch.wideband_full_band:
                # averaged channel straight from the CIR (Dirichlet kernel,
                # ChannelBase.mean_channel) — skips a full read of H
                F = pdsch.precoder_from_mean(
                    chan.mean_channel(state, self.slotNo))
                H = None
            else:
                H = chan.channel_matrix(state, self.slotNo)        # (L, K, nr, nt)
                F = pdsch.precoding_matrix_traced(H)               # (nt, nl)/(K, nt, nl)
            if self.domain == "freq" and F.ndim == 2:
                # wideband precoder folded into the channel BEFORE the
                # tap->subcarrier DFT (effective_channel_matrix): the
                # (L, K, nr, nt) tensor and the precoded grid are never
                # materialized — only the nl-wide effective channel is
                Heff = chan.effective_channel_matrix(state, self.slotNo, F)
                txGrid = grid
            else:
                if H is None:
                    H = chan.channel_matrix(state, self.slotNo)
                txGrid = precode(grid, F)                          # (nt, L, K)
        elif channel is not None:
            H, F = channel, None
            txGrid = grid
        else:
            H, F = None, None
            txGrid = grid
        nr = self.numRx if chan is not None else (
            channel.shape[-2] if channel is not None else grid.shape[-3])

        # channel application + AWGN
        if self.domain == "time":
            wf = self.ofdm.modulate(txGrid, windowing=self.windowing)
            if chan is not None:
                wf = jnp.pad(wf, [(0, 0)] * (wf.ndim - 1) + [(0, chan.getMaxDelay())])
                rxWf = chan.apply_to_signal(wf, state, self.slotNo)
            elif channel is not None:
                raise ValueError("Static freq channel requires domain='freq'")
            else:
                rxWf = wf
            if self.useRxPower and chan is not None:
                # reference waveform.py:107-142: per-RE power from CP-stripped
                # FFT windows, sigma^2 = rePower*nFFT/snr
                fftW = rxWf[..., jnp.asarray(self.ofdm.tables["demod_idx"])]
                x = fftW.reshape(fftW.shape[:-3] + (-1,))
                rePow = jnp.var(x, axis=-1) / self.carrier.numSubcarriers
                sigma = jnp.sqrt(rePow * self.carrier.nFFT / snr)
            else:
                sigma = jnp.sqrt(1.0 / (snr * nr * self.carrier.nFFT))
            noisy = rxWf + PRNG.awgn_from_key(kNoise, rxWf.shape, 1.0) \
                * sigma.astype(jnp.float32)
            if chan is not None:
                offset = chan.timing_offset(state, self.slotNo)
                noisy = jax.lax.dynamic_slice_in_dim(
                    noisy, offset, self.ofdm.numSamples, axis=-1)
            rxGrid = self.ofdm.demodulate(noisy)
            noiseVar = sigma ** 2 * self.carrier.nFFT
        else:
            if Heff is not None:
                rxGrid0 = apply_channel_freq(txGrid, Heff)
            else:
                rxGrid0 = apply_channel_freq(txGrid, H) if H is not None else txGrid
            if self.useRxPower and (H is not None or Heff is not None):
                # reference grid.py:1028-1046: sigma^2 = grid.var()/snr
                x = rxGrid0.reshape(rxGrid0.shape[:-3] + (-1,))
                sigma = jnp.sqrt(jnp.var(x, axis=-1) / snr)
            else:
                sigma = jnp.sqrt(1.0 / (snr * nr))
            rxGrid = rxGrid0 + PRNG.awgn_from_key(
                kNoise, rxGrid0.shape, 1.0) * sigma.astype(jnp.float32)
            noiseVar = sigma ** 2

        # RX: channel estimation + equalization
        if chan is not None:
            if self.chEst in ("ls", "custom"):
                hEff, _estNv = self.estimator.estimate(rxGrid)
            elif Heff is not None:
                hEff = Heff                                        # (L, K, nr, nl)
            else:
                hEff = H @ (F if F.ndim >= 3 else F[None, None])   # (L, K, nr, nl)
            eqGrid, llrScales = mmse_equalize(rxGrid, hEff, noiseVar)
        elif channel is not None:
            eqGrid, llrScales = mmse_equalize(rxGrid, channel, noiseVar)
        else:
            eqGrid, llrScales = rxGrid, None

        llrs = plan.extract_llrs(eqGrid, llrScales, noiseVar)
        if self.decoderDtype != jnp.float32:
            # cast at the demod boundary so XLA fuses it into the LLR
            # producer and rate recovery's pads/sums also run in the reduced
            # dtype — the float32 LLR tensor (~190 MB at batch 768) never
            # touches HBM. decoderDtype='int8' quantizes INSIDE decode
            # (per-codeword scale, LdpcDecoder._quantize_int8), so its
            # boundary/rate-recovery dtype is bfloat16.
            llrs = [l.astype(self._llrDtype) for l in llrs]
        bitErr = jnp.zeros((), jnp.int32)
        blkErr = jnp.zeros((), jnp.int32)
        cbErr = jnp.zeros((), jnp.int32)
        totalBits, totalBlocks, totalCbs = 0, 0, 0
        for q in range(numCW):
            decoded, ok, cbOk, _ = self.ldpc[q][1].decode_tb_full(
                llrs[q], numIter=self.decoderIter, dtype=self.decoderDtype)
            bitErr = bitErr + jnp.sum(decoded != payloads[q], dtype=jnp.int32)
            blkErr = blkErr + (~ok).astype(jnp.int32)
            cbErr = cbErr + jnp.sum(~cbOk, dtype=jnp.int32)
            totalBits += self.tbs[q]
            totalBlocks += 1
            totalCbs += self.ldpc[q][0].cfg.numCodeBlocks
        return dict(bitErrors=bitErr, blockErrors=blkErr,
                    bits=jnp.int32(totalBits), blocks=jnp.int32(totalBlocks),
                    cbErrors=cbErr, cbs=jnp.int32(totalCbs))

    # ------------------------------------------------------------ jit entry
    def make_trial_fn(self, channel: jnp.ndarray | None = None):
        """(key, snrDb) -> metrics; vmap/jit/shard at will."""
        def fn(key, snrDb):
            return self.run_slot(key, snrDb, channel)
        return fn

    # ---------------------------------------------------- TD slot machinery
    def _td_patterns(self):
        """Distinct slot CP patterns within a subframe.

        Returns ([(slotInSubframe, OfdmContext)], branchOfSlot (spsf,)).
        At 15/30 kHz every slot shares one pattern; at >=60 kHz the slots
        containing the long-CP symbols (0 and 7*2^mu of the subframe) differ
        from the rest, so a traced slot number needs a lax.switch.
        """
        car = self.carrier
        pats, pmap, seen = [], [], {}
        for r in range(car.slotsPerSubFrame):
            s = r * car.symbolsPerSlot
            key = tuple(car.symbolLensSubframe[s: s + car.symbolsPerSlot])
            if key not in seen:
                seen[key] = len(pats)
                pats.append((r, OfdmContext(car, r)))
            pmap.append(seen[key])
        return pats, np.asarray(pmap, np.int32)

    def td_channel_rx(self, txGrid, chanState, slotNo, kNoise, snr):
        """One slot through the TIME-domain channel path with a traced slot
        number: OFDM modulate -> pad -> fractional-delay channel -> AWGN ->
        timing sync -> OFDM demodulate. Returns (rxGrid, noiseVar).

        The static CP-pattern tables are selected by lax.switch over the
        distinct slot patterns (one branch at 15/30 kHz)."""
        chan = self.channelModel
        pats, pmap = self._td_patterns()

        def mk(r, ofdm):
            def f(_):
                wf = ofdm.modulate(txGrid, windowing=self.windowing)
                wf = jnp.pad(wf, [(0, 0)] * (wf.ndim - 1)
                             + [(0, chan.getMaxDelay())])
                rxWf = chan.apply_to_signal(wf, chanState, slotNo,
                                            symMapSlot=r)
                if self.useRxPower:
                    fftW = rxWf[..., jnp.asarray(ofdm.tables["demod_idx"])]
                    rePow = (jnp.var(fftW.reshape(fftW.shape[:-3] + (-1,)))
                             / self.carrier.numSubcarriers)
                    sigma = jnp.sqrt(rePow * self.carrier.nFFT / snr)
                else:
                    sigma = jnp.sqrt(1.0 / (snr * self.numRx
                                            * self.carrier.nFFT))
                noisy = rxWf + PRNG.awgn_from_key(
                    kNoise, rxWf.shape, 1.0) * sigma.astype(jnp.float32)
                offset = chan.timing_offset(chanState, slotNo)
                noisy = jax.lax.dynamic_slice_in_dim(
                    noisy, offset, ofdm.numSamples, axis=-1)
                return ofdm.demodulate(noisy), sigma ** 2 * self.carrier.nFFT
            return f

        if len(pats) == 1:
            return mk(*pats[0])(None)
        if isinstance(slotNo, (int, np.integer)):
            r = int(slotNo) % self.carrier.slotsPerSubFrame
            return mk(*pats[pmap[r]])(None)
        rem = slotNo % self.carrier.slotsPerSubFrame
        return jax.lax.switch(jnp.asarray(pmap)[rem],
                              [mk(r, o) for r, o in pats], None)

    def make_multislot_fn(self, numSlots: int):
        """(key, snrDb) -> summed metrics over ``numSlots`` consecutive slots
        with ONE fading realization evolving across them (the reference's
        per-SNR-point slot loop with channel.goNext(), SURVEY.md §3.2) as a
        ``lax.scan``. Supports both channel domains: 'freq' (grid-level) and
        'time' (OFDM + fractional-delay filtering + sync inside the scan).
        """
        if self.channelModel is None:
            raise ValueError("multislot path needs a channelModel")
        plan, pdsch, chan = self.plan, self.pdsch, self.channelModel
        numCW = pdsch.numCW

        def fn(key, snrDb):
            snr = 10.0 ** (snrDb / 10.0)
            kChan, kLoop = jax.random.split(key)
            state = chan.init_state(kChan)

            def step(carry, slotNo):
                kSlot = jax.random.fold_in(kLoop, slotNo)
                kBits, kNoise = jax.random.split(kSlot)
                payloads, rmBits = [], []
                for q in range(numCW):
                    kq = jax.random.fold_in(kBits, q)
                    p = jax.random.bernoulli(kq, 0.5, (self.tbs[q],)).astype(jnp.int8)
                    payloads.append(p)
                    rmBits.append(self.ldpc[q][0].encode_tb(p))
                grid = plan.populate(rmBits if numCW > 1 else rmBits[0])
                Heff = None
                if pdsch.wideband_full_band:
                    F = pdsch.precoder_from_mean(
                        chan.mean_channel(state, slotNo))
                    H = None
                else:
                    H = chan.channel_matrix(state, slotNo)
                    F = pdsch.precoding_matrix_traced(H)
                if self.domain == "freq" and F.ndim == 2:
                    # precoder folded into the CIR before the DFT — the
                    # full (L, K, nr, nt) tensor never materializes (see
                    # make_trial_fn / effective_channel_matrix)
                    Heff = chan.effective_channel_matrix(state, slotNo, F)
                    txGrid = grid
                else:
                    if H is None:
                        H = chan.channel_matrix(state, slotNo)
                    txGrid = precode(grid, F)
                if self.domain == "time":
                    rxGrid, noiseVar = self.td_channel_rx(
                        txGrid, state, slotNo, kNoise, snr)
                else:
                    rxGrid0 = apply_channel_freq(txGrid,
                                                 Heff if Heff is not None else H)
                    if self.useRxPower:
                        sigma = jnp.sqrt(jnp.var(rxGrid0.reshape(-1)) / snr)
                    else:
                        sigma = jnp.sqrt(1.0 / (snr * self.numRx))
                    rxGrid = rxGrid0 + PRNG.awgn_from_key(
                        kNoise, rxGrid0.shape, 1.0) * sigma.astype(jnp.float32)
                    noiseVar = sigma ** 2
                if self.chEst in ("ls", "custom"):
                    hEff, _ = self.estimator.estimate(rxGrid)
                elif Heff is not None:
                    hEff = Heff
                else:
                    hEff = H @ (F if F.ndim >= 3 else F[None, None])
                eqGrid, llrScales = mmse_equalize(rxGrid, hEff, noiseVar)
                llrs = plan.extract_llrs(eqGrid, llrScales, noiseVar)
                if self.decoderDtype != jnp.float32:
                    llrs = [l.astype(self._llrDtype) for l in llrs]
                bitErr = jnp.zeros((), jnp.int32)
                blkErr = jnp.zeros((), jnp.int32)
                for q in range(numCW):
                    decoded, ok, _ = self.ldpc[q][1].decode_tb(
                        llrs[q], numIter=self.decoderIter,
                        dtype=self.decoderDtype)
                    bitErr += jnp.sum(decoded != payloads[q], dtype=jnp.int32)
                    blkErr += (~ok).astype(jnp.int32)
                return carry, dict(bitErrors=bitErr, blockErrors=blkErr)

            _, ys = jax.lax.scan(step, (), jnp.arange(numSlots))
            totalBits = numSlots * sum(self.tbs[: numCW])
            return dict(bitErrors=jnp.sum(ys["bitErrors"]),
                        blockErrors=jnp.sum(ys["blockErrors"]),
                        bits=jnp.int32(totalBits),
                        blocks=jnp.int32(numSlots * numCW))
        return fn
