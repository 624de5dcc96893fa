"""Channel-model base machinery — fractional-delay filtering, CIR construction,
time/frequency-domain channel application.

TPU design split:
- Host (config time): windowed-sinc fractional-delay FIR bank (Kaiser window),
  per-path coefficient matrix (path delays are static per config), slot timing
  tables (symbol-start sample indices).
- Device (jit/vmap over trials): per-symbol complex path gains (from the
  derived model), CIR = gains @ coeffMatrix (one matmul), channel offset
  (argmax of summed CIR), frequency channel matrix (FFT of CIR), and
  time-domain application as an FFT-based batched convolution over all paths
  at once (replacing the reference's per-path ``scipy.signal.lfilter`` loop,
  channelmodel.py:438-440).

Behavioral parity: reference ``neoradium/channelmodel.py`` — FIR construction
(buildFirs:249-289), coefficient matrix with causal-latency padding
(getCoeffMatrix:292-318), per-slot gain evaluation points
(prepareForNextSlot:321-354), channel matrix (getChannelMatrix:362-400),
signal application (applyToSignal:403-448), gain normalization
(getChannelGains:451-469).
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..carrier import CarrierConfig
from ..utils import toLinear, toDb


def build_firs(filterLen: int = 16, delayQuantSize: int = 64,
               stopBandAtten: float = 80) -> np.ndarray:
    """(delayQuantSize+1, filterLen) polyphase windowed-sinc FIR bank."""
    if stopBandAtten > 50:
        beta = 0.1102 * (stopBandAtten - 8.7)
    elif stopBandAtten < 21:
        beta = 0.0
    else:
        beta = 0.5842 * (stopBandAtten - 21) ** 0.4 + 0.07886 * (stopBandAtten - 21)
    nn = delayQuantSize * filterLen
    win = np.kaiser(nn + 1, beta)
    m = np.arange(-nn // 2, nn // 2 + 1) / delayQuantSize
    fir = win * np.sinc(m)
    fir[0: nn + 1: delayQuantSize] = 0  # zero crossings of the ideal sinc
    fir[nn // 2] = 1
    bank = fir[:-1].reshape(filterLen, delayQuantSize).T
    return np.concatenate([bank, np.roll(bank[:1], -1)])


def coeff_matrix(pathDelays_ns: np.ndarray, sampleRate: int, firs: np.ndarray,
                 filterLen: int, delayQuantSize: int):
    """Per-path FIR rows -> (coeffMatrix (numPaths, coeffLen), filterDelay)."""
    delays = np.asarray(pathDelays_ns) * 1e-9 * sampleRate
    intDelays = delays.astype(np.int32)
    fracs = delays - intDelays
    filterDelay = int(np.clip(filterLen // 2 - 1 - intDelays.min(), 0, None))
    intDelays = intDelays + filterDelay
    qIdx = np.round(delayQuantSize * (1 - fracs)).astype(np.int32)
    fracCoeffs = firs[qIdx]                                   # (numPaths, filterLen)
    numPaths = len(delays)
    coeffLen = int(intDelays.max()) + filterLen // 2 + 1
    cm = np.zeros((numPaths, coeffLen))
    for p in range(numPaths):
        s = intDelays[p] - filterLen // 2 + 1
        cm[p, s: s + filterLen] = fracCoeffs[p]
    return cm, filterDelay


class ChannelBase:
    """Shared channel-model machinery. Derived models implement ``nrNt`` and
    ``path_gains(state, t0)``.

    The model is *functional*: per-trial randomness lives in an explicit
    ``state`` pytree (created by ``init_state(key)``), and the current time
    enters as ``t0`` (slot-start sample index) — no object mutation between
    slots. ``slot_start_sample(slotNo)`` converts the loop variable.
    """

    def __init__(self, carrier: CarrierConfig, **kwargs):
        self.carrier = carrier
        self.sampleRate = carrier.sampleRate
        self.dopplerShift = kwargs.get("dopplerShift", 40)
        self.carrierFreq = kwargs.get("carrierFreq", 3.5e9)
        self.normalizeGains = kwargs.get("normalizeGains", True)
        self.normalizeOutput = kwargs.get("normalizeOutput", True)
        self.txDir = kwargs.get("txDir", "Downlink")
        if self.txDir not in ("Downlink", "Uplink"):
            raise ValueError("txDir must be 'Downlink' or 'Uplink'")
        self.filterLen = kwargs.get("filterLen", 16)
        self.stopBandAtten = kwargs.get("stopBandAtten", 80)
        self.delayQuantSize = kwargs.get("delayQuantSize", 64)
        self.firs = build_firs(self.filterLen, self.delayQuantSize, self.stopBandAtten)
        # pathDelays/pathPowers set by the derived class before _finalize().

    def _finalize(self):
        """Called by derived classes once pathDelays/pathPowers are fixed."""
        self.coeffMatrix, self.filterDelay = coeff_matrix(
            self.pathDelays, self.sampleRate, self.firs,
            self.filterLen, self.delayQuantSize)

    # ------------------------------------------------------------ printing
    def _print_rows(self):
        """Common property rows; subclasses extend (reference
        ChannelModel.print + per-model print)."""
        ghz = self.carrierFreq / 1e9
        return [("carrierFreq", f"{ghz:g} GHz"),
                ("normalizeGains", self.normalizeGains),
                ("normalizeOutput", self.normalizeOutput),
                ("txDir", self.txDir),
                ("filterLen", f"{self.filterLen} samples"),
                ("delayQuantSize", self.delayQuantSize),
                ("stopBandAtten", f"{self.stopBandAtten} dB"),
                ("dopplerShift", f"{self.dopplerShift:g} Hz"),
                ("coherenceTime", f"{self.coherenceTime * 1e3:.3f} "
                                  "milliseconds")]

    def print(self, indent: int = 0, title: str | None = None,
              getStr: bool = False):
        from ..utils import format_properties
        s = format_properties(
            title or f"{type(self).__name__} Properties:",
            self._print_rows(), indent)
        if getStr:
            return s
        print(s)

    def __repr__(self):
        return self.print(getStr=True)

    # ------------------------------------------------------------- timing
    @property
    def coherenceTime(self) -> float:
        return float(np.sqrt(9 / (16 * np.pi)) / self.dopplerShift)

    def slot_start_sample(self, slotNo: int) -> int:
        c = self.carrier
        full, rem = divmod(slotNo, c.slotsPerSubFrame)
        subframeSamples = int(c.symbolLensSubframe.sum())
        return full * subframeSamples + int(
            c.symbolLensSubframe[: rem * c.symbolsPerSlot].sum())

    def gain_times(self, slotNo):
        """(nc+1,) absolute sample indices where gains are evaluated.

        ``slotNo`` may be a Python int or a traced int32 (for ``lax.scan``
        over slots) — all per-slot tables are static stacks indexed by
        slot-in-subframe, so the traced path is a single gather.
        """
        c = self.carrier
        spsf = c.slotsPerSubFrame
        subframeSamples = int(c.symbolLensSubframe.sum())
        cumStarts = np.asarray(
            [int(c.symbolLensSubframe[: r * c.symbolsPerSlot].sum())
             for r in range(spsf)], np.int64)
        offsets = np.stack([self.gain_sample_offsets(r) for r in range(spsf)])
        if isinstance(slotNo, (int, np.integer)):
            full, rem = divmod(int(slotNo), spsf)
            return full * subframeSamples + cumStarts[rem] + offsets[rem]
        full = slotNo // spsf
        rem = slotNo % spsf
        return (full * subframeSamples + jnp.asarray(cumStarts)[rem]
                + jnp.asarray(offsets)[rem])

    def gain_sample_offsets(self, slotNo: int = 0) -> np.ndarray:
        """(nc+1,) sample offsets within the slot where gains are evaluated
        (just after each symbol's CP — reference channelmodel.py:328-334)."""
        c = self.carrier
        s = c.slotNoInSubFrame(slotNo) * c.symbolsPerSlot
        symLens = np.concatenate([c.symbolLensSubframe, c.symbolLensSubframe])[
            s: s + c.symbolsPerSlot + 1].astype(np.int64)
        symLens = symLens.copy()
        symLens[0] -= c.nFFT
        return np.cumsum(symLens)

    def sym_lens(self, slotNo: int = 0) -> np.ndarray:
        c = self.carrier
        s = c.slotNoInSubFrame(slotNo) * c.symbolsPerSlot
        return np.concatenate([c.symbolLensSubframe, c.symbolLensSubframe])[
            s: s + c.symbolsPerSlot + 1].astype(np.int64)

    def getMaxDelay(self) -> int:
        return int(np.ceil(self.pathDelays.max() * self.sampleRate / 1e9
                           + self.filterDelay))

    # ------------------------------------------------------------- gains/CIR
    @property
    def nrNt(self):
        raise NotImplementedError

    def path_gains(self, state, tSamples):
        """(nc+1, nr, nt, numPaths) complex gains at sample times tSamples."""
        raise NotImplementedError

    def init_state(self, key):
        """Per-trial random channel state pytree (default: stateless)."""
        return ()

    def channel_gains(self, state, tSamples):
        """Normalized gains (reference getChannelGains:451-469)."""
        g = self.path_gains(state, tSamples)
        if self.normalizeOutput:
            g = g / np.sqrt(self.nrNt[0])
        if self.normalizeGains:
            g = g / np.sqrt(toLinear(self.pathPowers).sum())
        return g

    def cir(self, gains, cm=None):
        """gains (nc[+1], nr, nt, pp) -> CIR (nc, nr, nt, coeffLen) + offset."""
        if cm is None:
            cm = jnp.asarray(self.coeffMatrix, dtype=gains.real.dtype)
        c = jnp.einsum("crtp,pl->crtl", gains, cm.astype(gains.dtype))
        return c, self.cir_offset(c)

    @staticmethod
    def cir_offset(c):
        """Timing offset = argmax of the tx-and-time-summed |CIR| (reference
        prepareForNextSlot chanOffset, channelmodel.py:346)."""
        return jnp.argmax(jnp.sum(jnp.abs(jnp.sum(c, axis=(0, 2))), axis=0))

    def slot_cirs(self, state, slotNo):
        """(nc+1, nr, nt, coeffLen) per-symbol-time CIRs for one slot —
        the normalized path gains contracted with the fractional-delay
        coefficient rows. Every channel output (channel matrix, TD
        convolution, timing offset, mean channel) consumes the CIR, so this
        is the hook fused models override: CdlChannel contracts its ray
        terms straight against the coefficient rows without materializing
        per-cluster gains (see CdlChannel.slot_cirs)."""
        gains1 = self.slot_gains(state, slotNo)
        cm = jnp.asarray(self.slot_cm(slotNo))
        return jnp.einsum("crtp,pl->crtl", gains1, cm.astype(gains1.dtype))

    # --------------------------------------------------------------- hooks
    # Derived models with per-slot path sets (TrjChannel) override these two;
    # stochastic models (CDL/TDL) use the static coefficient matrix and gains
    # that depend only on the evaluation times.
    def slot_gains(self, state, slotNo):
        """Normalized (nc+1, nr, nt, pp) gains for one slot (slotNo may be
        traced)."""
        return self.channel_gains(state, self.gain_times(slotNo))

    def slot_cm(self, slotNo):
        """(pp, coeffLen) fractional-delay coefficient rows for one slot."""
        return self.coeffMatrix

    # ------------------------------------------------------------- outputs
    def channel_matrix(self, state=None, slotNo=0):
        """(L, K, nr, nt) frequency-domain channel for one slot.

        ``slotNo`` may be traced (see :meth:`gain_times`)."""
        c = self.slot_cirs(state, slotNo)[:-1]
        return self._cir_to_freq(c, self.cir_offset(c))

    def apply_to_grid(self, grid, state=None, slotNo=0):
        """Frequency-domain channel application to a (P, L, K) grid
        (reference ChannelModel.applyToGrid): returns the (Nr, L, K) RX
        grid through this slot's channel matrix. Convenience composition
        of :meth:`channel_matrix` + :func:`~neoradium_tpu.grid.
        apply_channel_freq`; the sims' hot path uses
        :meth:`effective_channel_matrix` instead (never materializes H)."""
        from ..grid import apply_channel_freq
        return apply_channel_freq(grid, self.channel_matrix(state, slotNo))

    def effective_channel_matrix(self, state, slotNo, F):
        """(L, K, nr, nl) post-precoding channel H @ F for a wideband
        precoder F (nt, nl), WITHOUT materializing the (L, K, nr, nt)
        channel tensor: the precoder contracts against the short CIR
        (nc, nr, nt, cl) BEFORE the tap->subcarrier DFT, so the DFT matmul
        shrinks by nt/nl and the only (L, K)-sized tensor is the effective
        channel itself (~nt/nl x less HBM traffic; at the headline config
        H is 2.2 MB/trial vs Heff 0.55 MB). Equals
        ``channel_matrix(...) @ F`` up to float reassociation."""
        c = self.slot_cirs(state, slotNo)[:-1]             # (nc, nr, nt, cl)
        offset = self.cir_offset(c)
        nt, nl = F.shape
        # contraction over the tiny nt axis unrolled (SoA rule)
        ceff = jnp.stack(
            [sum(c[..., t, :] * F[t, n] for t in range(nt))
             for n in range(nl)], axis=-2)                 # (nc, nr, nl, cl)
        return self._cir_to_freq(ceff, offset)

    def _cir_to_freq(self, c, offset):
        """(nc, nr, np, cl) CIR -> (L, K, nr, np) frequency response.

        Direct DFT of the short CIR as ONE matmul (MXU) over the cl ~ 100
        taps x K wanted subcarriers, instead of zero-padding to nFFT,
        rolling by the (traced) timing offset, and a full FFT; the offset
        roll becomes a per-subcarrier phase ramp (shift theorem). ~23ms ->
        ~1ms per 256-trial batch on the headline bench. The complex matmul
        runs in explicit real arithmetic: XLA's complex-dot lowering
        shuffles real/imag planes through transposed copies (same pathology
        as CdlChannel.slot_cirs); 4 real MXU matmuls read each plane once."""
        nFFT = self.carrier.nFFT
        nc, nr, np_, cl = c.shape
        K = self.carrier.numSubcarriers
        W = getattr(self, "_dft_w", None)
        if W is None or W.shape != (cl, K):
            kIdx = np.concatenate(
                [np.arange(K // 2) + nFFT - K // 2, np.arange(K // 2)])
            self._dft_kidx = kIdx
            W = np.exp(-2j * np.pi * np.outer(np.arange(cl), kIdx) / nFFT)
            self._dft_w = W                                    # complex128 host
        c2 = c.reshape(nc * nr * np_, cl)
        cr, ci = jnp.real(c2), jnp.imag(c2)
        Wr, Wi = jnp.asarray(W.real, cr.dtype), jnp.asarray(W.imag, cr.dtype)
        h = jax.lax.complex(cr @ Wr - ci @ Wi, cr @ Wi + ci @ Wr)
        rdt = jnp.real(h).dtype
        ramp = jnp.exp(2j * jnp.pi * jnp.asarray(self._dft_kidx, rdt)
                       * (offset.astype(rdt) / nFFT)).astype(h.dtype)
        h = (h * ramp).reshape(nc, nr, np_, K)
        return jnp.transpose(h, (0, 3, 1, 2))                  # (L, K, nr, np)

    def mean_channel(self, state=None, slotNo=0):
        """Mean over (L, K) of :meth:`channel_matrix`, computed directly
        from the CIR: the (traced-offset) phase ramp times the DFT column
        average over the centered subcarrier set {-K/2..K/2-1} has the
        closed Dirichlet form e^{-j pi d/nFFT} sin(pi K d/nFFT)/sin(pi
        d/nFFT)/K with d = offset - tap. Exactly equals
        ``channel_matrix(...).mean(axis=(0, 1))`` without ever reading the
        (L, K, nr, nt) tensor (~GBs at Monte-Carlo batch sizes) — used by
        the wideband SVD precoder (sim/link.py). Within one jitted trial
        XLA CSEs the shared gains/CIR computation with channel_matrix."""
        c = self.slot_cirs(state, slotNo)[:-1]
        offset = self.cir_offset(c)
        nc, nr, nt, cl = c.shape
        nFFT = self.carrier.nFFT
        K = self.carrier.numSubcarriers
        rdt = jnp.real(c).dtype
        d = offset.astype(rdt) - jnp.arange(cl, dtype=rdt)
        ang = jnp.pi * d / nFFT
        den = jnp.sin(ang)
        mag = jnp.where(jnp.abs(den) < 1e-12, jnp.asarray(K, rdt),
                        jnp.sin(K * ang) / jnp.where(
                            jnp.abs(den) < 1e-12, 1.0, den))
        f = (mag / K) * jnp.exp(-1j * ang.astype(c.dtype))
        return jnp.mean(c, axis=0) @ f.astype(c.dtype)        # (nr, nt)

    def apply_to_signal(self, waveform, state=None, slotNo: int = 0,
                        symMapSlot: int | None = None):
        """waveform (..., nt, ns) -> received (..., nr, ns).

        Symbol-blocked overlap-save convolution with per-symbol CIRs
        (reference applyToSignal:403-448 semantics: the path gains are
        constant within each OFDM symbol, keyed by the OUTPUT sample's
        symbol). Because the gains are per-symbol, the per-path gain mix
        folds into one short per-symbol CIR (nr, nt, cl) BEFORE the
        convolution: each symbol block convolves against its own CIR with a
        left halo of cl-1 samples — ~10x less FFT work and ~50x less memory
        than the monolithic all-paths FFT over the whole slot (no
        (paths, nt, nfft) intermediate).

        The per-sample symbol map is a static gather: ``slotNo`` must be a
        host int, OR pass a traced ``slotNo`` (for the gain times) together
        with a host-int ``symMapSlot`` giving the slot-in-subframe CP
        pattern to use (callers scan over slots and lax.switch over the
        distinct patterns).
        """
        cirs1 = self.slot_cirs(state, slotNo)              # (nc+1, nr, nt, cl)
        ns = waveform.shape[-1]
        cl = cirs1.shape[-1]
        halo = cl - 1
        symLens = np.asarray(
            self.sym_lens(slotNo if symMapSlot is None else symMapSlot),
            np.int64)
        # host-side block table: one block per OFDM symbol; channel-delay
        # pad samples past the last symbol boundary extend the final block
        # (they take the last symbol's gains, as in the reference)
        starts = np.concatenate([[0], np.cumsum(symLens)[:-1]])
        lens = symLens.copy()
        if ns > symLens.sum():
            lens[-1] += ns - symLens.sum()
        elif ns < symLens.sum():
            keep = starts < ns
            starts, lens = starts[keep], lens[keep].copy()
            lens[-1] = ns - starts[-1]
        nb = len(starts)
        lmax = int(lens.max())
        nfft = int(2 ** np.ceil(np.log2(halo + lmax + cl)))
        # gather blocks with their left halo; idx < 0 is the true zero
        # prefix of the stream. Reads past a block's own end (right overrun
        # up to lmax, real samples of the NEXT block) only influence conv
        # outputs we discard, so only the left mask is needed.
        idx = starts[:, None] - halo + np.arange(halo + lmax)[None, :]
        mask = jnp.asarray(idx >= 0, waveform.dtype)
        blocks = waveform[..., jnp.asarray(np.clip(idx, 0, ns - 1))] * mask
        # per-block CIR -> frequency response (short FFTs)
        gIdx = np.minimum(np.arange(nb), len(symLens) - 1)
        c = cirs1[jnp.asarray(gIdx)]                       # (nb, nr, nt, cl)
        C = jnp.fft.fft(c, nfft, axis=-1)                  # (nb, nr, nt, f)
        X = jnp.fft.fft(blocks, nfft, axis=-1)             # (..., nt, nb, f)
        Y = jnp.einsum("...tbf,brtf->...brf", X, C)        # (..., nb, nr, f)
        y = jnp.fft.ifft(Y, axis=-1)[..., halo: halo + lmax]
        # static scatter back to the sample stream
        bOf = np.searchsorted(starts, np.arange(ns), side="right") - 1
        flat = (bOf * lmax + (np.arange(ns) - starts[bOf])).astype(np.int32)
        y2 = jnp.swapaxes(y, -3, -2)                       # (..., nr, nb, lmax)
        y2 = y2.reshape(y2.shape[:-2] + (nb * lmax,))
        return y2[..., jnp.asarray(flat)]

    def apply_to_signal_sharded(self, waveform, state=None, mesh=None,
                                slotNo: int = 0, axisName: str = "sample"):
        """Distributed :meth:`apply_to_signal`: overlap-save FFT convolution
        with a ``ppermute`` halo exchange over a device mesh.

        The TPU-native equivalent of the reference's monolithic lfilter path
        (reference channelmodel.py:403-448; halo size = getMaxDelay,
        channelmodel.py:196-205, SURVEY.md §5): the sample stream shards
        over ``mesh.axis_names[axisName]``, each device convolves its block
        plus a left halo of ``coeffLen - 1`` samples fetched from its
        neighbor with one ``ppermute``, and the per-symbol gain mix uses the
        pre-gathered per-sample gains, themselves sharded over samples — so
        no collective is needed after the halo exchange and the result
        equals the single-device path up to FFT-size float association.

        Args:
          waveform: (..., nt, ns); leading dims are replicated.
          mesh: jax.sharding.Mesh containing ``axisName``.
        Returns (..., nr, ns) on the same sample sharding.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P
        from jax import shard_map

        if mesh is None:
            raise ValueError("apply_to_signal_sharded needs a Mesh "
                             "containing the sample axis")
        if axisName not in mesh.axis_names:
            raise ValueError(f"mesh has no axis {axisName!r} "
                             f"(axes: {mesh.axis_names})")

        gains1 = self.slot_gains(state, slotNo)            # (nc+1, nr, nt, pp)
        ns = waveform.shape[-1]
        cm = np.asarray(self.slot_cm(slotNo))
        pp, cl = cm.shape
        halo = cl - 1
        D = mesh.shape[axisName]
        nb = -(-ns // D)                                   # block length
        if halo > nb:
            # The halo exchange fetches from the immediate neighbor only; a
            # longer channel would need samples from further away and the
            # slice below would silently mis-align the overlap-save blocks.
            raise ValueError(
                f"channel memory ({halo} samples) exceeds the per-device "
                f"block ({nb} samples); shard over at most "
                f"{max(1, ns // max(halo, 1))} devices for this waveform")
        pad = nb * D - ns
        if pad:
            waveform = jnp.pad(waveform, [(0, 0)] * (waveform.ndim - 1)
                               + [(0, pad)])
        symLens = self.sym_lens(slotNo)
        symIdx = np.repeat(np.arange(len(symLens)), symLens)[: nb * D]
        if nb * D > symLens.sum():
            symIdx = np.append(symIdx, np.full(nb * D - symLens.sum(),
                                               len(symLens) - 1))
        gps = gains1[jnp.asarray(symIdx)]                  # (ns', nr, nt, pp)
        nfft = int(2 ** np.ceil(np.log2(nb + halo + cl)))
        C = jnp.fft.fft(jnp.asarray(cm), nfft, axis=-1)    # (pp, nfft)

        def block_fn(wf, g):
            # wf: (..., nt, nb) local block; g: (nb, nr, nt, pp) local gains
            tail = wf[..., -halo:] if halo else wf[..., :0]
            left = jax.lax.ppermute(tail, axisName,
                                    [(i, i + 1) for i in range(D - 1)])
            padded = jnp.concatenate([left, wf], axis=-1)  # (..., nt, nb+halo)
            X = jnp.fft.fft(padded, nfft, axis=-1)
            y = jnp.fft.ifft(X[..., None, :, :] * C[:, None, :],
                             axis=-1)[..., halo: halo + nb]
            return jnp.einsum("srtp,...pts->...rs", g.astype(y.dtype), y)

        lead = (None,) * (waveform.ndim - 2)
        out = shard_map(block_fn, mesh=mesh,
                        in_specs=(P(*lead, None, axisName), P(axisName)),
                        out_specs=P(*lead, None, axisName))(
            jax.device_put(waveform,
                           NamedSharding(mesh, P(*lead, None, axisName))),
            jax.device_put(gps, NamedSharding(mesh, P(axisName))))
        return out[..., :ns] if pad else out

    def timing_offset(self, state=None, slotNo=0):
        return self.cir_offset(self.slot_cirs(state, slotNo)[:-1])
