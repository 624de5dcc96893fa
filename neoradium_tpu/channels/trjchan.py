"""Trajectory (ray-tracing) channel — TR 38.901 §8.

TPU design: the trajectory is deterministic, so the entire per-point channel
description (delays -> per-point FIR coefficient matrices, angles/powers/
phases padded to the trajectory's maxPaths) is flattened host-side into
static arrays indexed by slot number; the gain evaluation (TR 38.901
Eqs. 7.5-28/29 with geometric Doppler r_hat . v / lambda) is the same
antenna-field einsum pipeline as the CDL channel. Zero-power padding keeps
ragged path counts (SURVEY.md §7 hard parts) out of the jitted shapes.

Behavioral parity: reference ``neoradium/trjchan.py`` — TrjChannel
parameters (trjchan.py:629-733), LOS gains Eq. 7.5-29 with ray-traced phase
(getLOSgains:876-921), NLOS gains Eq. 7.5-28 with shared XPR and ray-traced
phases (getNLOSgains:923-977), Doppler from 3-D velocity vs per-path arrival
vector (getDopplerFactor:979-990), delay normalization (pathDelays:749-754),
end-of-trajectory error (prepareForNextSlot:846-850), channel-sequence
generator (getChanSeqGen:993-1046).

Deviation (documented reference bug): the reference applies the NLOS
ray-traced initial phases as exp(1j*phase) with the phase still in DEGREES
(getNLOSgains:935 has no toRadian, while the LOS path at :898 converts);
we convert both to radians.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .base import ChannelBase, coeff_matrix
from .antenna import AntennaElement, antenna_spec, elements_fields
from ..utils import toLinear, toRadian

_C = 299792458.0


class TrjChannel(ChannelBase):
    """Deterministic ray-traced channel along a trajectory (one point/slot)."""

    def __init__(self, carrier, trajectory, **kwargs):
        kwargs.setdefault("rxOrientation", [0, 0, 0])
        super().__init__(carrier, **kwargs)
        self.trajectory = trajectory
        self.carrierFreq = trajectory.carrierFreq
        self.dopplerShift = trajectory.maxSpeed * self.carrierFreq / _C
        self.txAntenna = kwargs.get("txAntenna", AntennaElement())
        self.rxAntenna = kwargs.get("rxAntenna", AntennaElement())
        self.txOrientation = toRadian(kwargs.get("txOrientation", [0, 0, 0]))
        self.rxOrientation = toRadian(kwargs.get("rxOrientation", [0, 0, 0]))
        self.xPolPower = kwargs.get("xPolPower", 10.0)
        self.normalizeDelays = kwargs.get("normalizeDelays", True)
        self._txSpec = antenna_spec(self.txAntenna)
        self._rxSpec = antenna_spec(self.rxAntenna)
        self._coeff_cache = {}

    @property
    def nrNt(self):
        return (self.rxAntenna.getNumElements(), self.txAntenna.getNumElements())

    # ------------------------------------------------------------- per-point
    def _point(self, slotNo: int):
        if slotNo >= self.trajectory.numPoints:
            raise ValueError("Reached end of trajectory!")
        return self.trajectory[slotNo]

    def point_delays(self, slotNo: int) -> np.ndarray:
        p = self._point(slotNo)
        d = p.delays
        if self.normalizeDelays and len(d):
            d = d - d[0]
        return d

    def _point_coeffs(self, slotNo: int):
        key = tuple(np.round(self.point_delays(slotNo), 6))
        if key not in self._coeff_cache:
            self._coeff_cache[key] = coeff_matrix(
                np.asarray(key), self.sampleRate, self.firs,
                self.filterLen, self.delayQuantSize)
        return self._coeff_cache[key]

    def getMaxDelay(self, slotNo: int = None) -> int:
        if slotNo is None:
            slotNo = self.trajectory.curIdx
        d = self.point_delays(slotNo)
        if len(d) == 0:
            return self.filterLen // 2
        cm, fd = self._point_coeffs(slotNo)
        return int(np.ceil(d.max() * self.sampleRate / 1e9 + fd))

    # --------------------------------------------------------------- gains
    def _doppler(self, theta, phi, speed, tSamples):
        rHat = np.stack([np.sin(theta) * np.cos(phi),
                         np.sin(theta) * np.sin(phi), np.cos(theta)])
        shift = np.einsum("i...,i->...", rHat, speed) * self.carrierFreq / _C
        t = np.asarray(tSamples) / self.sampleRate
        return np.exp(2j * np.pi * t.reshape((-1,) + (1,) * shift.ndim) * shift)

    def point_gains(self, slotNo: int, tSamples) -> np.ndarray:
        """(nc, nr, nt, numPaths) gains for one trajectory point; None if the
        point has total blockage (reference getPathGains:852-874)."""
        p = self._point(slotNo)
        nr, nt = self.nrNt
        parts = []
        if p.hasLos == 1:
            phiA, thetaA, phiD, thetaD = (
                toRadian([p.losAoa, p.losZoa, p.losAod, p.losZod])[:, None, None])
            fieldTx, locTx = elements_fields(self._txSpec, thetaD, phiD,
                                             self.txOrientation)
            fieldRx, locRx = elements_fields(self._rxSpec, thetaA, phiA,
                                             self.rxOrientation)
            polMat = (np.exp(1j * toRadian(p.losPhase))
                      * np.asarray([[1.0, 0.0], [0.0, -1.0]]))
            h = np.einsum("ra,ab,tb->rt", np.asarray(fieldRx)[..., 0, 0],
                          polMat, np.asarray(fieldTx)[..., 0, 0])
            h = h * np.asarray(locRx)[:, None, 0, 0] * np.asarray(locTx)[None, :, 0, 0]
            dop = self._doppler(thetaA, phiA, p.speed, tSamples)[:, 0, 0]
            h = h[None] * dop[:, None, None] * np.sqrt(toLinear(p.losPower))
            parts.append(h[..., None])
        if p.numNlosPaths > 0:
            phiA, thetaA, phiD, thetaD = (
                toRadian([p.nlosAoas, p.nlosZoas, p.nlosAods, p.nlosZods])[:, :, None])
            fieldTx, locTx = elements_fields(self._txSpec, thetaD, phiD,
                                             self.txOrientation)
            fieldRx, locRx = elements_fields(self._rxSpec, thetaA, phiA,
                                             self.rxOrientation)
            fieldTx = np.asarray(fieldTx)[..., 0]     # (nt, 2, n)
            fieldRx = np.asarray(fieldRx)[..., 0]
            locTx = np.asarray(locTx)[..., 0]         # (nt, n)
            locRx = np.asarray(locRx)[..., 0]
            kappa = toLinear(self.xPolPower)
            polMat = (np.exp(1j * toRadian(p.nlosPhases))[None, None, :]
                      * np.sqrt(np.asarray([[1, 1 / kappa],
                                            [1 / kappa, 1]]))[:, :, None])
            h = np.einsum("ran,abn,tbn->rtn", fieldRx.astype(complex),
                          polMat, fieldTx.astype(complex))
            h = h * locRx[:, None, :] * locTx[None, :, :]
            dop = self._doppler(thetaA, phiA, p.speed, tSamples)[..., 0]  # (nc, n)
            h = h[None] * dop[:, None, None, :]
            h = h * np.sqrt(toLinear(p.nlosPowers))[None, None, None, :]
            parts.append(h)
        if not parts:
            return None
        return np.concatenate(parts, axis=-1)

    # -------------------------------------------------- ChannelBase plumbing
    def channel_gains_point(self, slotNo, tSamples):
        """Normalized (reference getChannelGains semantics) per-point gains."""
        g = self.point_gains(slotNo, tSamples)
        if g is None:
            return None
        if self.normalizeOutput:
            g = g / np.sqrt(self.nrNt[0])
        if self.normalizeGains:
            g = g / np.sqrt(toLinear(self._point(slotNo).powers).sum())
        return g

    def channel_matrix(self, state=None, slotNo: int = 0):
        """(L, K, nr, nt) for the trajectory point at ``slotNo``.

        Uses absolute slot sample times so Doppler phase is continuous
        across slots (the trajectory's own sampleNo timing governs speed)."""
        tS = self.gain_times(slotNo)
        gains = self.channel_gains_point(slotNo, tS)
        nFFT = self.carrier.nFFT
        K = self.carrier.numSubcarriers
        L = self.carrier.symbolsPerSlot
        nr, nt = self.nrNt
        if gains is None:
            return jnp.zeros((L, K, nr, nt), jnp.complex64)
        cm, _ = self._point_coeffs(slotNo)
        c = np.einsum("crtp,pl->crtl", gains[:-1], cm)
        offset = int(np.argmax(np.sum(np.abs(c.sum(axis=(0, 2))), axis=0)))
        buf = np.zeros(c.shape[:-1] + (nFFT,), complex)
        buf[..., :c.shape[-1]] = c
        buf = np.roll(buf, -offset, axis=-1)
        h = np.fft.fft(buf, axis=-1)
        idx = np.concatenate([np.arange(K // 2) + nFFT - K // 2,
                              np.arange(K // 2)])
        return jnp.asarray(np.transpose(h[..., idx], (0, 3, 1, 2)))

    def apply_to_signal(self, waveform, state=None, slotNo: int = 0):
        gains = self.channel_gains_point(slotNo, self.gain_times(slotNo))
        ns = waveform.shape[-1]
        nr, nt = self.nrNt
        if gains is None:
            return jnp.zeros(waveform.shape[:-2] + (nr, ns), jnp.complex64)
        cm, _ = self._point_coeffs(slotNo)
        pp, cl = cm.shape
        nfft = int(2 ** np.ceil(np.log2(ns + cl)))
        X = jnp.fft.fft(jnp.asarray(waveform), nfft, axis=-1)
        C = jnp.fft.fft(jnp.asarray(cm), nfft, axis=-1)
        y = jnp.fft.ifft(X[..., None, :, :] * C[:, None, :], axis=-1)[..., :ns]
        symLens = self.sym_lens(slotNo)
        symIdx = np.repeat(np.arange(len(symLens)), symLens)[:ns]
        if ns > symLens.sum():
            symIdx = np.append(symIdx, np.full(ns - symLens.sum(),
                                               len(symLens) - 1))
        gps = jnp.asarray(gains)[jnp.asarray(symIdx)]
        return jnp.einsum("srtp,...pts->...rs", gps, y)

    def timing_offset(self, state=None, slotNo: int = 0):
        gains = self.channel_gains_point(slotNo, self.gain_times(slotNo))
        if gains is None:
            return 0
        cm, _ = self._point_coeffs(slotNo)
        c = np.einsum("crtp,pl->crtl", gains[:-1], cm)
        return int(np.argmax(np.sum(np.abs(c.sum(axis=(0, 2))), axis=0)))

    # ------------------------------------------------------------- datasets
    def chan_seq_gen(self, seqPeriod: int = 1, seqLen: int = 10,
                     maxNumSeq: float = np.inf):
        """Generator of channel-matrix sequences (reference getChanSeqGen)."""
        n = 0
        slot = 0
        while n < maxNumSeq:
            seq = []
            ok = True
            for _ in range(seqLen):
                while slot % seqPeriod:
                    slot += 1
                if slot >= self.trajectory.numPoints:
                    ok = False
                    break
                seq.append(np.asarray(self.channel_matrix(slotNo=slot)))
                slot += 1
            if not ok:
                return
            n += 1
            yield np.stack(seq)
