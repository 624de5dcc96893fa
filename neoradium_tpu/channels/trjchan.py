"""Trajectory (ray-tracing) channel — TR 38.901 §8.

TPU design: the trajectory is deterministic, so the entire per-point channel
description is flattened host-side ONCE into static zero-padded stacks over
(numPoints, maxPaths): angles/phases/amplitudes/LOS flags/speeds plus the
per-point fractional-delay FIR coefficient rows (padded to one global
coefficient length). The jitted path is then pure gathers + the same
antenna-field einsum pipeline as the CDL channel: ``channel_matrix`` /
``timing_offset`` accept a *traced* slot number (so a whole trajectory can be
``vmap``-ed over slots or scanned inside one jit), and ``apply_to_signal``
jits with a static slot number like :class:`ChannelBase`. Zero-power padding
keeps ragged path counts (SURVEY.md §7 hard parts) out of the jitted shapes;
a totally-blocked point (no paths) yields an all-zero channel through the
same code path.

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
import jax
import jax.numpy as jnp

from .base import ChannelBase, coeff_matrix
from .antenna import AntennaElement, antenna_spec, elements_fields
from ..utils import toLinear, toRadian

_C = 299792458.0


class TrjChannel(ChannelBase):
    """Deterministic ray-traced channel along a trajectory (one point/slot)."""

    def _print_rows(self):
        rows = super()._print_rows()
        rows += [("xPolPower", f"{self.xPolPower:g} dB"),
                 ("normalizeDelays", self.normalizeDelays),
                 (None, self.trajectory.print(
                     getattr(self, "_printIndent", 0) + 2, "Trajectory:",
                     getStr=True))]
        return rows

    def print(self, indent: int = 0, title: str | None = None,
              getStr: bool = False):
        from ..utils import format_properties
        self._printIndent = indent
        s = format_properties(
            title or "Trajectory Channel Properties:",
            self._print_rows(), indent)
        if getStr:
            return s
        print(s)

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
        self._plan = None               # lazy static per-point device stacks

    @property
    def nrNt(self):
        return (self.rxAntenna.getNumElements(), self.txAntenna.getNumElements())

    # ------------------------------------------------------- host plan build
    def _device_plan(self) -> dict:
        """Static per-point stacks, built once host-side (NumPy) and cached.

        Shapes: N = numPoints, P = max(maxPaths, 1), Lc = global coeff len.
        Path lane order matches TrjPoint.pathInfo (LOS first when present);
        unused lanes have zero amplitude and zero FIR rows.
        """
        if self._plan is not None:
            return self._plan
        traj = self.trajectory
        N = traj.numPoints
        P = max(traj.maxPaths, 1)
        fl = self.filterLen
        angles = np.zeros((N, P, 4))                 # aoa, zoa, aod, zod (rad)
        phases = np.zeros((N, P))                    # initial phases (rad)
        amps = np.zeros((N, P))                      # sqrt(linear power)
        losFlag = np.zeros((N, P), bool)
        speeds = np.zeros((N, 3))
        scale = np.ones(N)                           # normalization multiplier
        cms, maxDelays = [], np.zeros(N, np.int64)
        for i, p in enumerate(traj.points):
            n = p.numPaths
            speeds[i] = p.speed
            if n == 0:
                cms.append(np.zeros((0, fl)))
                scale[i] = 0.0
                maxDelays[i] = fl // 2
                continue
            angles[i, :n] = toRadian(
                np.stack([p.aoas, p.zoas, p.aods, p.zods], axis=-1))
            phases[i, :n] = toRadian(p.phases)
            amps[i, :n] = np.sqrt(toLinear(p.powers))
            losFlag[i, 0] = p.hasLos == 1
            d = p.delays - (p.delays[0] if self.normalizeDelays else 0.0)
            cm, fd = coeff_matrix(d, self.sampleRate, self.firs, fl,
                                  self.delayQuantSize)
            cms.append(cm)
            maxDelays[i] = int(np.ceil(d.max() * self.sampleRate / 1e9 + fd))
            if self.normalizeOutput:
                scale[i] /= np.sqrt(self.nrNt[0])
            if self.normalizeGains:
                scale[i] /= np.sqrt(toLinear(p.powers).sum())
        Lc = max(max((cm.shape[1] for cm in cms), default=fl), fl)
        cmStack = np.zeros((N, P, Lc))
        for i, cm in enumerate(cms):
            cmStack[i, : cm.shape[0], : cm.shape[1]] = cm
        # NumPy (host) arrays on purpose: they may first be touched inside a
        # jit trace, where jnp conversion would capture leaked tracers; as
        # np constants they fold into whichever jit consumes them.
        self._plan = dict(angles=angles, phases=phases, amps=amps,
                          losFlag=losFlag, speeds=speeds, scale=scale,
                          cmStack=cmStack, maxDelays=maxDelays, numPaths=P)
        return self._plan

    def _check_slot(self, slotNo):
        """End-of-trajectory error for host slot numbers (reference
        prepareForNextSlot trjchan.py:846-850); traced slots are clipped."""
        if isinstance(slotNo, (int, np.integer)):
            if slotNo >= self.trajectory.numPoints:
                raise ValueError("Reached end of trajectory!")
            return slotNo
        return jnp.clip(slotNo, 0, self.trajectory.numPoints - 1)

    def getMaxDelay(self, slotNo: int = None) -> int:
        """Max channel delay in samples; trajectory-wide max when slotNo is
        None (use it to pad once for a whole scanned/vmapped trajectory)."""
        md = self._device_plan()["maxDelays"]
        if slotNo is None:
            return int(md.max())
        return int(md[int(slotNo)])

    # ------------------------------------------------------------- gains
    def slot_gains(self, state, slotNo):
        """(nc+1, nr, nt, P) normalized gains at the gain times of ``slotNo``
        (traced or host int). LOS lanes use the specular polarization matrix
        (Eq. 7.5-29), NLOS lanes the shared-XPR matrix (Eq. 7.5-28); padding
        lanes have zero amplitude."""
        plan = self._device_plan()
        slotNo = self._check_slot(slotNo)
        tS = self.gain_times(slotNo)
        ang = jnp.asarray(plan["angles"])[slotNo]        # (P, 4)
        phiA, thetaA, phiD, thetaD = (ang[:, 0], ang[:, 1], ang[:, 2],
                                      ang[:, 3])
        fieldTx, locTx = elements_fields(self._txSpec, thetaD, phiD,
                                         self.txOrientation)   # (nt,2,P),(nt,P)
        fieldRx, locRx = elements_fields(self._rxSpec, thetaA, phiA,
                                         self.rxOrientation)
        kappa = toLinear(self.xPolPower)
        losM = jnp.asarray([[1.0, 0.0], [0.0, -1.0]])
        nlosM = jnp.sqrt(jnp.asarray([[1.0, 1.0 / kappa],
                                      [1.0 / kappa, 1.0]]))
        pol = jnp.where(jnp.asarray(plan["losFlag"])[slotNo][None, None, :],
                        losM[:, :, None], nlosM[:, :, None])
        pol = pol * jnp.exp(1j * jnp.asarray(plan["phases"])[slotNo])[None, None, :]
        h = jnp.einsum("ran,abn,tbn->rtn", fieldRx.astype(pol.dtype), pol,
                       fieldTx.astype(pol.dtype))
        h = h * locRx[:, None, :] * locTx[None, :, :]
        # geometric Doppler: e^{j 2 pi t (rHat . v) f / c}
        rHat = jnp.stack([jnp.sin(thetaA) * jnp.cos(phiA),
                          jnp.sin(thetaA) * jnp.sin(phiA),
                          jnp.cos(thetaA)])              # (3, P)
        shift = (jnp.einsum("ip,i->p", rHat, jnp.asarray(plan["speeds"])[slotNo])
                 * (self.carrierFreq / _C))
        t = jnp.asarray(tS) / self.sampleRate            # (nc+1,)
        dop = jnp.exp(2j * jnp.pi * t[:, None] * shift[None, :])
        g = h[None] * dop[:, None, None, :] * jnp.asarray(plan["amps"])[slotNo][None, None,
                                                                   None, :]
        return g * jnp.asarray(plan["scale"])[slotNo]

    def slot_cm(self, slotNo):
        plan = self._device_plan()
        return jnp.asarray(plan["cmStack"])[self._check_slot(slotNo)]

    # ChannelBase.channel_matrix / apply_to_signal / timing_offset work
    # unchanged through the slot_gains/slot_cm hooks (the channel is
    # deterministic, so state=None is simply ignored by the base methods).
    # No overrides: re-declaring them here once dropped base kwargs like
    # apply_to_signal's symMapSlot, breaking domain='time' multislot sims.

    # ------------------------------------------------------------- datasets
    def chan_seq_gen(self, seqPeriod: int = 1, seqLen: int = 10,
                     maxNumSeq: float = np.inf):
        """Generator of channel-matrix sequences (reference getChanSeqGen).

        Device path: the whole sequence is one ``jit(vmap(channel_matrix))``
        over its slot numbers."""
        batched = jax.jit(jax.vmap(lambda s: self.channel_matrix(slotNo=s)))
        n = 0
        slot = 0
        while n < maxNumSeq:
            slots = []
            for _ in range(seqLen):
                while slot % seqPeriod:
                    slot += 1
                if slot >= self.trajectory.numPoints:
                    return
                slots.append(slot)
                slot += 1
            n += 1
            yield np.asarray(batched(jnp.asarray(slots)))
