"""Clustered Delay Line (CDL) channel — TR 38.901 §7.7.1.

TPU design: profile tables, delay/angle scaling and ray-offset expansion are
host-side; the per-trial randomness (ray coupling permutations, initial
phases) is an explicit ``state`` pytree drawn with ``jax.random`` so
Monte-Carlo trials vmap over independent channels. The gain computation
(TR 38.901 Eq. 7.5-22/7.5-29: antenna fields x polarization matrix x location
factors x Doppler, summed over 20 rays) is pure jnp einsums — MXU/VPU work.

Behavioral parity: reference ``neoradium/cdl.py`` — CDL-A..E tables 7.7.1-1..5
(cdl.py:33-156), ray offsets Table 7.5-3 (cdl.py:161), NLOS gains
(getNLOSgains:741-811), LOS gains (getLOSgains:672-738), ray coupling
(shuffleRays:859-868), Doppler (getDopplerFactor:871-887), delay scaling
§7.7.3 (scaleDelays:637), K-factor scaling §7.7.6, angle scaling §7.7.5.1.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .base import ChannelBase
from .antenna import AntennaElement, antenna_spec, elements_fields
from ..utils import toLinear, toDb, toRadian

# TR 38.901 Tables 7.7.1-1..5: per-cluster [delay(ns, normalized), power(dB),
# AOD, AOA, ZOD, ZOA(deg)]. Profiles D/E start with the LOS specular ray
# followed by its Laplacian part.
CDL_PROFILES = {
    "A": [
        [0.0000, -13.4, -178.1, 51.3, 50.2, 125.4], [0.3819, 0, -4.2, -152.7, 93.2, 91.3],
        [0.4025, -2.2, -4.2, -152.7, 93.2, 91.3], [0.5868, -4, -4.2, -152.7, 93.2, 91.3],
        [0.4610, -6, 90.2, 76.6, 122, 94], [0.5375, -8.2, 90.2, 76.6, 122, 94],
        [0.6708, -9.9, 90.2, 76.6, 122, 94], [0.5750, -10.5, 121.5, -1.8, 150.2, 47.1],
        [0.7618, -7.5, -81.7, -41.9, 55.2, 56], [1.5375, -15.9, 158.4, 94.2, 26.4, 30.1],
        [1.8978, -6.6, -83, 51.9, 126.4, 58.8], [2.2242, -16.7, 134.8, -115.9, 171.6, 26],
        [2.1718, -12.4, -153, 26.6, 151.4, 49.2], [2.4942, -15.2, -172, 76.6, 157.2, 143.1],
        [2.5119, -10.8, -129.9, -7, 47.2, 117.4], [3.0582, -11.3, -136, -23, 40.4, 122.7],
        [4.0810, -12.7, 165.4, -47.2, 43.3, 123.2], [4.4579, -16.2, 148.4, 110.4, 161.8, 32.6],
        [4.5695, -18.3, 132.7, 144.5, 10.8, 27.2], [4.7966, -18.9, -118.6, 155.3, 16.7, 15.2],
        [5.0066, -16.6, -154.1, 102, 171.7, 146], [5.3043, -19.9, 126.5, -151.8, 22.7, 150.7],
        [9.6586, -29.7, -56.2, 55.2, 144.9, 156.1]],
    "B": [
        [0.0000, 0, 9.3, -173.3, 105.8, 78.9], [0.1072, -2.2, 9.3, -173.3, 105.8, 78.9],
        [0.2155, -4, 9.3, -173.3, 105.8, 78.9], [0.2095, -3.2, -34.1, 125.5, 115.3, 63.3],
        [0.2870, -9.8, -65.4, -88.0, 119.3, 59.9], [0.2986, -1.2, -11.4, 155.1, 103.2, 67.5],
        [0.3752, -3.4, -11.4, 155.1, 103.2, 67.5], [0.5055, -5.2, -11.4, 155.1, 103.2, 67.5],
        [0.3681, -7.6, -67.2, -89.8, 118.2, 82.6], [0.3697, -3, 52.5, 132.1, 102.0, 66.3],
        [0.5700, -8.9, -72, -83.6, 100.4, 61.6], [0.5283, -9, 74.3, 95.3, 98.3, 58.0],
        [1.1021, -4.8, -52.2, 103.7, 103.4, 78.2], [1.2756, -5.7, -50.5, -87.8, 102.5, 82.0],
        [1.5474, -7.5, 61.4, -92.5, 101.4, 62.4], [1.7842, -1.9, 30.6, -139.1, 103.0, 78.0],
        [2.0169, -7.6, -72.5, -90.6, 100.0, 60.9], [2.8294, -12.2, -90.6, 58.6, 115.2, 82.9],
        [3.0219, -9.8, -77.6, -79.0, 100.5, 60.8], [3.6187, -11.4, -82.6, 65.8, 119.6, 57.3],
        [4.1067, -14.9, -103.6, 52.7, 118.7, 59.9], [4.2790, -9.2, 75.6, 88.7, 117.8, 60.1],
        [4.7834, -11.3, -77.6, -60.4, 115.7, 62.3]],
    "C": [
        [0, -4.4, -46.6, -101, 97.2, 87.6], [0.2099, -1.2, -22.8, 120, 98.6, 72.1],
        [0.2219, -3.5, -22.8, 120, 98.6, 72.1], [0.2329, -5.2, -22.8, 120, 98.6, 72.1],
        [0.2176, -2.5, -40.7, -127.5, 100.6, 70.1], [0.6366, 0, 0.3, 170.4, 99.2, 75.3],
        [0.6448, -2.2, 0.3, 170.4, 99.2, 75.3], [0.6560, -3.9, 0.3, 170.4, 99.2, 75.3],
        [0.6584, -7.4, 73.1, 55.4, 105.2, 67.4], [0.7935, -7.1, -64.5, 66.5, 95.3, 63.8],
        [0.8213, -10.7, 80.2, -48.1, 106.1, 71.4], [0.9336, -11.1, -97.1, 46.9, 93.5, 60.5],
        [1.2285, -5.1, -55.3, 68.1, 103.7, 90.6], [1.3083, -6.8, -64.3, -68.7, 104.2, 60.1],
        [2.1704, -8.7, -78.5, 81.5, 93.0, 61.0], [2.7105, -13.2, 102.7, 30.7, 104.2, 100.7],
        [4.2589, -13.9, 99.2, -16.4, 94.9, 62.3], [4.6003, -13.9, 88.8, 3.8, 93.1, 66.7],
        [5.4902, -15.8, -101.9, -13.7, 92.2, 52.9], [5.6077, -17.1, 92.2, 9.7, 106.7, 61.8],
        [6.3065, -16, 93.3, 5.6, 93.0, 51.9], [6.6374, -15.7, 106.6, 0.7, 92.9, 61.7],
        [7.0427, -21.6, 119.5, -21.9, 105.2, 58], [8.6523, -22.8, -123.8, 33.6, 107.8, 57]],
    "D": [
        [0, -0.2, 0, -180, 98.5, 81.5], [0, -13.5, 0, -180, 98.5, 81.5],
        [0.035, -18.8, 89.2, 89.2, 85.5, 86.9], [0.612, -21, 89.2, 89.2, 85.5, 86.9],
        [1.363, -22.8, 89.2, 89.2, 85.5, 86.9], [1.405, -17.9, 13, 163, 97.5, 79.4],
        [1.804, -20.1, 13, 163, 97.5, 79.4], [2.596, -21.9, 13, 163, 97.5, 79.4],
        [1.775, -22.9, 34.6, -137, 98.5, 78.2], [4.042, -27.8, -64.5, 74.5, 88.4, 73.6],
        [7.937, -23.6, -32.9, 127.7, 91.3, 78.3], [9.424, -24.8, 52.6, -119.6, 103.8, 87],
        [9.708, -30.0, -132.1, -9.1, 80.3, 70.6], [12.525, -27.7, 77.2, -83.8, 86.5, 72.9]],
    "E": [
        [0.000, -0.03, 0, -180, 99.6, 80.4], [0.000, -22.03, 0, -180, 99.6, 80.4],
        [0.5133, -15.8, 57.5, 18.2, 104.2, 80.4], [0.5440, -18.1, 57.5, 18.2, 104.2, 80.4],
        [0.5630, -19.8, 57.5, 18.2, 104.2, 80.4], [0.5440, -22.9, -20.1, 101.8, 99.4, 80.8],
        [0.7112, -22.4, 16.2, 112.9, 100.8, 86.3], [1.9092, -18.6, 9.3, -155.5, 98.8, 82.7],
        [1.9293, -20.8, 9.3, -155.5, 98.8, 82.7], [1.9589, -22.6, 9.3, -155.5, 98.8, 82.7],
        [2.6426, -22.3, 19, -143.3, 100.8, 82.9], [3.7136, -25.6, 32.7, -94.7, 96.4, 88],
        [5.4524, -20.2, 0.5, 147, 98.9, 81], [12.0034, -29.8, 55.9, -36.2, 95.6, 88.6],
        [20.6419, -29.2, 57.6, -26, 104.6, 78.3]],
}
# Per-cluster angle spreads [C_ASD, C_ASA, C_ZSD, C_ZSA] (deg) and XPR (dB)
CDL_CLUSTER_PARAMS = {
    "A": ([5, 11, 3, 3], 10), "B": ([10, 22, 3, 7], 8), "C": ([2, 15, 3, 7], 7),
    "D": ([5, 8, 3, 3], 11), "E": ([5, 11, 3, 7], 8),
}
# TR 38.901 Table 7.5-3: 20 ray offset angles (unit rms spread)
RAY_OFFSETS = np.asarray(
    [0.0447, -0.0447, 0.1413, -0.1413, 0.2492, -0.2492, 0.3715, -0.3715,
     0.5129, -0.5129, 0.6797, -0.6797, 0.8844, -0.8844, 1.1481, -1.1481,
     1.5195, -1.5195, 2.1551, -2.1551])

_DS_NAMES = {"VeryShort": 10, "Short": 30, "Nominal": 100, "Long": 300, "VeryLong": 1000}


class CdlChannel(ChannelBase):
    """CDL stochastic MIMO channel with full antenna-array geometry."""

    def __init__(self, carrier, profile: str | None = "A", **kwargs):
        super().__init__(carrier, **kwargs)
        self.profile = profile
        if profile is not None and profile not in "ABCDE":
            raise ValueError(f"Unsupported CDL profile {profile!r}")

        ds = kwargs.get("delaySpread", 30)
        if isinstance(ds, str):
            if ds not in _DS_NAMES:
                raise ValueError("delaySpread must be a number or one of "
                                 + ", ".join(_DS_NAMES))
            ds = _DS_NAMES[ds]
        self.delaySpread = ds
        self.ueDirAZ = toRadian(kwargs.get("ueDirAZ", [0, 90]))
        self.txAntenna = kwargs.get("txAntenna", AntennaElement())
        self.rxAntenna = kwargs.get("rxAntenna", AntennaElement())
        self.txOrientation = toRadian(kwargs.get("txOrientation", [0, 0, 0]))
        self.rxOrientation = toRadian(kwargs.get("rxOrientation", [180, 0, 0]))
        self.kFactor = kwargs.get("kFactor", None)
        self.angleScaling = kwargs.get("angleScaling", None)

        def prof(col):
            return (None if profile is None
                    else np.asarray(CDL_PROFILES[profile], np.float64)[:, col])

        self.pathDelays = np.asarray(kwargs.get("pathDelays", prof(0)), np.float64)
        self.pathPowers = np.asarray(kwargs.get("pathPowers", prof(1)), np.float64)
        self.aods = toRadian(kwargs.get("aods", prof(2)))
        self.aoas = toRadian(kwargs.get("aoas", prof(3)))
        self.zods = toRadian(kwargs.get("zods", prof(4)))
        self.zoas = toRadian(kwargs.get("zoas", prof(5)))
        self.hasLos = kwargs.get("hasLos", False if profile is None else profile in "DE")
        self.xPolPower = kwargs.get(
            "xPolPower", 10.0 if profile is None else CDL_CLUSTER_PARAMS[profile][1])
        for name in ("pathDelays", "pathPowers", "aods", "aoas", "zods", "zoas"):
            if getattr(self, name) is None:
                raise ValueError(f"'{name}' is not specified for the custom CDL model")

        self.kFactorLos = kwargs.get(
            "kFactorLos",
            (self.pathPowers[0] - self.pathPowers[1]) if self.hasLos else None)
        if profile is not None:
            self.pathDelays = self.pathDelays * self.delaySpread  # TR 38.901 §7.7.3
            if self.kFactor is not None:
                self._apply_kfactor_scaling()
        elif self.hasLos:
            # custom LOS: split first path into specular + Laplacian parts
            k1 = toLinear(self.kFactorLos)
            p1 = toLinear(self.pathPowers[0])
            p0 = -toDb(p1 + p1 / k1)
            self.pathPowers = np.concatenate(
                [[p0, p0 - self.kFactorLos], self.pathPowers[1:]])
            for name in ("pathDelays", "aods", "aoas", "zods", "zoas"):
                v = getattr(self, name)
                setattr(self, name, np.concatenate([[v[0]], v]))

        spreadsDefault = ([4.0, 10.0, 2.0, 2.0] if profile is None
                          else CDL_CLUSTER_PARAMS[profile][0])
        self.angleSpreads = toRadian(kwargs.get("angleSpreads", spreadsDefault))

        self.n = len(self.aods) - (1 if self.hasLos else 0)  # NLOS clusters
        self.m = 20                                          # rays per cluster
        self._fixed_coupling = kwargs.get("rayCoupling", None)
        if self._fixed_coupling is not None:
            self._fixed_coupling = np.asarray(self._fixed_coupling, np.int32)
        self._fixed_phases = toRadian(kwargs.get("initialPhases", None))

        self._precompute_angles()
        self._finalize()
        self._txSpec = antenna_spec(self.txAntenna)
        self._rxSpec = antenna_spec(self.rxAntenna)

    # ---------------------------------------------------------------- host
    @property
    def nrNt(self):
        return (self.rxAntenna.getNumElements(), self.txAntenna.getNumElements())

    def _apply_kfactor_scaling(self):
        """TR 38.901 §7.7.6 K-factor scaling Eq. 7.7.6-1/2/3.

        Deviation from the reference: channelmodel.py:486-491 computes the rms
        delay spread as sqrt(E[(p*d)^2]-E[p*d]^2) with inconsistent weighting,
        which is negative (NaN) for every LOS profile — the feature is unusable
        there. We use the standard power-weighted rms delay spread
        sqrt(sum(p*d^2)/sum(p) - (sum(p*d)/sum(p))^2) with the POST-scaling
        powers (TR 38.901 Eq. 7.7.6-3), normalized to the configured
        delaySpread."""
        powers = toLinear(self.pathPowers)
        kModel = toDb(powers[0] / powers[1:].sum())
        self.pathPowers = self.pathPowers.copy()
        self.pathPowers[1:] = self.pathPowers[1:] - self.kFactor + kModel
        powers = toLinear(self.pathPowers)
        sumP = powers.sum()
        meanD = (powers * self.pathDelays).sum() / sumP
        rms = np.sqrt((powers * self.pathDelays ** 2).sum() / sumP - meanD ** 2)
        self.pathDelays = self.pathDelays * (self.delaySpread / rms)

    @staticmethod
    def _wrap_pm_pi(a):
        return (a + np.pi) % (2 * np.pi) - np.pi

    @staticmethod
    def _wrap_0_pi(a):
        a = a % (2 * np.pi)
        return np.where(a > np.pi, 2 * np.pi - a, a)

    def _precompute_angles(self):
        """Ray angles (n, m) after offsets, optional scaling, wrapping."""
        off = 1 if self.hasLos else 0
        cASD, cASA, cZSD, cZSA = self.angleSpreads
        ro = RAY_OFFSETS
        phiD = self.aods[off:, None] + cASD * ro
        phiA = self.aoas[off:, None] + cASA * ro
        thetaD = self.zods[off:, None] + cZSD * ro
        thetaA = self.zoas[off:, None] + cZSA * ro
        pN = toLinear(self.pathPowers[off:])
        if self.angleScaling is not None:
            means = toRadian(np.asarray(self.angleScaling[0], np.float64))
            spreads = toRadian(np.asarray(self.angleScaling[1], np.float64))
            phiD, phiA, thetaD, thetaA = self._apply_angle_scaling(
                phiD, phiA, thetaD, thetaA, pN, means, spreads)
        self._phiD = self._wrap_pm_pi(phiD)
        self._phiA = self._wrap_pm_pi(phiA)
        self._thetaD = self._wrap_0_pi(thetaD)
        self._thetaA = self._wrap_0_pi(thetaA)
        self._pN = pN
        if self.hasLos:
            losAngles = (self.aods[:1], self.aoas[:1], self.zods[:1], self.zoas[:1])
            if self.angleScaling is not None:
                la = [a.reshape(1, 1) for a in losAngles]
                la = self._apply_angle_scaling(*la, toLinear(self.pathPowers[0]),
                                               means, spreads)
                losAngles = [a.reshape(1) for a in la]
            self._losPhiD = self._wrap_pm_pi(losAngles[0]).reshape(1, 1)
            self._losPhiA = self._wrap_pm_pi(losAngles[1]).reshape(1, 1)
            self._losThetaD = self._wrap_0_pi(losAngles[2]).reshape(1, 1)
            self._losThetaA = self._wrap_0_pi(losAngles[3]).reshape(1, 1)

    def _apply_angle_scaling(self, phiD, phiA, thetaD, thetaA, p, means, spreads):
        """TR 38.901 §7.7.5.1 / Annex A angle scaling."""
        p = np.atleast_1d(p)
        m = phiA.shape[-1]

        def model_stats(angles):
            w = (np.exp(1j * angles) * p.reshape(-1, 1)).sum() / m
            spread = np.sqrt(-2 * np.log(np.abs(w / p.sum())))
            return np.angle(w), spread

        def xform(angles, asD, maD):
            maM, asM = model_stats(angles)
            if asM == 0:
                return angles - maM + maD
            return asD * (angles - maM) / asM + maD

        out = [xform(phiD, spreads[0], means[0]), xform(phiA, spreads[1], means[1]),
               xform(thetaD, spreads[2], means[2]), xform(thetaA, spreads[3], means[3])]
        out[0] = out[0] % (2 * np.pi)
        out[1] = out[1] % (2 * np.pi)
        out[2] = np.clip(out[2], 0, np.pi)
        out[3] = np.clip(out[3], 0, np.pi)
        return out

    @classmethod
    def getMatlabRandomInit(cls, profile: str, seed: int):
        """Ray coupling + initial phases matching MATLAB 5G Toolbox draws.

        Reproduces the reference's helper (cdl.py:828-857) for golden-file
        comparison against MATLAB: a legacy MT19937 ``RandomState(seed)``
        drawn in MATLAB's order — 4x20xN uniforms for the initial phases,
        then 3x20xN uniforms argsorted per cluster for the coupling, with the
        reference's fix for MATLAB shuffling thetaA twice.

        Returns:
          (phiInit degrees (2, 2, n, 20), coupling int32 (3, n, 20)) where n
          is the NLOS cluster count — pass as the ``initialPhases`` /
          ``rayCoupling`` kwargs of CdlChannel.
        """
        rs = np.random.RandomState(seed)
        los = 1 if profile in "DE" else 0
        nAll, m = len(CDL_PROFILES[profile]), 20
        u = rs.random((4, m, nAll)).transpose(0, 2, 1)[:, los:, :]
        phiInit = (360.0 * u - 180.0).reshape(2, 2, nAll - los, m)

        draws = np.argsort(rs.random((3, m, nAll)), axis=1)
        # MATLAB consumes the theta-A permutation through the theta-D one:
        thetaA = np.take_along_axis(draws[1], np.argsort(draws[2], axis=0), axis=0)
        coupling = np.stack([draws[0], thetaA, draws[2]]
                            ).transpose(0, 2, 1)[:, los:, :]
        # ... and shuffles thetaA a second time (reference cdl.py:853-855):
        coupling[1] = np.take_along_axis(coupling[1], coupling[2], axis=-1)
        return phiInit, np.int32(coupling)

    # ------------------------------------------------------------ printing
    def _print_rows(self):
        import numpy as _np
        def deg(x):
            return _np.degrees(_np.asarray(x, float))
        def numlist(a, fmt="{:.4g}", perRow=12):
            a = list(_np.asarray(a).reshape(-1))
            rows = [" ".join(fmt.format(x) for x in a[i:i + perRow])
                    for i in range(0, len(a), perRow)]
            return ("\n" + 24 * " ").join(rows)
        rows = super()._print_rows()
        rows += [
            ("delaySpread", f"{self.delaySpread:g} ns"),
            ("ueDirAZ", ", ".join(f"{d:g}\u00b0" for d in deg(self.ueDirAZ))),
            ("Cross Pol. Power", f"{self.xPolPower:g} dB"),
            ("angleSpreads", " ".join(f"{d:g}\u00b0"
                                      for d in deg(self.angleSpreads))),
            (None, self._antenna_block("TX Antenna:", self.txAntenna,
                                       self.txOrientation,
                                       getattr(self, "_printIndent", 0))),
            (None, self._antenna_block("RX Antenna:", self.rxAntenna,
                                       self.rxOrientation,
                                       getattr(self, "_printIndent", 0))),
            ("hasLOS", self.hasLos),
            (f"NLOS Paths ({self.n})", ""),
            ("  Delays (ns)", numlist(self.pathDelays)),
            ("  Powers (dB)", numlist(self.pathPowers)),
            ("  AODs (Deg)", numlist(deg(self.aods), "{:.0f}")),
            ("  AOAs (Deg)", numlist(deg(self.aoas), "{:.0f}")),
            ("  ZODs (Deg)", numlist(deg(self.zods), "{:.0f}")),
            ("  ZOAs (Deg)", numlist(deg(self.zoas), "{:.0f}"))]
        return rows

    def _antenna_block(self, title, ant, orientation, indent=0):
        import numpy as _np
        from ..utils import format_properties
        rows = [("Total Elements", ant.getNumElements())]
        if hasattr(ant, "shape"):
            rows += [("spacing", ", ".join(f"{s:g}\u03bb"
                                           for s in _np.ravel(ant.spacing))),
                     ("shape", f"{ant.shape[0]} rows x {ant.shape[1]} columns"),
                     ("polarization", getattr(ant, "polarization", "|"))]
        ori = _np.degrees(_np.asarray(orientation, float))
        rows.append(("Orientation (\u03b1,\u03b2,\u03b3)",
                     " ".join(f"{d:g}\u00b0" for d in ori)))
        return format_properties(title, rows, indent + 2)

    def print(self, indent: int = 0, title: str | None = None,
              getStr: bool = False):
        from ..utils import format_properties
        self._printIndent = indent
        s = format_properties(
            title or f"CDL-{self.profile or 'Custom'} Channel Properties:",
            self._print_rows(), indent)
        if getStr:
            return s
        print(s)

    # --------------------------------------------------------------- state
    def init_state(self, key):
        """Per-trial random state: coupled ray angles (3, n*m — the phiA /
        thetaA / thetaD tables with each cluster's rays permuted by the
        random coupling, reference Step 2 / getRandomRayCoupling) + initial
        phases (2, 2, n, m).

        The state stores the PERMUTED ANGLE VALUES, not coupling indices: a
        per-trial (24, 20) gather costs ~6 ms/dispatch per angle at batch
        1536 on TPU, while permuting at state-init time is free — the
        random path sorts iid uniform keys carrying the angle rows as
        payload (tbl[argsort(u)] with no gather; stable sort keeps it
        bit-identical to the argsort formulation), and fixed couplings
        (goldens, matlabRandomInit) permute on host."""
        tbls = np.stack([self._phiA, self._thetaA, self._thetaD])  # (3,n,m)
        if self._fixed_coupling is not None:
            fixedAng = np.take_along_axis(
                tbls, np.asarray(self._fixed_coupling, np.int64), axis=-1)
        if self._fixed_coupling is not None and self._fixed_phases is not None:
            return dict(rayAngles=jnp.asarray(fixedAng.reshape(3, -1)),
                        phases=jnp.asarray(self._fixed_phases))
        kc, kp = jax.random.split(key)
        u = jax.random.uniform(kc, (3, self.n, self.m))
        if self._fixed_coupling is not None:
            ang = jnp.asarray(fixedAng)
        else:
            _, ang = jax.lax.sort(
                (u, jnp.broadcast_to(jnp.asarray(tbls), u.shape)),
                dimension=-1, num_keys=1, is_stable=True)
        phases = jax.random.uniform(kp, (2, 2, self.n, self.m),
                                    minval=-jnp.pi, maxval=jnp.pi)
        if self._fixed_phases is not None:
            phases = jnp.asarray(self._fixed_phases)
        return dict(rayAngles=ang.reshape(3, -1), phases=phases)

    # --------------------------------------------------------------- gains
    def _doppler(self, thetaA, phiA, tSamples):
        vPhi, vTheta = self.ueDirAZ
        dBar = self.dopplerShift * jnp.asarray(
            [np.sin(vTheta) * np.cos(vPhi), np.sin(vTheta) * np.sin(vPhi),
             np.cos(vTheta)])
        sinT = jnp.sin(thetaA)
        rHat = jnp.stack([sinT * jnp.cos(phiA), sinT * jnp.sin(phiA),
                          jnp.cos(thetaA)])
        dot = jnp.einsum("i...,i->...", rHat, dBar)
        if isinstance(tSamples, (np.ndarray, list, tuple)):
            # Host-known evaluation times (the per-slot symbol starts take
            # only 2 distinct spacings): build the phasors incrementally —
            # one complex exp per DISTINCT time step plus cheap fused
            # complex multiplies, instead of a (len(t), n*m) exp (~10 ms of
            # the headline dispatch at batch 1536). Drift after <=14
            # multiplies is ~len(t)*eps, far inside every gate.
            # key the step-phasor dict on INTEGER sample spacings (dividing
            # by sampleRate first can split equal spacings by one ulp and
            # silently mint extra exp terms)
            tArr = np.asarray(tSamples)
            if not np.issubdtype(tArr.dtype, np.integer):
                if not np.all(tArr == np.round(tArr)):
                    raise ValueError("host-path gain times must be integer "
                                     "sample indices")
            tInt = tArr.astype(np.int64)
            dInt = np.diff(tInt)
            steps = {ds: jnp.exp(2j * jnp.pi * (ds / self.sampleRate) * dot)
                     for ds in sorted(set(dInt.tolist()))}
            rows = [jnp.exp(2j * jnp.pi * (tInt[0] / self.sampleRate) * dot)]
            for ds in dInt.tolist():
                rows.append(rows[-1] * steps[ds])
            return jnp.stack(rows)
        t = jnp.asarray(tSamples) / self.sampleRate
        return jnp.exp(2j * jnp.pi * t.reshape((-1,) + (1,) * dot.ndim) * dot)

    def _nlos_ray_terms(self, state, tSamples):
        """Per-ray Doppler phasors and field products on the FLAT
        clusters*rays axis: returns (doppler (nc+1, n*m), h (nr, nt, n*m)),
        WITHOUT the per-cluster ray combine or power scaling. Shared by the
        generic per-cluster gains (:meth:`_nlos_gains`) and the fused CIR
        path (:meth:`slot_cirs`)."""
        n, m = self.n, self.m
        # coupling-permuted angles straight from the state (no gather —
        # see init_state)
        phiA, thetaA, thetaD = (state["rayAngles"][i] for i in range(3))

        kappa = toLinear(self.xPolPower)
        # flatten (clusters, rays) into ONE minor axis: m=20 rays as the lane
        # dim would waste 108/128 TPU lanes on every elementwise op below
        polMat = jnp.exp(1j * state["phases"].reshape(2, 2, n * m)) * jnp.sqrt(
            jnp.asarray([[1, 1 / kappa], [1 / kappa, 1]])).reshape(2, 2, 1)
        phiD = jnp.asarray(self._phiD).reshape(-1)

        fieldTx, locTx = elements_fields(self._txSpec, thetaD, phiD, self.txOrientation)
        fieldRx, locRx = elements_fields(self._rxSpec, thetaA, phiA, self.rxOrientation)
        doppler = self._doppler(thetaA, phiA, tSamples)          # (nc+1, n*m)

        # Eq. 7.5-22: fieldRx^T . polMat . fieldTx per (cluster*ray), with
        # the 2-element polarization axes a, b unrolled in Python so the
        # whole thing is fused elementwise broadcasts over the n*m lane
        # axis. The one-einsum form ("rax,abx,tbx->rtx") made XLA's
        # complex-dot lowering materialize dozens of transposed copies of
        # the (nr, nt, n*m) planes — ~27 ms/dispatch at batch 1536.
        fieldTx = fieldTx.astype(polMat.dtype)
        fieldRx = fieldRx.astype(polMat.dtype)
        g = [polMat[a, 0] * fieldTx[:, 0] + polMat[a, 1] * fieldTx[:, 1]
             for a in range(2)]                                  # (nt, x) each
        h = (fieldRx[:, 0, None, :] * g[0][None]
             + fieldRx[:, 1, None, :] * g[1][None])              # (nr, nt, x)
        h = h * locRx[:, None] * locTx[None, :]
        return doppler, h

    def _nlos_gains(self, state, tSamples):
        n, m = self.n, self.m
        doppler, h = self._nlos_ray_terms(state, tSamples)
        # Per-cluster gains for generic consumers (path_gains API parity
        # with reference getNLOSgains). The HOT path does not come through
        # here: slot_cirs contracts the ray terms straight against the
        # coefficient rows (fused matmul) — see slot_cirs for the HLO
        # evidence that motivated the split.
        h = h[None] * doppler[:, None, None]            # (nc+1, nr, nt, n*m)
        h = h.reshape(h.shape[:-1] + (n, m)).sum(-1)    # combine rays
        h = h * jnp.sqrt(jnp.asarray(self._pN) / m)
        return h

    def slot_cirs(self, state, slotNo):
        """Fused per-symbol-time CIRs: sum_x d[s,x] h[r,t,x] W[x,l] as ONE
        matmul contracting the flat clusters*rays axis x (n*m=480 for the
        3GPP profiles), with W[x,l] = coeffRow[cluster(x),l] *
        sqrt(pN[cluster(x)]/m) * normalization — i.e. the per-cluster ray
        combine and the gains-times-coefficients contraction reassociated
        into a single reduction over x (identical terms, different float
        grouping; goldens hold at 1e-9).

        Why (HLO evidence, 2026-08-21, headline bench batch 1536): the
        per-cluster path made XLA materialize the (nc+1, nr, nt, n*m)
        Doppler product plus dozens of transposed copies — 708 MB/dispatch,
        52 of the pipeline's 96.5 MB/slot of HBM traffic, ~50 of 197 ms —
        because the m=20 reshape-sum is a lane-wasting segment reduce that
        XLA cannot fuse into one pass at this batch. Here the same-shaped
        product is built exactly once as the LHS of an MXU matmul
        ((nc+1)*nr*nt, x) @ (x, coeffLen) whose contraction axis is 480
        lanes wide (per-cluster m=20 dots pad catastrophically instead:
        7179 slots/s when A/B'd round 3)."""
        tSamples = self.gain_times(slotNo)
        d, h = self._nlos_ray_terms(state, tSamples)
        W = getattr(self, "_fusedW", None)
        if W is None:
            cm = np.asarray(self.coeffMatrix, np.float64)      # (pp, cl)
            off = 1 if self.hasLos else 0
            scale = np.sqrt(np.asarray(self._pN) / self.m)     # (n,)
            norm = 1.0
            if self.normalizeOutput:
                norm /= np.sqrt(self.nrNt[0])
            if self.normalizeGains:
                norm /= np.sqrt(toLinear(self.pathPowers).sum())
            W = np.repeat(cm[off:] * scale[:, None] * norm, self.m, axis=0)
            self._fusedW = W                                   # (n*m, cl)
            self._fusedLosRow = cm[0] * norm if self.hasLos else None
        # The ray-term product E[s,r,t,x] = d[s,x] h[r,t,x] in explicit
        # real/imag planes: a complex-dot einsum here makes XLA's complex
        # lowering materialize dozens of transposed copies of the product
        # (HLO: the f32[B,15,2,8,480] buffer appeared x31); two real f32
        # matmuls against the real W read each plane exactly once.
        dr, di = jnp.real(d), jnp.imag(d)
        hr, hi = jnp.real(h), jnp.imag(h)
        Er = dr[:, None, None, :] * hr[None] - di[:, None, None, :] * hi[None]
        Ei = dr[:, None, None, :] * hi[None] + di[:, None, None, :] * hr[None]
        Wj = jnp.asarray(W, Er.dtype)
        c = jax.lax.complex(jnp.einsum("srtx,xl->srtl", Er, Wj),
                            jnp.einsum("srtx,xl->srtl", Ei, Wj))
        if self.hasLos:
            gl = self._los_gains(tSamples)[..., 0]         # (nc+1, nr, nt)
            c = c + gl[..., None] * jnp.asarray(self._fusedLosRow)
        return c

    def _los_gains(self, tSamples):
        thetaD = jnp.asarray(self._losThetaD)
        phiD = jnp.asarray(self._losPhiD)
        thetaA = jnp.asarray(self._losThetaA)
        phiA = jnp.asarray(self._losPhiA)
        pN = toLinear(self.pathPowers[0])
        fieldTx, locTx = elements_fields(self._txSpec, thetaD, phiD, self.txOrientation)
        fieldRx, locRx = elements_fields(self._rxSpec, thetaA, phiA, self.rxOrientation)
        polMat = jnp.asarray([[1.0, 0.0], [0.0, -1.0]])
        doppler = self._doppler(thetaA, phiA, tSamples)[:, 0, 0]    # (nc+1,)
        h = jnp.einsum("ra,ab,tb->rt", fieldRx[..., 0, 0], polMat, fieldTx[..., 0, 0])
        h = h * locRx[:, None, 0, 0] * locTx[None, :, 0, 0]
        h = h[None] * doppler[:, None, None]
        return (h * np.sqrt(pN))[..., None]                     # (nc+1, nr, nt, 1)

    def path_gains(self, state, tSamples):
        g = self._nlos_gains(state, tSamples)
        if self.hasLos:
            g = jnp.concatenate([self._los_gains(tSamples), g], axis=-1)
        return g

    # ------------------------------------------------------------- datasets
    @classmethod
    def getChanGen(cls, numChannels, carrier, profiles="ABCDE",
                   delaySpread=(10, 500), ueSpeed=(5, 20),
                   ueDir=(0, 360), seed=None, **kwargs):
        """Generator of random-channel matrices for dataset creation
        (reference cdl.py:934-1128): per channel, a random profile, a delay
        spread / UE speed / direction drawn from tuples (uniform range),
        lists (choice), or scalars, and an independent random realization.

        Deviation: the reference converts ueDir to radians and then the
        CdlChannel constructor converts AGAIN (cdl.py:1090,1117 +
        toRadian in __init__), collapsing all directions to ~0; we pass
        degrees once.
        """
        from ..random import RanGen, random as globalRandom
        carrierFreq = kwargs.get("carrierFreq", 3.5e9)
        rangen = (globalRandom if seed is None
                  else RanGen(RanGen.getGenerator(seed)))

        def draw(spec, n):
            if isinstance(spec, tuple):
                return rangen.uniform(*spec, n)
            if isinstance(spec, list):
                return rangen.choice(np.float64(spec), n)
            return np.full(n, float(spec))

        profs = rangen.choice(list(profiles), size=numChannels)
        speeds = draw(ueSpeed, numChannels)
        dirs = draw(ueDir, numChannels)
        spreads = draw(delaySpread, numChannels)
        chanSeeds = rangen.integers(10, 1000, size=numChannels)
        for i in range(numChannels):
            chan = cls(carrier, str(profs[i]), delaySpread=float(spreads[i]),
                       dopplerShift=float(speeds[i]) * carrierFreq / 299792458.0,
                       ueDirAZ=[float(dirs[i]), 90], **kwargs)
            state = chan.init_state(jax.random.PRNGKey(int(chanSeeds[i])))
            yield np.asarray(chan.channel_matrix(state, slotNo=0))
