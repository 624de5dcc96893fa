"""Tapped Delay Line (TDL) channel — TR 38.901 §7.7.2, with MIMO spatial
correlation per TS 38.101-4 B.2.3 / TS 38.104 G.2.3.

TPU design: tap tables, delay/K-factor scaling, and the Kronecker
correlation-matrix construction (incl. its PSD square root) are host-side
NumPy; the per-trial randomness (sum-of-sinusoids phases) is an explicit
``state`` pytree drawn with ``jax.random``, and the deterministic GMEDS1
time evolution is a pure trig einsum over (sinusoids x nr x nt x taps) —
so Monte-Carlo trials vmap and fading is continuous across slots within a
trial (absolute sample times in, no hidden state).

Behavioral parity: reference ``neoradium/tdl.py`` — tap tables TDL-A..E and
A30/B100/C60/C300/D30 (tdl.py:29-217), combined FR1/FR2 profile strings
(tdl.py:854-866), GMEDS1 (sosGMEDS1:1070-1089) and Xiao (sosXiao:1043-1067)
sum-of-sinusoids, LOS Rician tap at 0.7*fD (tdl.py:913,1115-1120),
Kronecker correlation with cross-polar Gamma and permutation matrix
(getSpatialCorrelationMatrix:1129-1199, getPermutationMatrix:1235),
PSD fix-up table (ensurePSD:1201-1232).

Deviations (documented reference bugs):
- The reference overwrites the delay spread embedded in 'A30'..'D30'
  profiles with the default 30 ns (tdl.py:866-869 assigns, then :870
  unconditionally re-reads the kwarg default); we honor the profile value
  unless the user explicitly passes ``delaySpread``.
- K-factor delay renormalization uses the corrected rms formula (see
  :meth:`neoradium_tpu.channels.cdl.CdlChannel._apply_kfactor_scaling`).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .base import ChannelBase
from ..utils import toLinear, toDb

# TR 38.901 Tables 7.7.2-1..5 ([normalized delay, power dB]) and
# TS 38.101-4 Table B.2.1-1..5 fixed-delay profiles ([delay ns, power dB]).
TDL_TAPS = {
    "A": [
        [0, -13.4], [0.3819, 0], [0.4025, -2.2], [0.5868, -4], [0.461, -6],
        [0.5375, -8.2], [0.6708, -9.9], [0.575, -10.5], [0.7618, -7.5],
        [1.5375, -15.9], [1.8978, -6.6], [2.2242, -16.7], [2.1718, -12.4],
        [2.4942, -15.2], [2.5119, -10.8], [3.0582, -11.3], [4.081, -12.7],
        [4.4579, -16.2], [4.5695, -18.3], [4.7966, -18.9], [5.0066, -16.6],
        [5.3043, -19.9], [9.6586, -29.7]],
    "B": [
        [0, 0], [0.1072, -2.2], [0.2155, -4], [0.2095, -3.2], [0.287, -9.8],
        [0.2986, -1.2], [0.3752, -3.4], [0.5055, -5.2], [0.3681, -7.6],
        [0.3697, -3], [0.57, -8.9], [0.5283, -9], [1.1021, -4.8],
        [1.2756, -5.7], [1.5474, -7.5], [1.7842, -1.9], [2.0169, -7.6],
        [2.8294, -12.2], [3.0219, -9.8], [3.6187, -11.4], [4.1067, -14.9],
        [4.279, -9.2], [4.7834, -11.3]],
    "C": [
        [0, -4.4], [0.2099, -1.2], [0.2219, -3.5], [0.2329, -5.2],
        [0.2176, -2.5], [0.6366, 0], [0.6448, -2.2], [0.656, -3.9],
        [0.6584, -7.4], [0.7935, -7.1], [0.8213, -10.7], [0.9336, -11.1],
        [1.2285, -5.1], [1.3083, -6.8], [2.1704, -8.7], [2.7105, -13.2],
        [4.2589, -13.9], [4.6003, -13.9], [5.4902, -15.8], [5.6077, -17.1],
        [6.3065, -16], [6.6374, -15.7], [7.0427, -21.6], [8.6523, -22.8]],
    "D": [
        [0, -0.2], [0, -13.5], [0.035, -18.8], [0.612, -21], [1.363, -22.8],
        [1.405, -17.9], [1.804, -20.1], [2.596, -21.9], [1.775, -22.9],
        [4.042, -27.8], [7.937, -23.6], [9.424, -24.8], [9.708, -30],
        [12.525, -27.7]],
    "E": [
        [0, -0.03], [0, -22.03], [0.5133, -15.8], [0.544, -18.1],
        [0.563, -19.8], [0.544, -22.9], [0.7112, -22.4], [1.9092, -18.6],
        [1.9293, -20.8], [1.9589, -22.6], [2.6426, -22.3], [3.7136, -25.6],
        [5.4524, -20.2], [12.0034, -29.8], [20.6519, -29.2]],
    "A30": [
        [0, -15.5], [10, 0], [15, -5.1], [20, -5.1], [25, -9.6], [50, -8.2],
        [65, -13.1], [75, -11.5], [105, -11], [135, -16.2], [150, -16.6],
        [290, -26.2]],
    "B100": [
        [0, 0], [10, -2.2], [20, -0.6], [30, -0.6], [35, -0.3], [45, -1.2],
        [55, -5.9], [120, -2.2], [170, -0.8], [245, -6.3], [330, -7.5],
        [480, -7.1]],
    "C60": [
        [0, -7.8], [15, -0.3], [40, 0], [50, -8.9], [55, -14.5], [75, -8.5],
        [80, -10.2], [130, -12.1], [210, -13.9], [300, -15.2], [360, -16.9],
        [520, -19.4]],
    "C300": [
        [0, -6.9], [65, 0], [70, -7.7], [190, -2.5], [195, -2.4], [200, -9.9],
        [240, -8], [325, -6.6], [520, -7.1], [1045, -13], [1510, -14.2],
        [2595, -16]],
    "D30": [
        [0, -0.2], [0, -12.4], [20, -21], [40, -16.7], [55, -18.3],
        [80, -21.9], [120, -27.8], [240, -23.6], [285, -24.8], [290, -30],
        [375, -27.6]],
}

# (alpha, beta, gamma) per TS 38.101-4 B.2.3 / TS 38.104 G.2.3
ALPHA_BETA_GAMMA = {
    "Downlink": {
        "CoPolar": {"High": (0.9, 0.9, 0), "Medium": (0.3, 0.9, 0),
                    "MediumA": (0.3, 0.3874, 0), "Low": (0.0, 0.0, 0)},
        "CrossPolar": {"High": (0.9, 0.9, 0.3), "Medium": (0.3, 0.6, 0.2)},
    },
    "Uplink": {
        "CoPolar": {"High": (0.9, 0.9, 0), "Medium": (0.9, 0.3, 0),
                    "Low": (0.0, 0.0, 0)},
        "CrossPolar": {"Low": (0.0, 0.0, 0.0)},
    },
}
_DS_NAMES = {"VeryShort": 10, "Short": 30, "Nominal": 100, "Long": 300, "VeryLong": 1000}
# FR1/FR2 combined 'profile-doppler' strings (TS 38.101-4 Tables B.2.2-1/2)
_COMBINED = {"A30-5", "A30-10", "B100-400", "C300-100", "C300-600", "C300-1200",
             "A30-35", "A30-75", "A30-300", "C60-300", "D30-75"}


def _psd_sqrtm(m: np.ndarray) -> np.ndarray:
    """Symmetric PSD matrix square root via eigendecomposition (host)."""
    w, v = np.linalg.eigh(m)
    return (v * np.sqrt(np.clip(w, 0, None))) @ v.T


class TdlChannel(ChannelBase):
    """TDL channel: SOS Rayleigh/Rician fading + Kronecker MIMO correlation.

    Antennas are *counts* (``txAntennaCount``/``rxAntennaCount``), not
    geometry (reference tdl.py:878-879)."""

    def __init__(self, carrier, profile: str = "A", **kwargs):
        super().__init__(carrier, **kwargs)
        if profile in _COMBINED:
            profile, doppler = profile.split("-")
            self.dopplerShift = int(doppler)
        if profile not in ("A", "B", "C", "D", "E",
                           "A30", "B100", "C60", "C300", "D30"):
            raise ValueError(f"Unsupported delay profile {profile!r}")
        self.profile = profile

        ds = kwargs.get("delaySpread",
                        int(profile[1:]) if len(profile) > 1 else 30)
        if isinstance(ds, str):
            if ds not in _DS_NAMES:
                raise ValueError("delaySpread must be a number or one of "
                                 + ", ".join(_DS_NAMES))
            ds = _DS_NAMES[ds]
        self.delaySpread = ds

        self.txAntennaCount = kwargs.get("txAntennaCount", 1)
        self.rxAntennaCount = kwargs.get("rxAntennaCount", 1)
        self.kFactor = kwargs.get("kFactor", None)

        taps = np.asarray(TDL_TAPS[profile], np.float64)
        self.pathDelays = np.asarray(kwargs.get("pathDelays", taps[:, 0]),
                                     np.float64).copy()
        self.pathPowers = np.asarray(kwargs.get("pathPowers", taps[:, 1]),
                                     np.float64).copy()
        self.hasLos = kwargs.get("hasLos", profile[0] in "DE")
        self.kFactorLos = kwargs.get(
            "kFactorLos",
            (self.pathPowers[0] - self.pathPowers[1]) if self.hasLos else None)

        if len(profile) == 1:          # normalized profiles scale by DS (§7.7.3)
            self.pathDelays = self.pathDelays * self.delaySpread
        if self.kFactor is not None:
            self._apply_kfactor_scaling()

        if self.hasLos:
            self.losDopplerShift = 0.7 * self.dopplerShift     # TR 38.901 §7.7.2
            # merge the split specular + Rayleigh first taps into one Rician tap
            self.pathPowers = np.concatenate(
                [[toDb(toLinear(self.pathPowers[:2]).sum())], self.pathPowers[2:]])
            self.pathDelays = np.concatenate(
                [self.pathDelays[:1], self.pathDelays[2:]])

        self.numPaths = len(self.pathDelays)

        self.mimoCorrelation = kwargs.get("mimoCorrelation", "Low")
        # Deviation: the reference accepts 'MediumB' at construction
        # (tdl.py:922-924) but has no alpha/beta/gamma table entry for it
        # (tdl.py:633) so it asserts later inside
        # getSpatialCorrelationMatrix; we reject it eagerly instead.
        if self.mimoCorrelation not in ("Low", "Medium", "MediumA", "High"):
            raise ValueError(f"Unsupported mimoCorrelation {self.mimoCorrelation!r}")
        self.polarization = kwargs.get("polarization", "CoPolar")
        if self.polarization not in ("CoPolar", "CrossPolar"):
            raise ValueError("polarization must be 'CoPolar' or 'CrossPolar'")

        self.sosType = kwargs.get("sosType", "GMEDS1")
        if self.sosType not in ("GMEDS1", "Xiao"):
            raise ValueError("sosType must be 'GMEDS1' or 'Xiao'")
        self.sosNumSins = kwargs.get("sosNumSins", 32)
        self._fixed_phases = kwargs.get("sosPhases", None)  # dev/golden hook

        cm = kwargs.get("correlationMatrix", None)
        if cm is None:
            cm = self.spatial_correlation_matrix()
        nr, nt = self.nrNt
        if np.isscalar(cm):
            self._sqrtCor = None
        else:
            if self.normalizeGains:
                cm = cm * nt * nr / np.trace(cm)
            self._sqrtCor = _psd_sqrtm(np.asarray(cm, np.float64))
        self.correlationMatrix = cm
        self._finalize()

    # ------------------------------------------------------------ printing
    def _print_rows(self):
        import numpy as _np
        def numlist(a, fmt="{:.4g}", perRow=12):
            a = list(_np.asarray(a).reshape(-1))
            rows = [" ".join(fmt.format(x) for x in a[i:i + perRow])
                    for i in range(0, len(a), perRow)]
            return ("\n" + 24 * " ").join(rows)
        rows = super()._print_rows()
        rows += [("delaySpread", f"{self.delaySpread:g} ns"),
                 ("txAntennaCount", self.txAntennaCount),
                 ("rxAntennaCount", self.rxAntennaCount),
                 ("mimoCorrelation", self.mimoCorrelation),
                 ("polarization", self.polarization),
                 ("sosType", f"{self.sosType} ({self.sosNumSins} sinusoids)"),
                 ("hasLOS", self.hasLos),
                 ("kFactor", None if self.kFactor is None
                  else f"{self.kFactor:g} dB"),
                 (f"Paths ({self.numPaths})", ""),
                 ("  Delays (ns)", numlist(self.pathDelays)),
                 ("  Powers (dB)", numlist(self.pathPowers))]
        return rows

    def print(self, indent: int = 0, title: str | None = None,
              getStr: bool = False):
        from ..utils import format_properties
        s = format_properties(
            title or f"TDL-{self.profile} Channel Properties:",
            self._print_rows(), indent)
        if getStr:
            return s
        print(s)

    # ----------------------------------------------------------------- host
    @property
    def nrNt(self):
        return (self.rxAntennaCount, self.txAntennaCount)

    def _apply_kfactor_scaling(self):
        """TR 38.901 §7.7.6 with corrected rms (see module docstring)."""
        powers = toLinear(self.pathPowers)
        kModel = toDb(powers[0] / powers[1:].sum())
        self.pathPowers[1:] = self.pathPowers[1:] - self.kFactor + kModel
        powers = toLinear(self.pathPowers)
        sumP = powers.sum()
        meanD = (powers * self.pathDelays).sum() / sumP
        rms = np.sqrt((powers * self.pathDelays ** 2).sum() / sumP - meanD ** 2)
        self.pathDelays = self.pathDelays * (self.delaySpread / rms)

    def permutation_matrix(self) -> np.ndarray:
        """Cross-polar permutation P (TS 38.101-4 §B.2.3.2.1)."""
        nr, nt = self.nrNt
        pp = np.zeros((nt * nr, nt * nr), np.float64)
        for j in range(nt // 2):
            for i in range(nr):
                pp[j * nr + i, 2 * j * nr + i] = 1
                pp[(j + nt // 2) * nr + i, (2 * j + 1) * nr + i] = 1
        return pp

    def polarization_angles(self):
        """(txPolAngles, rxPolAngles) in degrees for CrossPolar mode
        (TS 38.101-4 §B.2.3.2; reference getPolarizationAngles,
        tdl.py:1252-1261): gNB slants +-45, UE slants 90/0, swapped for
        uplink."""
        if self.polarization != "CrossPolar":
            raise ValueError("polarization_angles requires CrossPolar mode")
        gnb, ue = [45, -45], [90, 0]
        return (gnb, ue) if self.txDir == "Downlink" else (ue, gnb)

    def spatial_correlation_matrix(self):
        """Kronecker R_spat (scalar means identity of that size)."""
        nr, nt = self.nrNt
        if nt * nr <= 1:
            return 1
        ng, nu = (nt, nr) if self.txDir == "Downlink" else (nr, nt)
        if self.polarization == "CrossPolar":
            ng, nu = ng // 2, nu // 2
        try:
            alpha, beta, gamma = ALPHA_BETA_GAMMA[self.txDir][
                self.polarization][self.mimoCorrelation]
        except KeyError:
            raise ValueError(
                f"The combination '{self.txDir}, {self.polarization}, "
                f"{self.mimoCorrelation}' is not supported!")

        def power_matrix(n):
            return np.square(np.asarray(
                [[(i - j) / (n - 1) for j in range(n)] for i in range(n)],
                np.float64))

        gnb = ng if (ng == 1 or alpha == 0) else alpha ** power_matrix(ng)
        ue = nu if (nu == 1 or beta == 0) else beta ** power_matrix(nu)

        if self.polarization == "CrossPolar":
            pp = self.permutation_matrix()
            if self.txDir == "Downlink":
                gg = np.asarray([[1, 0, -gamma, 0], [0, 1, 0, gamma],
                                 [-gamma, 0, 1, 0], [0, gamma, 0, 1]],
                                np.float64)
            elif nu == 1:
                # Deviation: the reference's uplink nu==1 branch
                # (tdl.py:1170-1175) builds a 2x2 Gamma whose Kronecker
                # product can never match the nt*nr permutation matrix, so
                # it crashes with a shape error for every such config; we
                # reject it eagerly instead.
                raise ValueError(
                    "Uplink CrossPolar needs >= 4 tx antennas (2 UE "
                    "cross-polar pairs)")
            else:
                gg = np.asarray([[1, -gamma, 0, 0], [-gamma, 1, 0, 0],
                                 [0, 0, 1, gamma], [0, 0, gamma, 1]],
                                np.float64)
            ue = np.eye(ue) if np.isscalar(ue) else ue
            gnb = np.eye(gnb) if np.isscalar(gnb) else gnb
            if self.txDir == "Downlink":
                rSpat = pp @ np.kron(np.kron(gnb, gg), ue) @ pp.T
            else:
                rSpat = pp @ np.kron(np.kron(ue, gg), gnb) @ pp.T
        elif np.isscalar(ue) and np.isscalar(gnb):
            rSpat = ue * gnb
        else:
            ue = np.eye(ue) if np.isscalar(ue) else ue
            gnb = np.eye(gnb) if np.isscalar(gnb) else gnb
            rSpat = (np.kron(gnb, ue) if self.txDir == "Downlink"
                     else np.kron(ue, gnb))
        return self._ensure_psd(rSpat)

    def _ensure_psd(self, rSpat):
        """PSD fix-up factors from TS 38.101-4 B.2.3.x / TS 38.104 G.2.3.x."""
        nr, nt = self.nrNt
        conf = f"{nt}x{nr}"
        a = 0.0
        if self.txDir == "Downlink":
            if self.polarization == "CoPolar":
                if self.mimoCorrelation == "High":
                    a = {"4x2": 1e-4, "4x4": 1.2e-4}.get(conf, 0.0)
                elif self.mimoCorrelation == "Medium":
                    a = {"2x4": 1e-4, "4x4": 1.2e-4}.get(conf, 0.0)
            elif self.mimoCorrelation == "High":
                a = {"8x2": 1e-4}.get(conf, 0.0)
        elif self.polarization == "CoPolar":
            if self.mimoCorrelation == "High":
                a = {"2x4": 1e-4, "4x4": 1.2e-4}.get(conf, 0.0)
            elif self.mimoCorrelation == "Medium":
                a = {"4x4": 1.2e-4}.get(conf, 0.0)
        if a > 0:
            if np.isscalar(rSpat):
                rSpat = np.eye(rSpat)
            return (rSpat + a * np.eye(nt * nr)) / (1.0 + a)
        return rSpat

    # ---------------------------------------------------------------- state
    def init_state(self, key):
        """Per-trial SOS phases: two (numSins, nr, nt, numPaths) uniforms."""
        if self._fixed_phases is not None:
            t1, t2 = self._fixed_phases
            return dict(theta1=jnp.asarray(t1), theta2=jnp.asarray(t2))
        nr, nt = self.nrNt
        shape = (self.sosNumSins, nr, nt, self.numPaths)
        k1, k2 = jax.random.split(key)
        lo, hi = ((0.0, 2 * np.pi) if self.sosType == "GMEDS1"
                  else (-np.pi, np.pi))
        return dict(theta1=jax.random.uniform(k1, shape, minval=lo, maxval=hi),
                    theta2=jax.random.uniform(k2, shape, minval=lo, maxval=hi))

    # ---------------------------------------------------------------- gains
    def _sos_gmeds1(self, state, t):
        """GMEDS1 deterministic SOS (reference sosGMEDS1:1070-1089).
        t: (nc,) seconds -> (nc, nr, nt, numPaths) complex."""
        n = self.sosNumSins
        alphaIN = np.pi * (np.arange(n) + 0.5) / (2 * n)              # (n,)
        alphaI0 = np.pi * (np.arange(self.numPaths) + 1) / (4 * n * (self.numPaths + 2))
        f1 = 2 * np.pi * self.dopplerShift * np.cos(alphaIN[:, None] + alphaI0)
        f2 = 2 * np.pi * self.dopplerShift * np.cos(alphaIN[:, None] - alphaI0)
        # angles: (nc, n, nr, nt, pp)
        tt = t[:, None, None, None, None]
        a1 = 2 * np.pi * jnp.asarray(f1)[:, None, None, :] * tt + state["theta1"]
        a2 = 2 * np.pi * jnp.asarray(f2)[:, None, None, :] * tt + state["theta2"]
        return np.sqrt(2.0 / n) * (jnp.cos(a1) + 1j * jnp.cos(a2)).sum(1)

    def _sos_xiao(self, state, t):
        """Xiao SOS (reference sosXiao:1043-1067); thetaN/phiN from state."""
        n = self.sosNumSins
        # state['theta1'] plays thetaN (broadcast over nr/nt in the reference:
        # drawn (1,1) there; here per-element is equally valid statistically),
        # state['theta2'] plays phiN.
        alphaN = (2 * np.pi * (np.arange(n).reshape(-1, 1, 1, 1) + 1)
                  + state["theta1"]) / n
        tt = t[:, None, None, None, None]
        angles = (2 * np.pi * self.dopplerShift * tt * jnp.cos(alphaN)
                  + state["theta2"])
        return np.sqrt(1.0 / n) * (jnp.cos(angles) + 1j * jnp.sin(angles)).sum(1)

    def path_gains(self, state, tSamples):
        nr, nt = self.nrNt
        t = jnp.asarray(tSamples) / self.sampleRate                   # (nc,)
        if self.sosType == "GMEDS1":
            g = self._sos_gmeds1(state, t)                            # (nc,nr,nt,pp)
        else:
            g = self._sos_xiao(state, t)
        if self._sqrtCor is not None:
            nc = g.shape[0]
            g = jnp.einsum("cip,ij->cjp",
                           g.reshape(nc, nr * nt, self.numPaths),
                           jnp.asarray(self._sqrtCor, g.real.dtype)
                           ).reshape(nc, nr, nt, self.numPaths)
        if self.hasLos:
            # NOTE: reproduced exactly from reference tdl.py:1115-1120, which
            # uses k1st = sqrt(K_linear) where the textbook Rician mix uses
            # K_linear — i.e. the effective specular amplitude is K^(1/4).
            k1 = np.sqrt(toLinear(self.kFactorLos))
            los = jnp.exp(2j * jnp.pi * self.losDopplerShift * t)
            first = (g[..., 0] + np.sqrt(k1) * los[:, None, None]) / np.sqrt(k1 + 1)
            g = jnp.concatenate([first[..., None], g[..., 1:]], axis=-1)
        return g * jnp.sqrt(jnp.asarray(toLinear(self.pathPowers)))
