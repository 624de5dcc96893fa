"""Adaptive SNR sweep scheduling — behavioral parity with reference
``neoradium/snrhelper.py`` (SnrScheduler): an iterator that brackets the
[loSnrVal, hiSnrVal] metric range from an initial guess, then sweeps it at
the configured step, skipping uninformative SNR points.

This is inherently sequential host-side control (SURVEY.md §7 hard parts):
the scheduler picks the next SNR point; the device work stays batched
*within* each point (trials vmapped/sharded per SNR).
"""
from __future__ import annotations

import numpy as np


class SnrScheduler:
    """Adaptive SNR iterator (see reference snrhelper.py:14-254).

    Iterate over it, run the Monte-Carlo point at each yielded SNR, and call
    ``setData(metric, *extras)`` once per iteration. After StopIteration,
    ``getSnrsAndData()`` returns the sorted in-bracket arrays.

    Works for decreasing metrics (BER/BLER: loSnrVal > hiSnrVal) and
    increasing ones (throughput: loSnrVal < hiSnrVal).
    """

    _UP_2X, _DOWN_2X = "SearchingUp", "SearchingDown"

    def __init__(self, snr0: float = 0, step: float = 1, maxSnrs: int = 500,
                 loSnrVal: float = 100, hiSnrVal: float = 0):
        if not (isinstance(step, (int, float)) and step > 0):
            raise ValueError("`step` must be a positive number.")
        if not (isinstance(maxSnrs, int) and maxSnrs > 0):
            raise ValueError("`maxSnrs` must be a positive integer.")
        self.snr0 = snr0
        self.step = step
        self.maxSnrs = maxSnrs
        self.loSnrVal = loSnrVal
        self.hiSnrVal = hiSnrVal
        self.reset()

    def reset(self):
        self.curSnr = self.snr0
        self.state = "Start"
        self.curLo = -np.inf
        self.curHi = np.inf
        self._upStart = None
        self._snrs: list[float] = []
        self._data: list[tuple] = []
        self._pending = False      # setData owed for the last yielded SNR

    # ------------------------------------------------------------- iterator
    def __iter__(self):
        return self

    def __next__(self):
        if self.state == "Done":
            raise StopIteration
        if self._pending:
            raise ValueError('The "setData" was not called in the last iteration!')
        self._pending = True
        return self.curSnr

    # ------------------------------------------------------------- recording
    def _zone(self, value) -> str:
        """'Lo', 'Hi', or 'Mid' relative to the target metric bracket."""
        lo, hi = self.loSnrVal, self.hiSnrVal
        if lo < hi:      # increasing metric (throughput)
            return "Lo" if value <= lo else ("Hi" if value >= hi else "Mid")
        return "Lo" if value >= lo else ("Hi" if value <= hi else "Mid")

    def setData(self, value, *otherValues):
        """Record metric(s) for the current SNR and pick the next one."""
        self._pending = False
        if self._data and len(otherValues) + 1 != len(self._data[0]):
            raise ValueError('Inconsistent number of values passed to "setData"!')
        if len(self._snrs) >= self.maxSnrs:
            raise ValueError(f"Did not converge after {self.maxSnrs} tries.")
        self._snrs.append(self.curSnr)
        self._data.append((value,) + tuple(otherValues))
        # advance; skip over SNRs we already have data for
        while self.curSnr in self._snrs:
            i = self._snrs.index(self.curSnr)
            self._advance(self._data[i][0])
            if self.curSnr is None:
                break
            self.curSnr = float(np.round(self.curSnr, 4))

    # ------------------------------------------------------- state machine
    def _advance(self, value):
        z = self._zone(value)
        s, step = self.state, self.step
        if s == "Start":
            if z == "Lo":
                self.curLo = max(self.curSnr, self.curLo)
                self.state, self.curSnr = self._UP_2X, self.curSnr + step
            elif z == "Hi":
                self.curHi = min(self.curSnr, self.curHi)
                self.state, self.curSnr = self._DOWN_2X, self.curSnr - step
            else:
                self._upStart = self.curSnr + step
                self.state, self.curSnr = "GoingDown", self.curSnr - step
        elif s == self._UP_2X:
            if z == "Lo":
                self.curLo = max(self.curSnr, self.curLo)
                self.curSnr += 2 * step
            elif z == "Hi":
                self.curHi = min(self.curSnr, self.curHi)
                self.state = self._DOWN_2X
                self.curSnr = (self.curHi + self.curLo) / 2
            else:
                self._upStart = self.curSnr + step
                self.state, self.curSnr = "GoingDown", self.curSnr - step
        elif s == self._DOWN_2X:
            if z == "Hi":
                self.curHi = min(self.curSnr, self.curHi)
                self.curSnr -= 2 * step
            elif z == "Lo":
                self.curLo = max(self.curSnr, self.curLo)
                self.state = self._UP_2X
                self.curSnr = (self.curHi + self.curLo) / 2
            else:
                self._upStart = self.curSnr + step
                self.state, self.curSnr = "GoingDown", self.curSnr - step
        elif s == "GoingDown":
            if z == "Lo":
                self.curLo = max(self.curSnr, self.curLo)
                self.state, self.curSnr = "AtLow", self.curSnr - step
            elif z == "Hi":
                raise RuntimeError(
                    f"non-monotonic metric: hit the high bracket while "
                    f"sweeping down at snr={self.curSnr}, value={value}")
            else:
                self.curSnr -= step
        elif s == "AtLow":
            if z == "Lo":
                self.state, self.curSnr = "GoingUp", self._upStart
            elif z == "Hi":
                raise RuntimeError(
                    f"non-monotonic metric: high-bracket value right after "
                    f"the low end, at snr={self.curSnr}, value={value}")
            else:
                self.state, self.curSnr = "GoingDown", self.curSnr - step
        elif s == "GoingUp":
            if z == "Hi":
                self.curHi = min(self.curSnr, self.curHi)
                self.state, self.curSnr = "AtHigh", self.curSnr + step
            elif z == "Lo":
                raise RuntimeError(
                    f"non-monotonic metric: hit the low bracket while "
                    f"sweeping up at snr={self.curSnr}, value={value}")
            else:
                self.curSnr += step
        elif s == "AtHigh":
            if z == "Hi":
                self.state, self.curSnr = "Done", None
            elif z == "Lo":
                raise RuntimeError(
                    f"non-monotonic metric: low-bracket value right after "
                    f"the high end, at snr={self.curSnr}, value={value}")
            else:
                self.state, self.curSnr = "GoingUp", self.curSnr + step

    # --------------------------------------------------------- checkpointing
    def state_dict(self) -> dict:
        """Serializable state for checkpoint/resume of long sweeps."""
        return dict(curSnr=self.curSnr, state=self.state,
                    curLo=None if np.isneginf(self.curLo) else self.curLo,
                    curHi=None if np.isposinf(self.curHi) else self.curHi,
                    upStart=self._upStart, snrs=list(self._snrs),
                    data=[list(d) for d in self._data], pending=self._pending)

    def load_state_dict(self, s: dict):
        self.curSnr = s["curSnr"]
        self.state = s["state"]
        self.curLo = -np.inf if s["curLo"] is None else s["curLo"]
        self.curHi = np.inf if s["curHi"] is None else s["curHi"]
        self._upStart = s["upStart"]
        self._snrs = list(s["snrs"])
        self._data = [tuple(d) for d in s["data"]]
        self._pending = s["pending"]

    # ------------------------------------------------------------- results
    def getSnrsAndData(self):
        """Sorted in-bracket [snrs, metric, *extras] arrays."""
        if not self._snrs:
            return [np.array([])]
        order = np.argsort(self._snrs)
        keep = [i for i in order
                if self.curLo <= self._snrs[i] <= self.curHi]
        snrs = np.asarray([self._snrs[i] for i in keep])
        cols = [np.asarray([self._data[i][j] for i in keep])
                for j in range(len(self._data[0]))]
        return [snrs] + cols
