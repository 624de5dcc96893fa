"""HARQ — hybrid-ARQ retransmission with Chase combining (CC) or incremental
redundancy (IR), multi-process entity, per-try statistics, events.

Behavioral parity: reference ``neoradium/harq.py`` — per-codeword state
machine (HarqCW.update harq.py:181-204: try counter, rv from rvSequence,
timeout at maxTries), round-robin process entity (goNext harq.py:626-634),
statistics (txBits/rxBits per try, throughput/BLER/meanTries
harq.py:599-612), RXSUCCESS/RXFAILED/TIMEOUT events (harq.py:459-473).
Deviation: on a final-try failure the reference eventCallback fires both
RXFAILED and TIMEOUT for the same transmission (harq.py:193-197); rx_step
emits one event code per (codeword, step) — TIMEOUT alone — because a
jittable step returns fixed-shape outputs. Callers needing the reference's
dual-event stream can reconstruct it from ``out['ok']``/``out['timeout']``
(a timeout always implies the decode failed).
Soft combining happens in LDPC rate recovery by accumulating into the
circular decode buffer (reference ldpc.py:1377-1412 ==
``LdpcDecoder.recover_rate(softBuffer=...)`` here).

TPU design: the reference's mutable object graph becomes an explicit state
pytree + pure step functions. :class:`HarqEntity` is the standalone,
pipeline-agnostic building block — ``init_state`` / ``tx_step`` / ``rx_step``
compose with ANY user TX/RX chain, eagerly or under ``jit``/``lax.scan``/
``vmap``. Data-dependent control flow (new TX vs re-TX, rv selection) is
jnp.where / lax.switch over statically-built rv variants of the rate-match
gather — shapes never change. Per-try statistics accumulate inside the state
as one-hot adds (no dynamic scatters). :class:`PdschHarqSim` builds the
reference's canonical PDSCH throughput loop on top, for both the
frequency-domain and the time-domain (OFDM + fractional-delay filtering +
sync) channel paths, with fading correlated ACROSS slots within a trial.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..grid import apply_channel_freq, precode
from ..random import PRNG
from ..rx.equalize import mmse_equalize
from .link import PdschLinkSim

# Event codes emitted by HarqEntity.rx_step (reference harq.py:415-423).
RXSUCCESS, RXFAILED, TIMEOUT = 0, 1, 2
EVENT_NAMES = {RXSUCCESS: "RXSUCCESS", RXFAILED: "RXFAILED",
               TIMEOUT: "TIMEOUT"}


@dataclass(frozen=True)
class HarqConfig:
    """HARQ entity parameters (reference harq.py:366-540 vocabulary)."""

    numProc: int = 8
    maxTries: int = 4
    harqType: str = "IR"              # 'IR' or 'CC'
    rvSequence: tuple = (0, 2, 3, 1)

    def __post_init__(self):
        if not 1 <= self.numProc <= 32:
            raise ValueError("numProc must be in [1..32]")
        if self.harqType not in ("IR", "CC"):
            raise ValueError("harqType must be 'IR' or 'CC'")

    def rv_for_try(self, tryNum: int) -> int:
        if self.harqType == "CC":
            return 0
        return self.rvSequence[tryNum % len(self.rvSequence)]


class HarqEntity:
    """Standalone multi-process HARQ entity usable with ANY pipeline.

    Functional equivalent of the reference ``HarqEntity``/``HarqProcess``/
    ``HarqCW`` object graph (harq.py:366-668): the mutable per-process state
    and the cumulative statistics live in an explicit pytree returned by
    :meth:`init_state`; :meth:`tx_step` and :meth:`rx_step` are pure and can
    run eagerly, under ``jit``, inside ``lax.scan`` (see
    :class:`PdschHarqSim`) or ``vmap`` over trials.

    Args:
      coders: list of (LdpcEncoder, LdpcDecoder) pairs, one per codeword
        (1 or 2) — e.g. ``PdschLinkSim.ldpc``.
      cfg: :class:`HarqConfig`.

    Typical slot loop (user-owned channel/modulation chain)::

        ent = HarqEntity(sim.ldpc, HarqConfig(numProc=16, harqType='IR'))
        st = ent.init_state()
        for slotNo in range(n):
            proc = slotNo % ent.cfg.numProc
            rm, payloads, tx = ent.tx_step(st, proc, newPayloads(slotNo))
            llrs = user_channel_and_receiver(rm)
            st, out = ent.rx_step(st, proc, llrs, payloads, numIter=8)
            # out['event'] per codeword: RXSUCCESS / RXFAILED / TIMEOUT
        print(HarqEntity.format_stats(ent.stats(st)))
    """

    def print(self, indent: int = 0, title: str | None = None,
              getStr: bool = False):
        """Reference-style property listing (HarqEntity.print, harq.py);
        per-try statistics come from stats()/format_stats."""
        from ..utils import format_properties
        c = self.cfg
        s = format_properties(
            title or "HARQ Entity Properties:",
            [("numProc", c.numProc),
             ("maxTries", c.maxTries),
             ("harqType", c.harqType),
             ("rvSequence", list(c.rvSequence))], indent)
        if getStr:
            return s
        print(s)

    def __repr__(self):
        return self.print(getStr=True)

    def __init__(self, coders, cfg: HarqConfig | None = None):
        self.cfg = cfg or HarqConfig()
        self.coders = list(coders)
        self.numCW = len(self.coders)
        if self.numCW not in (1, 2):
            raise ValueError("HARQ entity supports 1 or 2 codewords")
        self.tbs = [enc.cfg.payloadSize for enc, _ in self.coders]
        maxTries = self.cfg.maxTries
        rvForTry = [self.cfg.rv_for_try(t) for t in range(maxTries)]
        # static per-rv branches: rate matching (TX) and rate recovery (RX)
        self._rm_branches = [
            [lambda coded, rv=rv, q=q: self.coders[q][0].rate_match(coded, rv)
             for rv in rvForTry] for q in range(self.numCW)]

        def rr_branch(q, rv):
            def f(args):
                llrs, buf = args
                return self.coders[q][1].recover_rate(llrs, rv, buf)
            return f
        self._rr_branches = [[rr_branch(q, rv) for rv in rvForTry]
                             for q in range(self.numCW)]

    # ------------------------------------------------------------- state
    def init_state(self) -> dict:
        """Fresh entity state: per-process machines + zeroed statistics."""
        cfg = self.cfg
        st = {}
        for q in range(self.numCW):
            c = self.coders[q][0].cfg
            st[f"payload{q}"] = jnp.zeros((cfg.numProc, self.tbs[q]), jnp.int8)
            st[f"softBuf{q}"] = jnp.zeros(
                (cfg.numProc, c.numCodeBlocks, c.cirBufSize), jnp.float32)
            st[f"curTry{q}"] = jnp.zeros((cfg.numProc,), jnp.int32)
        # cumulative per-try statistics, summed over codewords
        # (reference harq.py:431-450: txBits/rxBits/txBlocks/rxBlocks arrays)
        for k in ("txBits", "rxBits"):
            st[k] = jnp.zeros((cfg.maxTries,), jnp.int64 if
                              jax.config.jax_enable_x64 else jnp.int32)
        for k in ("txBlocks", "rxBlocks"):
            st[k] = jnp.zeros((cfg.maxTries,), jnp.int32)
        st["numTimeouts"] = jnp.zeros((), jnp.int32)
        return st

    # ---------------------------------------------------------------- TX
    def tx_step(self, state: dict, proc, newPayloads):
        """Transmit side for HARQ process ``proc`` (host int or traced).

        For each codeword: if the process needs new data (curTry == 0) the
        corresponding entry of ``newPayloads`` is consumed (reference
        ``needNewData`` NDI, harq.py:236-244); otherwise the stored payload
        is re-encoded and re-rate-matched at this try's redundancy version
        (reference getRateMatchedCodeBlocks harq.py:145-162 — we re-encode
        instead of buffering coded bits: static shapes, negligible cost).

        Returns ``(rmBits, payloads, txInfo)`` — rate-matched bit (or LLR-
        position) arrays per codeword, the actual payloads in flight (pass to
        :meth:`rx_step`), and a dict with per-codeword ``newTx``/``curTry``.
        """
        cfg = self.cfg
        rmBits, payloads, newTxs, curTries = [], [], [], []
        for q in range(self.numCW):
            enc = self.coders[q][0]
            curTry = state[f"curTry{q}"][proc]
            newTx = curTry == 0
            payload = jnp.where(newTx, jnp.asarray(newPayloads[q], jnp.int8),
                                state[f"payload{q}"][proc])
            coded = enc.encode(enc.segment(payload))
            bits = jax.lax.switch(jnp.minimum(curTry, cfg.maxTries - 1),
                                  self._rm_branches[q], coded)
            rmBits.append(bits)
            payloads.append(payload)
            newTxs.append(newTx)
            curTries.append(curTry)
        return rmBits, payloads, dict(newTx=jnp.stack(newTxs),
                                      curTry=jnp.stack(curTries))

    # ---------------------------------------------------------------- RX
    def rx_step(self, state: dict, proc, llrs, payloads, numIter: int = 5,
                dtype=jnp.float32):
        """Receive side: soft-combine, decode, update machines + statistics.

        Mirrors reference HarqCW.decodeLLRs + update (harq.py:165-204): the
        per-try statistics count this transmission at its ``curTry`` index,
        a failure advances the try counter (re-TX at the next rv), a failure
        at the last try emits TIMEOUT and resets, a success emits RXSUCCESS
        and resets.

        Returns ``(newState, out)`` with out per codeword: ``decoded``
        (payload bits), ``ok``, ``event`` (RXSUCCESS/RXFAILED/TIMEOUT),
        ``tryNo``, ``timeout``, ``bitErrors``.
        """
        cfg = self.cfg
        newState = dict(state)
        tryNo, okArr, timeoutArr, events, decodedAll = [], [], [], [], []
        bitErr = jnp.zeros((), jnp.int32)
        for q in range(self.numCW):
            dec = self.coders[q][1]
            curTry = state[f"curTry{q}"][proc]
            newTx = curTry == 0
            softIn = jnp.where(newTx, 0.0, state[f"softBuf{q}"][proc])
            rec, buf = jax.lax.switch(jnp.minimum(curTry, cfg.maxTries - 1),
                                      self._rr_branches[q],
                                      (llrs[q], softIn))
            decoded = dec.decode(rec, numIter=numIter, dtype=dtype)
            merged, cbOk = dec.check_crc_and_merge(decoded)
            ok = jnp.all(cbOk, axis=-1)
            timeout = (~ok) & (curTry + 1 >= cfg.maxTries)
            nextTry = jnp.where(ok | timeout, 0, curTry + 1)
            newState[f"payload{q}"] = state[f"payload{q}"].at[proc].set(
                payloads[q].astype(jnp.int8))
            newState[f"softBuf{q}"] = state[f"softBuf{q}"].at[proc].set(
                buf.astype(jnp.float32))
            newState[f"curTry{q}"] = state[f"curTry{q}"].at[proc].set(nextTry)
            # statistics at index curTry (one-hot adds: no dynamic scatter)
            oneHot = (jnp.arange(cfg.maxTries) == curTry)
            newState["txBits"] = newState["txBits"] \
                + oneHot * jnp.asarray(self.tbs[q], newState["txBits"].dtype)
            newState["txBlocks"] = newState["txBlocks"] + oneHot.astype(jnp.int32)
            okHot = oneHot & ok
            newState["rxBits"] = newState["rxBits"] \
                + okHot * jnp.asarray(self.tbs[q], newState["rxBits"].dtype)
            newState["rxBlocks"] = newState["rxBlocks"] + okHot.astype(jnp.int32)
            newState["numTimeouts"] = newState["numTimeouts"] \
                + timeout.astype(jnp.int32)
            payloadBits = merged[..., : self.tbs[q]]
            bitErr += jnp.sum(payloadBits != payloads[q], dtype=jnp.int32)
            tryNo.append(curTry)
            okArr.append(ok)
            timeoutArr.append(timeout)
            events.append(jnp.where(ok, RXSUCCESS,
                                    jnp.where(timeout, TIMEOUT, RXFAILED)))
            decodedAll.append(payloadBits)
        out = dict(tryNo=jnp.stack(tryNo), ok=jnp.stack(okArr),
                   timeout=jnp.stack(timeoutArr), event=jnp.stack(events),
                   bitErrors=bitErr, decoded=decodedAll)
        return newState, out

    # ------------------------------------------------------------- stats
    def stats(self, state: dict) -> dict:
        """Reference printStats fields (harq.py:540-612) from an entity
        state (or a dict of summed per-try counters)."""
        return harq_stats(state)

    @staticmethod
    def format_stats(s: dict) -> str:
        """Reference printStats text layout (harq.py:556-568)."""
        return ("\nHARQ Entity Statistics:\n"
                f"  txBits (per try):     {s['txBitsPerTry']}\n"
                f"  rxBits (per try):     {s['rxBitsPerTry']}\n"
                f"  txBlocks (per try):   {s['txBlocksPerTry']}\n"
                f"  rxBlocks (per try):   {s['rxBlocksPerTry']}\n"
                f"  numTimeouts:          {int(s['numTimeouts'])}\n"
                f"  totalTxBlocks:        {s['totalTxBlocks']}\n"
                f"  totalRxBlocks:        {s['totalRxBlocks']}\n"
                f"  totalTxBits:          {s['totalTxBits']}\n"
                f"  totalRxBits:          {s['totalRxBits']}\n"
                f"  throughput:           {s['throughput']:.2f}%\n"
                f"  bler:                 {s['bler']:.2f}%\n"
                f"  Average Num. Retries: {s['meanTries']:.2f}\n")

    @staticmethod
    def event_log(out, slotNo=None) -> list[str]:
        """Host helper: reference-style event strings from an rx_step output
        (or a scanned stack of them) — the traced-world replacement for the
        reference's ``eventCallback`` (harq.py:414-473)."""
        ev = np.atleast_2d(np.asarray(out["event"]))
        tries = np.atleast_2d(np.asarray(out["tryNo"]))
        lines = []
        for s in range(ev.shape[0]):
            for q in range(ev.shape[-1] if ev.ndim > 1 else 1):
                tag = f"slot {slotNo if slotNo is not None else s:3d} "
                lines.append(f"{tag}CW{q}: {EVENT_NAMES[int(ev[s][q])]:>9s} "
                             f"(try {int(tries[s][q])})")
        return lines


def harq_stats(counters: dict) -> dict:
    """Aggregate reference-style statistics (harq.py:599-612) from per-try
    counter arrays (entity state, or summed rx metrics across trials)."""
    txBits = np.sum(np.asarray(counters["txBits"]), axis=0) \
        if np.asarray(counters["txBits"]).ndim > 1 else np.asarray(counters["txBits"])
    rxBits = np.sum(np.asarray(counters["rxBits"]), axis=0) \
        if np.asarray(counters["rxBits"]).ndim > 1 else np.asarray(counters["rxBits"])
    txBlocks = np.sum(np.asarray(counters["txBlocks"]), axis=0) \
        if np.asarray(counters["txBlocks"]).ndim > 1 else np.asarray(counters["txBlocks"])
    rxBlocks = np.sum(np.asarray(counters["rxBlocks"]), axis=0) \
        if np.asarray(counters["rxBlocks"]).ndim > 1 else np.asarray(counters["rxBlocks"])
    timeouts = float(np.sum(counters["numTimeouts"]))
    maxTries = len(txBlocks)
    totalRx = float(rxBlocks.sum())
    return dict(
        throughput=100.0 * float(rxBits.sum()) / max(float(txBits.sum()), 1),
        bler=100.0 * (txBlocks.sum() - rxBlocks.sum()) / max(txBlocks.sum(), 1),
        meanTries=((rxBlocks * np.arange(maxTries)).sum() + timeouts * maxTries)
        / max(totalRx + timeouts, 1),
        txBitsPerTry=txBits.tolist(), rxBitsPerTry=rxBits.tolist(),
        txBlocksPerTry=txBlocks.tolist(), rxBlocksPerTry=rxBlocks.tolist(),
        totalTxBits=int(txBits.sum()), totalRxBits=int(rxBits.sum()),
        totalTxBlocks=int(txBlocks.sum()), totalRxBlocks=int(rxBlocks.sum()),
        numTimeouts=timeouts,
    )


class PdschHarqSim:
    """Monte-Carlo PDSCH link with HARQ over a sequence of slots.

    Wraps a :class:`PdschLinkSim` and runs ``numSlots`` slots per trial under
    ``lax.scan`` with a :class:`HarqEntity` state as (part of) the carry; the
    fading channel evolves over slots within a trial (reference §3.2
    throughput loop, Playground/PDSCH/PDSCH-Throughput.ipynb). Supports both
    channel domains: 'freq' (grid-level) and 'time' (OFDM modulate +
    fractional-delay channel filtering + timing sync every slot). Supports
    one or two codewords (numLayers up to 8); each codeword has its own try
    counter / rv / soft buffer, like the reference HarqProcess holding 1-2
    HarqCW state machines (harq.py:205-365).
    """

    def __init__(self, linkSim: PdschLinkSim, harq: HarqConfig | None = None,
                 numSlots: int = 20):
        if linkSim.channelModel is None:
            raise ValueError("HARQ sim needs a channel model")
        self.sim = linkSim
        self.harq = harq or HarqConfig()
        self.numSlots = numSlots
        self.numCW = linkSim.pdsch.numCW
        self.entity = HarqEntity(linkSim.ldpc, self.harq)
        self.tbs = linkSim.tbs

    # ------------------------------------------------------------------ scan
    def run_trial(self, key: jax.Array, snrDb):
        """One trial: scan numSlots slots. Returns per-try stats dict."""
        sim, harq = self.sim, self.harq
        plan, pdsch = sim.plan, sim.pdsch
        chan = sim.channelModel
        ent = self.entity
        snr = 10.0 ** (snrDb / 10.0)

        kChan, kLoop = jax.random.split(key)
        chanState = chan.init_state(kChan)
        carry0 = ent.init_state()

        def step(carry, slotNo):
            proc = slotNo % harq.numProc
            kSlot = jax.random.fold_in(kLoop, slotNo)
            kBits, kNoise = jax.random.split(kSlot)

            newPayloads = [
                jax.random.bernoulli(jax.random.fold_in(kBits, q), 0.5,
                                     (self.tbs[q],)).astype(jnp.int8)
                for q in range(self.numCW)]
            rmBits, payloads, _tx = ent.tx_step(carry, proc, newPayloads)
            grid = plan.populate(rmBits if self.numCW > 1 else rmBits[0])

            # ---- channel with slot-continuous fading + precoding
            Heff = None
            if pdsch.wideband_full_band:
                F = pdsch.precoder_from_mean(
                    chan.mean_channel(chanState, slotNo))
                H = None
            else:
                H = chan.channel_matrix(chanState, slotNo)
                F = pdsch.precoding_matrix_traced(H)
            if sim.domain == "freq" and F.ndim == 2:
                # precoder folded into the CIR before the DFT (see
                # PdschLinkSim.make_trial_fn / effective_channel_matrix)
                Heff = chan.effective_channel_matrix(chanState, slotNo, F)
                txGrid = grid
            else:
                if H is None:
                    H = chan.channel_matrix(chanState, slotNo)
                txGrid = precode(grid, F)
            if sim.domain == "time":
                rxGrid, noiseVar = sim.td_channel_rx(
                    txGrid, chanState, slotNo, kNoise, snr)
            else:
                rxGrid0 = apply_channel_freq(txGrid,
                                             Heff if Heff is not None else H)
                if sim.useRxPower:
                    sigma = jnp.sqrt(jnp.var(rxGrid0.reshape(-1)) / snr)
                else:
                    sigma = jnp.sqrt(1.0 / (snr * sim.numRx))
                rxGrid = rxGrid0 + PRNG.awgn_from_key(
                    kNoise, rxGrid0.shape, 1.0) * sigma.astype(jnp.float32)
                noiseVar = sigma ** 2

            if sim.chEst == "ls":
                hEff, _ = sim.estimator.estimate(rxGrid)
            elif Heff is not None:
                hEff = Heff
            else:
                hEff = H @ (F if F.ndim >= 3 else F[None, None])
            eqGrid, llrScales = mmse_equalize(rxGrid, hEff, noiseVar)
            llrsAll = plan.extract_llrs(eqGrid, llrScales, noiseVar)

            carry, out = ent.rx_step(carry, proc, llrsAll, payloads,
                                     numIter=sim.decoderIter,
                                     dtype=sim.decoderDtype)
            return carry, dict(bitErrors=out["bitErrors"])

        endState, ys = jax.lax.scan(step, carry0, jnp.arange(self.numSlots))
        return dict(
            txBlocks=endState["txBlocks"], rxBlocks=endState["rxBlocks"],
            txBits=endState["txBits"].astype(jnp.int32),
            rxBits=endState["rxBits"].astype(jnp.int32),
            numTimeouts=endState["numTimeouts"],
            bitErrors=jnp.sum(ys["bitErrors"], dtype=jnp.int32),
        )

    def make_trial_fn(self):
        return self.run_trial

    # ------------------------------------------------------------------ stats
    @staticmethod
    def stats(metrics: dict) -> dict:
        """Aggregate reference-style statistics (harq.py:599-612)."""
        return harq_stats(metrics)
