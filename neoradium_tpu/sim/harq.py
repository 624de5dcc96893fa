"""HARQ — hybrid-ARQ retransmission with Chase combining (CC) or incremental
redundancy (IR), multi-process entity, per-try statistics.

Behavioral parity: reference ``neoradium/harq.py`` — per-codeword state
machine (HarqCW.update harq.py:181-204: try counter, rv from rvSequence,
timeout at maxTries), round-robin process entity (goNext harq.py:626-634),
statistics (txBits/rxBits per try, throughput/BLER/meanTries
harq.py:599-612). Soft combining happens in LDPC rate recovery by
accumulating into the decode buffer (reference ldpc.py:1377-1412 ==
``LdpcDecoder.recover_rate(softBuffer=...)`` here).

TPU design: the reference's mutable object graph becomes an explicit carry
pytree in a ``lax.scan`` over slots. Data-dependent control flow (new TX vs
re-TX, rv selection) is jnp.where / lax.switch over statically-built rv
variants of the rate-match gather — shapes never change. Trials vmap over
the whole scan; each trial carries its own channel state so fading is
correlated ACROSS slots within a trial (Doppler continuity via absolute
slot sample times) and independent across trials.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..grid import apply_channel_freq, precode
from ..rx.equalize import mmse_equalize
from .link import PdschLinkSim


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


class PdschHarqSim:
    """Monte-Carlo PDSCH link with HARQ over a sequence of slots.

    Wraps a :class:`PdschLinkSim` (frequency-domain channel path) and runs
    ``numSlots`` slots per trial under ``lax.scan``; the fading channel
    evolves over slots within a trial (reference §3.2 throughput loop).
    Supports one or two codewords (numLayers up to 8); each codeword has
    its own try counter / rv / soft buffer, like the reference HarqProcess
    holding 1-2 HarqCW state machines (harq.py:205-365).
    """

    def __init__(self, linkSim: PdschLinkSim, harq: HarqConfig | None = None,
                 numSlots: int = 20):
        if linkSim.domain != "freq":
            raise ValueError("HARQ sim uses the frequency-domain channel path")
        if linkSim.channelModel is None:
            raise ValueError("HARQ sim needs a channel model")
        self.sim = linkSim
        self.harq = harq or HarqConfig()
        self.numSlots = numSlots
        self.numCW = linkSim.pdsch.numCW
        self.coders = linkSim.ldpc                 # [(enc, dec)] per codeword
        self.tbs = linkSim.tbs

    # ------------------------------------------------------------------ scan
    def run_trial(self, key: jax.Array, snrDb):
        """One trial: scan numSlots slots. Returns per-try stats dict."""
        sim, harq = self.sim, self.harq
        plan, pdsch = sim.plan, sim.pdsch
        chan = sim.channelModel
        snr = 10.0 ** (snrDb / 10.0)
        maxTries = harq.maxTries
        numCW = self.numCW

        kChan, kLoop = jax.random.split(key)
        chanState = chan.init_state(kChan)

        # rv-variant branches per codeword (static index tables per rv)
        rvForTry = [harq.rv_for_try(t) for t in range(maxTries)]
        rm_branches = [[lambda coded, rv=rv, q=q: self.coders[q][0].rate_match(coded, rv)
                        for rv in rvForTry] for q in range(numCW)]

        def rr_branch(q, rv):
            def f(args):
                llrs, buf = args
                return self.coders[q][1].recover_rate(llrs, rv, buf)
            return f
        rr_branches = [[rr_branch(q, rv) for rv in rvForTry]
                       for q in range(numCW)]

        carry0 = {}
        for q in range(numCW):
            cfg = self.coders[q][0].cfg
            carry0[f"payload{q}"] = jnp.zeros((harq.numProc, self.tbs[q]),
                                              jnp.int8)
            carry0[f"softBuf{q}"] = jnp.zeros(
                (harq.numProc, cfg.numCodeBlocks, cfg.cirBufSize), jnp.float32)
            carry0[f"curTry{q}"] = jnp.zeros((harq.numProc,), jnp.int32)

        def step(carry, slotNo):
            proc = slotNo % harq.numProc
            kSlot = jax.random.fold_in(kLoop, slotNo)
            kBits, kNoise = jax.random.split(kSlot)

            # ---- TX per codeword: encode every slot (cheap, static shapes);
            # re-TX just re-rate-matches the same coded bits at the new rv.
            payloads, allBits, curTries, newTxs = [], [], [], []
            for q in range(numCW):
                enc = self.coders[q][0]
                curTry = carry[f"curTry{q}"][proc]
                newTx = curTry == 0
                kq = jax.random.fold_in(kBits, q)
                newPayload = jax.random.bernoulli(
                    kq, 0.5, (self.tbs[q],)).astype(jnp.int8)
                payload = jnp.where(newTx, newPayload,
                                    carry[f"payload{q}"][proc])
                coded = enc.encode(enc.segment(payload))
                bits = jax.lax.switch(jnp.minimum(curTry, maxTries - 1),
                                      rm_branches[q], coded)
                payloads.append(payload)
                allBits.append(bits)
                curTries.append(curTry)
                newTxs.append(newTx)
            grid = plan.populate(allBits if numCW > 1 else allBits[0])

            # ---- channel with slot-continuous fading + precoding
            H = chan.channel_matrix(chanState, slotNo)
            F = pdsch.precoding_matrix_traced(H)
            txGrid = precode(grid, F)
            rxGrid0 = apply_channel_freq(txGrid, H)
            x = rxGrid0.reshape(-1)
            sigma = jnp.sqrt(jnp.var(x) / snr)
            from ..random import PRNG
            rxGrid = rxGrid0 + PRNG.awgn_from_key(
                kNoise, rxGrid0.shape, 1.0) * sigma.astype(jnp.float32)
            noiseVar = sigma ** 2

            if sim.chEst == "ls":
                hEff, _ = sim.estimator.estimate(rxGrid)
            else:
                hEff = H @ (F if F.ndim >= 3 else F[None, None])
            eqGrid, llrScales = mmse_equalize(rxGrid, hEff, noiseVar)
            llrsAll = plan.extract_llrs(eqGrid, llrScales, noiseVar)

            # ---- RX per codeword: combine, decode, update HARQ state
            newCarry = dict(carry)
            ys = dict()
            tryNo, okArr, timeoutArr = [], [], []
            bitErr = jnp.zeros((), jnp.int32)
            for q in range(numCW):
                dec = self.coders[q][1]
                curTry, newTx = curTries[q], newTxs[q]
                softIn = jnp.where(newTx, 0.0, carry[f"softBuf{q}"][proc])
                rec, buf = jax.lax.switch(jnp.minimum(curTry, maxTries - 1),
                                          rr_branches[q], (llrsAll[q], softIn))
                decoded = dec.decode(rec, numIter=sim.decoderIter)
                merged, cbOk = dec.check_crc_and_merge(decoded)
                ok = jnp.all(cbOk, axis=-1)
                timeout = (~ok) & (curTry + 1 >= maxTries)
                nextTry = jnp.where(ok | timeout, 0, curTry + 1)
                newCarry[f"payload{q}"] = carry[f"payload{q}"].at[proc].set(
                    payloads[q])
                newCarry[f"softBuf{q}"] = carry[f"softBuf{q}"].at[proc].set(
                    buf.astype(jnp.float32))
                newCarry[f"curTry{q}"] = carry[f"curTry{q}"].at[proc].set(nextTry)
                bitErr += jnp.sum(merged[..., : self.tbs[q]] != payloads[q],
                                  dtype=jnp.int32)
                tryNo.append(curTry)
                okArr.append(ok)
                timeoutArr.append(timeout)
            y = dict(tryNo=jnp.stack(tryNo), ok=jnp.stack(okArr),
                     timeout=jnp.stack(timeoutArr), bitErrors=bitErr)
            return newCarry, y

        _, ys = jax.lax.scan(step, carry0, jnp.arange(self.numSlots))

        # per-try histograms (reference harq.py:update), summed over codewords
        tries = ys["tryNo"]                              # (slots, numCW)
        okF = ys["ok"]
        tbsArr = jnp.asarray(self.tbs[: numCW])[None, :, None]
        oneHot = (tries[..., None] == jnp.arange(maxTries)[None, None, :])
        txBlocks = jnp.sum(oneHot, axis=(0, 1), dtype=jnp.int32)
        rxBlocks = jnp.sum(oneHot & okF[..., None], axis=(0, 1),
                           dtype=jnp.int32)
        txBits = jnp.sum(oneHot * tbsArr, axis=(0, 1)).astype(jnp.int32)
        rxBits = jnp.sum((oneHot & okF[..., None]) * tbsArr,
                         axis=(0, 1)).astype(jnp.int32)
        return dict(
            txBlocks=txBlocks, rxBlocks=rxBlocks,
            txBits=txBits, rxBits=rxBits,
            numTimeouts=jnp.sum(ys["timeout"], dtype=jnp.int32),
            bitErrors=jnp.sum(ys["bitErrors"], dtype=jnp.int32),
        )

    def make_trial_fn(self):
        return self.run_trial

    # ------------------------------------------------------------------ stats
    @staticmethod
    def stats(metrics: dict) -> dict:
        """Aggregate reference-style statistics (harq.py:599-612)."""
        txBits = float(np.sum(metrics["txBits"]))
        rxBits = float(np.sum(metrics["rxBits"]))
        txBlocks = np.sum(np.asarray(metrics["txBlocks"]), axis=0) \
            if np.asarray(metrics["txBlocks"]).ndim > 1 else np.asarray(metrics["txBlocks"])
        rxBlocks = np.sum(np.asarray(metrics["rxBlocks"]), axis=0) \
            if np.asarray(metrics["rxBlocks"]).ndim > 1 else np.asarray(metrics["rxBlocks"])
        timeouts = float(np.sum(metrics["numTimeouts"]))
        maxTries = len(txBlocks)
        totalRx = float(rxBlocks.sum())
        return dict(
            throughput=100.0 * rxBits / max(txBits, 1),
            bler=100.0 * (txBlocks.sum() - rxBlocks.sum()) / max(txBlocks.sum(), 1),
            meanTries=((rxBlocks * np.arange(maxTries)).sum() + timeouts * maxTries)
            / max(totalRx + timeouts, 1),
            txBlocksPerTry=txBlocks.tolist(), rxBlocksPerTry=rxBlocks.tolist(),
            numTimeouts=timeouts,
        )
