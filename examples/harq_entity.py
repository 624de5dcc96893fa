"""Standalone HARQ entity with a user-owned pipeline (mirrors the reference
``HarqEntity``/``HarqProcess`` workflow, reference harq.py:366-668, used
outside any canned simulation).

The entity is a pure-functional building block: an explicit state pytree
(``init_state``) plus ``tx_step``/``rx_step`` that compose with ANY TX/RX
chain — here a bare BPSK-LLR AWGN link — eagerly or under jit/scan/vmap.
Per-try statistics accumulate inside the state; ``format_stats`` prints the
reference's printStats layout and ``event_log`` renders
RXSUCCESS/RXFAILED/TIMEOUT events.

Run: python examples/harq_entity.py [numSlots]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# Examples default to CPU for fast startup; set NR_TPU=1 to run on TPU.
if not os.environ.get("NR_TPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp

from neoradium_tpu.coding.ldpc import LdpcConfig, LdpcEncoder, LdpcDecoder
from neoradium_tpu.sim.harq import HarqEntity, HarqConfig


def main():
    numSlots = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    tbs, g = 1500, 3600
    cfg = LdpcConfig(tbs, baseGraphNo=1, modulation="QPSK", txLayers=1,
                     targetRate=tbs / g, g=g)
    ent = HarqEntity([(LdpcEncoder(cfg), LdpcDecoder(cfg))],
                     HarqConfig(numProc=4, maxTries=4, harqType="IR"))
    st = ent.init_state()
    key = jax.random.PRNGKey(0)
    noiseStd = 3.3                      # near the combining threshold

    for slot in range(numSlots):
        proc = slot % ent.cfg.numProc
        kP, kN, key = jax.random.split(key, 3)
        # TX: the entity picks new-vs-retransmit data and the rv per process
        newPayload = [jax.random.bernoulli(kP, 0.5,
                                           (tbs,)).astype(jnp.int8)]
        rmBits, payloads, txInfo = ent.tx_step(st, proc, newPayload)
        # user-owned "channel": BPSK + AWGN -> LLRs
        llr = ((1.0 - 2.0 * rmBits[0].astype(jnp.float32)) * 2.0
               + noiseStd * jax.random.normal(kN, rmBits[0].shape))
        # RX: soft-combine into the process buffer, decode, update stats
        st, out = ent.rx_step(st, proc, [llr], payloads, numIter=8)
        for line in HarqEntity.event_log(out, slotNo=slot):
            print(f"  proc {proc}  {line}")

    print(HarqEntity.format_stats(ent.stats(st)))


if __name__ == "__main__":
    main()
