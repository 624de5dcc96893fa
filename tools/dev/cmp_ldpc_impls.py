"""Cross-check the two LDPC device formulations (impl='soa' vs impl='dense').

Both must produce bit-identical outputs for encode and decode; 'soa' is the
TPU-optimal form (elementwise + static rolls), 'dense' the CPU-friendly
gather/scatter form picked automatically when the default backend is cpu.
Run on any backend; on the axon TPU this validates the bench path.

Usage: python tools/dev/cmp_ldpc_impls.py [batch]
"""
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from neoradium_tpu.coding.ldpc import LdpcConfig, LdpcEncoder, LdpcDecoder


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rng = np.random.default_rng(0)
    for tbs, bgn, mod, layers, rate in [
            (3000, 1, "16QAM", 2, 490 / 1024),
            (30216, 1, "16QAM", 2, 490 / 1024),
            (1500, 2, "QPSK", 1, 193 / 1024)]:
        cfg = LdpcConfig(tbs, bgn, mod, layers, rate)
        enc, dec = LdpcEncoder(cfg), LdpcDecoder(cfg)
        txb = jnp.asarray(rng.integers(0, 2, (batch, tbs)).astype(np.int8))
        cbs = enc.segment(txb)
        e0 = jax.jit(jax.vmap(lambda b: enc.encode(b, impl="dense")))(cbs)
        e1 = jax.jit(jax.vmap(lambda b: enc.encode(b, impl="soa")))(cbs)
        encDiff = int(jnp.sum(e0 != e1))
        rm = enc.rate_match(e0)
        llrs = (1.0 - 2.0 * rm.astype(jnp.float32)
                + jnp.asarray(0.8 * rng.standard_normal(rm.shape), jnp.float32))
        rec, _ = jax.jit(jax.vmap(dec.recover_rate))(llrs)
        d0 = jax.jit(jax.vmap(lambda r: dec.decode(r, 5, impl="dense")))(rec)
        d1 = jax.jit(jax.vmap(lambda r: dec.decode(r, 5, impl="soa")))(rec)
        decDiff = int(jnp.sum(d0 != d1))
        print(f"tbs={tbs} bg={bgn} {mod}: encode diff={encDiff}, "
              f"decode diff={decDiff}")
        assert encDiff == 0 and decDiff == 0
    print("soa == dense: all identical")


if __name__ == "__main__":
    main()
