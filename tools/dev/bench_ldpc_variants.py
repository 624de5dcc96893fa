"""Standalone TPU timing of LDPC decode variants at the headline shape.

Times jit(vmap(decode)) (the sims' pattern — jit of a pre-batched decode
SIGSEGVs the axon remote compile helper, CLAUDE.md) on the real chip with
min-of-reps and a forced host transfer. Usage:

    python tools/dev/bench_ldpc_variants.py [batch] [impl ...]

impls default to: soa (bf16) + soa-iter4. Round-5 measurement log (batch
1536, Zc=352, C=4, bf16, real v5e over the axon tunnel):

  pre-round-5 soa (lead+(z,) layout)   86.8 ms
  soa2 = compressed messages (int8 sign/argmin side arrays, bit-level
    reconstruction)                   101.5 ms   REJECTED
  flat-folded soa ((N*Zc,) arrays)     57.4 ms   SHIPPED (bit-identical)
  flat + compressed                    59.8 ms   REJECTED
  flat + amin stored bf16              60.1 ms   REJECTED (int32 amin never
                                                 leaves the fused layer)
  lax.map batch tiling x4/x8         79/78 ms    REJECTED (pre-fold base)

The compressed-message trick (store per-layer min1/min2/argmin + per-edge
signs, reconstruct msg = mins*s*0.75) is bit-reconstructible but loses on
TPU: the int8 side arrays cost casts/relayouts that exceed the message-byte
savings, in both layouts. The actual bottleneck was tile padding of the
loop-carried buffers (see decode()'s layout note), fixed by the fold.
"""
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from neoradium_tpu.coding.ldpc import LdpcConfig, LdpcEncoder, LdpcDecoder

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1536
    variants = sys.argv[2:] or ["soa", "soa-iter4"]

    cfg = LdpcConfig(30216, baseGraphNo=1, modulation="16QAM", txLayers=2,
                     targetRate=490 / 1024, g=63648)
    enc, dec = LdpcEncoder(cfg), LdpcDecoder(cfg)
    print(f"payload={cfg.payloadSize} C={cfg.numCodeBlocks} Zc={cfg.liftingSize}"
          f" batch={batch}", file=sys.stderr)

    key = jax.random.PRNGKey(0)
    tb = jax.random.bernoulli(key, 0.5, (cfg.payloadSize,)).astype(jnp.int8)
    rm = enc.encode_tb(tb, rv=0).astype(jnp.float32)
    llr = (1.0 - 2.0 * rm) * 4.0
    llr = jnp.broadcast_to(llr, (batch,) + llr.shape)
    llr = llr + 0.5 * jax.random.normal(key, llr.shape, jnp.float32)
    rec, _ = jax.jit(jax.vmap(lambda l: dec.recover_rate(l, 0)))(llr)
    rec = jax.block_until_ready(rec.astype(jnp.bfloat16))

    for name in variants:
        impl, it = (name.split("-iter") + ["5"])[:2] if "-iter" in name \
            else (name, "5")
        it = int(it)
        fn = jax.jit(jax.vmap(lambda r: dec.decode(
            r, it, impl=impl, dtype=jnp.bfloat16, activeRvs=(0,))))
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(rec))
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            o = fn(rec)
            float(o.sum())
            ts.append(time.perf_counter() - t0)
        errs = float((out[:1] != jnp.asarray(tb == 1, jnp.int8)[: cfg.codeBlockSize]
                      ).astype(jnp.float32).mean()) if False else -1
        print(f"{name:12s}: {min(ts)*1e3:8.2f} ms/call  "
              f"(compile {compile_s:.1f}s, med {sorted(ts)[len(ts)//2]*1e3:.2f})")


if __name__ == "__main__":
    main()
