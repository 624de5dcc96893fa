"""LDPC chain tests: bit-exact vs reference golden tensors at every stage
(segmentation, encode, rate match, rate recovery, decode, merge), plus noisy
round-trip and HARQ soft-combining behavior."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from neoradium_tpu.coding.ldpc import LdpcConfig, LdpcEncoder, LdpcDecoder
from neoradium_tpu.modulation import Modem

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _case(tag):
    d = np.load(os.path.join(GOLDEN, "ldpc.npz"))
    tbs, bgn, rv, layers, z, C, K, F, g = d[f"{tag}_cfg"]
    mod = bytes(d[f"{tag}_mod"]).decode()
    rate = float(d[f"{tag}_rate"][0])
    cfg = LdpcConfig(int(tbs), int(bgn), mod, int(layers), rate, int(g))
    return d, tag, cfg, int(rv)


@pytest.mark.parametrize("tag", ["s1", "s2", "s3", "s4"])
def test_ldpc_chain_golden(tag):
    d, tag, cfg, rv = _case(tag)
    tbs, bgn, _, layers, z, C, K, F, g = d[f"{tag}_cfg"]
    assert cfg.liftingSize == z and cfg.numCodeBlocks == C
    assert cfg.codeBlockSize == K and cfg.numFillerBits == F

    enc = LdpcEncoder(cfg)
    cbs = np.asarray(enc.segment(jnp.asarray(d[f"{tag}_txb"])))
    assert np.array_equal(cbs, d[f"{tag}_cbs"])
    coded = np.asarray(enc.encode(jnp.asarray(cbs)))
    assert np.array_equal(coded, d[f"{tag}_coded"])
    rm = np.asarray(enc.rate_match(jnp.asarray(coded), rv=rv))
    assert np.array_equal(rm, d[f"{tag}_rm"])

    dec = LdpcDecoder(cfg)
    llrs = jnp.asarray(1.0 - 2.0 * rm.astype(np.float64))
    rec, _ = dec.recover_rate(llrs, rv=0)
    assert np.allclose(np.asarray(rec), np.clip(d[f"{tag}_rec"], -1e30, 1e30), rtol=1e-6)
    decoded = np.asarray(dec.decode(rec, numIter=5))
    assert np.array_equal(decoded, d[f"{tag}_decoded"])
    merged, cbok = dec.check_crc_and_merge(jnp.asarray(decoded))
    assert np.array_equal(np.asarray(merged), d[f"{tag}_merged"])
    assert np.array_equal(np.asarray(cbok), d[f"{tag}_crc"])


def test_ldpc_noisy_roundtrip_batched():
    rng = np.random.default_rng(11)
    cfg = LdpcConfig(3000, 1, "16QAM", 2, 490 / 1024)
    enc, dec, modem = LdpcEncoder(cfg), LdpcDecoder(cfg), Modem("16QAM")
    txb = jnp.asarray(rng.integers(0, 2, (4, 3000)).astype(np.int8))
    rm = enc.encode_tb(txb)
    syms = modem.modulate(rm)
    nv = 0.08
    noise = (rng.normal(size=syms.shape) + 1j * rng.normal(size=syms.shape)) * np.sqrt(nv / 2)
    llrs = modem.llrs_from_symbols(syms + jnp.asarray(noise.astype(np.complex64)), nv)
    payload, ok, _ = dec.decode_tb(llrs)
    assert np.all(np.asarray(ok))
    assert np.array_equal(np.asarray(payload), np.asarray(txb))


def test_ldpc_harq_ir_combining():
    """At an SNR where single transmissions fail, rv=0 + rv=2 soft-combining
    must recover the block (incremental redundancy)."""
    rng = np.random.default_rng(13)
    cfg = LdpcConfig(3000, 1, "16QAM", 2, 490 / 1024)
    enc, dec, modem = LdpcEncoder(cfg), LdpcDecoder(cfg), Modem("16QAM")
    txb = jnp.asarray(rng.integers(0, 2, (4, 3000)).astype(np.int8))
    nv = 0.45

    def chan(rm):
        s = modem.modulate(rm)
        n = (rng.normal(size=s.shape) + 1j * rng.normal(size=s.shape)) * np.sqrt(nv / 2)
        return modem.llrs_from_symbols(s + jnp.asarray(n.astype(np.complex64)), nv)

    _, ok0, buf0 = dec.decode_tb(chan(enc.encode_tb(txb, rv=0)), rv=0)
    _, ok2, _ = dec.decode_tb(chan(enc.encode_tb(txb, rv=2)), rv=2, softBuffer=buf0)
    assert np.asarray(ok0).mean() < 0.5          # first TX mostly fails
    assert np.all(np.asarray(ok2))               # IR combining recovers


def test_ldpc_parity_invariant():
    """Every encoded (unpunctured) block satisfies all base-graph parity rows."""
    rng = np.random.default_rng(14)
    cfg = LdpcConfig(1500, 2, "QPSK", 1, 193 / 1024)
    enc = LdpcEncoder(cfg)
    cbs = enc.segment(jnp.asarray(rng.integers(0, 2, 1500).astype(np.int8)))
    full = np.asarray(enc.encode(cbs, puncture=False))
    z = cfg.liftingSize
    x = full.reshape(cfg.numCodeBlocks, cfg.numCols, z)
    for row in cfg.baseGraph:
        acc = np.zeros((cfg.numCodeBlocks, z), np.int64)
        for j, k in enumerate(row):
            if k >= 0:
                acc += np.roll(x[:, j], -int(k), axis=-1)
        assert np.all(acc % 2 == 0)


def test_ldpc_is_valid_coded_block_and_decode2():
    """Device parity validator accepts encoder output and rejects corrupted
    codewords; host decode2 (row-serial verification decoder) round-trips."""
    rng = np.random.default_rng(17)
    cfg = LdpcConfig(400, 2, "QPSK", 1, 193 / 1024)
    enc, dec = LdpcEncoder(cfg), LdpcDecoder(cfg)
    cbs = enc.segment(jnp.asarray(rng.integers(0, 2, 400).astype(np.int8)))
    full = enc.encode(cbs, puncture=False)
    ok = np.asarray(dec.is_valid_coded_block(full))
    assert ok.shape == (cfg.numCodeBlocks,) and np.all(ok)
    bad = full.at[..., 3].set(1 - full[..., 3])
    assert not np.asarray(dec.is_valid_coded_block(bad)).all()

    rm = enc.rate_match(enc.encode(cbs), rv=0)
    rec, _ = dec.recover_rate(1.0 - 2.0 * rm.astype(np.float64), rv=0)
    d2 = dec.decode2(np.asarray(rec), maxIter=6)
    d1 = np.asarray(dec.decode(rec, numIter=6))
    assert np.array_equal(d2, d1)
    merged, cbok = dec.check_crc_and_merge(jnp.asarray(d2))
    assert np.all(np.asarray(cbok))


@pytest.mark.parametrize("A,bgn,mod,rate,rv", [
    (3000, 1, "16QAM", 490 / 1024, 0),
    (3000, 2, "QPSK", 300 / 1024, 0),
    (3000, 1, "16QAM", 490 / 1024, 2),
    (1000, 1, "64QAM", 800 / 1024, 3),
])
def test_active_rows_pruning_exact(A, bgn, mod, rate, rv):
    """Rate-matching-aware layer pruning (LdpcConfig.active_rows) is
    bit-identical: a row whose degree-1 extension-parity column never
    receives channel LLRs sends exactly-zero messages at every layered
    min-sum iteration, so skipping it changes no belief. Assert full
    belief equality between the pruned and unpruned decoders, and that
    the pruning actually bites at these rates."""
    cfg = LdpcConfig(A, bgn, mod, txLayers=2, targetRate=rate)
    act = cfg.active_rows((rv,))
    assert 4 <= len(act) < cfg.numParityRows  # prunes something, keeps core
    rng = np.random.default_rng(5)
    enc, dec = LdpcEncoder(cfg), LdpcDecoder(cfg)
    txb = jnp.asarray(rng.integers(0, 2, (A,)).astype(np.int8))
    rm = np.asarray(enc.encode_tb(txb, rv=rv), np.float64)
    llrs = jnp.asarray((1.0 - 2.0 * rm) + rng.normal(0, 0.6, rm.shape))
    rec, _ = dec.recover_rate(llrs, rv=rv)
    bFull = np.asarray(dec.decode(rec, numIter=5, outputBelief=True))
    bPruned = np.asarray(dec.decode(rec, numIter=5, outputBelief=True,
                                    activeRvs=(rv,)))
    assert np.array_equal(bFull, bPruned)
    # the decode_tb auto path (softBuffer=None -> prune at (rv,)) agrees too
    pAuto, okAuto, _ = dec.decode_tb(llrs, rv=rv)
    pNone, okNone, _ = dec.decode_tb(llrs, rv=rv, activeRvs=None)
    assert np.array_equal(np.asarray(pAuto), np.asarray(pNone))
    assert bool(okAuto) == bool(okNone)


def test_bf16_decode_matches_f32_outcomes():
    """bfloat16 message passing (the TPU fast path, decoderDtype='bfloat16')
    must track float32 min-sum: identical decodes well above threshold, and
    near-identical block outcomes in the waterfall (bf16's 8-bit mantissa
    far exceeds hardware decoders' 4-6 bit LLR quantization)."""
    import jax
    cfg = LdpcConfig(1000, baseGraphNo=1, modulation="QPSK", txLayers=1,
                     targetRate=490 / 1024)
    enc, dec = LdpcEncoder(cfg), LdpcDecoder(cfg)
    key = jax.random.PRNGKey(3)
    kBits, kNoise = jax.random.split(key)
    B = 24
    payload = jax.random.bernoulli(kBits, 0.5, (B, 1000)).astype(jnp.int8)
    tx = 1.0 - 2.0 * jax.vmap(enc.encode_tb)(payload).astype(jnp.float32)
    for snrDb, minAgree in ((4.0, 1.0), (0.0, 0.9)):
        sigma = float(10 ** (-snrDb / 20))
        noisy = tx + sigma * jax.random.normal(kNoise, tx.shape)
        llrs = 2.0 * noisy / sigma ** 2
        okF = jax.vmap(lambda v: dec.decode_tb(v, numIter=6)[1])(llrs)
        okB = jax.vmap(lambda v: dec.decode_tb(
            v, numIter=6, dtype=jnp.bfloat16)[1])(llrs)
        agree = float(jnp.mean((okF == okB).astype(jnp.float32)))
        assert agree >= minAgree, (snrDb, agree)
        if snrDb >= 4.0:
            assert bool(jnp.all(okF)) and bool(jnp.all(okB))


@pytest.mark.slow
def test_int8_decode_impls_agree_and_track_f32():
    """Fixed-point decode (dtype='int8': 5-bit per-codeword-scaled channel
    LLRs, int8 messages, int16 beliefs, truncated 0.75 normalization — a
    hardware-decoder-realistic mode the reference lacks): the soa and dense
    impls are bit-identical, and block outcomes track float32 min-sum well
    above / in the waterfall. (Not the bench path: measured 9931 vs 11650
    slots/s for bf16 on v5e at batch 1536 — int16 VPU arithmetic and the
    int8<->int16 casts cost more than the halved message storage saves.)"""
    import jax
    cfg = LdpcConfig(320, baseGraphNo=2, modulation="QPSK", txLayers=1,
                     targetRate=308 / 1024)
    enc, dec = LdpcEncoder(cfg), LdpcDecoder(cfg)
    key = jax.random.PRNGKey(9)
    kBits, kNoise = jax.random.split(key)
    B = 24
    payload = jax.random.bernoulli(kBits, 0.5, (B, 320)).astype(jnp.int8)
    tx = 1.0 - 2.0 * jax.vmap(enc.encode_tb)(payload).astype(jnp.float32)
    for snrDb, minAgree in ((6.0, 1.0), (1.0, 0.85)):
        sigma = float(10 ** (-snrDb / 20))
        noisy = tx + sigma * jax.random.normal(kNoise, tx.shape)
        llrs = 2.0 * noisy / sigma ** 2
        rec = jax.vmap(lambda v: dec.recover_rate(v)[0])(llrs)
        dS = jax.vmap(lambda r: dec.decode(r, 6, impl="soa",
                                           dtype=jnp.int8))(rec)
        dD = jax.vmap(lambda r: dec.decode(r, 6, impl="dense",
                                           dtype=jnp.int8))(rec)
        assert jnp.array_equal(dS, dD)
        okI = jax.vmap(lambda v: dec.decode_tb(
            v, numIter=6, dtype=jnp.int8)[1])(llrs)
        okF = jax.vmap(lambda v: dec.decode_tb(v, numIter=6)[1])(llrs)
        agree = float(jnp.mean((okI == okF).astype(jnp.float32)))
        assert agree >= minAgree, (snrDb, agree)
        if snrDb >= 6.0:
            assert bool(jnp.all(okI))


@pytest.mark.slow
def test_bf16_decode_bler_matches_f32():
    """bf16 message passing leaves the BLER statistically indistinguishable
    from float32 in the middle of the waterfall: |BLER_bf16 - BLER_f32| <
    3*SE over 1152 blocks x 3 seeds (binomial SE ~1.5% — a real shift of a
    few percent fails). This is the accuracy license for the headline
    bench's decoderDtype='bfloat16' (bench.py); the 24-block quick test
    above only gates gross divergence."""
    import jax
    cfg = LdpcConfig(1000, baseGraphNo=1, modulation="QPSK", txLayers=1,
                     targetRate=490 / 1024)
    enc, dec = LdpcEncoder(cfg), LdpcDecoder(cfg)
    B, sigma = 384, float(10 ** (-1.7 / 20))  # 1.7 dB: mid-waterfall
    nF = nB = n = 0
    for seed in (11, 12, 13):
        kBits, kNoise = jax.random.split(jax.random.PRNGKey(seed))
        payload = jax.random.bernoulli(kBits, 0.5, (B, 1000)).astype(jnp.int8)
        tx = 1.0 - 2.0 * jax.vmap(enc.encode_tb)(payload).astype(jnp.float32)
        llrs = 2.0 * (tx + sigma * jax.random.normal(kNoise, tx.shape)) / sigma**2
        okF = jax.vmap(lambda v: dec.decode_tb(v, numIter=6)[1])(llrs)
        okB = jax.vmap(lambda v: dec.decode_tb(
            v, numIter=6, dtype=jnp.bfloat16)[1])(llrs)
        nF += int(jnp.sum(~okF))
        nB += int(jnp.sum(~okB))
        n += B
    blerF, blerB = nF / n, nB / n
    assert 0.05 < blerF < 0.95, blerF         # really mid-waterfall
    se = np.sqrt(blerF * (1 - blerF) / n)
    assert abs(blerB - blerF) < 3 * se, (blerF, blerB, se)


@pytest.mark.slow
def test_int8_decode_bler_matches_f32():
    """Fixed-point (dtype='int8') BLER gate, analogous to the bf16 one but
    ONE-SIDED: at mid-waterfall, BLER_int8 <= BLER_f32 + 3*SE over 1152
    blocks x 3 seeds. int8 is not statistically equivalent to f32 — it is
    measurably BETTER here (0.39 vs 0.51 at 1.7 dB, ~8 SE): the 5-bit
    channel quantization clips overconfident LLRs and the
    truncation-toward-zero 0.75 normalization is slightly stronger, both
    well-known min-sum improvements. The gate therefore bounds any
    regression while recording the benefit; a saturation-oscillation
    regression (the failure mode of the rejected full-scale variant — see
    _quantize_int8) also fails the above-waterfall guard decisively: that
    variant decoded NOTHING above the waterfall."""
    import jax
    cfg = LdpcConfig(1000, baseGraphNo=1, modulation="QPSK", txLayers=1,
                     targetRate=490 / 1024)
    enc, dec = LdpcEncoder(cfg), LdpcDecoder(cfg)
    B, sigma = 384, float(10 ** (-1.7 / 20))  # 1.7 dB: mid-waterfall
    nF = nI = n = 0
    nHighSnrFail = 0
    for seed in (11, 12, 13):
        kBits, kNoise = jax.random.split(jax.random.PRNGKey(seed))
        payload = jax.random.bernoulli(kBits, 0.5, (B, 1000)).astype(jnp.int8)
        tx = 1.0 - 2.0 * jax.vmap(enc.encode_tb)(payload).astype(jnp.float32)
        llrs = 2.0 * (tx + sigma * jax.random.normal(kNoise, tx.shape)) / sigma**2
        okF = jax.vmap(lambda v: dec.decode_tb(v, numIter=6)[1])(llrs)
        okI = jax.vmap(lambda v: dec.decode_tb(
            v, numIter=6, dtype=jnp.int8)[1])(llrs)
        nF += int(jnp.sum(~okF))
        nI += int(jnp.sum(~okI))
        n += B
        # above-the-waterfall guard (the rejected variant's failure mode)
        hi = 2.0 * (tx[:64] + 0.5 * sigma
                    * jax.random.normal(kNoise, tx[:64].shape)) / (0.5 * sigma)**2
        okHi = jax.vmap(lambda v: dec.decode_tb(
            v, numIter=6, dtype=jnp.int8)[1])(hi)
        nHighSnrFail += int(jnp.sum(~okHi))
    blerF, blerI = nF / n, nI / n
    assert 0.05 < blerF < 0.95, blerF
    se = np.sqrt(blerF * (1 - blerF) / n)
    assert blerI < blerF + 3 * se, (blerF, blerI, se)
    assert nHighSnrFail == 0, nHighSnrFail
