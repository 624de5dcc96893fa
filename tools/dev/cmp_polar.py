"""Dev-only: compare Polar chain vs reference (params, encode, RM, decode)."""
import sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")
from neoradium.polar import PolarEncoder as RefEnc, PolarDecoder as RefDec
from neoradium_tpu.coding.polar import PolarConfig, PolarEncoder, PolarDecoder

rng = np.random.default_rng(2)
cases = [
    (32, 100, "DCI"),          # shortening
    (30, 600, "DCI"),          # small K, large E
    (12, 50, "UCI"),           # nPC=3 case
    (18, 250, "UCI"),          # nPC=3, maybe nPCwm=1
    (100, 300, "UCI"),         # 11-bit CRC
    (24, 864, "PBCH"),         # PBCH standard size
    (400, 2000, "UCI"),        # segmentation
    (45, 120, "UCI"),          # puncturing regime
]
for a, e, dt in cases:
    cfg = PolarConfig(a, e, dt)
    try:
        ref = RefEnc(a, e, dt)
    except TypeError:
        # reference polar.py:384 crashes for any nPCwm=1 config (list indexed
        # by ndarray); verify our own round-trip only
        assert cfg.nPCwm == 1, (a, e, dt)
        ref = None
    if ref is not None:
        assert cfg.polarCodeSize == ref.polarCodeSize, (a, e, dt)
        assert cfg.codeBlockSize == ref.codeBlockSize
        assert cfg.nPC == ref.nPC and cfg.nPCwm == ref.nPCwm
        assert list(cfg.msgBits) == list(ref.msgBits), (a, e, dt)
        assert list(cfg.frozenBits) == list(ref.frozenBits)
        assert sorted(cfg.pcBits) == sorted(ref.pcBits) if cfg.pcBits else True

    txb = rng.integers(0, 2, a).astype(np.int8)
    enc = PolarEncoder(cfg)
    myCbs = np.asarray(enc.segment(jnp.asarray(txb)))
    myCoded = np.asarray(enc.encode(jnp.asarray(myCbs)))
    myRm = np.asarray(enc.rate_match(jnp.asarray(myCoded)))
    if ref is not None:
        refCbs = ref.doSegmentation(txb)
        refCoded = ref.encode(refCbs)
        refRm = ref.rateMatch(refCoded)
        assert np.array_equal(myCbs, refCbs), (a, e, dt, "segment")
        assert np.array_equal(myCoded, refCoded), (a, e, dt, "encode")
        assert np.array_equal(myRm, refRm.flatten()), (a, e, dt, "rateMatch")
    refRm = myRm.reshape(cfg.numCodeBlocks, -1)

    # decode: noiseless bipolar LLRs
    llrs = (1.0 - 2.0 * refRm.astype(np.float64)) * 5
    dec = PolarDecoder(cfg)
    myOut, myErrs = dec.decode_tb(jnp.asarray(llrs.flatten()))
    assert np.array_equal(np.asarray(myOut), txb), (a, e, dt, "decode payload")
    assert int(myErrs) == 0, (a, e, dt, "crc")
    if cfg.rmMode != "repetition" and ref is not None:
        # (reference recoverRate crashes for e>=N; RefDec crashes for nPCwm=1)
        refDecoder = RefDec(a, e, dt)
        refRec = refDecoder.recoverRate(llrs)
        refOut, refErrs = refDecoder.decode(refRec)
        assert np.array_equal(refOut, txb), (a, e, dt, "ref decode sanity")
    print(f"{dt} A={a} E={e}: N={cfg.polarCodeSize} mode={cfg.rmMode} OK")
print("POLAR MATCH OK")
