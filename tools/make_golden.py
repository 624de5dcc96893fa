"""Generate golden test fixtures by running the reference implementation.

The reference (read-only at /root/reference) serves as the behavioral oracle,
exactly as it itself uses MATLAB 5G Toolbox ``.mat`` tensors as its oracle
(reference ``Playground/CompareWithMatlab/``). Outputs land in
``tests/golden/*.npz`` and are committed; tests never import the reference.

Run from the repo root:  python tools/make_golden.py
"""
import sys

import numpy as np

sys.path.insert(0, "/root/reference")

OUT = "tests/golden"


def gold_and_crc():
    from neoradium.utils import goldSequence
    from neoradium.chancodebase import ChanCodeBase

    rng = np.random.default_rng(7)
    cinits = [1, 301, 0x12345, 2**31 - 1, 911]
    gold = np.stack([np.array(goldSequence(c, 2048), dtype=np.uint8) for c in cinits])

    crc_in = rng.integers(0, 2, (4, 300)).astype(np.uint8)
    crcs = {}
    for poly in ["6", "11", "16", "24A", "24B", "24C"]:
        crcs[f"crc_{poly}"] = ChanCodeBase.getCrc(crc_in.copy(), poly).astype(np.uint8)
    np.savez_compressed(f"{OUT}/gold_crc.npz",
                        cinits=np.array(cinits, dtype=np.int64), gold=gold,
                        crc_in=crc_in, **crcs)


def modulation():
    from neoradium.modulation import Modem

    rng = np.random.default_rng(8)
    out = {}
    for mod in ["BPSK", "QPSK", "16QAM", "64QAM", "256QAM", "1024QAM"]:
        m = Modem(mod)
        bits = rng.integers(0, 2, 24 * m.qm).astype(np.int8)
        syms = m.modulate(bits)
        noisy = syms + 0.05 * (rng.normal(size=syms.shape) + 1j * rng.normal(size=syms.shape))
        llrs = m.getLLRsFromSymbols(noisy, 0.02)
        llrs_exact = m.getLLRsFromSymbols(noisy, 0.02, useMax=False)
        out[f"{mod}_const"] = m.constellation
        out[f"{mod}_bits"] = bits
        out[f"{mod}_syms"] = syms
        out[f"{mod}_noisy"] = noisy
        out[f"{mod}_llrs"] = llrs
        out[f"{mod}_llrs_exact"] = llrs_exact
    np.savez_compressed(f"{OUT}/modulation.npz", **out)


def ofdm():
    from neoradium.carrier import Carrier

    rng = np.random.default_rng(9)
    out = {}
    for tag, (numRbs, spacing, cp) in {
        "a": (25, 30, "normal"), "b": (51, 30, "normal"), "c": (20, 60, "extended"),
    }.items():
        c = Carrier(numRbs=numRbs, spacing=spacing, cpType=cp)
        g = c.createGrid(2)
        data = rng.normal(size=g.shape) + 1j * rng.normal(size=g.shape)
        g.grid[:] = data
        wf = c.createGrid(2)
        wf.grid[:] = data
        w_none = g.ofdmModulate(windowing="NONE")
        w_std = wf.ofdmModulate(windowing="STD")
        rx = w_none.ofdmDemodulate(c.curBwp)
        out[f"{tag}_cfg"] = np.array([numRbs, spacing, 1 if cp == "extended" else 0])
        out[f"{tag}_grid"] = data
        out[f"{tag}_wf_none"] = w_none.waveform
        out[f"{tag}_wf_std"] = w_std.waveform
        out[f"{tag}_rx"] = rx.grid
    np.savez_compressed(f"{OUT}/ofdm.npz", **out)


def ldpc():
    from neoradium.ldpc import LdpcEncoder, LdpcDecoder

    rng = np.random.default_rng(10)
    out = {}
    cases = {
        # (tbs_payload_bits, baseGraph, modulation, rate, rv, layers)
        "s1": (3000, 1, "16QAM", 490 / 1024, 0, 2),   # single CB after seg? -> C=1
        "s2": (20000, 1, "QPSK", 449 / 1024, 0, 1),   # multi-CB
        "s3": (2000, 2, "QPSK", 193 / 1024, 0, 1),    # BG2
        "s4": (8000, 1, "64QAM", 658 / 1024, 2, 2),   # rv=2
    }
    for tag, (tbs, bgn, mod, rate, rv, layers) in cases.items():
        enc = LdpcEncoder(baseGraphNo=bgn, modulation=mod, txLayers=layers, targetRate=rate)
        txb = rng.integers(0, 2, tbs).astype(np.int8)
        tbWithCrc = enc.appendCrc(txb, "24A")
        cbs = enc.doSegmentation(tbWithCrc)
        coded = enc.encode(cbs)
        g = int(np.ceil(tbs / rate))
        rm = enc.rateMatch(coded, g, rv=rv)
        # decoder path: bipolar LLRs from the bits (noiseless)
        dec = LdpcDecoder(baseGraphNo=bgn, modulation=mod, txLayers=layers)
        llrs = 1.0 - 2.0 * rm.astype(np.float64)
        # Temporarily emulate rv!=0 recovery only for rv=0 cases
        rec = dec.recoverRate(llrs, tbs)
        decoded = dec.decode(rec, numIter=5)
        merged, crcMatch = dec.checkCrcAndMerge(decoded)
        out[f"{tag}_cfg"] = np.array([tbs, bgn, rv, layers, enc.liftingSize, enc.numCodeBlocks,
                                      enc.codeBlockSize, enc.numFillerBits, g])
        out[f"{tag}_mod"] = np.frombuffer(mod.encode(), dtype=np.uint8)
        out[f"{tag}_rate"] = np.array([rate])
        out[f"{tag}_txb"] = txb
        out[f"{tag}_cbs"] = cbs.astype(np.int8)
        out[f"{tag}_coded"] = coded.astype(np.int8)
        out[f"{tag}_rm"] = rm.astype(np.int8)
        out[f"{tag}_rec"] = rec
        out[f"{tag}_decoded"] = decoded.astype(np.int8)
        out[f"{tag}_merged"] = merged.astype(np.int8)
        out[f"{tag}_crc"] = np.array(crcMatch, dtype=bool)
    np.savez_compressed(f"{OUT}/ldpc.npz", **out)




def pdsch():
    import sys
    sys.path.insert(0, "/root/reference")
    from neoradium import Carrier, PDSCH

    rng = np.random.default_rng(21)
    out = {}
    cases = {
        "p1": (dict(numRbs=51, spacing=30), dict(numLayers=2, modulation="16QAM"),
               dict(configType=2, additionalPos=2), 0),
        "p2": (dict(numRbs=25, spacing=15), dict(numLayers=1, modulation="QPSK"),
               dict(), 0),
        "p3": (dict(numRbs=24, spacing=30), dict(numLayers=6, modulation="256QAM"),
               dict(configType=2, symbols=2), 1),
    }
    for tag, (carkw, pkw, dkw, slotNo) in cases.items():
        c = Carrier(**carkw)
        for _ in range(slotNo):
            c.goNext()
        p = PDSCH(c.curBwp, **pkw)
        p.setDMRS(**dkw)
        g = p.getGrid()
        bitSizes = p.getBitSizes(g)
        bits = [rng.integers(0, 2, n).astype(np.int8) for n in bitSizes]
        p.populateGrid(g, [b.copy() for b in bits])
        noisy = g.grid + 0.05 * (rng.normal(size=g.shape) + 1j * rng.normal(size=g.shape))
        ng = g.clone()
        ng.grid = noisy
        idx = p.getReIndexes(g, "PDSCH")
        scales = np.abs(rng.normal(size=g.shape)) + 0.5
        llrs = p.getLLRsFromGrid(ng, idx, llrScales=scales, noiseVar=0.005)
        out[f"{tag}_reTypeIds"] = g.reTypeIds
        out[f"{tag}_grid"] = g.grid
        out[f"{tag}_noisy"] = noisy
        out[f"{tag}_scales"] = scales
        out[f"{tag}_tbs"] = np.array(p.getTxBlockSize(490 / 1024))
        for q, b in enumerate(bits):
            out[f"{tag}_bits{q}"] = b
            out[f"{tag}_llrs{q}"] = llrs[q]
    np.savez_compressed(f"{OUT}/pdsch.npz", **out)


def cdl():
    from neoradium import Carrier, AntennaPanel, CdlChannel, Waveform

    rng = np.random.default_rng(31)
    out = {}
    cases = {
        # NLOS profile, cross-pol panels, custom doppler/direction
        "a": dict(profile="A", delaySpread=30, dopplerShift=55, ueDirAZ=[10, 80],
                  tx=([2, 2], "x"), rx=([1, 2], "+")),
        # LOS profile (reference kFactor scaling NaNs for all LOS profiles,
        # so K-factor goldens are impossible; see CdlChannel._apply_kfactor_scaling)
        "d": dict(profile="D", delaySpread=100, dopplerShift=25, ueDirAZ=[0, 90],
                  tx=([2, 1], "|"), rx=([1, 1], "|")),
        # LOS profile E, mixed polarization panels
        "e": dict(profile="E", delaySpread=300, dopplerShift=5, ueDirAZ=[45, 45],
                  tx=([2, 2], "|"), rx=([1, 2], "x")),
    }
    for tag, kw in cases.items():
        carrier = Carrier(numRbs=12, spacing=30)
        bwp = carrier.curBwp
        profile = kw["profile"]
        n = {"A": 23, "B": 23, "C": 24, "D": 13, "E": 14}[profile]
        m = 20
        coupling = np.stack([np.stack([rng.permutation(m) for _ in range(n)])
                             for _ in range(3)]).astype(np.int32)
        phases = rng.uniform(-180, 180, (2, 2, n, m))
        chanKw = dict(delaySpread=kw["delaySpread"], carrierFreq=3.5e9,
                      dopplerShift=kw["dopplerShift"], ueDirAZ=kw["ueDirAZ"],
                      txAntenna=AntennaPanel(kw["tx"][0], polarization=kw["tx"][1]),
                      rxAntenna=AntennaPanel(kw["rx"][0], polarization=kw["rx"][1]),
                      rayCoupling=coupling, initialPhases=phases)
        if "kFactor" in kw:
            chanKw["kFactor"] = kw["kFactor"]
        ch = CdlChannel(bwp, profile, **chanKw)
        h0 = ch.getChannelMatrix()
        ch.goNext()
        carrier.goNext()
        h1 = ch.getChannelMatrix()
        nt = ch.nrNt[1]
        slotLen = int(bwp.getSlotLen())
        sig = (rng.normal(size=(nt, slotLen + ch.getMaxDelay()))
               + 1j * rng.normal(size=(nt, slotLen + ch.getMaxDelay())))
        ch.restart()
        y = ch.applyToSignal(Waveform(sig)).waveform
        out[f"{tag}_coupling"] = coupling
        out[f"{tag}_phases"] = phases
        out[f"{tag}_h0"] = h0
        out[f"{tag}_h1"] = h1
        out[f"{tag}_sig"] = sig
        out[f"{tag}_y"] = y
        out[f"{tag}_offset"] = np.array(ch.getTimingOffset())
        out[f"{tag}_maxDelay"] = np.array(ch.getMaxDelay())
    np.savez_compressed(f"{OUT}/cdl.npz", **out)


def chest():
    from neoradium import Carrier, PDSCH

    rng = np.random.default_rng(11)
    out = {}
    cases = {
        "c1": (dict(numRbs=25, spacing=30), dict(numLayers=2, modulation="QPSK"),
               dict(configType=2, additionalPos=2)),
        "c2": (dict(numRbs=12, spacing=15), dict(numLayers=1, modulation="16QAM"),
               dict()),
        "c3": (dict(numRbs=20, spacing=30), dict(numLayers=4, modulation="16QAM"),
               dict(configType=1, symbols=2)),
    }
    for tag, (carkw, pkw, dkw) in cases.items():
        car = Carrier(**carkw)
        p = PDSCH(car.curBwp, **pkw)
        p.setDMRS(**dkw)
        g = p.getGrid()
        nl = pkw["numLayers"]
        nr = nl + 1
        L, K = g.shape[1], g.shape[2]
        h = (rng.normal(size=(L, K, nr, nl))
             + 1j * rng.normal(size=(L, K, nr, nl))) / np.sqrt(2)
        rx = g.applyChannel(h)
        noisy = rx.grid + 0.02 * (rng.normal(size=rx.shape)
                                  + 1j * rng.normal(size=rx.shape))
        rxg = rx.clone()
        rxg.grid = noisy
        refH, refNv = rxg.estimateChannelLS(p.dmrs)
        out[f"{tag}_noisy"] = noisy
        out[f"{tag}_h"] = h
        out[f"{tag}_hEst"] = refH
        out[f"{tag}_noiseVar"] = np.array(refNv)
        if tag != "c1":
            continue
        # interpolation-kernel variants on the c1 grid (estimateChannelLsEx;
        # int2d needs neighbors=None — the reference's default neighbors=12
        # crashes scipy there, see chest.py interp2d_matrix docstring)
        for kernel, polarInt, int2d in [
                ("thin_plate_spline", False, False),
                ("thin_plate_spline", True, True),
                ("multiquadric", False, False),
                ("quadratic", False, False)]:
            vh, vnv, _ = rxg.estimateChannelLsEx(
                p.dmrs, meanCdm=True, polarInt=polarInt, int2d=int2d,
                kernel=kernel, neighbors=None if int2d else 12)
            key = f"k_{kernel}_{int(polarInt)}{int(int2d)}"
            out[f"{key}_hEst"] = vh
            out[f"{key}_noiseVar"] = np.array(vnv)
    np.savez_compressed(f"{OUT}/chest.npz", **out)


def tdl():
    from neoradium import Carrier, TdlChannel, Waveform
    from neoradium import random as refrandom

    out = {}
    cases = {
        "a": dict(profile="A", delaySpread=100, dopplerShift=40,
                  txAntennaCount=2, rxAntennaCount=2, mimoCorrelation="High"),
        "d": dict(profile="D", delaySpread=30, dopplerShift=10,
                  txAntennaCount=1, rxAntennaCount=1),
        "x": dict(profile="B100", dopplerShift=400, txAntennaCount=4,
                  rxAntennaCount=2, mimoCorrelation="Medium",
                  polarization="CrossPolar", delaySpread=100),
    }
    rng = np.random.default_rng(17)
    for tag, kw in cases.items():
        refrandom.setSeed(42)
        carrier = Carrier(numRbs=12, spacing=30)
        ch = TdlChannel(carrier.curBwp, **kw)
        h0 = ch.getChannelMatrix()
        ch.goNext()
        carrier.goNext()
        h1 = ch.getChannelMatrix()
        ch.restart()
        nt = ch.nrNt[1]
        slotLen = int(carrier.curBwp.getSlotLen())
        sig = (rng.normal(size=(nt, slotLen + ch.getMaxDelay()))
               + 1j * rng.normal(size=(nt, slotLen + ch.getMaxDelay())))
        y = ch.applyToSignal(Waveform(sig)).waveform
        out[f"{tag}_theta1"] = ch.sosTheta1N[0]
        out[f"{tag}_theta2"] = ch.sosTheta2N[0]
        out[f"{tag}_h0"] = h0
        out[f"{tag}_h1"] = h1
        out[f"{tag}_sig"] = sig
        out[f"{tag}_y"] = y
        out[f"{tag}_corMat"] = np.asarray(ch.correlationMatrix, np.float64)
        out[f"{tag}_maxDelay"] = np.array(ch.getMaxDelay())
    np.savez_compressed(f"{OUT}/tdl.npz", **out)


def polar():
    from neoradium.polar import PolarEncoder, PolarDecoder

    rng = np.random.default_rng(23)
    out = {}
    cases = {
        "dci1": (32, 100, "DCI"), "dci2": (30, 600, "DCI"),
        "uci1": (12, 50, "UCI"), "uci2": (100, 300, "UCI"),
        "pbch": (24, 864, "PBCH"), "seg": (400, 2000, "UCI"),
        "short": (45, 120, "UCI"),
    }
    for tag, (a, e, dt) in cases.items():
        enc = PolarEncoder(a, e, dt)
        txb = rng.integers(0, 2, a).astype(np.int8)
        cbs = enc.doSegmentation(txb)
        coded = enc.encode(cbs)
        rm = enc.rateMatch(coded)
        out[f"{tag}_cfg"] = np.array([a, e])
        out[f"{tag}_dt"] = np.frombuffer(dt.encode(), dtype=np.uint8)
        out[f"{tag}_txb"] = txb
        out[f"{tag}_cbs"] = cbs
        out[f"{tag}_coded"] = coded
        out[f"{tag}_rm"] = rm
        out[f"{tag}_msgBits"] = np.asarray(enc.msgBits, np.int32)
        out[f"{tag}_frozenBits"] = np.asarray(enc.frozenBits, np.int32)
        # noisy decode golden (skip e>=N: reference recoverRate crashes there)
        if e < enc.polarCodeSize:
            dec = PolarDecoder(a, e, dt)
            llrs = (1 - 2 * rm.astype(np.float64)) * 4 \
                + rng.normal(size=rm.shape) * 1.2
            decoded, errs = dec.decode(dec.recoverRate(llrs))
            out[f"{tag}_llrs"] = llrs
            out[f"{tag}_decoded"] = decoded
            out[f"{tag}_errs"] = np.array(errs)
    np.savez_compressed(f"{OUT}/polar.npz", **out)


def csirs():
    from neoradium import Carrier, CsiRsConfig

    rng = np.random.default_rng(13)
    out = {}
    cases = {
        "trs": dict(numPorts=1, density=3),
        "p2": dict(numPorts=2),
        "p4": dict(numPorts=4, freqMap="010"),
        "p8": dict(numPorts=8),
        "p8c4": dict(numPorts=8, cdmSize=4, freqMap="010100"),
        "p12": dict(numPorts=12, cdmSize=4),
        "p24": dict(numPorts=24, cdmSize=8),
        "p32h": dict(numPorts=32, cdmSize=2, density=0.5),
        "pwr": dict(numPorts=1, density=1, powerDb=3, scramblingID=41,
                    symbols=[9]),
    }
    for tag, kw in cases.items():
        for slotNo in (0, 4):
            carrier = Carrier(numRbs=25, spacing=30)
            for _ in range(slotNo):
                carrier.goNext()
            cfg = CsiRsConfig(bwp=carrier.curBwp, **kw)
            g = carrier.curBwp.createGrid(cfg.numPorts)
            cfg.populateGrid(g)
            out[f"{tag}_{slotNo}_grid"] = g.grid
            out[f"{tag}_{slotNo}_types"] = g.reTypeIds
    # CSI-RS channel estimation golden
    carrier = Carrier(numRbs=24, spacing=30)
    cfg = CsiRsConfig(bwp=carrier.curBwp, numPorts=8)
    g = carrier.curBwp.createGrid(8)
    cfg.populateGrid(g)
    L, K = g.shape[1], g.shape[2]
    h = (rng.normal(size=(L, K, 2, 8)) + 1j * rng.normal(size=(L, K, 2, 8))) / np.sqrt(2)
    rx = g.applyChannel(h)
    noisy = rx.grid + 0.03 * (rng.normal(size=rx.shape) + 1j * rng.normal(size=rx.shape))
    rxg = rx.clone()
    rxg.grid = noisy
    refH, refNv = rxg.estimateChannelLS(cfg)
    out["est_noisy"] = noisy
    out["est_hEst"] = refH
    out["est_noiseVar"] = np.array(refNv)
    np.savez_compressed(f"{OUT}/csirs.npz", **out)


def csifb():
    from neoradium import Carrier, CsiRsConfig
    from neoradium.csifeedback import CsiReport

    rng = np.random.default_rng(3)
    out = {}
    # codebooks (N2==1 only: reference precoder shapes are broken for N2>1)
    for tag, (n1, n2, ports, layers) in {
        "a": (2, 1, 4, [1, 2]), "b": (4, 1, 8, [1, 2, 3, 4]),
        "c": (8, 1, 16, [1, 2]),
    }.items():
        refCar = Carrier(numRbs=24, spacing=30)
        refCsi = CsiRsConfig(bwp=refCar.curBwp, numPorts=ports)
        rep = CsiReport(refCsi, n1=n1, n2=n2)
        for nl in layers:
            idx, cb = [], []
            for i1, i2 in rep.type1SpIndexes(nl):
                idx.append(list(i1) + [i2])
                cb.append(rep.getType1SpPrecoder(nl, i1, i2))
            cb = np.asarray(cb).reshape(len(idx), ports, -1)
            out[f"{tag}_{nl}_idx"] = np.asarray(idx)
            out[f"{tag}_{nl}_cb"] = cb
    # end-to-end rank/PMI search
    refCar = Carrier(numRbs=24, spacing=30)
    refCsi = CsiRsConfig(bwp=refCar.curBwp, numPorts=4)
    rep = CsiReport(refCsi, n1=2, n2=1)
    hs, ranks, pmis = [], [], []
    for t in range(3):
        h = (rng.normal(size=(14, 288, 4, 4))
             + 1j * rng.normal(size=(14, 288, 4, 4))) / np.sqrt(2)
        rank, pmi, sbSinr = rep.getBestRank(h, 0.1)
        hs.append(h)
        ranks.append(rank)
        pmis.append(str(pmi))
        out[f"search_{t}_sinr0"] = np.asarray(sbSinr[0])
    out["search_h"] = np.stack(hs)
    out["search_rank"] = np.asarray(ranks)
    out["search_pmi"] = np.frombuffer("|".join(pmis).encode(), np.uint8)
    np.savez_compressed(f"{OUT}/csifb.npz", **out)


def ptrs():
    from neoradium import Carrier, PDSCH

    out = {}
    cases = {
        "t1": (dict(numRbs=25, spacing=30),
               dict(numLayers=1, modulation="16QAM", rnti=17),
               dict(configType=1), dict(timeDensity=1, freqDensity=2)),
        "t2": (dict(numRbs=25, spacing=30),
               dict(numLayers=2, modulation="16QAM", rnti=3),
               dict(configType=2, additionalPos=1),
               dict(timeDensity=2, freqDensity=4, reOffset=1)),
        "t3": (dict(numRbs=51, spacing=30),
               dict(numLayers=2, modulation="64QAM", rnti=900),
               dict(configType=1, additionalPos=2),
               dict(timeDensity=2, freqDensity=2, portSet=[0, 1])),
        "t4": (dict(numRbs=10, spacing=30),
               dict(numLayers=1, modulation="QPSK", rnti=5),
               dict(), dict(timeDensity=4, freqDensity=2, epreRatio=1)),
    }
    for tag, (carkw, pkw, dkw, tkw) in cases.items():
        c = Carrier(**carkw)
        p = PDSCH(c.curBwp, **pkw)
        p.setDMRS(**dkw)
        p.setPTRS(**tkw)
        g = p.getGrid()
        out[f"{tag}_grid"] = g.grid
        out[f"{tag}_types"] = g.reTypeIds
    np.savez_compressed(f"{OUT}/ptrs.npz", **out)


def bler_curve():
    """Ensemble BLER counters from the reference PDSCH-BLER pipeline.

    Mirrors ``Playground/PDSCH/PDSCH-BLER.ipynb`` (CDL-C 8x2, 16QAM,
    R=490/1024, freq-domain channel) but samples the BLER *ensemble*: a
    fresh seeded channel realization per slot, so the counters are i.i.d.
    Bernoulli draws comparable to our independent Monte-Carlo trials.
    Both perfect and LS channel estimation are recorded.
    """
    from neoradium import Carrier, PDSCH, AntennaPanel, CdlChannel
    from neoradium import random as refrandom
    from neoradium.ldpc import LdpcEncoder

    # SNR points straddle each estimator's TB-level waterfall (LS costs
    # ~2.5 dB vs perfect CSI in this config)
    SNRS = {"perfect": [7.0, 8.0, 9.0, 10.0], "ls": [10.0, 11.0, 12.0, 13.0]}
    NUM_SLOTS = 300
    out = {"numSlots": np.array(NUM_SLOTS)}
    for chEst in ("perfect", "ls"):
        out[f"{chEst}_snrs"] = np.array(SNRS[chEst])
        errs = []
        for snrDb in SNRS[chEst]:
            refrandom.setSeed(123)
            carrier = Carrier(numRbs=51, spacing=30)
            bwp = carrier.curBwp
            pdsch = PDSCH(bwp, interleavingBundleSize=0, numLayers=2,
                          nID=carrier.cellId, modulation="16QAM")
            pdsch.setDMRS(prgSize=0, configType=2, additionalPos=2)
            enc = LdpcEncoder(baseGraphNo=1, modulation="16QAM", txLayers=2,
                              targetRate=490 / 1024)
            dec = enc.getDecoder()
            cbErrors = cbTotal = tbErrors = 0
            for slotNo in range(NUM_SLOTS):
                channel = CdlChannel(
                    bwp, "C", delaySpread=300, carrierFreq=4e9,
                    dopplerShift=5, seed=1000 + slotNo,
                    txAntenna=AntennaPanel([2, 2], polarization="x"),
                    rxAntenna=AntennaPanel([1, 1], polarization="x"))
                grid = pdsch.getGrid()
                tbs = pdsch.getTxBlockSize(490 / 1024)
                txBlock = refrandom.bits(tbs[0])
                numBits = pdsch.getBitSizes(grid)
                rm = enc.getRateMatchedCodeBlocks(txBlock, numBits[0])
                pdsch.populateGrid(grid, rm)
                idx = pdsch.getReIndexes(grid, "PDSCH")
                H = channel.getChannelMatrix()
                F = pdsch.getPrecodingMatrix(H)
                pre = grid.precode(F)
                rxGrid = pre.applyChannel(H).addNoise(snrDb=snrDb,
                                                      useRxPower=True)
                if chEst == "perfect":
                    hEst = H @ F[None, ...]
                else:
                    hEst, _ = rxGrid.estimateChannelLS(
                        pdsch.dmrs, polarInt=False, kernel="linear")
                eqGrid, scales = rxGrid.equalize(hEst)
                llrs = pdsch.getLLRsFromGrid(eqGrid, idx, scales)
                rec = dec.recoverRate(llrs[0], tbs[0])
                decoded = dec.decode(rec, numIter=8)
                _, crcMatch = dec.checkCrcAndMerge(decoded)
                cbErrors += len(crcMatch) - sum(crcMatch)
                cbTotal += len(crcMatch)
                tbErrors += int(not all(crcMatch))
            errs.append([tbErrors, NUM_SLOTS, cbErrors, cbTotal])
            print(f"  bler_curve {chEst} SNR {snrDb}: tb {tbErrors}/"
                  f"{NUM_SLOTS} cb {cbErrors}/{cbTotal}")
        # columns: tbErrors, tbTotal, cbErrors, cbTotal
        out[f"{chEst}_counts"] = np.array(errs, dtype=np.int64)
    np.savez_compressed(f"{OUT}/bler_curve.npz", **out)


def bler_headline():
    """Reference error counters at the headline bench configuration.

    Same ensemble protocol as :func:`bler_curve` but at the EXACT receiver
    settings `bench.py` measures: LS channel estimation, decoder numIter=5,
    useRxPower noise. The committed counters license the bench's TPU
    fast-path combo (bf16 decoder + rv-aware layer pruning + Gram precoder
    + Dirichlet mean-channel feed) via the clustered z-gate in
    tests/test_link_e2e.py::test_headline_fastpath_bler_anchor.
    """
    from neoradium import Carrier, PDSCH, AntennaPanel, CdlChannel
    from neoradium import random as refrandom
    from neoradium.ldpc import LdpcEncoder

    SNRS = [11.5, 12.5, 13.5]     # numIter=5 LS waterfall: BLER ~0.76/0.51/0.3
    NUM_SLOTS = 300
    out = {"numSlots": np.array(NUM_SLOTS), "snrs": np.array(SNRS)}
    errs = []
    for snrDb in SNRS:
        refrandom.setSeed(123)
        carrier = Carrier(numRbs=51, spacing=30)
        bwp = carrier.curBwp
        pdsch = PDSCH(bwp, interleavingBundleSize=0, numLayers=2,
                      nID=carrier.cellId, modulation="16QAM")
        pdsch.setDMRS(prgSize=0, configType=2, additionalPos=2)
        enc = LdpcEncoder(baseGraphNo=1, modulation="16QAM", txLayers=2,
                          targetRate=490 / 1024)
        dec = enc.getDecoder()
        cbErrors = cbTotal = tbErrors = 0
        for slotNo in range(NUM_SLOTS):
            channel = CdlChannel(
                bwp, "C", delaySpread=300, carrierFreq=4e9,
                dopplerShift=5, seed=1000 + slotNo,
                txAntenna=AntennaPanel([2, 2], polarization="x"),
                rxAntenna=AntennaPanel([1, 1], polarization="x"))
            grid = pdsch.getGrid()
            tbs = pdsch.getTxBlockSize(490 / 1024)
            txBlock = refrandom.bits(tbs[0])
            numBits = pdsch.getBitSizes(grid)
            rm = enc.getRateMatchedCodeBlocks(txBlock, numBits[0])
            pdsch.populateGrid(grid, rm)
            idx = pdsch.getReIndexes(grid, "PDSCH")
            H = channel.getChannelMatrix()
            F = pdsch.getPrecodingMatrix(H)
            pre = grid.precode(F)
            rxGrid = pre.applyChannel(H).addNoise(snrDb=snrDb,
                                                  useRxPower=True)
            hEst, _ = rxGrid.estimateChannelLS(
                pdsch.dmrs, polarInt=False, kernel="linear")
            eqGrid, scales = rxGrid.equalize(hEst)
            llrs = pdsch.getLLRsFromGrid(eqGrid, idx, scales)
            rec = dec.recoverRate(llrs[0], tbs[0])
            decoded = dec.decode(rec, numIter=5)
            _, crcMatch = dec.checkCrcAndMerge(decoded)
            cbErrors += len(crcMatch) - sum(crcMatch)
            cbTotal += len(crcMatch)
            tbErrors += int(not all(crcMatch))
        errs.append([tbErrors, NUM_SLOTS, cbErrors, cbTotal])
        print(f"  bler_headline SNR {snrDb}: tb {tbErrors}/{NUM_SLOTS} "
              f"cb {cbErrors}/{cbTotal}")
    out["counts"] = np.array(errs, dtype=np.int64)
    np.savez_compressed(f"{OUT}/bler_headline.npz", **out)


def bler_headline_i2():
    """Reference counters at the headline config with decoder numIter=2 —
    the iteration count the reference's OWN throughput notebook uses
    (Playground/PDSCH/PDSCH-Throughput.ipynb decodeLLRs(..., numIter=2)).
    bench.py matches it for apples-to-apples; this fixture gates the
    full fast-path combo at that setting
    (tests/test_link_e2e.py::test_headline_iter2_bler_anchor). SNR points
    straddle the 2-iteration LS waterfall (~2.5 dB above the 5-iteration
    one)."""
    from neoradium import Carrier, PDSCH, AntennaPanel, CdlChannel
    from neoradium import random as refrandom
    from neoradium.ldpc import LdpcEncoder

    SNRS = [15.0, 16.5, 18.0]
    NUM_SLOTS = 300
    out = {"numSlots": np.array(NUM_SLOTS), "snrs": np.array(SNRS)}
    errs = []
    for snrDb in SNRS:
        refrandom.setSeed(123)
        carrier = Carrier(numRbs=51, spacing=30)
        bwp = carrier.curBwp
        pdsch = PDSCH(bwp, interleavingBundleSize=0, numLayers=2,
                      nID=carrier.cellId, modulation="16QAM")
        pdsch.setDMRS(prgSize=0, configType=2, additionalPos=2)
        enc = LdpcEncoder(baseGraphNo=1, modulation="16QAM", txLayers=2,
                          targetRate=490 / 1024)
        dec = enc.getDecoder()
        cbErrors = cbTotal = tbErrors = 0
        for slotNo in range(NUM_SLOTS):
            channel = CdlChannel(
                bwp, "C", delaySpread=300, carrierFreq=4e9,
                dopplerShift=5, seed=1000 + slotNo,
                txAntenna=AntennaPanel([2, 2], polarization="x"),
                rxAntenna=AntennaPanel([1, 1], polarization="x"))
            grid = pdsch.getGrid()
            tbs = pdsch.getTxBlockSize(490 / 1024)
            txBlock = refrandom.bits(tbs[0])
            numBits = pdsch.getBitSizes(grid)
            rm = enc.getRateMatchedCodeBlocks(txBlock, numBits[0])
            pdsch.populateGrid(grid, rm)
            idx = pdsch.getReIndexes(grid, "PDSCH")
            H = channel.getChannelMatrix()
            F = pdsch.getPrecodingMatrix(H)
            pre = grid.precode(F)
            rxGrid = pre.applyChannel(H).addNoise(snrDb=snrDb,
                                                  useRxPower=True)
            hEst, _ = rxGrid.estimateChannelLS(
                pdsch.dmrs, polarInt=False, kernel="linear")
            eqGrid, scales = rxGrid.equalize(hEst)
            llrs = pdsch.getLLRsFromGrid(eqGrid, idx, scales)
            rec = dec.recoverRate(llrs[0], tbs[0])
            decoded = dec.decode(rec, numIter=2)
            _, crcMatch = dec.checkCrcAndMerge(decoded)
            cbErrors += len(crcMatch) - sum(crcMatch)
            cbTotal += len(crcMatch)
            tbErrors += int(not all(crcMatch))
        errs.append([tbErrors, NUM_SLOTS, cbErrors, cbTotal])
        print(f"  bler_headline_i2 SNR {snrDb}: tb {tbErrors}/{NUM_SLOTS} "
              f"cb {cbErrors}/{cbTotal}")
    out["counts"] = np.array(errs, dtype=np.int64)
    np.savez_compressed(f"{OUT}/bler_headline_i2.npz", **out)


def bler_curve_td():
    """Reference TB/CB error counters for the TIME-domain channel pipeline
    (ofdmModulate -> pad(maxDelay) -> applyToSignal -> addNoise(nFFT=) ->
    sync(getTimingOffset) -> ofdmDemodulate, the MLChestDataGen.ipynb flow),
    with BOTH perfect and LS (DMRS linear-interp) channel estimation,
    ensemble sampling (fresh seeded channel per slot)."""
    from neoradium import Carrier, PDSCH, AntennaPanel, CdlChannel
    from neoradium import random as refrandom
    from neoradium.ldpc import LdpcEncoder

    # MATLAB-convention noise (rxPower assumed 1/nr): the per-realization
    # channel gain spread dominates, so the waterfall is shallow and sits
    # ~10 dB below the useRxPower one; LS costs a few dB on top
    SNRS = {"perfect": [-4.0, -2.0, 0.0], "ls": [-1.0, 1.0, 3.0]}
    NUM_SLOTS = 200
    out = {"numSlots": np.array(NUM_SLOTS)}
    for chEst in ("perfect", "ls"):
        out[f"{chEst}_snrs"] = np.array(SNRS[chEst])
        errs = []
        for snrDb in SNRS[chEst]:
            refrandom.setSeed(123)
            carrier = Carrier(numRbs=51, spacing=30)
            bwp = carrier.curBwp
            pdsch = PDSCH(bwp, interleavingBundleSize=0, numLayers=2,
                          nID=carrier.cellId, modulation="16QAM")
            pdsch.setDMRS(prgSize=0, configType=2, additionalPos=2)
            enc = LdpcEncoder(baseGraphNo=1, modulation="16QAM", txLayers=2,
                              targetRate=490 / 1024)
            dec = enc.getDecoder()
            cbErrors = cbTotal = tbErrors = 0
            for slotNo in range(NUM_SLOTS):
                channel = CdlChannel(
                    bwp, "C", delaySpread=300, carrierFreq=4e9,
                    dopplerShift=5, seed=1000 + slotNo,
                    txAntenna=AntennaPanel([2, 2], polarization="x"),
                    rxAntenna=AntennaPanel([1, 1], polarization="x"))
                grid = pdsch.getGrid()
                tbs = pdsch.getTxBlockSize(490 / 1024)
                txBlock = refrandom.bits(tbs[0])
                numBits = pdsch.getBitSizes(grid)
                rm = enc.getRateMatchedCodeBlocks(txBlock, numBits[0])
                pdsch.populateGrid(grid, rm)
                idx = pdsch.getReIndexes(grid, "PDSCH")
                H = channel.getChannelMatrix()
                F = pdsch.getPrecodingMatrix(H)
                txWf = grid.precode(F).ofdmModulate()
                txWf = txWf.pad(channel.getMaxDelay())
                rxWf = channel.applyToSignal(txWf)
                noisy = rxWf.addNoise(snrDb=snrDb, nFFT=bwp.nFFT)
                synced = noisy.sync(channel.getTimingOffset())
                rxGrid = synced.ofdmDemodulate(bwp)  # noiseVar auto-scales xnFFT
                if chEst == "perfect":
                    hEst = H @ F[None, ...]
                else:
                    hEst, _ = rxGrid.estimateChannelLS(
                        pdsch.dmrs, polarInt=False, kernel="linear")
                eqGrid, scales = rxGrid.equalize(hEst)
                llrs = pdsch.getLLRsFromGrid(eqGrid, idx, scales)
                rec = dec.recoverRate(llrs[0], tbs[0])
                decoded = dec.decode(rec, numIter=8)
                _, crcMatch = dec.checkCrcAndMerge(decoded)
                cbErrors += len(crcMatch) - sum(crcMatch)
                cbTotal += len(crcMatch)
                tbErrors += int(not all(crcMatch))
            errs.append([tbErrors, NUM_SLOTS, cbErrors, cbTotal])
            print(f"  bler_curve_td {chEst} SNR {snrDb}: tb {tbErrors}/"
                  f"{NUM_SLOTS} cb {cbErrors}/{cbTotal}")
        out[f"{chEst}_counts"] = np.array(errs, dtype=np.int64)
    np.savez_compressed(f"{OUT}/bler_curve_td.npz", **out)


def bler_tdl4x4():
    """Second independent BLER-parity anchor: TDL-B 100ns 4x4 with Medium
    Kronecker MIMO correlation, 2 layers, 64QAM, R=567/1024, perfect chEst —
    exercises the Kronecker correlation path and the higher-order LLR chain
    end to end (the primary anchor rides CDL-C 8x2 16QAM only). Ensemble
    protocol as bler_curve: fresh seeded channel per slot. Rank-2 over the
    correlated 4x4 keeps the SVD precoder's streams decodable (rank 4 is
    permanently in outage on the weak eigenmodes at Medium correlation)."""
    from neoradium import Carrier, PDSCH, TdlChannel
    from neoradium import random as refrandom
    from neoradium.ldpc import LdpcEncoder

    SNRS = [18.0, 21.0, 24.0, 27.0]
    NUM_SLOTS = 250
    RATE = 567 / 1024
    out = {"numSlots": np.array(NUM_SLOTS), "snrs": np.array(SNRS)}
    errs = []
    for snrDb in SNRS:
        refrandom.setSeed(123)
        carrier = Carrier(numRbs=51, spacing=30)
        bwp = carrier.curBwp
        pdsch = PDSCH(bwp, interleavingBundleSize=0, numLayers=2,
                      nID=carrier.cellId, modulation="64QAM")
        pdsch.setDMRS(prgSize=0, configType=2, additionalPos=2)
        enc = LdpcEncoder(baseGraphNo=1, modulation="64QAM", txLayers=2,
                          targetRate=RATE)
        dec = enc.getDecoder()
        cbErrors = cbTotal = tbErrors = 0
        for slotNo in range(NUM_SLOTS):
            channel = TdlChannel(bwp, "B", delaySpread=100, dopplerShift=5,
                                 txAntennaCount=4, rxAntennaCount=4,
                                 mimoCorrelation="Medium", seed=1000 + slotNo)
            grid = pdsch.getGrid()
            tbs = pdsch.getTxBlockSize(RATE)
            txBlock = refrandom.bits(tbs[0])
            numBits = pdsch.getBitSizes(grid)
            rm = enc.getRateMatchedCodeBlocks(txBlock, numBits[0])
            pdsch.populateGrid(grid, rm)
            idx = pdsch.getReIndexes(grid, "PDSCH")
            H = channel.getChannelMatrix()
            F = pdsch.getPrecodingMatrix(H)
            pre = grid.precode(F)
            rxGrid = pre.applyChannel(H).addNoise(snrDb=snrDb,
                                                  useRxPower=True)
            hEst = H @ F[None, ...]
            eqGrid, scales = rxGrid.equalize(hEst)
            llrs = pdsch.getLLRsFromGrid(eqGrid, idx, scales)
            rec = dec.recoverRate(llrs[0], tbs[0])
            decoded = dec.decode(rec, numIter=8)
            _, crcMatch = dec.checkCrcAndMerge(decoded)
            cbErrors += len(crcMatch) - sum(crcMatch)
            cbTotal += len(crcMatch)
            tbErrors += int(not all(crcMatch))
        errs.append([tbErrors, NUM_SLOTS, cbErrors, cbTotal])
        print(f"  bler_tdl4x4 SNR {snrDb}: tb {tbErrors}/{NUM_SLOTS} "
              f"cb {cbErrors}/{cbTotal}")
    out["counts"] = np.array(errs, dtype=np.int64)
    np.savez_compressed(f"{OUT}/bler_tdl4x4.npz", **out)


def bler_2cw():
    """Dual-codeword BLER-parity anchor: CDL-C 8x6, numLayers=6 (2 codewords
    of 3 layers each), 16QAM, R=490/1024, LS estimation — exercises the
    2-codeword TX/RX split (per-CW scrambling, layer mapping, LLR
    extraction, LDPC chains) that no other statistical gate covers.
    Counters are per CODEWORD (each slot contributes 2 TB trials).

    The reference runs here with getPrecodingMatrix PATCHED to its own
    documented behavior: its group loop (pdsch.py:1146-1165) emits the
    wideband precoder from RB 0's 12-subcarrier mean and discards the
    rest of the band — invisible at rank <= 2 (every other gate) but the
    rank-6 weak columns differ materially, which would make this gate
    compare precoder-bug artifacts instead of the 2-CW chain. See the
    deviation note in neoradium_tpu/phy/pdsch.py:getPrecodingMatrix."""
    from neoradium import Carrier, PDSCH, AntennaPanel, CdlChannel
    from neoradium import random as refrandom
    from neoradium.ldpc import LdpcEncoder

    def fullBandWidebandPrecoder(self, channelMatrix):
        gm = channelMatrix.mean(axis=(0, 1))
        _, _, vH = np.linalg.svd(gm)
        return (np.conj(vH).T)[:, :self.numLayers] / np.sqrt(self.numLayers)

    origGetPrecoder = PDSCH.getPrecodingMatrix
    PDSCH.getPrecodingMatrix = fullBandWidebandPrecoder

    SNRS = [11.0, 13.0, 15.0, 19.0]
    NUM_SLOTS = 200
    RATE = 490 / 1024
    out = {"numSlots": np.array(NUM_SLOTS), "snrs": np.array(SNRS)}
    errs = []
    for snrDb in SNRS:
        refrandom.setSeed(123)
        carrier = Carrier(numRbs=51, spacing=30)
        bwp = carrier.curBwp
        pdsch = PDSCH(bwp, interleavingBundleSize=0, numLayers=6,
                      nID=carrier.cellId, modulation="16QAM")
        pdsch.setDMRS(prgSize=0, configType=2, additionalPos=2)
        encs = [LdpcEncoder(baseGraphNo=1, modulation="16QAM", txLayers=nl,
                            targetRate=RATE) for nl in (3, 3)]
        decs = [e.getDecoder() for e in encs]
        cbErrors = cbTotal = tbErrors = tbTotal = 0
        for slotNo in range(NUM_SLOTS):
            channel = CdlChannel(
                bwp, "C", delaySpread=300, carrierFreq=4e9,
                dopplerShift=5, seed=1000 + slotNo,
                txAntenna=AntennaPanel([2, 2], polarization="x"),
                rxAntenna=AntennaPanel([1, 3], polarization="x"))
            grid = pdsch.getGrid()
            tbs = pdsch.getTxBlockSize(RATE)
            numBits = pdsch.getBitSizes(grid)
            rms = []
            for q in range(2):
                txBlock = refrandom.bits(tbs[q])
                rms.append((txBlock,
                            encs[q].getRateMatchedCodeBlocks(txBlock,
                                                             numBits[q])))
            pdsch.populateGrid(grid, [rm for _, rm in rms])
            idx = pdsch.getReIndexes(grid, "PDSCH")
            H = channel.getChannelMatrix()
            F = pdsch.getPrecodingMatrix(H)
            pre = grid.precode(F)
            rxGrid = pre.applyChannel(H).addNoise(snrDb=snrDb,
                                                  useRxPower=True)
            hEst, _ = rxGrid.estimateChannelLS(
                pdsch.dmrs, polarInt=False, kernel="linear")
            eqGrid, scales = rxGrid.equalize(hEst)
            llrs = pdsch.getLLRsFromGrid(eqGrid, idx, scales)
            for q in range(2):
                rec = decs[q].recoverRate(llrs[q], tbs[q])
                decoded = decs[q].decode(rec, numIter=8)
                _, crcMatch = decs[q].checkCrcAndMerge(decoded)
                cbErrors += len(crcMatch) - sum(crcMatch)
                cbTotal += len(crcMatch)
                tbErrors += int(not all(crcMatch))
                tbTotal += 1
        errs.append([tbErrors, tbTotal, cbErrors, cbTotal])
        print(f"  bler_2cw SNR {snrDb}: tb {tbErrors}/{tbTotal} "
              f"cb {cbErrors}/{cbTotal}")
    PDSCH.getPrecodingMatrix = origGetPrecoder
    out["counts"] = np.array(errs, dtype=np.int64)
    np.savez_compressed(f"{OUT}/bler_2cw.npz", **out)


def harq_anchor():
    """The throughput-notebook anchor: 1000-slot HARQ run, faithful replica.

    Reproduces ``Playground/PDSCH/PDSCH-Throughput.ipynb`` exactly (seed 123,
    CDL-C 8x2 continuous channel, 16 IR HARQ processes, perfect chEst,
    decoder numIter=2) at snrDb = 6 and 10.  The committed notebook output at
    6 dB is txBits=30216000, rxBits=3263328 (10.80% throughput), rxBlocks=108
    (89.20% BLER), meanTries=3.54 — this generator should land on the same
    numbers modulo numpy-version float drift.
    """
    from neoradium import (Carrier, PDSCH, CdlChannel, AntennaPanel,
                           LdpcEncoder, HarqEntity)
    from neoradium import random as refrandom

    numSlots = 1000
    seeds = [123, 231, 321, 412, 512, 612, 712, 812]
    out = {"numSlots": np.array(numSlots), "snrs": np.array([6.0, 10.0]),
           "seeds": np.array(seeds)}
    carrier = Carrier(numRbs=51, spacing=30)
    bwp = carrier.curBwp
    pdsch = PDSCH(bwp, interleavingBundleSize=0, numLayers=2,
                  nID=carrier.cellId, modulation="16QAM")
    pdsch.setDMRS(prgSize=0, configType=2, additionalPos=2,
                  otherCdmGroups=[])
    enc = LdpcEncoder(baseGraphNo=1, modulation="16QAM",
                      txLayers=pdsch.numLayers, targetRate=490 / 1024)
    harq = HarqEntity(enc, "IR", 16)
    channel = CdlChannel(
        bwp, "C", delaySpread=300, carrierFreq=4e9, dopplerShift=5,
        txAntenna=AntennaPanel([1, 4], polarization="x"),
        rxAntenna=AntennaPanel([1, 1], polarization="+",
                               beamWidth=[75, 360]),
        rxOrientation=[0, 0, 0])
    ens = {6: [], 10: []}
    for snrDb in (6, 10):
        for seed in seeds:
            refrandom.setSeed(seed)
            channel.restart()
            harq.reset()
            for s in range(numSlots):
                grid = bwp.createGrid(pdsch.numLayers)
                pdsch.allocateResources(grid)
                txBlockSizes = pdsch.getTxBlockSize(490 / 1024)
                numBits = pdsch.getBitSizes(grid)
                txBlocks = [refrandom.bits(txBlockSizes[c])
                            if harq.needNewData[c] else None
                            for c in range(harq.numCW)]
                rm = harq.getRateMatchedCodeBlocks(txBlocks, numBits)
                pdsch.populateGrid(grid, rm)
                H = channel.getChannelMatrix()
                F = pdsch.getPrecodingMatrix(H)
                rxGrid = grid.precode(F).applyChannel(H)
                noisy = rxGrid.addNoise(snrDb=snrDb, useRxPower=True)
                eqGrid, llrScales = noisy.equalize(H @ F[None, ...])
                llrs = pdsch.getLLRsFromGrid(eqGrid, pdsch.dataIndices,
                                             llrScales)
                harq.decodeLLRs(llrs, txBlockSizes, numIter=2)
                channel.goNext()
                harq.goNext()
            if seed == 123:
                # the committed notebook anchor (exact reproduction)
                tag = f"snr{snrDb}"
                out[f"{tag}_txBits"] = harq.txBits.copy()
                out[f"{tag}_rxBits"] = harq.rxBits.copy()
                out[f"{tag}_txBlocks"] = harq.txBlocks.copy()
                out[f"{tag}_rxBlocks"] = harq.rxBlocks.copy()
                out[f"{tag}_numTimeouts"] = np.array(harq.numTimeouts)
            ens[snrDb].append([harq.throughput, harq.bler, harq.meanTries])
            print(f"  harq_anchor snr={snrDb} seed={seed}: "
                  f"throughput={harq.throughput:.2f}% bler={harq.bler:.2f}%"
                  f" meanTries={harq.meanTries:.2f}")
    # ensemble: (seeds, 3) per SNR — columns throughput%, bler%, meanTries
    out["snr6_ensemble"] = np.array(ens[6])
    out["snr10_ensemble"] = np.array(ens[10])
    np.savez_compressed(f"{OUT}/harq_anchor.npz", **out)


def trjchan():
    """Reference TrjChannel on synthetic trajectories: channel matrices over
    3 slots, TD application, timing offsets, for NLOS and LOS cases.

    The synthetic points mirror tools/dev/cmp_trjchan.py (NLOS phases zero:
    the reference applies them in degrees — documented bug — so nonzero
    phases cannot match). The fixture stores the point parameters so the
    test rebuilds the same trajectory without importing the reference.
    """
    from neoradium import Carrier, AntennaPanel, Waveform
    from neoradium.trjchan import TrjPoint, Trajectory, TrjChannel

    rng = np.random.default_rng(9)
    out = {}
    for hasLos in (False, True):
        tag = "los" if hasLos else "nlos"
        refCar = Carrier(numRbs=12, spacing=30)
        slotSamples = int(refCar.curBwp.getSlotLen())
        pts, infos = [], []
        for i in range(4):
            pi = np.zeros((6, 8))
            pi[:, 1] = np.sort(rng.uniform(0, 800, 6))
            pi[:, 2] = -rng.uniform(0, 25, 6)
            pi[:, 3] = rng.uniform(-180, 180, 6)
            pi[:, 4] = rng.uniform(30, 150, 6)
            pi[:, 5] = rng.uniform(-180, 180, 6)
            pi[:, 6] = rng.uniform(30, 150, 6)
            pi[:, 7] = -1
            if hasLos:
                pi[0, 7] = 0
            pts.append(TrjPoint(np.array([i * 0.5, 0.0, 1.5]),
                                1 if hasLos else 0, pi.copy(), 10.0, 0,
                                np.array([3.0, 1.0, 0.0]), i * slotSamples))
            infos.append(pi)
        ch = TrjChannel(refCar.curBwp, Trajectory(pts, 3.5e9),
                        txAntenna=AntennaPanel([2, 2], polarization="x"),
                        rxAntenna=AntennaPanel([1, 2], polarization="|"))
        out[f"{tag}_pathInfo"] = np.stack(infos)
        hs = []
        for slot in range(3):
            hs.append(ch.getChannelMatrix())
            ch.goNext()
            refCar.goNext()
        out[f"{tag}_h"] = np.stack(hs)
        ch.restart()
        refCar.slotNo = 0
        nt = ch.nrNt[1]
        sig = (rng.normal(size=(nt, slotSamples + ch.getMaxDelay()))
               + 1j * rng.normal(size=(nt, slotSamples + ch.getMaxDelay())))
        out[f"{tag}_sig"] = sig
        out[f"{tag}_y"] = ch.applyToSignal(Waveform(sig)).waveform
        out[f"{tag}_offset"] = np.array(ch.getTimingOffset())
    np.savez_compressed(f"{OUT}/trjchan.npz", **out)


def deepmimo_golden():
    """Reference DeepMIMO trajectory machinery on a tiny synthetic scenario:
    path-matched interpolation (one TrjPoint per slot) and PCG64-seeded
    random grid walks across every mode — all bit-exact tensors.

    The scenario is the smooth multipath field of tools/dev/cmp_deepmimo.py,
    committed in the fixture so the test rebuilds it via
    DeepMimoData.fromPoints without reference import.
    """
    from neoradium import Carrier
    from neoradium.trjchan import TrjPoint
    from neoradium.deepmimo import DeepMimoData
    from neoradium import random as refrandom

    nx, ny = 30, 20
    delta = np.array([0.4, 0.4])
    bs = np.array([5.0, 5.0, 20.0])
    xyzs, infos, dists = [], [], []
    pts = []
    for iy in range(ny):
        for ix in range(nx):
            xyz = np.array([ix * delta[0], iy * delta[1], 1.5])
            t = np.arange(4)
            pi = np.zeros((4, 8))
            pi[:, 0] = 10 * np.sin(0.1 * ix + t) + 5 * iy * 0.05
            pi[:, 1] = 100 + 5 * t + 0.5 * ix + 0.3 * iy
            pi[:, 2] = -5 - 2 * t - 0.01 * ix
            pi[:, 3] = 30 + 3 * t + 0.2 * ix
            pi[:, 4] = 80 + t
            pi[:, 5] = -40 + 5 * t + 0.1 * iy
            pi[:, 6] = 95 + t
            pi[:, 7] = -1
            pi[0, 7] = 0
            dist = np.sqrt(np.square(bs - xyz).sum())
            xyzs.append(xyz); infos.append(pi); dists.append(dist)
            pts.append(TrjPoint(xyz, 1, pi.copy(), dist, 0))

    dmd = DeepMimoData.__new__(DeepMimoData)
    dmd.scenario = "synthetic"
    dmd.carrierFreq = 3.5e9
    dmd.bsXyz = bs
    dmd.allTrjPoints = pts
    dmd.gridSize = np.array([nx, ny])
    dmd.delta = delta
    dmd.numGridPoints = nx * ny
    dmd.xyMin = pts[0].xyz[:2]
    dmd.xyMax = pts[-1].xyz[:2]

    out = {"xyz": np.stack(xyzs), "pathInfo": np.stack(infos),
           "dist": np.asarray(dists), "gridSize": np.array([nx, ny]),
           "delta": delta, "bsXyz": bs}

    # interpolation: fixed index path, one point per slot at 5 m/s
    refCar = Carrier(numRbs=12, spacing=30)
    idx = [0, 2, 4, 4 + 2 * nx]
    traj = dmd.interpolateTrajectory(idx, 5.0, refCar.curBwp)
    out["interp_idx"] = np.asarray(idx)
    out["interp_xyz"] = np.stack([p.xyz for p in traj])
    out["interp_sampleNo"] = np.asarray([p.sampleNo for p in traj])
    out["interp_speed"] = np.stack([p.speed for p in traj])
    out["interp_hasLos"] = np.asarray([p.hasLos for p in traj])
    out["interp_pathInfo"] = np.stack([p.pathInfo for p in traj])

    # random walks: every direction mode + custom prob + distance cap
    cases = [("pX", dict(trajDir="+X")), ("mX", dict(trajDir="-X")),
             ("pY", dict(trajDir="+Y")), ("mY", dict(trajDir="-Y")),
             ("all", dict(trajDir="All")),
             ("prob", dict(trajDir="All", prob=(0.2, 0.5, 0.3))),
             ("dist", dict(trajDir="All", trajLen=6.0))]
    for i, (tag, kw) in enumerate(cases):
        n = kw.pop("trajLen", 24)
        refrandom.setSeed(1000 + i)
        out[f"walk_{tag}"] = dmd.getRandomGridTraj(
            np.array([[0, 0], [11, 7]]), 2, n, **kw)
    np.savez_compressed(f"{OUT}/deepmimo.npz", **out)


def matlab_golden():
    """Repackage the MATLAB 5G Toolbox golden tensors as committed fixtures.

    This is the INDEPENDENT oracle tier (SURVEY.md §4 tier 1): the ``.mat``
    files under ``/root/reference/Playground/CompareWithMatlab/*/MatlabFiles``
    were produced by MATLAB's 5G Toolbox (see the ``.mlx`` sources next to
    them), NOT by the reference Python code — so a bug faithfully shared by
    the reference and this repo is still caught.  This generator only runs
    ``scipy.io.loadmat`` (no reference import) and records the notebook
    configs alongside the tensors; ``tests/test_matlab_golden.py`` drives OUR
    implementation against them following each notebook's protocol
    (inf -> LARGE_LLR, filler -1 adjustments, MATLAB axis orders).
    """
    import scipy.io

    base = "/root/reference/Playground/CompareWithMatlab"

    def load(sub, name, key=None):
        return scipy.io.loadmat(f"{base}/{sub}/MatlabFiles/{name}.mat")[key or name]

    # --- LDPC (LDPC-Matlab.ipynb: BG1, QPSK, 1 layer, R=449/1024) ----------
    np.savez_compressed(f"{OUT}/matlab_ldpc.npz",
                        inBits=load("LDPC", "in").reshape(-1).astype(np.int8),
                        cbsIn=load("LDPC", "cbsIn").T.astype(np.int8),
                        enc=load("LDPC", "enc").T.astype(np.int8),
                        chIn=load("LDPC", "chIn").T.astype(np.int8),
                        raterec=load("LDPC", "raterec").T,
                        decBits=load("LDPC", "decBits").T.astype(np.int8),
                        decBlk=load("LDPC", "decBlk").T.reshape(-1).astype(np.int8))

    # --- Polar (PolarMatlab.ipynb: A=30, E=120, 'dci', QPSK, ebNo=0.8) -----
    np.savez_compressed(f"{OUT}/matlab_polar.npz",
                        msg=load("Polar", "msg").reshape(-1).astype(np.int8),
                        msgcrc=load("Polar", "msgcrc").T.astype(np.int8),
                        encOut=load("Polar", "encOut").T.astype(np.int8),
                        modIn=load("Polar", "modIn").T.astype(np.int8),
                        modOut=load("Polar", "modOut").T,
                        chanNoise=load("Polar", "chanNoise").T,
                        rxLLR=load("Polar", "rxLLR").T,
                        decIn=load("Polar", "decIn").T,
                        decBits=load("Polar", "decBits").reshape(-1).astype(np.int8))

    # --- PDSCH (PDSCH-waveform.ipynb: startRb=1 numRbs=52 mu=1, 2 layers,
    #     interleavingBundleSize=2, DMRS otherCdmGroups=[1], FFT precoder) --
    np.savez_compressed(f"{OUT}/matlab_pdsch.npz",
                        dmrsSymbols=load("PDSCH", "dmrsSymbols").T.flatten(),
                        pdschBits=load("PDSCH", "pdschBits").flatten().astype(np.int8),
                        pdschSymbols=load("PDSCH", "pdschSymbols").T.flatten(),
                        pdschGrid=np.transpose(load("PDSCH", "pdschGrid"), (2, 1, 0)),
                        txWaveform=load("PDSCH", "txWaveform").T)

    # --- CDL 4x2-panel MIMO + SISO (CDL-Matlab / SisoCdl notebooks:
    #     model D/C, seed 123 MATLAB init, 25 RB mu=0, fc=4 GHz, 15 km/h) ---
    for sub, tag in (("CDL", "cdl"), ("CDL-SISO", "cdl_siso")):
        np.savez_compressed(f"{OUT}/matlab_{tag}.npz",
                            txWaveform=load(sub, "txWaveform").T,
                            rxWaveform=load(sub, "rxWaveform").T)

    # --- CSI-RS (CSI-RS-Matlab.ipynb: 25 RB mu=0 nFFT=2048, slot 1,
    #     NZP 2-port + ZP 4-port sets, then CDL-D channel + LS chest) -------
    np.savez_compressed(f"{OUT}/matlab_csirs.npz",
                        csirsSym=load("CSI-RS", "csirsSym").T.flatten(),
                        txGrid=np.transpose(load("CSI-RS", "txGrid"), (2, 1, 0)),
                        txWaveform=load("CSI-RS", "txWaveform").T,
                        H_actual=np.transpose(load("CSI-RS", "H_actual"), (1, 0, 2, 3)),
                        rxWaveform=load("CSI-RS", "rxWaveform").T,
                        noise=load("CSI-RS", "noise").T,
                        rxGrid=np.transpose(load("CSI-RS", "rxGrid"), (2, 1, 0)))

    # --- Antenna patterns (Antenna*.ipynb: 65-deg 30-dB element; 4x4 '+'
    #     panel; 2x2 array of panels at 3-lambda spacing).  MATLAB emits
    #     closed 181x361 grids; drop the wrap row/col like the notebooks. ---
    ant = {}
    for mat, pre in (("Element", "el"), ("Panel", "panel"), ("Array", "array")):
        ant[f"{pre}_directivity"] = load("Antenna", f"{mat}Directivity",
                                         "directivity")[:-1, :-1]
        ant[f"{pre}_field"] = load("Antenna", f"{mat}Field", "field")[:-1, :-1]
        ant[f"{pre}_powerDb"] = load("Antenna", f"{mat}PowerDb",
                                     "powerDb")[:-1, :-1]
    np.savez_compressed(f"{OUT}/matlab_antenna.npz", **ant)


ALL_GENERATORS = [gold_and_crc, modulation, ofdm, ldpc, pdsch, cdl, chest, bler_curve_td,
                  tdl, polar, csirs, csifb, ptrs, bler_curve, bler_headline,
                  bler_tdl4x4, bler_2cw, bler_headline_i2,
                  harq_anchor,
                  trjchan, deepmimo_golden, matlab_golden]

if __name__ == "__main__":
    import os
    os.makedirs(OUT, exist_ok=True)
    names = sys.argv[1:]
    for gen in ALL_GENERATORS:
        if names and gen.__name__ not in names:
            continue
        print(f"generating {gen.__name__} ...")
        gen()
    print("golden fixtures written to", OUT)
