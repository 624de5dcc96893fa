"""Dev-only: compare TdlChannel vs reference with injected SOS phases."""
import sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, "/root/reference")
from neoradium import Carrier, TdlChannel as RefTdl, Waveform
from neoradium import random as refrandom

from neoradium_tpu.carrier import CarrierConfig
from neoradium_tpu.channels.tdl import TdlChannel

cases = [
    dict(profile="A", delaySpread=100, dopplerShift=40, txAntennaCount=2,
         rxAntennaCount=2, mimoCorrelation="High"),
    dict(profile="D", delaySpread=30, dopplerShift=10, txAntennaCount=1,
         rxAntennaCount=1),
    dict(profile="B100", dopplerShift=400, txAntennaCount=4, rxAntennaCount=2,
         mimoCorrelation="Medium", polarization="CrossPolar", delaySpread=100),
    dict(profile="C", delaySpread=300, dopplerShift=100, txAntennaCount=2,
         rxAntennaCount=4, mimoCorrelation="Medium"),
]
for kw in cases:
    refrandom.setSeed(42)
    refCar = Carrier(numRbs=12, spacing=30)
    ref = RefTdl(refCar.curBwp, **kw)
    myCar = CarrierConfig(numRbs=12, spacing=30)
    mine = TdlChannel(myCar, kw["profile"],
                      **{k: v for k, v in kw.items() if k != "profile"},
                      sosPhases=(ref.sosTheta1N[0].transpose(0, 1, 2, 3),
                                 ref.sosTheta2N[0]))
    state = mine.init_state(jax.random.PRNGKey(0))
    refH = ref.getChannelMatrix()
    myH = np.asarray(mine.channel_matrix(state, slotNo=0))
    err = np.abs(myH - refH).max() / np.abs(refH).max()
    print(kw["profile"], "H err:", err)
    assert err < 1e-9, err

    nt = ref.nrNt[1]
    slotLen = int(refCar.curBwp.getSlotLen())
    rng = np.random.default_rng(1)
    sig = (rng.normal(size=(nt, slotLen + ref.getMaxDelay()))
           + 1j * rng.normal(size=(nt, slotLen + ref.getMaxDelay())))
    refY = ref.applyToSignal(Waveform(sig)).waveform
    myY = np.asarray(mine.apply_to_signal(sig, state, slotNo=0))
    err2 = np.abs(myY - refY).max() / np.abs(refY).max()
    print(kw["profile"], "TD err:", err2)
    assert err2 < 1e-9, err2
print("TDL MATCH OK")
