"""Dev-only: compare CdlChannel vs reference with fixed coupling/phases."""
import sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

rng = np.random.default_rng(5)
n, m = 23, 20  # CDL-A NLOS clusters
coupling = np.stack([np.stack([rng.permutation(m) for _ in range(n)]) for _ in range(3)]).astype(np.int32)
phases_deg = rng.uniform(-180, 180, (2, 2, n, m))

sys.path.insert(0, "/root/reference")
from neoradium import Carrier, AntennaPanel as RefPanel, CdlChannel as RefCdl

refCar = Carrier(numRbs=25, spacing=30)
refTx = RefPanel([2, 2], polarization="x")
refRx = RefPanel([1, 2], polarization="+")
ref = RefCdl(refCar.curBwp, "A", delaySpread=30, carrierFreq=3.5e9,
             dopplerShift=55, ueDirAZ=[10, 80],
             txAntenna=refTx, rxAntenna=refRx,
             rayCoupling=coupling, initialPhases=phases_deg)
refH = ref.getChannelMatrix()
print("ref H:", refH.shape)

from neoradium_tpu.carrier import CarrierConfig
from neoradium_tpu.channels.antenna import AntennaPanel
from neoradium_tpu.channels.cdl import CdlChannel

car = CarrierConfig(numRbs=25, spacing=30)
mine = CdlChannel(car, "A", delaySpread=30, carrierFreq=3.5e9,
                  dopplerShift=55, ueDirAZ=[10, 80],
                  txAntenna=AntennaPanel((2, 2), polarization="x"),
                  rxAntenna=AntennaPanel((1, 2), polarization="+"),
                  rayCoupling=coupling, initialPhases=phases_deg)
state = mine.init_state(jax.random.PRNGKey(0))
myH = np.asarray(mine.channel_matrix(state, slotNo=0))
print("my H:", myH.shape)
err = np.abs(myH - refH).max() / (np.abs(refH).max() + 1e-30)
print("channel_matrix rel err:", err)

# time-domain application
slotLen = int(refCar.curBwp.getSlotLen())
nt = ref.nrNt[1]
sig = (rng.normal(size=(nt, slotLen + ref.getMaxDelay()))
       + 1j * rng.normal(size=(nt, slotLen + ref.getMaxDelay())))
from neoradium import Waveform
refOut = ref.applyToSignal(Waveform(sig)).waveform
myOut = np.asarray(mine.apply_to_signal(sig, state, slotNo=0))
print("ref out:", refOut.shape, "my out:", myOut.shape)
err2 = np.abs(myOut - refOut).max() / (np.abs(refOut).max() + 1e-30)
print("apply_to_signal rel err:", err2)
print("timing offset: ref", ref.getTimingOffset(), "mine", int(mine.timing_offset(state)))
assert err < 1e-9 and err2 < 1e-9
print("CDL MATCH OK")
