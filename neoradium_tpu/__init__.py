"""NeoRadium-TPU: a TPU-native 5G NR physical-layer simulation framework.

A from-scratch JAX/XLA/Pallas implementation of a complete 3GPP 5G NR PHY
link-level simulator (downlink PDSCH chain, channel coding, fading channels,
channel estimation/equalization, HARQ, CSI feedback), designed TPU-first:

- All hot kernels are batched, static-shape JAX functions that map onto the
  MXU/VPU; Monte-Carlo trials are ``vmap``-ed and sharded over device meshes.
- Configuration objects are frozen, hashable Python dataclasses whose derived
  index sets / tables are precomputed host-side with NumPy; jitted device
  functions consume only arrays and static config.
- Per-slot state (slot counters, channel fading state, HARQ soft buffers) is
  an explicit pytree carried through ``lax.scan``, not object mutation.

Feature parity target: InterDigitalInc/NeoRadium v0.4.0 (see SURVEY.md).
"""

__version__ = "0.1.0"

from .carrier import Carrier, CarrierConfig, SAMPLE_RATE
from .modulation import Modem
from .utils import toDb, toLinear, getMse, getNmse
from .sequences import gold_sequence
from . import crc
from .ofdm import OfdmContext
from .coding.ldpc import LdpcConfig, LdpcEncoder, LdpcDecoder
from .random import PRNG, RanGen, random
from .waveform import Waveform, estimate_timing_offset
from .grid import (HostGrid, precode, apply_channel_freq,
                   noise_std_for_grid_snr, noise_std_for_waveform_snr,
                   grid_re_power, grid_noise_std, retRegister)
from .phy.pdsch import PdschConfig, ReservedRbSet
from .phy.dmrs import DmrsConfig, PtrsConfig
from .phy.csirs import CsiRs, CsiRsSet, CsiRsConfig
from .phy.csifeedback import CsiReport
from .coding.polar import PolarConfig, PolarEncoder, PolarDecoder
from .channels import (AntennaElement, AntennaPanel, AntennaArray, ChannelBase,
                       CdlChannel, TdlChannel, TrjPoint, Trajectory,
                       TrjChannel, DeepMimoData)
from .rx import mmse_equalize, LsChannelEstimator
from .sim import (PdschLinkSim, run_bler_sweep, run_bler_grid, make_trial_keys,
                  PdschHarqSim, HarqConfig, HarqEntity, harq_stats,
                  SnrScheduler)
