from .link import PdschLinkSim
from .sweep import run_bler_sweep, make_trial_keys
from .harq import PdschHarqSim, HarqConfig
from .snr import SnrScheduler
