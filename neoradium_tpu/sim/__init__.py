from .adaptive import AdaptivePdschLink
from .link import PdschLinkSim
from .sweep import run_bler_sweep, run_bler_grid, make_trial_keys
from .harq import PdschHarqSim, HarqConfig, HarqEntity, harq_stats
from .snr import SnrScheduler
