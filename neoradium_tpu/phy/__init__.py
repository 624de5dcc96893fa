from .dmrs import DmrsConfig
from .pdsch import PdschConfig, ReservedRbSet
