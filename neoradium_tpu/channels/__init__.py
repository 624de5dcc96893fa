from .antenna import AntennaElement, AntennaPanel, AntennaArray
from .base import ChannelBase
from .cdl import CdlChannel
from .tdl import TdlChannel
