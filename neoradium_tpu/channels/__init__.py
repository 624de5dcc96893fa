from .antenna import AntennaElement, AntennaPanel, AntennaArray
from .base import ChannelBase
from .cdl import CdlChannel
from .tdl import TdlChannel
from .trajectory import TrjPoint, Trajectory
from .trjchan import TrjChannel
from .deepmimo import DeepMimoData
