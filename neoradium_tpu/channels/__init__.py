from .antenna import AntennaElement, AntennaPanel, AntennaArray
