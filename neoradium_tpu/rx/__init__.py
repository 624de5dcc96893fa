from .equalize import mmse_equalize
from .chest import LsChannelEstimator, scale_noise_var
