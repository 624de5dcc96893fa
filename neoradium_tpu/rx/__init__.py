from .equalize import mmse_equalize
