"""Loader for 3GPP standard constant tables bundled with the package.

``nr_tables.npz`` holds normative spec data (see tools/extract_3gpp_tables.py):
LDPC base graphs (TS 38.212 Tables 5.3.2-2/3), lifting-size sets (Table
5.3.2-1), the Polar reliability sequence (Table 5.3.1.2-1) and interleaver
patterns (Tables 5.3.1.1-1, 5.4.1.1-1).
"""
from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

_DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")


@lru_cache(maxsize=1)
def _tables():
    return np.load(os.path.join(_DATA, "nr_tables.npz"))


def ldpc_base_graph_sets(bgn: int) -> np.ndarray:
    """(rows, cols, 8) int16 shift-coefficient sets; -1 = no edge."""
    return _tables()[f"ldpc_bg{bgn}"]


def ldpc_lifting_sets() -> list[list[int]]:
    t = _tables()
    sets = t["ldpc_lifting_sets"]
    lens = t["ldpc_lifting_set_lens"]
    return [list(map(int, sets[i, : lens[i]])) for i in range(sets.shape[0])]


def polar_reliability() -> np.ndarray:
    return _tables()["polar_reliability"]


def polar_input_interleaver() -> np.ndarray:
    return _tables()["polar_input_interleaver"]


def polar_subblock_interleaver() -> np.ndarray:
    return _tables()["polar_subblock_interleaver"]
