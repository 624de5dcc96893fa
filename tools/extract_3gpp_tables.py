"""One-time codegen: extract 3GPP standard constant tables into ``neoradium_tpu/data/``.

The tables stored here are **3GPP standard data** (TS 38.212 / TS 38.211 /
TR 38.901 normative tables), not code:

- LDPC base graphs 1 and 2 shift coefficients (TS 38.212 Tables 5.3.2-2/5.3.2-3),
  stored dense as ``(rows, cols, 8)`` int16 with -1 marking absent edges.
- LDPC lifting-size sets (TS 38.212 Table 5.3.2-1).
- Polar reliability sequence (TS 38.212 Table 5.3.1.2-1), input interleaver
  (Table 5.3.1.1-1) and sub-block interleaver pattern (Table 5.4.1.1-1).

We read the numeric values via the reference implementation mounted at
/root/reference (which transcribed them from the spec) and re-store them in our
own dense ``.npz`` format. Run once; the ``.npz`` is committed.
"""
import sys
import numpy as np

sys.path.insert(0, "/root/reference")
from neoradium import ldpc as _ldpc  # noqa: E402
from neoradium import polar as _polar  # noqa: E402

OUT = "neoradium_tpu/data/nr_tables.npz"


def dense_bg(bg_rows, n_rows, n_cols):
    """Convert sparse {row: [(col, [8 shifts])]} to dense (rows, cols, 8) int16."""
    out = np.full((n_rows, n_cols, 8), -1, dtype=np.int16)
    for i, row in enumerate(bg_rows):
        for col, shifts in row:
            out[i, col, : len(shifts)] = shifts
    return out


def main():
    bg1 = dense_bg(_ldpc.hbg[1], 46, 68)
    bg2 = dense_bg(_ldpc.hbg[2], 42, 52)

    # Lifting size sets: ragged -> pad with 0
    lss = _ldpc.liftingSizeSets
    max_len = max(len(s) for s in lss)
    lifting = np.zeros((len(lss), max_len), dtype=np.int32)
    lifting_len = np.array([len(s) for s in lss], dtype=np.int32)
    for i, s in enumerate(lss):
        lifting[i, : len(s)] = s

    np.savez_compressed(
        OUT,
        ldpc_bg1=bg1,
        ldpc_bg2=bg2,
        ldpc_lifting_sets=lifting,
        ldpc_lifting_set_lens=lifting_len,
        polar_reliability=np.asarray(_polar.reliabilitySeq, dtype=np.int16),
        polar_input_interleaver=np.asarray(_polar.inputInterleaver, dtype=np.int16),
        polar_subblock_interleaver=np.asarray(_polar.subBlockInterleaver, dtype=np.int16),
    )
    print(f"wrote {OUT}")
    d = np.load(OUT)
    for k in d.files:
        print(f"  {k}: {d[k].shape} {d[k].dtype}")


if __name__ == "__main__":
    main()
