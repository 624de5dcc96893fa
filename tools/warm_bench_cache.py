"""Refresh the committed persistent-compilation cache for bench.py.

Runs ``bench.py --inner <batch>`` for each default batch so every XLA
executable the bench touches (the Monte-Carlo point fn plus the small
reduction/convert helpers) lands in ``.jax_cache/``, then stamps
``.jax_cache/WARM.json`` with the jax/jaxlib versions the cache was built
under. Run on the real chip after any change to the bench program or a
jax upgrade, then commit the cache directory:

    python tools/warm_bench_cache.py && git add -A .jax_cache

The axon tunnel hangs randomly on ~half of process starts (see the
watchdog comment in bench.py), so each batch is retried under a timeout
rather than trusted to finish; the axon server caches compiles
server-side, so a killed attempt's compile work carries over.
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench


def warm(batch, tries=4, timeout=580):
    for i in range(tries):
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(bench.__file__),
                 "--inner", str(batch)],
                timeout=timeout, capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            print(f"  batch {batch} try {i + 1}: timed out, retrying")
            continue
        if out.returncode == 0 and "{" in out.stdout:
            print(f"  {out.stdout.strip().splitlines()[-1]}")
            return True
        print(f"  batch {batch} try {i + 1}: rc={out.returncode} "
              f"{out.stderr.strip()[-300:]}")
    return False


def main():
    batches = [int(a) for a in sys.argv[1:]] or [1536, 768]
    for batch in batches:
        print(f"warming batch {batch} ...", flush=True)
        if not warm(batch):
            sys.exit(f"warming batch {batch} failed")
    with open(bench.WARM_MARKER, "w") as f:
        json.dump({"versions": bench._versions(), "batches": batches}, f)
    print(f"stamped {bench.WARM_MARKER}")


if __name__ == "__main__":
    main()
