"""Record the committed warm compile cache for the driver's multichip dryrun.

Clears .dryrun_cache/ and runs ``__graft_entry__.dryrun_multichip(8)`` twice
in fresh subprocesses: the first populates the cache (cold XLA:CPU compile of
the 8-device DP train step), the second verifies the programs now load from
the cache (it must be dramatically faster).  Run this after ANY change that
affects the traced train step (model/ops/loss/step/config defaults) and
commit the resulting .dryrun_cache/ — otherwise the driver host pays the
multi-minute cold compile and can hit its time budget (round-4 artifact was
rc=124 for exactly that reason).

Usage: python tools/record_dryrun_cache.py [--n 8] [--keep]
"""

import argparse
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".dryrun_cache")


def run_once(n: int) -> float:
    t0 = time.perf_counter()
    res = subprocess.run(
        [sys.executable, "-c",
         f"import __graft_entry__ as g; g.dryrun_multichip({n})"],
        cwd=REPO)
    if res.returncode != 0:
        raise SystemExit(f"dryrun failed rc={res.returncode}")
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--keep", action="store_true",
                    help="do not clear the cache first (incremental top-up)")
    args = ap.parse_args()

    if not args.keep and os.path.isdir(CACHE):
        shutil.rmtree(CACHE)
    cold = run_once(args.n)
    warm = run_once(args.n)
    n_entries = len(os.listdir(CACHE)) if os.path.isdir(CACHE) else 0
    size_mb = sum(os.path.getsize(os.path.join(CACHE, f))
                  for f in os.listdir(CACHE)) / 1e6 if n_entries else 0.0
    print(f"cold={cold:.1f}s warm={warm:.1f}s entries={n_entries} "
          f"size={size_mb:.1f}MB")
    if warm > 0.6 * cold:
        print("WARNING: warm run not much faster than cold — cache misses? "
              "(check XLA_FLAGS canonicalization)", file=sys.stderr)


if __name__ == "__main__":
    main()
