"""Generate a large transcript fixture as parallel bounded-memory chunks.

    python tools/gen_chunks.py --outdir .fixtures/sf16.0 --chunks 4 --sf-per-chunk 4.0

Each chunk is an independent process with its own seed and a disjoint conv_id
range, all writing into ONE dataset root (same part_date=… dirs, distinct file
basenames). Peak RSS ≈ chunks × one-chunk footprint (~10 GB at sf 4.0).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys
sys.path.insert(0, sys.argv[5])
from lyra_spark import fixtures
sf, outdir, chunk_i, offset = sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
if sf not in fixtures.N_CONVS:
    fixtures.N_CONVS[sf] = int(float(sf) * 100_000)
fixtures.materialize(sf, outdir, seed=fixtures.SEED + 1000 * chunk_i,
                     conv_offset=offset, chunk=f"c{chunk_i:02d}")
print(f"chunk {chunk_i} done")
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--sf-per-chunk", default="4.0")
    args = ap.parse_args()

    n_convs = int(float(args.sf_per_chunk) * 100_000)
    procs = []
    for i in range(args.chunks):
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", CHILD, args.sf_per_chunk, args.outdir, str(i), str(i * n_convs), REPO]
            )
        )
    rc = 0
    for p in procs:
        rc |= p.wait()
    sys.exit(rc)


if __name__ == "__main__":
    main()
