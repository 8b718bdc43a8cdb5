"""Regenerate the committed golden forest snapshots (tests/snapshots/).

Run DELIBERATELY when the build algorithm or the threefry stream
changes; the committed files exist to catch *accidental* cross-round
drift of the build stream (the insta-snapshot role of the reference's
src/tests/writer.rs:296-320 and src/tests/binary_quantized.rs:47-54).

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/regen_goldens.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

from tests.test_golden import (
    GOLDEN_METRICS,
    GOLDEN_SCENARIOS,
    build_golden,
    build_incremental_golden,
    slug,
)

SNAP_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "snapshots")


def main():
    for metric in GOLDEN_METRICS:
        path = os.path.join(SNAP_DIR, f"golden_{slug(metric)}.txt")
        with open(path, "w") as fh:
            fh.write(build_golden(metric))
        print("wrote", path)
    path = os.path.join(SNAP_DIR, "golden_incremental.txt")
    with open(path, "w") as fh:
        fh.write(build_incremental_golden())
    print("wrote", path)
    for scenario, fn in sorted(GOLDEN_SCENARIOS.items()):
        path = os.path.join(SNAP_DIR, f"golden_{scenario}.txt")
        with open(path, "w") as fh:
            fh.write(fn())
        print("wrote", path)


if __name__ == "__main__":
    main()
