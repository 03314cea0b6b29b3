"""Stamp GREEN_SOURCES.json with current source fingerprints.

Run at SESSION START, before any edits, once the new CORRECTNESS_r*.json has
landed: every query green in the latest round gets its current fingerprint
recorded (the source now is the source the driver ran). Any query edited
after its stamp then outranks stale-but-unchanged greens in the next sweep
(core/registry.py:driver_ordered_queries).

Usage:
    python scratch/refresh_green_sources.py            # greens of latest round
    python scratch/refresh_green_sources.py q_a q_b    # just these names
"""

import sys

sys.path.insert(0, "/root/repo")

from iceberg_benchmark_poc_spark.core.registry import refresh_green_sources

names = sys.argv[1:] or None
snap = refresh_green_sources(names)
print(f"stamped {len(names) if names else 'latest-round greens'}; snapshot now {len(snap)} entries")
