"""Query modules. Importing this package populates the registry.

Each module covers one band of SURVEY.md §2 (see COVERAGE.md for the full map):
  manifests   — scans, partition/stat pruning, manifest trees, compaction (§2.1-2.2, 2.7)
  dv          — delete-vector resolution join family (§2.3)
  dv_payload  — DV position-set codec roundtrip (binary/zlib path, §2.8)
  aggregates  — aggregation, windowed cumulative sums, cost models, top-k (§2.4-2.6)
  relational  — star-schema analytics exercising Catalyst end-to-end
  temporal    — as-of / range joins, rollup, set algebra
  approx      — skew-salted and sketch-based aggregation
  textpipe    — training-data text ops: dedup, fingerprints, lang-id, quality
  textprep    — corpus prep: PII scrub, repetition filter, chunking, tf-idf
  embeddings  — similarity search over embedding vectors
  multimodal  — binary payloads through Arrow-batched Pandas UDFs
  streamlike  — batch twins of the streaming window queries (§2.9)
  sources     — CSV/JSONL/ORC source+sink round trips (fingerprint-gated)
  behavior    — event-sequence analytics: funnel, retention, anomaly
"""

from . import manifests  # noqa: F401
from . import dv  # noqa: F401
from . import aggregates  # noqa: F401
from . import relational  # noqa: F401
from . import textpipe  # noqa: F401
from . import textprep  # noqa: F401
from . import embeddings  # noqa: F401
from . import multimodal  # noqa: F401
from . import temporal  # noqa: F401
from . import approx  # noqa: F401
from . import analytic  # noqa: F401
from . import dv_payload  # noqa: F401
from . import streamlike  # noqa: F401
from . import sources  # noqa: F401
from . import behavior  # noqa: F401
from . import zorder  # noqa: F401
from . import bpe  # noqa: F401
from . import tpch_derived  # noqa: F401
