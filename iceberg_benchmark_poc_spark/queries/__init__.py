"""Query modules. Importing this package populates the registry.

Each module covers one band of SURVEY.md §2:
  manifests   — scans, partition/stat pruning, manifest trees, compaction (§2.1-2.2, 2.7)
  dv          — delete-vector resolution join family (§2.3)
  aggregates  — aggregation, windowed cumulative sums, cost models, top-k (§2.4-2.6)
  relational  — star-schema analytics exercising Catalyst end-to-end
  textpipe    — training-data text ops: dedup, fingerprints, lang-id, quality
  embeddings  — similarity search over embedding vectors
  streamlike  — batch twins of the streaming window queries (§2.9)
"""

from . import manifests  # noqa: F401
from . import dv  # noqa: F401
from . import aggregates  # noqa: F401
from . import relational  # noqa: F401
from . import textpipe  # noqa: F401
from . import embeddings  # noqa: F401
from . import multimodal  # noqa: F401
from . import temporal  # noqa: F401
from . import approx  # noqa: F401
from . import dv_payload  # noqa: F401
from . import streamlike  # noqa: F401
