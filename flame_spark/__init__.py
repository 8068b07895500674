"""flame_spark — a PySpark-native inverted-index + BM25 engine with the
query and data-processing capabilities of kreeedit/FLAME (text-reuse /
formulaic-language similarity), rebuilt Spark-first.

Layers:
- constants/config:      frozen semantics + engine knobs
- hashing:               exact Mersenne-61 LNO-gram fingerprints
- normalize/bpe:         deterministic text pipeline (driver-learned,
                         broadcast artifacts)
- corpus:                DataFrame scan-side transforms (Arrow UDFs)
- postings/bm25/similarity: relational index + scoring (Catalyst-native)
- segments/wand:         compressed posting segments + block-max WAND
- oracle:                single-process NumPy differential oracle
- textops/embedops:      training-data pipeline operators (dedup, ANN,
                         text quality, fingerprints)
"""

from .config import FlameConfig  # noqa: F401
from .session import get_spark  # noqa: F401
