"""Column-level building blocks (re-exported for library users).

All JVM-side expressions — safe in hot paths at any scale.
"""

from cuttana_spark.operators.similarity import _dot as dot_product  # noqa: F401
from cuttana_spark.operators.similarity import _norm as l2_norm  # noqa: F401
from cuttana_spark.operators.text import (  # noqa: F401
    normalized,
    portable_hash64,
)

__all__ = ["dot_product", "l2_norm", "normalized", "portable_hash64"]
