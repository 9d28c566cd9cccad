"""Scalar-function layer (SURVEY.md §2.6): path/key transforms, text
analytics primitives, and vector math — all as Catalyst Column expressions
(JVM-side, whole-stage-codegen friendly) rather than Python UDFs.
"""

from swiftbulkuploader_spark.functions.paths import (  # noqa: F401
    object_key,
    path_basename,
    path_cutoff,
    path_join,
    segment_name,
    strip_leading_slash,
)
from swiftbulkuploader_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_norm,
)
