"""Physical-layout helpers: partitioning/parallelism decisions that Catalyst
cannot make for us (it sizes scans by bytes, not by downstream compute cost).
"""

from swiftbulkuploader_spark.plans.layout import spread  # noqa: F401
