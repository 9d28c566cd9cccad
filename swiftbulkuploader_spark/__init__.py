"""swiftbulkuploader_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference bulk-upload pipeline (scholarsportal/SwiftBulkUploader, surveyed in
SURVEY.md), re-expressed Spark-first:

* the MySQL manifest table        -> Parquet-backed DataFrames (catalog.py)
* the recursive directory walker  -> distributed listing source (sources/ingest.py)
* the multiprocessing upload pool -> ``mapPartitions`` over an ObjectStore
                                     (sources/objectstore.py, plans/upload.py)
* per-row UPDATE status flags     -> append-only attempt log + anti-join /
                                     latest-wins window (operators/pipeline_queries.py)
* the file segmenter              -> a segment-plan DataFrame (sources/segments.py)
* progress/rate monitoring        -> observe()/listeners + windowed aggregates
                                     (streaming/progress.py)

plus the large-scale training-data operators a 100 TB pipeline needs:
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity search,
text analysis, JSON ops, star-schema analytics (operators/*).

Everything is public PySpark API; no custom Catalyst rules are required
(SURVEY.md §4.2).
"""

__version__ = "0.1.0"

from swiftbulkuploader_spark.session import get_spark  # noqa: F401
from swiftbulkuploader_spark.catalog import TABLES, load_tables  # noqa: F401
