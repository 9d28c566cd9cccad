"""Multimodal column support: opaque binary media + typed metadata
(north-star extension; no counterpart in the reference).
"""

from swiftbulkuploader_spark.multimodal.media import (  # noqa: F401
    MEDIA_SCHEMA,
    decode_image_meta,
    frame_sample_plan,
    media_stats,
)
