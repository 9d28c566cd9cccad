"""Sources & sinks (SURVEY.md §2.1): distributed filesystem ingest, the
pluggable ObjectStore sink, and the segment planner.
"""
