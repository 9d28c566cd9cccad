"""Operator layer: every query operator from SURVEY.md §2, expressed as
(spark, sf_dir) -> DataFrame callables, each paired (where SQL-expressible)
with a DuckDB oracle in the module's ORACLES dict. registry.py merges them
into the driver contract exposed by __spark_entry__.py.
"""
