"""MERGE INTO (upsert) as a DataFrame composition — the stateful alternative
to the attempt-log model for U2 (SURVEY.md §2.4).

The reference mutates in place: ``UPDATE {t} SET uploaded='1' WHERE id={k}``
per uploaded file (bulkupload.py:253-261), one statement and one fresh DB
connection per file (:236,247,260). The engine's primary answer is the
append-only attempt log + ``apply_attempts`` (plans/upload.py); this module
adds the *set-oriented* form a lakehouse job needs: reconcile a snapshot with
a delta in one ANSI ``MERGE INTO target USING source ON key WHEN MATCHED THEN
UPDATE WHEN NOT MATCHED THEN INSERT [WHEN NOT MATCHED BY SOURCE THEN
DELETE]`` statement, then overwrite the snapshot.

Two physical strategies, chosen by the caller's knowledge of the delta size
(Catalyst cannot pick this one by itself because a full outer join is never
broadcastable):

* ``broadcast_delta=False`` — one full-outer equi-join on the merge key:
  a single hash shuffle of both sides, correct at any delta size.
* ``broadcast_delta=True`` — the huge-target/small-delta plan (the common
  nightly-merge case, and the 100 TB-correct one): update/keep is a
  map-side ``target LEFT JOIN broadcast(source)``; inserts are
  ``source ANTI broadcast(matched_keys)`` where ``matched_keys`` is the
  (≤ |source|-row) output of a map-side semi join. The target is scanned,
  never shuffled — zero wide exchanges in the whole plan.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from swiftbulkuploader_spark.catalog import load_table


def _key_cond(keys: list[str]) -> Column:
    return reduce(
        lambda a, b: a & b,
        [F.col(f"t.{k}") == F.col(f"s.{k}") for k in keys],
    )


def _merged_cols(target_cols, keys, update_cols, t_present, s_present,
                 action_col):
    """Per-column CASE rules shared by both physical forms."""
    out = []
    for c in target_cols:
        if c in keys:
            out.append(F.coalesce(F.col(f"t.{c}"), F.col(f"s.{c}")).alias(c))
        elif c in update_cols:
            # matched -> source value; insert -> source value; kept -> target
            out.append(
                F.when(s_present, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            )
        else:
            out.append(
                F.when(t_present, F.col(f"t.{c}")).otherwise(F.col(f"s.{c}")).alias(c)
            )
    if action_col:
        out.append(
            F.when(t_present & s_present, F.lit("updated"))
            .when(s_present, F.lit("inserted"))
            .otherwise(F.lit("kept"))
            .alias(action_col)
        )
    return out


def merge_into(
    target: DataFrame,
    source: DataFrame,
    key,
    update_cols,
    insert: bool = True,
    delete_unmatched: bool = False,
    action_col: str | None = None,
    broadcast_delta: bool = False,
) -> DataFrame:
    """ANSI MERGE semantics over same-schema frames.

    * matched rows take ``update_cols`` from the source, the rest from the
      target (WHEN MATCHED THEN UPDATE SET ...);
    * source-only rows are inserted when ``insert`` (WHEN NOT MATCHED THEN
      INSERT);
    * target-only rows are kept, or dropped when ``delete_unmatched``
      (WHEN NOT MATCHED BY SOURCE THEN DELETE).

    Merge keys must be non-null and unique per side (the ANSI precondition —
    a multi-matched target row is a cardinality violation in real MERGE).
    ``action_col`` appends an audit column in {'updated','inserted','kept'}.
    ``broadcast_delta=True`` selects the shuffle-free physical form (module
    docstring); semantics are identical — pinned by tests running both.
    """
    keys = [key] if isinstance(key, str) else list(key)
    update_cols = list(update_cols)
    t, s = target.alias("t"), source.alias("s")
    cond = _key_cond(keys)
    t_present = F.col(f"t.{keys[0]}").isNotNull()
    s_present = F.col(f"s.{keys[0]}").isNotNull()

    if not broadcast_delta:
        joined = t.join(s, cond, "full_outer")
        merged = joined.select(
            *_merged_cols(target.columns, keys, update_cols, t_present,
                          s_present, action_col),
            t_present.alias("__t"), s_present.alias("__s"),
        )
        if not insert:
            merged = merged.filter(F.col("__t"))
        if delete_unmatched:
            merged = merged.filter(F.col("__s"))
        return merged.drop("__t", "__s")

    # --- huge-target / small-delta form: target is never shuffled ---
    upd = t.join(F.broadcast(s), cond, "left_outer").select(
        *_merged_cols(target.columns, keys, update_cols, F.lit(True),
                      s_present, action_col),
        s_present.alias("__s"),
    )
    if delete_unmatched:
        upd = upd.filter(F.col("__s"))
    upd = upd.drop("__s")
    if not insert:
        return upd

    # keys already present in the target: small by the uniqueness
    # precondition (≤ one target match per source row), so broadcastable.
    matched_keys = (
        t.join(F.broadcast(s), cond, "left_semi")
        .select(*[F.col(f"t.{k}").alias(k) for k in keys])
    )
    inserts = s.join(F.broadcast(matched_keys), on=keys, how="left_anti")
    ins_cols = [F.col(c) for c in target.columns]
    if action_col:
        ins_cols.append(F.lit("inserted").alias(action_col))
    return upd.unionByName(inserts.select(*ins_cols))


def u2_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract query: reconcile an orders snapshot with a re-crawl delta in
    one MERGE — the set-oriented replacement for the reference's per-file
    UPDATE loop (bulkupload.py:187-202 driving :253-261).

    Target = the stale snapshot (every order whose key isn't divisible by 7
    — those rows are "missing" and arrive as inserts). Source = the delta:
    every third order re-crawled as finished with a 10% price correction.
    Runs the shuffle-free broadcast_delta form (delta ≈ 1/3 of the snapshot
    here, but the physical shape is the point); the full-outer form is
    checked equivalent in tests. The output tags every row with its merge
    action so the oracle checks the matched/inserted/kept split
    row-for-row, not just the final values.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    target = orders.filter(F.col("o_orderkey") % 7 != 0)
    source = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        F.lit("F").alias("o_orderstatus"),
        (F.col("o_totalprice") * F.lit(1.1)).alias("o_totalprice"),
    )
    merged = merge_into(
        target,
        source,
        key="o_orderkey",
        update_cols=["o_orderstatus", "o_totalprice"],
        insert=True,
        action_col="merge_action",
        broadcast_delta=True,
    )
    # o_totalprice is emitted unrounded: x*1.1 is the same IEEE-754 multiply
    # in both engines, while round(x, 2) is engine-specific at half-cent
    # representation edges (Spark HALF_UP vs DuckDB) — rounding would make a
    # correct merge hash-mismatch.
    return merged.select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "merge_action"
    )


def x6_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: per-customer order stats kept as a
    materialized state table, refreshed by MERGING the delta's partial
    aggregates into the previous state instead of recomputing from scratch
    — the pattern that turns an O(history) nightly rollup into O(delta).

    Algebraic aggregates only (count, sum, min, max — each merges by the
    same function): old-state rows and delta partial-agg rows union, then
    one re-aggregation keyed on the group. At 100 TB the state table is
    bucketed on the group key, so the union+agg shuffles ONLY the delta;
    avg/stddev extend the same way by carrying (count, sum, sum-of-squares).
    The oracle computes the same stats from the full table in one pass —
    equality IS the proof that the incremental merge loses nothing.
    """
    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 5 != 0)
    delta = orders.filter(F.col("o_orderkey") % 5 == 0)

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("total_spend"),
            F.max("o_orderdate").alias("last_order"),
        )

    state = partial(old)  # stands in for the persisted state table
    merged = (
        state.unionByName(partial(delta))
        .groupBy("o_custkey")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("total_spend").alias("total_spend"),
            F.max("last_order").alias("last_order"),
        )
    )
    # total_spend stays unrounded: the 9-sig-digit hash normalization
    # absorbs summation-order ulps, while round() would re-introduce
    # engine-specific half-case behavior (see u2_merge_upsert).
    return merged.select("o_custkey", "n_orders", "total_spend", "last_order")


QUERIES = {
    "u2_merge_upsert": u2_merge_upsert,
    "x6_incremental_agg": x6_incremental_agg,
}

ORACLES = {
    "u2_merge_upsert": """
        WITH target AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_orderkey % 7 <> 0
        ),
        source AS (
            SELECT o_orderkey, 'F' AS o_orderstatus,
                   o_totalprice * 1.1 AS o_totalprice
            FROM orders WHERE o_orderkey % 3 = 0
        )
        SELECT coalesce(t.o_orderkey, s.o_orderkey) AS o_orderkey,
               CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus
                    ELSE t.o_orderstatus END AS o_orderstatus,
               CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
                    ELSE t.o_totalprice END AS o_totalprice,
               CASE WHEN t.o_orderkey IS NOT NULL AND s.o_orderkey IS NOT NULL
                         THEN 'updated'
                    WHEN s.o_orderkey IS NOT NULL THEN 'inserted'
                    ELSE 'kept' END AS merge_action
        FROM target t FULL OUTER JOIN source s ON t.o_orderkey = s.o_orderkey
    """,
    # one-pass recompute: equality with the union-of-partials merge is the
    # correctness proof for the incremental path
    "x6_incremental_agg": """
        SELECT o_custkey,
               CAST(count(*) AS BIGINT) AS n_orders,
               sum(o_totalprice) AS total_spend,
               max(o_orderdate) AS last_order
        FROM orders
        GROUP BY o_custkey
    """,
}
