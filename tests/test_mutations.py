"""MERGE INTO semantics on crafted frames (operators/mutations.py).

Pins the ANSI matched/not-matched/not-matched-by-source behavior the
reference's per-row UPDATE loop (bulkupload.py:187-202, 253-261) implies,
expressed set-oriented.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from swiftbulkuploader_spark.operators.mutations import merge_into


def _frames(spark):
    target = spark.createDataFrame(
        [(1, "pending", 10.0), (2, "pending", 20.0), (3, "done", 30.0)],
        "id long, status string, size double",
    )
    source = spark.createDataFrame(
        [(2, "done", 21.0), (4, "pending", 40.0)],
        "id long, status string, size double",
    )
    return target, source


def test_merge_upsert_matched_and_inserted(spark):
    target, source = _frames(spark)
    out = merge_into(
        target, source, key="id", update_cols=["status", "size"],
        action_col="merge_action",
    )
    rows = {r.id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert (rows[1].status, rows[1].merge_action) == ("pending", "kept")
    assert (rows[2].status, rows[2].size, rows[2].merge_action) == ("done", 21.0, "updated")
    assert rows[3].merge_action == "kept"
    assert (rows[4].status, rows[4].merge_action) == ("pending", "inserted")


def test_merge_update_only_and_delete_unmatched(spark):
    target, source = _frames(spark)
    # insert=False: WHEN MATCHED only — id 4 must not appear
    upd = merge_into(target, source, key="id", update_cols=["status"], insert=False)
    assert {r.id for r in upd.collect()} == {1, 2, 3}
    # update_cols=["status"] leaves size at the target value
    assert {r.size for r in upd.filter(F.col("id") == 2).collect()} == {20.0}

    # delete_unmatched: sync target to source — only source keys survive
    sync = merge_into(
        target, source, key="id", update_cols=["status", "size"],
        delete_unmatched=True,
    )
    assert {r.id for r in sync.collect()} == {2, 4}


def test_merge_composite_key(spark):
    target = spark.createDataFrame(
        [(1, "a", 1.0), (1, "b", 2.0)], "k1 long, k2 string, v double"
    )
    source = spark.createDataFrame(
        [(1, "b", 9.0), (2, "a", 5.0)], "k1 long, k2 string, v double"
    )
    for bd in (False, True):
        out = merge_into(target, source, key=["k1", "k2"], update_cols=["v"],
                         action_col="merge_action", broadcast_delta=bd)
        rows = {(r.k1, r.k2): r for r in out.collect()}
        assert rows[(1, "a")].merge_action == "kept", bd
        assert (rows[(1, "b")].v, rows[(1, "b")].merge_action) == (9.0, "updated"), bd
        assert rows[(2, "a")].merge_action == "inserted", bd


def test_merge_broadcast_delta_equivalent_and_shuffle_free(spark):
    """broadcast_delta=True must produce identical rows to the full-outer
    form, with ZERO shuffle exchanges (the target is scanned, never
    repartitioned — the 100 TB nightly-merge plan)."""
    target, source = _frames(spark)
    kwargs = dict(key="id", update_cols=["status", "size"],
                  action_col="merge_action")
    ref = merge_into(target, source, broadcast_delta=False, **kwargs)
    fast = merge_into(target, source, broadcast_delta=True, **kwargs)
    assert sorted(map(tuple, ref.collect())) == sorted(map(tuple, fast.collect()))

    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastHashJoin" in plan

    # delete_unmatched parity between the two forms
    ref_d = merge_into(target, source, broadcast_delta=False,
                       delete_unmatched=True, **kwargs)
    fast_d = merge_into(target, source, broadcast_delta=True,
                        delete_unmatched=True, **kwargs)
    assert sorted(map(tuple, ref_d.collect())) == sorted(map(tuple, fast_d.collect()))


def test_merge_matches_reference_model_randomized(spark):
    """Seeded randomized cross-check: both physical forms of merge_into must
    match a dict-based reference model for every flag combination."""
    import random

    rng = random.Random(20260814)
    for trial in range(3):
        t_keys = rng.sample(range(30), rng.randint(5, 12))
        s_keys = rng.sample(range(30), rng.randint(5, 12))
        target = [(k, rng.randint(0, 5), float(rng.randint(0, 99))) for k in t_keys]
        source = [(k, rng.randint(6, 9), float(rng.randint(100, 199))) for k in s_keys]

        tdf = spark.createDataFrame(target, "id long, status long, size double")
        sdf = spark.createDataFrame(source, "id long, status long, size double")
        tmap, smap = {r[0]: r for r in target}, {r[0]: r for r in source}

        for insert in (True, False):
            for delete_unmatched in (True, False):
                expect = set()
                for k, (kk, st, sz) in tmap.items():
                    if k in smap:
                        expect.add((k, smap[k][1], sz))  # update status only
                    elif not delete_unmatched:
                        expect.add((k, st, sz))
                if insert:
                    expect |= {tuple(smap[k]) for k in smap if k not in tmap}

                for bd in (False, True):
                    got = merge_into(
                        tdf, sdf, key="id", update_cols=["status"],
                        insert=insert, delete_unmatched=delete_unmatched,
                        broadcast_delta=bd,
                    ).collect()
                    assert {tuple(r) for r in got} == expect, (
                        trial, insert, delete_unmatched, bd
                    )
