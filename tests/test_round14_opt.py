"""Round-14 optimization pins: every restructured operator must stay
bit-for-bit equivalent to its pre-optimization form (the driver
hash-compares query results, so "faster but epsilon-different" is a
REGRESSION — CLAUDE.md rule 3/9)."""
from __future__ import annotations

from pyspark.sql import functions as F

SF_SMOKE = "/root/testdata/sf0.001"


class TestKcenterRunningMinPersist:
    def test_picks_match_stateless_lazy_fold(self, spark):
        """The r14 persisted running-min form must reproduce the former
        stateless lazy-lineage fold EXACTLY (same rounds, same 6-dp
        distances, same tie-breaks): re-run the old algorithm inline on
        the smoke SF and compare every (sel_rank, vec_id, coverage_dist)
        bit-for-bit."""
        from swiftbulkuploader_spark.catalog import load_table
        from swiftbulkuploader_spark.functions.vectors import (
            cosine_similarity,
        )
        from swiftbulkuploader_spark.operators.similarity import (
            KCENTER_K,
            _lit_vec,
            x2_kcenter_select,
        )

        # --- the pre-r14 form, verbatim (lazy lineage, re-folded) ---
        emb = load_table(spark, SF_SMOKE, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        seed = emb.orderBy("vec_id").limit(1).collect()[0]
        picks = [(int(seed["vec_id"]), [float(x) for x in seed["v"]], None)]
        cur = emb
        for r in range(2, KCENTER_K + 1):
            last_id, last_vec, _ = picks[-1]
            d = F.round(
                F.lit(1.0)
                - F.coalesce(
                    cosine_similarity(F.col("v"), _lit_vec(last_vec)),
                    F.lit(-2.0),
                ),
                6,
            )
            cur = cur.filter(F.col("vec_id") != last_id).withColumn(
                "mind", d if r == 2 else F.least(F.col("mind"), d)
            )
            top = cur.orderBy(
                F.col("mind").desc(), F.col("vec_id").asc()
            ).limit(1).collect()[0]
            picks.append(
                (int(top["vec_id"]), [float(x) for x in top["v"]],
                 float(top["mind"]))
            )
        expected = [(i + 1, p[0], p[2]) for i, p in enumerate(picks)]

        got = sorted(
            (int(r["sel_rank"]), int(r["vec_id"]), r["coverage_dist"])
            for r in x2_kcenter_select(spark, SF_SMOKE).collect()
        )
        assert got == sorted(expected)

    def test_no_cached_state_survives_the_call(self, spark):
        """The per-round persists are per-call working state, NOT a
        cross-call memo (the kcenter result-caching line): after the
        call returns, none of this call's running-min frames may remain
        registered in the CacheManager (a `mind` running-min column is
        unique to this query's round frames)."""
        from swiftbulkuploader_spark.operators.similarity import (
            x2_kcenter_select,
        )

        x2_kcenter_select(spark, SF_SMOKE).collect()
        jsc = spark.sparkContext._jsc.sc()
        leftovers = [
            info.name()
            for info in jsc.getRDDStorageInfo()
            if "mind" in (info.name() or "")
        ]
        assert leftovers == []


class TestRandomProjectionExprForm:
    def test_bit_identical_to_column_form(self, spark):
        """The single-parse F.expr emission must produce bit-identical
        coordinates to the former per-element Column construction —
        rebuild the old form inline and compare every double with ==
        (exact, no tolerance)."""
        from swiftbulkuploader_spark.catalog import load_table
        from swiftbulkuploader_spark.operators.similarity import (
            RP_IN_DIM,
            RP_OUT_DIM,
            _achlioptas_entry,
            x2_random_projection,
        )

        emb = load_table(spark, SF_SMOKE, "embeddings")
        v = F.col("embedding").cast("array<double>")
        scale = (3.0 / RP_OUT_DIM) ** 0.5
        outs = []
        for j in range(RP_OUT_DIM):
            term = None
            for i in range(RP_IN_DIM):
                e = _achlioptas_entry(i, j)
                if e == 0:
                    continue
                t = (F.element_at(v, i + 1) if e > 0
                     else -F.element_at(v, i + 1))
                term = t if term is None else term + t
            outs.append(
                ((term if term is not None else F.lit(0.0))
                 * F.lit(scale)).alias(f"p{j}")
            )
        old = {r["vec_id"]: r for r in emb.select("vec_id", *outs).collect()}
        new = {
            r["vec_id"]: r
            for r in x2_random_projection(spark, SF_SMOKE).collect()
        }
        assert set(old) == set(new) and len(old) > 0
        for vid, orow in old.items():
            nrow = new[vid]
            for j in range(RP_OUT_DIM):
                assert orow[f"p{j}"] == nrow[f"p{j}"], (vid, j)


class TestBridgeFragmentsDeltaClosure:
    def test_mixed_graph_matches_full_reclosure(self, spark):
        """A graph exercising every delta-closure path at once — an
        unaffected pure triangle (no bridges: must skip the closure and
        label fragment := component), a mixed component (triangle core +
        pendant bridge: kept edges DO enter the pruned closure), a pure
        path (all edges bridges: shatters to singletons with an EMPTY
        kept-edge set), and a pure pair — compared against hand-computed
        full-closure ground truth."""
        from swiftbulkuploader_spark.operators.components import (
            bridge_fragments_from_edges,
        )

        edges = spark.createDataFrame(
            [
                # pure triangle, no bridges (unaffected component)
                (1, 2), (1, 3), (2, 3),
                # mixed: triangle 7-8-9 + pendant 10 on 7 (7-10 bridge)
                (7, 8), (7, 9), (8, 9), (7, 10),
                # pure path 20-21-22: both edges bridges
                (20, 21), (21, 22),
                # pure pair
                (30, 31),
            ],
            "a long, b long",
        )
        out = {r["component"]: r
               for r in bridge_fragments_from_edges(edges).collect()}
        assert set(out) == {1, 7, 20, 30}

        tri = out[1]
        assert (tri["size_before"], tri["n_bridges"], tri["n_fragments"],
                tri["max_fragment"], tri["splits"]) == (3, 0, 1, 3, False)

        mixed = out[7]
        assert (mixed["size_before"], mixed["n_bridges"],
                mixed["n_fragments"], mixed["max_fragment"],
                mixed["splits"]) == (4, 1, 2, 3, True)

        path = out[20]
        assert (path["size_before"], path["n_bridges"], path["n_fragments"],
                path["max_fragment"], path["splits"]) == (3, 2, 3, 1, True)

        pair = out[30]
        assert (pair["size_before"], pair["n_bridges"], pair["n_fragments"],
                pair["max_fragment"], pair["splits"]) == (2, 1, 2, 1, True)

    def test_empty_affected_kept_set_skips_closure(self, spark):
        """The isEmpty() fast path: every bridge-containing component is
        PURE bridges (no kept edge), so the pruned closure input is empty
        and the skip branch must emit fragment := node for every affected
        node — a pure pair and a pure 3-path (all edges bridges) next to
        an untouched triangle (kept edges, but NOT in a bridge
        component, so they must not resurrect the closure)."""
        from swiftbulkuploader_spark.operators.components import (
            bridge_fragments_from_edges,
        )

        edges = spark.createDataFrame(
            [
                (1, 2), (1, 3), (2, 3),   # pure triangle, no bridges
                (20, 21), (21, 22),        # pure path: both edges bridges
                (30, 31),                  # pure pair
            ],
            "a long, b long",
        )
        out = {r["component"]: r
               for r in bridge_fragments_from_edges(edges).collect()}
        assert set(out) == {1, 20, 30}
        assert (out[1]["n_fragments"], out[1]["splits"]) == (1, False)
        path = out[20]
        assert (path["size_before"], path["n_bridges"], path["n_fragments"],
                path["max_fragment"], path["splits"]) == (3, 2, 3, 1, True)
        pair = out[30]
        assert (pair["size_before"], pair["n_bridges"], pair["n_fragments"],
                pair["max_fragment"], pair["splits"]) == (2, 1, 2, 1, True)
