"""Operator edge-case unit tests (SURVEY.md §5.2.4).

The fixtures contain no NULLs, so these tests inject their own: NULL join
keys, NULL aggregation inputs, empty groups, ties, single-row partitions.
Hand-computable toy inputs, exact expected outputs.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_null_join_keys_never_match(spark):
    left = spark.createDataFrame([(1, "a"), (None, "b")], "k INT, v STRING")
    right = spark.createDataFrame([(1, "x"), (None, "y")], "k INT, w STRING")
    joined = left.join(right, "k")
    assert joined.count() == 1  # NULL keys never equal anything
    outer = left.join(right, "k", "left")
    assert outer.count() == 2  # NULL-key row survives with NULL payload
    assert outer.where(F.col("w").isNull()).count() == 1


def test_aggregates_skip_nulls(spark):
    df = spark.createDataFrame(
        [("g", 1.0), ("g", None), ("g", 3.0), ("h", None)], "g STRING, x DOUBLE"
    )
    out = {
        r["g"]: (r["n_all"], r["n_x"], r["s"], r["m"])
        for r in df.groupBy("g")
        .agg(
            F.count("*").alias("n_all"),
            F.count("x").alias("n_x"),
            F.sum("x").alias("s"),
            F.avg("x").alias("m"),
        )
        .collect()
    }
    assert out["g"] == (3, 2, 4.0, 2.0)  # count(*) counts NULL rows, agg skips
    assert out["h"] == (1, 0, None, None)  # all-NULL group -> NULL sum/avg


def test_count_distinct_ignores_nulls(spark):
    df = spark.createDataFrame([(1,), (1,), (None,), (2,)], "x INT")
    assert df.agg(F.countDistinct("x").alias("n")).collect()[0]["n"] == 2


def test_window_single_row_partition(spark):
    df = spark.createDataFrame([(1, 10.0)], "k INT, v DOUBLE")
    w = Window.partitionBy("k").orderBy("v")
    r = df.select(
        F.row_number().over(w).alias("rn"),
        F.lag("v").over(w).alias("prev"),
        F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("run"),
    ).collect()[0]
    assert (r["rn"], r["prev"], r["run"]) == (1, None, 10.0)


def test_rank_vs_dense_rank_on_ties(spark):
    df = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 2), ("d", 3)], "id STRING, x INT"
    )
    w = Window.orderBy("x")
    got = {
        r["id"]: (r["rnk"], r["drnk"])
        for r in df.select(
            "id", F.rank().over(w).alias("rnk"), F.dense_rank().over(w).alias("drnk")
        ).collect()
    }
    assert got == {"a": (1, 1), "b": (1, 1), "c": (3, 2), "d": (4, 3)}


def test_rollup_null_placeholder_vs_real_null(spark):
    """grouping() distinguishes subtotal NULLs from genuine NULL keys."""
    df = spark.createDataFrame([("x", 1), (None, 2)], "g STRING, v INT")
    rows = (
        df.rollup("g")
        .agg(F.sum("v").alias("s"), F.grouping("g").alias("is_total"))
        .collect()
    )
    by = {(r["g"], r["is_total"]): r["s"] for r in rows}
    assert by[("x", 0)] == 1
    assert by[(None, 0)] == 2  # the real NULL group
    assert by[(None, 1)] == 3  # the rollup total row
    assert len(by) == 3


def test_set_ops_distinct_semantics(spark):
    a = spark.createDataFrame([(1,), (1,), (2,)], "x INT")
    b = spark.createDataFrame([(2,), (3,)], "x INT")
    assert sorted(r["x"] for r in a.intersect(b).collect()) == [2]
    assert sorted(r["x"] for r in a.subtract(b).collect()) == [1]
    assert sorted(r["x"] for r in a.exceptAll(b).collect()) == [1, 1]


def test_dropduplicates_on_key_with_identical_payload(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], "k INT, v STRING")
    out = sorted(tuple(r) for r in df.dropDuplicates(["k"]).collect())
    assert out == [(1, "a"), (2, "b")]


def test_explode_empty_and_null_arrays(spark):
    df = spark.createDataFrame(
        [(1, ["a"]), (2, []), (3, None)], "id INT, arr ARRAY<STRING>"
    )
    assert df.select(F.explode("arr")).count() == 1  # empty+NULL drop rows
    assert df.select(F.explode_outer("arr")).count() == 3  # outer keeps them
    sizes = {r["id"]: r["n"] for r in df.select("id", F.size("arr").alias("n")).collect()}
    assert sizes == {1: 1, 2: 0, 3: None}  # Spark 4: size(NULL) = NULL


def test_udtf_posexplode_equivalence(spark):
    """Table-function surface: posexplode ≡ a UDTF emitting (pos, token)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos INT, tok STRING")
    class Tokenize:
        def eval(self, text: str):
            for i, t in enumerate(text.split(" ")):
                yield i, t

    df = spark.createDataFrame([("a b c",)], "text STRING")
    via_udtf = [(r["pos"], r["tok"]) for r in Tokenize(F.lit("a b c")).collect()]
    via_builtin = [
        (r["pos"], r["tok"])
        for r in df.select(F.posexplode(F.split("text", " ")).alias("pos", "tok")).collect()
    ]
    assert via_udtf == via_builtin == [(0, "a"), (1, "b"), (2, "c")]


def test_udtf_registered_for_sql_lateral(spark):
    """Native Python UDTF registered via spark.udtf.register and invoked
    from SQL — both as a bare table function and in a LATERAL join
    against a real table expression (per-row fan-out, the SQL-surface
    form of the tokenize stage in a document pipeline)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos INT, tok STRING")
    class TokenizeUdtf:
        def eval(self, text: str):
            for i, t in enumerate((text or "").split(" ")):
                if t:
                    yield i, t

    spark.udtf.register("tokenize_udtf", TokenizeUdtf)
    try:
        bare = spark.sql("SELECT pos, tok FROM tokenize_udtf('x y z')").collect()
        assert [(r["pos"], r["tok"]) for r in bare] == [(0, "x"), (1, "y"), (2, "z")]

        lateral = spark.sql(
            """
            SELECT v.id, t.pos, t.tok
            FROM VALUES (1, 'a b'), (2, 'c'), (3, '') AS v(id, s),
                 LATERAL tokenize_udtf(v.s) AS t
            ORDER BY v.id, t.pos
            """
        ).collect()
        assert [(r["id"], r["pos"], r["tok"]) for r in lateral] == [
            (1, 0, "a"),
            (1, 1, "b"),
            (2, 0, "c"),
        ]
    finally:
        spark.sql("DROP TEMPORARY FUNCTION IF EXISTS tokenize_udtf")


def test_session_window_gap_boundary(spark):
    """An event exactly gap after the previous MERGES into the session
    (break is delta > gap, strictly), while gap+1s starts a new one —
    pins the > break predicate used in the q_stream_session oracle."""
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"),
            (2, "2024-01-01 10:30:00"),  # exactly 30 min later -> merges
            (3, "2024-01-01 11:00:01"),  # 30 min + 1 s later   -> new session
        ],
        "id INT, ts_s STRING",
    ).select("id", F.col("ts_s").cast("timestamp").alias("ts"))
    sessions = (
        df.groupBy(F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert sorted(r["n"] for r in sessions) == [1, 2]


def test_cli_list_and_oracle():
    """The CLI's Spark-free paths: list filters by substring, oracle
    prints the registered SQL, unknown names exit non-zero."""
    import contextlib
    import io

    from data_pipeline_etl_spark.__main__ import main

    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        assert main(["list", "q_agg_groupby"]) == 0
    assert "q_agg_groupby" in out.getvalue()
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        assert main(["oracle", "q_agg_groupby"]) == 0
    assert "l_returnflag" in out.getvalue()
    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        assert main(["run", "no_such_query"]) == 2


def _edges_df(spark, undirected_pairs):
    """Bidirectional (src, dst) frame from a list of (a, b) pairs."""
    both = [(a, b) for a, b in undirected_pairs] + [(b, a) for a, b in undirected_pairs]
    return spark.createDataFrame(both, "src LONG, dst LONG")


def test_connected_components_chain_beyond_hop_budget(spark):
    """A 60-node chain (diameter 59) converges well inside the 20-round
    cap because each round is hop + pointer-jump — hop-only propagation
    would need ~59 rounds and previously returned silently-wrong labels.
    """
    from data_pipeline_etl_spark.operators.llm_dedup import _connected_components

    chain = [(i, i + 1) for i in range(100, 160)]  # one component, min id 100
    ring = [(200 + i, 200 + (i + 1) % 5) for i in range(5)]  # second component
    labels = _connected_components(_edges_df(spark, chain + ring))
    got = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    assert got == {**{i: 100 for i in range(100, 161)}, **{200 + i: 200 for i in range(5)}}


def test_connected_components_unconverged_raises(spark):
    """Hitting the round cap before the fixpoint must raise, not return
    partial clusters (VERDICT r6 item 1). A 40-node chain cannot converge
    in a single hop+jump round.
    """
    import pytest

    from data_pipeline_etl_spark.operators.llm_dedup import _connected_components

    chain = [(i, i + 1) for i in range(40)]
    with pytest.raises(RuntimeError, match="did not converge"):
        _connected_components(_edges_df(spark, chain), max_rounds=1)


def test_hll_sketch_merge_tracks_exact_counts(spark):
    """The per-source HLL estimates and the union-merged estimate must
    land within HLL error (<2% at lgK default 12; exact at fixture
    cardinalities well below 2^12) of the true distinct counts — and the
    merged row must equal the estimate over the un-sharded corpus,
    pinning the partial-merge property q_agg_sketch_merge advertises."""
    from data_pipeline_etl_spark.operators.aggregates import q_agg_sketch_merge
    from data_pipeline_etl_spark.sources.tables import table
    from tests.conftest import SF_DIR

    got = {r["source"]: r["approx_docs"] for r in q_agg_sketch_merge(spark, SF_DIR).collect()}
    d = table(spark, SF_DIR, "documents")
    exact = {r["source"]: r["n"] for r in d.groupBy("source").agg(F.countDistinct("doc_id").alias("n")).collect()}
    exact["__all__"] = d.select("doc_id").distinct().count()
    assert set(got) == set(exact)
    for k, n in exact.items():
        assert abs(got[k] - n) <= max(1, int(0.02 * n)), (k, got[k], n)


def test_kll_quantile_rank_error_bound(spark):
    """Every KLL quantile estimate (per group AND the sketch-merged
    __all__ row) must sit within 2x the k=200 normalized rank-error
    bound (~1.65%, doubled for the with-high-probability slack) of the
    exact quantile IN RANK SPACE: the exact rank of the estimated value
    must be within 2*0.0165*n of q*n. Value-space comparison would be
    meaningless on a heavy-tailed price column."""
    from data_pipeline_etl_spark.operators.aggregates import q_agg_kll_quantile
    from data_pipeline_etl_spark.sources.tables import table
    from tests.conftest import SF_DIR

    rows = q_agg_kll_quantile(spark, SF_DIR).collect()
    l = table(spark, SF_DIR, "lineitem")
    assert {r["l_returnflag"] for r in rows} == {"A", "N", "R", "__all__"}
    for r in rows:
        grp = l if r["l_returnflag"] == "__all__" else l.where(
            F.col("l_returnflag") == r["l_returnflag"]
        )
        n = r["n"]
        assert n == grp.count()
        for q in (0.5, 0.9, 0.99):
            est = r[f"p{int(q * 100)}"]
            rank = grp.where(F.col("l_extendedprice") <= est).count()
            assert abs(rank - q * n) <= 2 * 0.0165 * n + 1, (
                r["l_returnflag"], q, est, rank, n,
            )
