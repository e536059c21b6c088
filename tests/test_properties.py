"""Property-based invariants (SURVEY.md §5.2.6, hypothesis).

Small generated tables -> structural invariants that must hold for any
input: rollup/cube row-count algebra, Jaccard symmetry/idempotence, dedup
idempotence, window rank bounds, set-op cardinalities.

One shared strategy note: Spark job latency dominates, so examples are
kept few (max_examples=5-8) and tables tiny — the value is in the shape
coverage (duplicates, empty partitions, single groups), not volume.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.sampled_from(["x", "y"]),
        st.integers(min_value=-100, max_value=100),
    ),
    min_size=1,
    max_size=25,
)


@given(rows=rows_strategy)
@SETTINGS
def test_rollup_row_algebra(spark, rows):
    """|rollup(g1,g2)| = |group(g1,g2)| + |group(g1)| + 1."""
    df = spark.createDataFrame(rows, "g1 STRING, g2 STRING, v INT")
    n_full = df.groupBy("g1", "g2").count().count()
    n_g1 = df.groupBy("g1").count().count()
    n_rollup = df.rollup("g1", "g2").count().count()
    assert n_rollup == n_full + n_g1 + 1


@given(rows=rows_strategy)
@SETTINGS
def test_cube_row_algebra(spark, rows):
    df = spark.createDataFrame(rows, "g1 STRING, g2 STRING, v INT")
    n_full = df.groupBy("g1", "g2").count().count()
    n_g1 = df.groupBy("g1").count().count()
    n_g2 = df.groupBy("g2").count().count()
    n_cube = df.cube("g1", "g2").count().count()
    assert n_cube == n_full + n_g1 + n_g2 + 1


@given(rows=rows_strategy)
@SETTINGS
def test_dedup_idempotent(spark, rows):
    df = spark.createDataFrame(rows, "g1 STRING, g2 STRING, v INT")
    once = df.dropDuplicates()
    twice = once.dropDuplicates()
    assert once.count() == twice.count()
    assert once.subtract(twice).count() == 0


@given(rows=rows_strategy)
@SETTINGS
def test_row_number_is_dense_permutation(spark, rows):
    df = spark.createDataFrame(rows, "g1 STRING, g2 STRING, v INT")
    w = Window.partitionBy("g1").orderBy("v", "g2")
    rn = df.withColumn("rn", F.row_number().over(w))
    per_group = rn.groupBy("g1").agg(
        F.count("*").alias("n"), F.max("rn").alias("mx"), F.min("rn").alias("mn")
    )
    for r in per_group.collect():
        assert r["mn"] == 1 and r["mx"] == r["n"]


@given(
    texts=st.lists(
        st.lists(st.sampled_from(["t0", "t1", "t2", "t3", "t4"]), min_size=1, max_size=6),
        min_size=2,
        max_size=8,
    )
)
@SETTINGS
def test_jaccard_symmetric_and_bounded(spark, texts):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    sets = df.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("s")
    )
    a, b = sets.alias("a"), sets.alias("b")
    inter = F.size(F.array_intersect(F.col("a.s"), F.col("b.s")))
    union = F.size(F.col("a.s")) + F.size(F.col("b.s")) - inter
    pairs = (
        a.join(b, F.col("a.doc_id") != F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("da"),
            F.col("b.doc_id").alias("db"),
            (inter / union).alias("j"),
        )
        .collect()
    )
    seen = {(r["da"], r["db"]): r["j"] for r in pairs}
    for (da, db), j in seen.items():
        assert 0.0 <= j <= 1.0
        assert math.isclose(j, seen[(db, da)])  # symmetry


@given(rows=rows_strategy)
@SETTINGS
def test_exceptall_cardinality(spark, rows):
    df = spark.createDataFrame(rows, "g1 STRING, g2 STRING, v INT")
    half = df.limit(max(1, len(rows) // 2))
    assert df.exceptAll(half).count() == df.count() - half.count()


_ALPH = "ab"  # tiny alphabet maximizes accidental shingle collisions — good stress


@given(
    shared=st.text(alphabet=_ALPH, min_size=11, max_size=16),  # >= k + w - 1 = 11
    pre_a=st.text(alphabet=_ALPH, min_size=0, max_size=10),
    suf_a=st.text(alphabet=_ALPH, min_size=0, max_size=10),
    pre_b=st.text(alphabet=_ALPH, min_size=0, max_size=10),
    suf_b=st.text(alphabet=_ALPH, min_size=0, max_size=10),
)
@SETTINGS
def test_winnow_shared_substring_guarantee(spark, shared, pre_a, suf_a, pre_b, suf_b):
    """Schleimer et al.: docs sharing a substring of length >= k+w-1
    (= 11 for k=8, w=4) share at least one winnowing fingerprint."""
    from data_pipeline_etl_spark.operators.llm_text import winnow_fingerprints

    df = spark.createDataFrame(
        [(0, pre_a + shared + suf_a), (1, pre_b + shared + suf_b)],
        "doc_id INT, text STRING",
    )
    fp = winnow_fingerprints(df).collect()
    a = {r["h"] for r in fp if r["doc_id"] == 0}
    b = {r["h"] for r in fp if r["doc_id"] == 1}
    assert a & b, "no shared fingerprint despite shared substring"


@given(
    texts=st.lists(
        st.lists(st.sampled_from(["t0", "t1", "t2"]), min_size=1, max_size=4),
        min_size=2,
        max_size=8,
    )
)
@SETTINGS
def test_minhash_identical_sets_share_all_bands(spark, texts):
    """Docs with identical distinct-token sets get identical signatures
    (hence collide in every LSH band); signature components are minima,
    so any doc's signature is stable under token repetition."""
    from data_pipeline_etl_spark.operators.llm_dedup import _MINHASH_K, _minhash_sig

    rows = []
    for i, toks in enumerate(texts):
        rows.append((2 * i, " ".join(toks)))          # original
        rows.append((2 * i + 1, " ".join(toks + toks)))  # repeated tokens
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    sigs = {r["doc_id"]: tuple(r[f"mh{j}"] for j in range(_MINHASH_K))
            for r in _minhash_sig(df).collect()}
    for i in range(len(texts)):
        assert sigs[2 * i] == sigs[2 * i + 1]


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["p q", "q r", "r s"]), st.integers(1, 500)),
        min_size=2,
        max_size=12,
    )
)
@SETTINGS
def test_survivorship_exactly_one_keeper_per_group(spark, rows):
    """Every multi-member duplicate group keeps exactly one doc, and
    group_size equals the member count."""
    df = spark.createDataFrame(
        [(i, t, n) for i, (t, n) in enumerate(rows)],
        "doc_id INT, text STRING, n_chars INT",
    )
    fp = F.md5(F.array_join(F.sort_array(F.array_distinct(F.split("text", " "))), " "))
    base = df.select("doc_id", "n_chars", fp.alias("content_hash"))
    w = Window.partitionBy("content_hash")
    ranked = base.select(
        "doc_id",
        "content_hash",
        F.row_number().over(w.orderBy(F.desc("n_chars"), F.asc("doc_id"))).alias("rn"),
        F.count("*").over(w).alias("group_size"),
    ).where(F.col("group_size") > 1)
    out = ranked.collect()
    by_hash: dict[str, list] = {}
    for r in out:
        by_hash.setdefault(r["content_hash"], []).append(r)
    for h, members in by_hash.items():
        keeps = [m for m in members if m["rn"] == 1]
        assert len(keeps) == 1, h
        assert all(m["group_size"] == len(members) for m in members)


@given(
    vecs=st.lists(
        st.lists(st.floats(-1.0, 1.0, allow_nan=False, width=32), min_size=8, max_size=8),
        min_size=1,
        max_size=4,
    )
)
@SETTINGS
def test_hyperplane_lsh_exact_duplicates_collide_everywhere(spark, vecs):
    """An exact copy of a vector produces the SAME sign bit against every
    hyperplane, hence identical band signatures — so exact-duplicate
    embeddings are always LSH candidates (recall = 1 for exact dups, the
    floor any near-dup blocking scheme must guarantee)."""
    from data_pipeline_etl_spark.operators.llm_similarity import (
        _LSH_BANDS,
        _LSH_PLANES,
        _LSH_ROWS,
        _PLANE_SQL,
    )

    rows = []
    for i, v in enumerate(vecs):
        rows.append((2 * i, v))
        rows.append((2 * i + 1, list(v)))  # exact duplicate
    df = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<FLOAT>")
    bits = F.expr(
        f"transform(sequence(0, {_LSH_PLANES - 1}), j -> "
        f"CASE WHEN aggregate(sequence(1, size(embedding)), CAST(0 AS DOUBLE), "
        f"(acc, i) -> acc + CAST(element_at(embedding, i) AS DOUBLE) * {_PLANE_SQL}"
        f") >= 0 THEN 1 ELSE 0 END)"
    )
    bands = F.expr(
        f"transform(sequence(0, {_LSH_BANDS - 1}), k -> "
        f"aggregate(sequence(1, {_LSH_ROWS}), 0, "
        f"(acc, t) -> acc * 2 + element_at(bits, {_LSH_ROWS} * k + t)))"
    )
    sigs = {
        r["vec_id"]: tuple(r["bands"])
        for r in df.withColumn("bits", bits).select("vec_id", bands.alias("bands")).collect()
    }
    for i in range(len(vecs)):
        assert sigs[2 * i] == sigs[2 * i + 1]
        assert len(sigs[2 * i]) == _LSH_BANDS


def test_minhash_lsh_candidate_recall(spark):
    """The banded-MinHash candidate set (q_dedup_lsh_candidates) must
    recover >= 90% of the exact Jaccard >= 0.8 pairs (q_sim_jaccard).

    Theory: P(candidate | jaccard s) = 1-(1-s^r)^b; the 4-band x 3-row
    config gives 0.943 at the s=0.8 decision threshold and more above
    it — measured 0.985 at sf0.01 / 0.977 at sf0.1 (SCALE.md). A config
    regression that silently under-recalls (the old 2x4 bands measured
    0.865) fails here.
    """
    from data_pipeline_etl_spark.registry import QUERIES, load_all_operators

    load_all_operators()
    true_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["q_sim_jaccard"](spark, SF_DIR).collect()
    }
    cand_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["q_dedup_lsh_candidates"](spark, SF_DIR).collect()
    }
    assert true_pairs, "truth set unexpectedly empty — fixture changed?"
    recall = len(true_pairs & cand_pairs) / len(true_pairs)
    assert recall >= 0.9, f"LSH candidate recall {recall:.3f} < 0.9"


def test_kl_nonnegative_and_zero_for_whole_corpus(spark):
    """Gibbs' inequality: KL(P_lang || Q_corpus) >= 0 for every slice,
    with equality only when the slice distribution equals the corpus's.
    Runs on the real fixture — the invariant must hold for ANY corpus."""
    from data_pipeline_etl_spark.registry import QUERIES, load_all_operators

    load_all_operators()
    rows = QUERIES["q_text_kl"](spark, SF_DIR).collect()
    assert rows, "KL query returned no slices"
    for r in rows:
        assert r["kl"] >= 0.0, (r["lang"], r["kl"])


def test_zipf_slope_negative(spark):
    """Frequency is non-increasing in rank by construction, so the OLS
    log-log slope must be <= 0 for any corpus with >= 2 vocab items."""
    from data_pipeline_etl_spark.registry import QUERIES, load_all_operators

    load_all_operators()
    rows = QUERIES["q_text_zipf"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        if r["n_vocab"] >= 2:
            assert r["zipf_slope"] <= 0.0, (r["lang"], r["zipf_slope"])


def test_contamination_bounds_and_planted_dup(spark):
    """contam_frac in [0,1] on the fixture; a benchmark text planted
    verbatim in the corpus must score exactly 1.0 (its every bigram
    occurs elsewhere) — the guarantee decontamination relies on."""
    from data_pipeline_etl_spark.operators.llm_corpus import q_contamination
    from data_pipeline_etl_spark.registry import load_all_operators

    load_all_operators()
    for r in q_contamination(spark, SF_DIR).collect():
        assert 0.0 <= r["contam_frac"] <= 1.0

    import tempfile, os
    from pyspark.sql import functions as _F

    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    planted_text = base.where(_F.col("source") == "src0").orderBy("doc_id").first()["text"]
    extra = spark.createDataFrame(
        [(999_999, planted_text, "en", "src5", len(planted_text))],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    with tempfile.TemporaryDirectory() as tmp:
        aug = os.path.join(tmp, "aug")
        base.select("doc_id", "text", "lang", "source", "n_chars").unionByName(
            extra
        ).write.parquet(os.path.join(aug, "documents.parquet"))
        planted_id = base.where(_F.col("source") == "src0").orderBy("doc_id").first()["doc_id"]
        scores = {r["doc_id"]: r["contam_frac"] for r in q_contamination(spark, aug).collect()}
        assert scores[planted_id] == 1.0, scores.get(planted_id)


def test_hyperplane_bits_pandas_bitexact(spark):
    """The vectorized (numpy/Arrow) hyperplane-bit path must produce
    bit-identical signs to the interpreted SQL fold for every fixture
    vector — the guarantee that lets a cluster run swap it in without
    re-validating parity. Accumulation order is dimension-sequential on
    both paths, so every float64 partial sum matches, not just signs."""
    from data_pipeline_etl_spark.operators.llm_similarity import (
        _LSH_PLANES,
        _PLANE_SQL,
        hyperplane_bits_pandas,
    )
    from data_pipeline_etl_spark.sources.tables import table

    emb = table(spark, SF_DIR, "embeddings")
    sql_bits = emb.select(
        "vec_id",
        F.expr(
            f"transform(sequence(0, {_LSH_PLANES - 1}), j -> "
            f"CASE WHEN aggregate(sequence(1, size(embedding)), CAST(0 AS DOUBLE), "
            f"(acc, i) -> acc + CAST(element_at(embedding, i) AS DOUBLE) * {_PLANE_SQL}"
            f") >= 0 THEN 1 ELSE 0 END)"
        ).alias("bits"),
    )
    a = {r["vec_id"]: list(r["bits"]) for r in sql_bits.collect()}
    b = {r["vec_id"]: list(r["bits"]) for r in hyperplane_bits_pandas(emb).collect()}
    assert a == b


def test_hyperplane_lsh_planted_neardup_recall(spark):
    """Planted-pair recall for the random-hyperplane bands: the fixture's
    embeddings contain NO true near-duplicates (max pairwise cosine
    0.512 at sf0.01), so q_sim_neardup's recall claim cannot be measured
    against fixture truth — it is carried by this planted-pair property
    instead. Each fixture vector gets a perturbed copy at cosine ~0.98
    (theta ~ 0.2 rad); theory for 4 bands x 8 bits gives
    P(candidate) = 1-(1-(1-theta/pi)^8)^4 ~ 0.97 per pair, so the banded
    candidates must recover >= 90% of the 500 planted pairs. A band
    reconfiguration that silently under-recalls near-dups fails here.
    """
    import numpy as np
    import pandas as pd

    from data_pipeline_etl_spark.operators.llm_similarity import (
        band_candidate_pairs_for,
    )
    from data_pipeline_etl_spark.sources.tables import table

    pdf = table(spark, SF_DIR, "embeddings").select("vec_id", "embedding").toPandas()
    rng = np.random.default_rng(7)  # deterministic planting
    planted_rows = []
    offset = 1_000_000
    for vec_id, emb in zip(pdf["vec_id"], pdf["embedding"]):
        v = np.asarray(emb, dtype=np.float64)
        nv = np.linalg.norm(v)
        noise = rng.standard_normal(v.shape)
        noise -= (noise @ v) / (nv * nv) * v  # orthogonal component only
        noise *= (nv * np.tan(0.2)) / np.linalg.norm(noise)  # theta = 0.2 rad
        planted_rows.append(
            (int(vec_id) + offset, [float(x) for x in (v + noise)])
        )
    both = pd.concat(
        [
            pdf.assign(embedding=[[float(x) for x in e] for e in pdf["embedding"]]),
            pd.DataFrame(planted_rows, columns=["vec_id", "embedding"]),
        ]
    )
    df = spark.createDataFrame(both, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    cand = {
        (r["a"], r["b"]) for r in band_candidate_pairs_for(df.repartition(8)).collect()
    }
    planted = {(int(v), int(v) + offset) for v in pdf["vec_id"]}
    recall = len(planted & cand) / len(planted)
    assert recall >= 0.9, f"planted near-dup recall {recall:.3f} < 0.9"


def test_results_invariant_under_shuffle_partitioning(spark):
    """Declared results must not depend on the physical partition count
    (the knob every cluster sizes differently): representative queries
    from the agg/window/dedup/top-k families produce identical multisets
    at spark.sql.shuffle.partitions = 32 (session default) and 7.
    q_sample is the documented exception (Bernoulli sampling is
    split-dependent by design — tests/test_rows_only.py pins its
    same-split determinism instead)."""
    from data_pipeline_etl_spark.registry import QUERIES, load_all_operators

    load_all_operators()
    names = [
        "q_agg_groupby",
        "q_dedup_exact",
        "q_win_gaps_islands",
        "q_sample_weighted",
        # r13: the exact-int power iteration must be partition-count-free
        # by construction (integer matvec has no fold order), and the
        # curriculum's two-level prefix scan must produce the same total
        # order however the range windows are distributed
        "q_embed_pca",
        "q_mix_curriculum",
        "q_corpus_report",
        # r14: the deflated+reorthogonalized second ladder inherits the
        # same exact-int invariance (projection inner product is an
        # exact DECIMAL(38,0) sum, no fold order); fertility's broadcast
        # count-join and the 2-D projection's per-row sequential fold
        # must likewise be split-free
        "q_embed_pca2",
        "q_text_bpe_fertility",
        "q_embed_pca_project2",
        # r15: split/mixture assignments are pure md5 functions of the
        # CC cluster label, and the label fixpoint (min over a
        # component) has no fold order — all three must be split-free
        # (incremental's match is a min over matched store ids)
        "q_split_leakage_safe",
        "q_mix_dedup_aware",
        "q_split_incremental",
        "q_dedup_cluster_stats",
        # r16: the token-budget prefix scan's keep set is a pure
        # function of (md5 order, exact integer cumsum) — the hex
        # sub-bucketing must not leak into the result however the
        # (source, hex) windows are distributed
        "q_mix_token_budget",
    ]

    from data_pipeline_etl_spark.operators.materialized import uncached

    def run_all():
        # fresh builds on BOTH settings — the session cache would hand
        # the second run the first run's frames and the invariance pin
        # would be vacuous for the cached families (r16)
        with uncached():
            return {
                n: sorted(tuple(str(v) for v in r) for r in QUERIES[n](spark, SF_DIR).collect())
                for n in names
            }

    default = run_all()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        alt = run_all()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert default == alt


def test_kmeans_lloyd_wcss_monotone(spark):
    """Lloyd's algorithm guarantees the within-cluster sum of squares
    never increases across iterations — the invariant that makes the
    IVF centroid training pass (kmeans_lloyd) trustworthy on any
    corpus. Centroid means are float32-rounded per iteration (matching
    the embedding dtype), so allow a 1e-6 relative slack."""
    from data_pipeline_etl_spark.operators.llm_similarity import kmeans_lloyd
    from data_pipeline_etl_spark.sources.tables import table

    emb = table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    cents, wcss = kmeans_lloyd(emb, k=8, iters=4)
    assert len(wcss) == 4 and all(v > 0 for v in wcss)
    for a, b in zip(wcss, wcss[1:]):
        assert b <= a * (1 + 1e-6), wcss
    # strictly improved over the seed assignment (real movement, not a no-op)
    assert wcss[-1] < wcss[0]
    rows = cents.collect()
    assert len(rows) == 8
    assert all(len(r["c"]) == 64 for r in rows)


def _ref_substring_spans(docs, k=8):
    """Brute-force reference for q_dedup_substring: per doc, merge
    cross-doc duplicated k-gram positions whose coverage windows touch
    (gap <= k-1) into maximal spans."""
    gram_docs: dict = {}
    toks = {i: t.split(" ") for i, t in docs}
    for i, ts in toks.items():
        for p in range(len(ts) - k + 1):
            gram_docs.setdefault(tuple(ts[p : p + k]), set()).add(i)
    out = {}
    for i, ts in toks.items():
        hits = [
            p
            for p in range(len(ts) - k + 1)
            if len(gram_docs[tuple(ts[p : p + k])]) > 1
        ]
        if not hits:
            continue
        spans = []
        start = prev = hits[0]
        for p in hits[1:]:
            if p - prev <= k - 1:
                prev = p
            else:
                spans.append((start, prev))
                start = prev = p
        spans.append((start, prev))
        lens = [e - s + k for s, e in spans]
        out[i] = (len(spans), max(lens), round(sum(lens) / len(ts), 6))
    return out


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b"]), min_size=4, max_size=24).map(
            " ".join
        ),
        min_size=2,
        max_size=4,
    )
)
@SETTINGS
def test_substring_spans_match_bruteforce(spark, tmp_path_factory, docs):
    """q_dedup_substring output equals a brute-force Python reference on
    random binary-alphabet docs (2^8 = 256 possible 8-grams, so cross-doc
    collisions occur naturally; docs shorter than k must drop out)."""
    from data_pipeline_etl_spark.registry import QUERIES, load_all_operators

    load_all_operators()
    sf = str(tmp_path_factory.mktemp("spans"))
    rows = [(int(i), t, "en", "src0", len(t)) for i, t in enumerate(docs)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    got = {
        r["doc_id"]: (r["n_spans"], r["max_span"], r["dup_frac"])
        for r in QUERIES["q_dedup_substring"](spark, sf).collect()
    }
    assert got == _ref_substring_spans(list(enumerate(docs)))


def test_join_interval_matches_bruteforce(spark, tmp_path):
    """Seeded-random intervals across parts, checked against a plain
    O(n^2) Python reference: bucketization + in-bucket expansion +
    distinct must reproduce exactly the brute-force overlap pairs —
    including intervals that straddle fortnight boundaries and pairs
    co-bucketed twice."""
    import random
    from datetime import date, timedelta

    rng = random.Random(20260814)
    rows = []
    ok = 0
    for pk in range(1, 6):
        for _ in range(rng.randint(5, 14)):
            ok += 1
            qty = float(rng.randint(30, 50))
            ship = date(2024, 1, 1) + timedelta(days=rng.randint(0, 60))
            rows.append((ok, pk, 1, qty, ship))
    sf = str(tmp_path / "prop_iv")
    spark.createDataFrame(
        [(o, p, l, q, str(s)) for o, p, l, q, s in rows],
        "l_orderkey long, l_partkey long, l_linenumber int, "
        "l_quantity double, l_shipdate string",
    ).selectExpr(
        "l_orderkey", "l_partkey", "l_linenumber", "l_quantity",
        "CAST(l_shipdate AS TIMESTAMP) AS l_shipdate",
    ).write.parquet(f"{sf}/lineitem.parquet")

    expected = {}
    for i, (ok_a, pk_a, _, q_a, s_a) in enumerate(rows):
        r_a = s_a + timedelta(days=int(q_a) % 14 + 1)
        for ok_b, pk_b, _, q_b, s_b in rows[i + 1:]:
            if pk_a != pk_b:
                continue
            r_b = s_b + timedelta(days=int(q_b) % 14 + 1)
            if s_a <= r_b and s_b <= r_a:
                ov = (min(r_a, r_b) - max(s_a, s_b)).days + 1
                n, mx = expected.get(pk_a, (0, 0))
                expected[pk_a] = (n + 1, max(mx, ov))

    from data_pipeline_etl_spark.registry import QUERIES
    got = {
        r.l_partkey: (r.n_pairs, r.max_overlap_days)
        for r in QUERIES["q_join_interval"](spark, sf).collect()
    }
    assert got == expected


@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # orders per customer proxy
            st.integers(min_value=1, max_value=5),
        ),
        min_size=1,
        max_size=15,
    )
)
@SETTINGS
def test_skyline_matches_bruteforce_pareto(spark, tmp_path_factory, pts):
    """q_skyline == the O(n²) Pareto definition on arbitrary point sets:
    keep p iff no q has spend >= p.spend AND orders >= p.orders with one
    strict. Customers are synthesized so customer k has pts[k][1] orders
    of a price that lands spend at pts[k][0] dollars total."""
    rows = []
    ok = 1
    for ck, (spend, n) in enumerate(pts):
        per = spend * 100 // n / 100.0  # cents-exact per-order price
        rem = round(spend * 100 - round(per * 100) * (n - 1))
        for i in range(n - 1):
            rows.append((ok, ck, "O", per, "2024-01-01", "1-URGENT")); ok += 1
        rows.append((ok, ck, "O", rem / 100.0, "2024-01-01", "1-URGENT")); ok += 1
    sf = str(tmp_path_factory.mktemp("prop_skyline"))
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(f"{sf}/orders.parquet")
    from data_pipeline_etl_spark.registry import QUERIES, load_all_operators

    load_all_operators()
    got = {
        r["o_custkey"]: (r["spend_cents"], r["n_orders"])
        for r in QUERIES["q_skyline"](spark, sf).collect()
    }
    all_pts = {ck: (spend * 100, n) for ck, (spend, n) in enumerate(pts)}
    expected = {
        ck
        for ck, (s, n) in all_pts.items()
        if not any(
            (s2 >= s and n2 >= n and (s2 > s or n2 > n))
            for ck2, (s2, n2) in all_pts.items()
            if ck2 != ck
        )
    }
    assert set(got) == expected, (got, all_pts)
    for ck in expected:
        assert got[ck] == all_pts[ck]


@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),  # user
            st.integers(min_value=0, max_value=40),  # hour offset over ~2 days
        ),
        min_size=1,
        max_size=20,
    )
)
@SETTINGS
def test_concurrency_matches_bruteforce_sweep(spark, tmp_path_factory, evs):
    """q_time_concurrency == the O(n²) definition at every boundary:
    n_active(t) = #(user,day) intervals with start <= t <= end, where
    the interval is that user's [min ts, max ts] within the day."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, (base + datetime.timedelta(hours=h)).strftime("%Y-%m-%d %H:%M:%S"), u,
         "view", 1.0)
        for i, (u, h) in enumerate(evs)
    ]
    sf = str(tmp_path_factory.mktemp("prop_conc"))
    from tests.test_planted_ops import _write_events

    _write_events(spark, sf, rows)
    from data_pipeline_etl_spark.registry import QUERIES, load_all_operators

    load_all_operators()
    got = {
        r["t"]: r["n_active"]
        for r in QUERIES["q_time_concurrency"](spark, sf).collect()
    }
    ivals = {}
    for u, h in evs:
        t = base + datetime.timedelta(hours=h)
        key = (u, t.date())
        s, e = ivals.get(key, (t, t))
        ivals[key] = (min(s, t), max(e, t))
    bounds = {t for s, e in ivals.values() for t in (s, e)}
    assert set(got) == bounds
    for t in bounds:
        expect = sum(1 for s, e in ivals.values() if s <= t <= e)
        assert got[t] == expect, (t, got[t], expect)


@given(
    texts=st.lists(
        st.lists(st.sampled_from(["t0", "t1", "t2", "t3"]), min_size=1, max_size=4),
        min_size=1,
        max_size=6,
    )
)
@SETTINGS
def test_store_compact_matches_bruteforce(spark, texts):
    """Bucket-min survivorship must agree with the brute-force rule on
    any corpus: a doc is evicted iff SOME earlier doc IN THE SAME
    (lang, source) BLOCK shares a (band_idx, band_key) bucket, and its
    blocker is the SMALLEST such doc — verified against a direct
    pairwise Python reference (no bucket-min shortcut), including
    origin tagging by the max/2 cut. Docs alternate between two lang
    blocks, so identical texts land in BOTH blocks and a regression
    that drops the block key from the bucket join (cross-block
    eviction) fails here."""
    import hashlib

    from data_pipeline_etl_spark.operators.llm_dedup import (
        _MINHASH_BAND,
        _MINHASH_K,
        store_compact_for,
    )

    ids = [3 + 10 * i for i in range(len(texts))]
    langs = ["en" if i % 2 == 0 else "de" for i in range(len(texts))]
    df = spark.createDataFrame(
        [(d, " ".join(t), lg, "s0") for d, t, lg in zip(ids, texts, langs)],
        "doc_id LONG, text STRING, lang STRING, source STRING",
    )
    out = {
        r["doc_id"]: (r["origin"], r["status"], r["blocker_id"])
        for r in store_compact_for(df).collect()
    }

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    def bands(toks):
        mhs = [min(md5(f"{i}:{t}") for t in set(toks)) for i in range(_MINHASH_K)]
        nb = _MINHASH_K // _MINHASH_BAND
        return {
            (b, md5("".join(mhs[b * _MINHASH_BAND:(b + 1) * _MINHASH_BAND])))
            for b in range(nb)
        }

    bk = {d: bands(t) for d, t in zip(ids, texts)}
    blk = dict(zip(ids, langs))
    cut = max(ids) / 2
    expected = {}
    for d in ids:
        coll = [e for e in ids if e < d and blk[e] == blk[d] and bk[e] & bk[d]]
        expected[d] = (
            "store" if d < cut else "delta",
            "evicted" if coll else "kept",
            min(coll) if coll else None,
        )
    assert out == expected


@given(
    vocab=st.dictionaries(
        keys=st.text(alphabet="abt", min_size=1, max_size=6),
        values=st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=10,
    )
)
@SETTINGS
def test_bpe_train_matches_bruteforce(spark, vocab):
    """The k-round trainer must agree with a direct Python Sennrich
    reference (explicit token lists, no string-replace shortcut) on any
    (word, freq) vocab: same argmax each round under the (n DESC, a, b)
    tie-break, same greedy left-to-right non-overlapping merge
    application, and the same early stop when the vocab fuses before k.
    The tight 'abt' alphabet makes multi-char symbols share prefixes/
    suffixes constantly, so a separator-discipline regression in
    _bpe_merge (binding 'ta b' while merging (a, b)) diverges within a
    round or two."""
    from data_pipeline_etl_spark.operators.llm_text import bpe_train_for

    K = 4
    seqs = {w: list(w) for w in vocab}
    expected = []
    for _ in range(K):
        counts: dict[tuple, int] = {}
        for w, f in vocab.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        n = max(counts.values())
        a, b = min(p for p, c in counts.items() if c == n)
        expected.append((a, b, n))
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out

    df = spark.createDataFrame(list(vocab.items()), "w STRING, freq LONG")
    got = [
        (r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_train_for(df, K).orderBy("merge_rank").collect()
    ]
    assert got == expected


@given(
    docs=st.lists(
        st.lists(
            st.text(alphabet="abt", min_size=1, max_size=6),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=4,
    )
)
@SETTINGS
def test_bpe_encode_matches_bruteforce(spark, docs):
    """Per-document encoding must agree with a direct Python reference
    end-to-end on any corpus: same corpus vocabulary, same k=4 merge
    trajectory (apply semantics — the sentinel makes exhausted rounds
    no-ops, which the reference models by stopping at empty pair
    counts), same greedy left-to-right tokenization, same dense
    lexicographic token ids, and the same per-doc counts + head-id
    string in exact document word order. The tight 'abt' alphabet keeps
    multi-char symbols colliding so a merge- or id-ordering bug
    diverges within an example or two."""
    from collections import Counter

    from data_pipeline_etl_spark.operators.llm_text import bpe_encode_for

    K = 4
    vocab = Counter(w for ws in docs for w in ws)
    seqs = {w: list(w) for w in vocab}
    for _ in range(K):
        counts: dict[tuple, int] = {}
        for w, f in vocab.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        n = max(counts.values())
        a, b = min(p for p, c in counts.items() if c == n)
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    tid = {t: i + 1 for i, t in enumerate(sorted({t for s in seqs.values() for t in s}))}
    expected = {}
    for d, ws in enumerate(docs):
        ids = [tid[t] for w in ws for t in seqs[w]]
        expected[d] = (
            len(ws),
            sum(len(w) for w in ws),
            len(ids),
            ",".join(str(i) for i in ids[:10]),
        )

    frame = spark.createDataFrame(
        [(d, " ".join(ws)) for d, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_words"], r["n_chars"], r["n_tokens"], r["head_ids"])
        for r in bpe_encode_for(frame, K).collect()
    }
    assert got == expected


@given(
    docs=st.lists(
        st.lists(
            st.text(alphabet="abt", min_size=1, max_size=6),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=4,
    )
)
@SETTINGS
def test_bpe_decode_roundtrip(spark, docs):
    """The tokenizer-family losslessness law on any corpus:
    decode(encode(x)) == normalize(x) — every document must come back
    'ok' with head_text equal to the (already-normalized) input's
    40-char head, n_chars equal to the input's non-space length, and
    n_tokens matching the same brute-force Sennrich reference the
    encode property pins (so a token over- or under-split cannot hide
    behind a string that still happens to reassemble). The tight 'abt'
    alphabet keeps merged symbols colliding at word boundaries, where
    a reassembly-order or separator bug would corrupt the roundtrip."""
    from collections import Counter

    from data_pipeline_etl_spark.operators.llm_text import bpe_decode_for

    K = 4
    vocab = Counter(w for ws in docs for w in ws)
    seqs = {w: list(w) for w in vocab}
    for _ in range(K):
        counts: dict[tuple, int] = {}
        for w, f in vocab.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        n = max(counts.values())
        a, b = min(p for p, c in counts.items() if c == n)
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out

    frame = spark.createDataFrame(
        [(d, " ".join(ws)) for d, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_chars"], r["head_text"], r["roundtrip"])
        for r in bpe_decode_for(frame, K).collect()
    }
    expected = {
        d: (
            sum(len(seqs[w]) for w in ws),
            sum(len(w) for w in ws),
            " ".join(ws)[:40],
            "ok",
        )
        for d, ws in enumerate(docs)
    }
    assert got == expected


def test_embed_pca_repeat_run_bit_identical(spark):
    """Regression pin for the power-iteration determinism design: the
    first draft iterated on 6-dp-rounded DOUBLES and produced three
    distinct results in five runs of the same plan (v0 = 1/sqrt(64) is
    exactly binary and covariance sits on the 1e-6 decimal grid, so
    ~1/8 of matvec sums landed exactly on decimal rounding
    half-boundaries where float summation ORDER decided the tie). The
    shipped ladder does the matvec in exact int64 micro-units, so two
    independent constructions must agree to the BIT on every loading."""
    from data_pipeline_etl_spark.registry import QUERIES, load_all_operators

    load_all_operators()
    from data_pipeline_etl_spark.operators.materialized import uncached

    runs = []
    for _ in range(2):
        with uncached():  # two INDEPENDENT constructions, not one + a cache hit
            rows = QUERIES["q_embed_pca"](spark, SF_DIR).collect()
        runs.append(sorted((r["dim"], repr(r["loading"]), repr(r["lam"])) for r in rows))
    assert runs[0] == runs[1]


def test_bpe_fertility_lockstep_with_encode(spark):
    """Family-lockstep pin: q_text_bpe_fertility and q_text_bpe_encode
    run the SAME k=4 tokenizer (one merge loop, one vocabulary), so
    their corpus-wide word and token totals must agree exactly even
    though fertility never builds the per-token frame — a drifted
    second tokenizer or a changed explode would break the equality."""
    from data_pipeline_etl_spark.registry import QUERIES, load_all_operators

    load_all_operators()
    fert = QUERIES["q_text_bpe_fertility"](spark, SF_DIR).collect()
    enc = QUERIES["q_text_bpe_encode"](spark, SF_DIR).collect()
    assert sum(r["n_words"] for r in fert) == sum(r["n_words"] for r in enc)
    assert sum(r["n_tokens"] for r in fert) == sum(r["n_tokens"] for r in enc)
    for r in fert:
        if r["fertility"] is not None:
            assert r["fertility"] >= 1.0  # BPE never splits below 1 tok/word
            assert r["chars_per_token"] >= 1.0


def test_embed_pca2_orthogonal_and_bit_identical(spark):
    """PC2 contract on the real fixture: (a) the deflated+reorthogonal-
    ized second component is orthogonal to PC1 — per-round exact-int
    projection pins every iterate to the v1-complement up to one
    rounding, so |cos| stays at the 1e-6 scale even on this
    near-isotropic corpus where plain deflation measured |cos| = 0.116
    (the v1-mixture failure mode, see _pca_power_loop's docstring);
    (b) the eigenvalue estimates are ordered (lam1 >= lam) and the
    variance split is consistent with them against the exact trace;
    (c) two independent constructions agree to the BIT on every column
    (the same exact-int determinism pin as PC1)."""
    from data_pipeline_etl_spark.registry import QUERIES, load_all_operators

    load_all_operators()
    from data_pipeline_etl_spark.operators.materialized import uncached

    v1 = {r["dim"]: r["loading"] for r in QUERIES["q_embed_pca"](spark, SF_DIR).collect()}
    runs = []
    for _ in range(2):
        with uncached():  # two INDEPENDENT constructions, not one + a cache hit
            rows = QUERIES["q_embed_pca2"](spark, SF_DIR).collect()
        runs.append(
            sorted(
                (
                    r["dim"],
                    repr(r["loading"]),
                    repr(r["lam"]),
                    repr(r["lam1"]),
                    repr(r["evr1"]),
                    repr(r["evr2"]),
                )
                for r in rows
            )
        )
    assert runs[0] == runs[1]
    r0 = rows[0]
    assert r0["lam1"] >= r0["lam"] > 0
    assert 0 < r0["evr2"] <= r0["evr1"] < 1
    # evr ratio consistent with the eigenvalue ratio (same trace divisor)
    assert abs(r0["evr1"] / r0["evr2"] - r0["lam1"] / r0["lam"]) < 1e-3
    v2 = {r["dim"]: r["loading"] for r in rows}
    dot = sum(v1[d] * v2[d] for d in v1)
    assert abs(dot) < 1e-4, dot


def test_corpus_report_algebra(spark):
    """Structural invariants of the corpus health report on the real
    fixture: source doc counts sum to the corpus size, token totals
    equal an independently computed per-doc sum, entropy is bounded by
    ln(n_langs), and dup_rate lives in [0, 1)."""
    from data_pipeline_etl_spark.registry import QUERIES, load_all_operators
    from data_pipeline_etl_spark.sources.tables import table

    load_all_operators()
    rows = QUERIES["q_corpus_report"](spark, SF_DIR).collect()
    d = table(spark, SF_DIR, "documents")
    assert sum(r["n_docs"] for r in rows) == d.count()
    tok_total = d.select(
        F.sum(F.size(F.split("text", " "))).alias("t")
    ).collect()[0]["t"]
    assert sum(r["total_tokens"] for r in rows) == tok_total
    for r in rows:
        assert 0.0 <= r["lang_entropy"] <= math.log(r["n_langs"]) + 1e-9, r
        assert 0.0 <= r["dup_rate"] < 1.0, r
        assert r["n_docs"] >= r["n_langs"] >= 1, r


def test_mix_curriculum_total_order(spark):
    """pos must be a 1..N permutation whose order refines
    (bucket, doc_id) — the loader can sort by pos alone and get the
    curriculum."""
    from data_pipeline_etl_spark.registry import QUERIES, load_all_operators

    load_all_operators()
    rows = QUERIES["q_mix_curriculum"](spark, SF_DIR).collect()
    n = len(rows)
    assert sorted(r["pos"] for r in rows) == list(range(1, n + 1))
    by_pos = sorted(rows, key=lambda r: r["pos"])
    keys = [(r["bucket"], r["doc_id"]) for r in by_pos]
    assert keys == sorted(keys)


def test_variant_extract_agrees_with_string_json_path(spark):
    """Cross-implementation equivalence inside Spark: the VARIANT field
    probe must aggregate to the same numbers as the string-JSON
    get_json_object path (q_events_enrich's mechanism) on the real
    fixture."""
    from data_pipeline_etl_spark.registry import QUERIES, load_all_operators
    from data_pipeline_etl_spark.sources.tables import table

    load_all_operators()
    got = {
        r["event_type"]: (r["n"], r["sum_k"])
        for r in QUERIES["q_variant_extract"](spark, SF_DIR).collect()
    }
    ref = {
        r["event_type"]: (r["n"], r["sum_k"])
        for r in table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.get_json_object("props", "$.k").cast("int")
            ).cast("bigint").alias("sum_k"),
        )
        .collect()
    }
    assert got == ref


_novelty_docs = st.lists(
    st.tuples(
        st.sampled_from(["s", "t"]),
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=8
        ),
    ),
    min_size=1,
    max_size=8,
)


@given(docs=_novelty_docs)
@SETTINGS
def test_novelty_matches_reference(spark, docs):
    """q_text_novelty's inverted-index plan vs a direct per-doc Python
    reference on arbitrary tiny corpora: trigram counts, within-source
    document frequency (repeats inside one doc count once), the novel
    fraction, and the NULL-for-sub-trigram totality row must all agree
    exactly — including cross-source isolation (the same trigram in
    sources s and t must not see each other)."""
    from collections import Counter

    from data_pipeline_etl_spark.operators.llm_text import novelty_for

    frame = spark.createDataFrame(
        [(i, src, " ".join(ws)) for i, (src, ws) in enumerate(docs)],
        "doc_id long, source string, text string",
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty"])
        for r in novelty_for(frame).collect()
    }
    grams = {
        i: [tuple(ws[j : j + 3]) for j in range(max(len(ws) - 2, 0))]
        for i, (_, ws) in enumerate(docs)
    }
    df: Counter = Counter()
    for i, (src, _) in enumerate(docs):
        for g in set(grams[i]):
            df[(src, g)] += 1
    expected = {}
    for i, (src, _) in enumerate(docs):
        gs = grams[i]
        novel = sum(1 for g in gs if df[(src, g)] == 1)
        expected[i] = (
            len(gs),
            novel,
            _round_half_away(novel / len(gs)) if gs else None,
        )
    assert got == expected


_trunc_docs = st.lists(
    st.tuples(
        st.sampled_from(["p", "q"]),
        st.integers(min_value=1, max_value=200),
    ),
    min_size=1,
    max_size=10,
)


def _round_half_away(x: float, nd: int = 6) -> float:
    """Both engines round the SHORTEST DECIMAL REPR of a double
    half-away-from-zero; Python's round() is half-even on the binary
    value. Two hypothesis-found boundary classes pin the rule:
    49/128 = 0.3828125 (exactly representable; half-even vs half-up
    differ -> 0.382813) and 169/640 (NOT representable — the double is
    0.26406249999999998 but its shortest repr is "0.2640625", and both
    Spark and DuckDB round THAT to 0.264063; verified empirically in
    both engines). Spark's round() is BigDecimal.valueOf(d), i.e.
    Double.toString(d) = shortest repr, so Decimal(repr(x)) — not
    Decimal(x), which expands the full binary value and rounds DOWN on
    the 169/640 class — is the engine rule.

    JDK assumption (ADVICE r16): Decimal(repr(x)) == Double.toString(x)
    relies on both producing the SHORTEST round-trip digits. Python's
    repr always does; Double.toString was only guaranteed shortest from
    JDK 19 (JDK-4511638 — older JVMs occasionally emit extra digits).
    The empirical both-engine verification above ran on the Spark 4.1.2
    bundled JVM (OpenJDK 17 in this sandbox) and held on both pinned
    boundary classes; if a future JVM/Spark bump shifts a 6-dp hash,
    re-check THIS function first."""
    import decimal

    q = decimal.Decimal(repr(x)).quantize(
        decimal.Decimal(1).scaleb(-nd), rounding=decimal.ROUND_HALF_UP
    )
    return float(q)


@given(docs=_trunc_docs)
# 169/640 shortest-repr half boundary — see _round_half_away
@example(docs=[("p", 1), ("p", 78), ("p", 192), ("p", 200)])
@SETTINGS
def test_pack_truncation_matches_reference(spark, docs):
    """q_pack_truncation vs direct arithmetic on arbitrary (source,
    n_tokens) corpora spanning the W=64 boundary: losses, int-ceil
    segment counts, the grid identity n_segments*W = tokens_total +
    pad_waste, and both 6-dp fractions must agree exactly (reference
    rounds half-away-from-zero like both engines — see
    _round_half_away)."""
    import shutil
    import tempfile

    from data_pipeline_etl_spark.registry import QUERIES, load_all_operators

    load_all_operators()
    W = 64
    # tmp_path is function-scoped, not per-hypothesis-example, so a
    # fresh mkdtemp per example is correct — but it must be cleaned up
    # or examples accumulate tmp dirs across runs (ADVICE r14).
    sf = tempfile.mkdtemp(prefix="prop_trunc_")
    try:
        spark.createDataFrame(
            [(i, src, " ".join(["t"] * nt)) for i, (src, nt) in enumerate(docs)],
            "doc_id long, source string, text string",
        ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
        got = {
            r["source"]: (
                r["n_docs"], r["tokens_total"], r["n_truncated"],
                r["tokens_lost"], r["frac_lost"], r["n_segments"],
                r["pad_waste"], r["frac_pad"],
            )
            for r in QUERIES["q_pack_truncation"](spark, sf).collect()
        }
    finally:
        shutil.rmtree(sf, ignore_errors=True)
    expected = {}
    for src in {s for s, _ in docs}:
        nts = [nt for s, nt in docs if s == src]
        total = sum(nts)
        lost = sum(max(nt - W, 0) for nt in nts)
        segs = sum((nt + W - 1) // W for nt in nts)
        expected[src] = (
            len(nts), total, sum(1 for nt in nts if nt > W),
            lost, _round_half_away(lost / total), segs,
            segs * W - total, _round_half_away((segs * W - total) / (segs * W)),
        )
    assert got == expected
    for src, row in got.items():
        assert row[5] * W == row[1] + row[6]  # grid identity


@given(docs=_trunc_docs)
@SETTINGS
def test_sample_topk_matches_reference(spark, docs):
    """q_sample_topk's two-level window vs the direct per-source md5
    order statistic on arbitrary corpora (doc texts vary by token
    count, so hashes are distinct): exactly min(k, |stratum|) rows per
    source, ranked 1..n in hash order, matching hashlib exactly."""
    import hashlib
    import shutil
    import tempfile

    from data_pipeline_etl_spark.registry import QUERIES, load_all_operators

    load_all_operators()
    # per-example mkdtemp + cleanup, same rationale as
    # test_pack_truncation_matches_reference above (ADVICE r14).
    sf = tempfile.mkdtemp(prefix="prop_topk_")
    rows = [
        (i, src, " ".join([f"w{i}"] * nt))
        for i, (src, nt) in enumerate(docs)
    ]
    try:
        spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
        got = sorted(
            (r["source"], r["rk"], r["doc_id"])
            for r in QUERIES["q_sample_topk"](spark, sf).collect()
        )
    finally:
        shutil.rmtree(sf, ignore_errors=True)
    expected = []
    for src in {s for s, _ in docs}:
        hashed = sorted(
            (hashlib.md5(t.encode()).hexdigest(), i)
            for i, s, t in rows
            if s == src
        )[:10]
        expected.extend((src, rk + 1, i) for rk, (_, i) in enumerate(hashed))
    assert got == sorted(expected)


def test_split_leakage_safe_no_straddling_pairs(spark):
    """The leakage-safety INVARIANT on the real sf0.001 fixture: compute
    every Jaccard>=0.8 near-dup pair independently in Python (exact set
    arithmetic over the same (lang, source) blocks the engine uses) and
    assert (a) both endpoints of every pair share one cluster AND one
    split — no pair straddles the train/val boundary, the failure mode
    the operator exists to prevent — and (b) split is a pure function
    of cluster_id across the whole assignment."""
    from data_pipeline_etl_spark.registry import QUERIES, load_all_operators
    from data_pipeline_etl_spark.sources.tables import table

    load_all_operators()
    sf = "/root/testdata/sf0.001"
    docs = (
        table(spark, sf, "documents")
        .select("doc_id", "lang", "source", "text")
        .collect()
    )
    out = {
        r["doc_id"]: r for r in QUERIES["q_split_leakage_safe"](spark, sf).collect()
    }
    assert set(out) == {r["doc_id"] for r in docs}
    # (b) one split per cluster
    by_cluster = {}
    for r in out.values():
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values())
    # (a) exact near-dup pairs never straddle clusters (hence splits)
    blocks = {}
    for r in docs:
        blocks.setdefault((r["lang"], r["source"]), []).append(
            (r["doc_id"], set(r["text"].split(" ")))
        )
    n_pairs = 0
    for members in blocks.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                (da, ta), (db, tb) = members[i], members[j]
                inter = len(ta & tb)
                if inter / (len(ta) + len(tb) - inter) >= 0.8:
                    n_pairs += 1
                    assert out[da]["cluster_id"] == out[db]["cluster_id"], (da, db)
                    assert out[da]["split"] == out[db]["split"], (da, db)
    assert n_pairs > 0  # the fixture must actually exercise the invariant
