#!/usr/bin/env python
"""N-x scaling probe: replicate sf0.1's lineitem/orders (and embeddings)
N-x with key remapping so join fan-out stays realistic, and measure
headline query wall time at 1x vs each requested factor. The point is
the SLOPE: a scale-correct plan costs ~Nx (ideally less, because fixed
overhead amortizes) — a quadratic or skew-bound plan blows past it.
Results are recorded in SCALE.md / BASELINE.md; run on a quiet host.

    python scripts/scaling_probe.py [factor ...] [--only SUBSTR]   # default: 10

``--only SUBSTR[,SUBSTR...]`` keeps just the cases whose name contains
any listed substring (e.g. ``--only lsh`` re-measures the LSH family
without replaying the lineitem suite; ``--only pagerank,triangles,
basket`` measures the graph family off one shared replication).

Replicated documents get per-replica TOKEN PREFIXES (r<rep>_<token>) so
within-replica duplicate structure is preserved and nothing else —
verbatim copies would make every sliding gram a cross-doc duplicate and
the substr_spans case would measure the degenerate all-dup corpus.
Replicated embeddings are CIRCULARLY SHIFTED per replica (shift = rep %%
dim), not copied verbatim: verbatim copies would plant N-1 exact dups per
vector and inflate LSH bucket occupancy quadratically by construction —
the honest scale model is a corpus growing with new content, which
shifted vectors approximate (dimensions are i.i.d.-ish, so a shifted
copy signatures like an unrelated vector).

LSH runs in two flavors: ``lsh_*`` (the declared query's interpreted SQL
fold; capped at LSH_MAX_FACTOR — ~2.5 ms/vector means beyond ~60k
vectors it measures patience, not plan shape) and ``lshv_*`` (the
vectorized hyperplane_bits_pandas bit path feeding the SAME band-bucket
machinery via band_pairs_from_bits; bit-exact, runs at every factor —
this is the row that fills the 100x cell). Scaled-band cases
(``*_scaledN``) are ALSO measured at 1x so their slope is computed
against their own per-vector cost, not fixed8's (a 4xN-plane fold costs
more per vector than 4x8 regardless of corpus size).
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LSH_MAX_FACTOR = 30


def main() -> int:
    args = list(sys.argv[1:])
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = [s for s in args[i + 1].split(",") if s]
        del args[i : i + 2]
    factors = [int(a) for a in args] or [10]
    from pyspark.sql import functions as F

    from data_pipeline_etl_spark.operators.llm_similarity import (
        _LSH_BANDS,
        band_candidate_pairs_for,
        band_pairs_from_bits,
        hyperplane_bits_pandas,
    )
    from data_pipeline_etl_spark.session import get_spark

    spark = get_spark("scaling-probe")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    sf = "/root/testdata/sf0.1"

    l = spark.read.parquet(f"{sf}/lineitem.parquet")
    o = spark.read.parquet(f"{sf}/orders.parquet")
    e = spark.read.parquet(f"{sf}/embeddings.parquet")
    dc = spark.read.parquet(f"{sf}/documents.parquet")
    max_ok = o.agg(F.max("o_orderkey")).collect()[0][0] + 1
    max_vid = e.agg(F.max("vec_id")).collect()[0][0] + 1
    max_did = dc.agg(F.max("doc_id")).collect()[0][0] + 1
    max_pk = l.agg(F.max("l_partkey")).collect()[0][0] + 1
    dim = len(e.select("embedding").first()[0])

    def _norm_events(df):
        # the loader's ts dispatch (sources/tables.py): ns long vs µs ts
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            return df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
            )
        return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))

    ev = _norm_events(spark.read.parquet(f"{sf}/events.parquet"))
    max_uid = ev.agg(F.max("user_id")).collect()[0][0] + 1
    max_eid = ev.agg(F.max("event_id")).collect()[0][0] + 1

    def replicate(tmp: str, factor: int, need_base: bool = True) -> dict[str, str]:
        reps = spark.range(factor).select(F.col("id").alias("rep"))
        paths = {"lineitem": None, "orders": None}
        for name, df, key, mx in (
            ("lineitem", l, "l_orderkey", max_ok),
            ("orders", o, "o_orderkey", max_ok),
        ):
            if not need_base:  # --only selected no lineitem/orders case —
                continue  # skip the dominant replication cost (60M rows at 100x)
            paths[name] = os.path.join(tmp, name)
            rdf = df.crossJoin(reps).withColumn(key, F.col(key) + F.col("rep") * mx)
            if name == "lineitem":
                # remap partkey per replica too: the co-order GRAPH must
                # grow Nx (Nx nodes, Nx edges, same degree structure) —
                # with parts unremapped the graph cases would measure a
                # constant-size graph with Nx-weighted edges, i.e. the
                # pair-build only. Orderkey cases never read l_partkey.
                rdf = rdf.withColumn(
                    "l_partkey", F.col("l_partkey") + F.col("rep") * max_pk
                )
            rdf.drop("rep").write.parquet(paths[name])
        paths["embeddings"] = os.path.join(tmp, "embeddings")
        shift = (F.col("rep") % dim).cast("int")
        (
            e.crossJoin(reps)
            .select(
                (F.col("vec_id") + F.col("rep") * max_vid).alias("vec_id"),
                F.when(shift == 0, F.col("embedding"))
                .otherwise(
                    F.concat(
                        F.expr(f"slice(embedding, cast(rep % {dim} as int) + 1, "
                               f"{dim} - cast(rep % {dim} as int))"),
                        F.expr(f"slice(embedding, 1, cast(rep % {dim} as int))"),
                    )
                )
                .alias("embedding"),
            )
            .write.parquet(paths["embeddings"])
        )
        # documents: per-replica token prefixing (verbatim copies would
        # make EVERY gram a cross-doc dup — the honest corpus-growth
        # model keeps the within-replica dup structure and nothing else)
        paths["documents"] = os.path.join(tmp, "documents")
        (
            dc.crossJoin(reps)
            .select(
                (F.col("doc_id") + F.col("rep") * max_did).alias("doc_id"),
                "lang",
                "source",
                F.array_join(
                    F.expr("transform(split(text, ' '), t -> concat('r', rep, '_', t))"),
                    " ",
                ).alias("text"),
            )
            .write.parquet(paths["documents"])
        )
        # events: Nx more users over the SAME calendar window (user_id /
        # event_id remapped, ts untouched) — the honest growth model for
        # time-keyed data: traffic grows, the clock doesn't.
        paths["events"] = os.path.join(tmp, "events")
        (
            ev.crossJoin(reps)
            .select(
                (F.col("event_id") + F.col("rep") * max_eid).alias("event_id"),
                "ts",
                (F.col("user_id") + F.col("rep") * max_uid).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
            .write.parquet(paths["events"])
        )
        return paths

    def q1(ldf):
        return ldf.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("l_quantity"), F.avg("l_extendedprice"), F.count("*")
        )

    def join_agg(ldf, odf):
        return (
            ldf.join(odf, ldf.l_orderkey == odf.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*"), F.sum("l_extendedprice"))
        )

    def dedup(ldf):
        # summarize instead of returning |distinct| rows to the driver —
        # at scale the dedup output goes to a sink, and an early probe
        # version that materialized 4.5M digest rows measured Arrow
        # transfer (18.6x slope), not the operator (~6x)
        return (
            ldf.groupBy(
                F.md5(F.concat_ws("|", "l_orderkey", "l_linenumber")).alias("d")
            )
            .count()
            .agg(F.count("*").alias("n_unique"), F.sum("count").alias("n_rows"))
        )

    def wtopn(ldf):
        from pyspark.sql import Window

        w = Window.partitionBy("l_returnflag").orderBy(
            F.desc("l_extendedprice"), "l_orderkey", "l_linenumber"
        )
        return ldf.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 10)

    def lsh(edf, rows):
        # candidate generation is the scale-critical stage; summarize the
        # pair count so Arrow transfer stays out of the measurement
        return band_candidate_pairs_for(edf, rows=rows).agg(
            F.count("*").alias("n_pairs")
        )

    def lshv(edf, rows):
        # vectorized bit path, same band-bucket machinery (bit-exact)
        return band_pairs_from_bits(
            hyperplane_bits_pandas(edf, planes=_LSH_BANDS * rows), _LSH_BANDS, rows
        ).agg(F.count("*").alias("n_pairs"))

    def lshv_hot(edf, rows):
        # deliberate HOT-KEY cell (VERDICT r16 item 7): force ~10% of all
        # vectors into ONE (band, sig) bucket by overwriting band 0's bit
        # pattern, so the in-bucket combination explode runs C(n/10, 2)
        # pair expansions in a single task. This is the skew shape AQE
        # can NOT mitigate: skew-join splitting applies to joins only
        # (guide §2.5) and cannot split a single key; the expansion here
        # is a groupBy(collect_list) + per-row explode, so one hot bucket
        # = one straggler task regardless of AQE. Capped at
        # LSH_MAX_FACTOR like the interpreted fold — past ~30x the
        # quadratic hot bucket measures patience, not plan shape.
        hot_prefix = "array(" + ",".join(["1"] * rows) + ")"
        bits = hyperplane_bits_pandas(edf, planes=_LSH_BANDS * rows).withColumn(
            "bits",
            F.when(
                F.col("vec_id") % 10 == 0,
                F.expr(
                    f"concat({hot_prefix}, "
                    f"slice(bits, {rows} + 1, size(bits) - {rows}))"
                ),
            ).otherwise(F.col("bits")),
        )
        return band_pairs_from_bits(bits, _LSH_BANDS, rows).agg(
            F.count("*").alias("n_pairs")
        )

    def substr(ddf):
        # summarize (span counts + covered totals), never per-doc rows
        from data_pipeline_etl_spark.operators.llm_dedup import substring_spans

        return substring_spans(ddf).agg(
            F.count("*").alias("n_docs"),
            F.sum("n_spans").alias("n_spans"),
            F.round(F.avg("dup_frac"), 4).alias("avg_dup_frac"),
        )

    def bigram(ddf):
        # per-doc output summarized to one row so Arrow transfer stays
        # out of the measurement; prefix-replicated docs keep the
        # within-replica transition structure (each replica is its own
        # closed vocabulary, so the bigram model grows linearly — the
        # honest corpus-growth model for a vocabulary-bounded table)
        from data_pipeline_etl_spark.operators.llm_text import bigram_logprob_for

        return bigram_logprob_for(ddf).agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bigrams").alias("n_bigrams"),
            F.round(F.avg("avg_logprob"), 6).alias("mean_avg_lp"),
        )

    def covm(edf):
        # 2080-row output; summarize anyway so every case reports one row
        from data_pipeline_etl_spark.operators.llm_similarity import covariance_for

        return covariance_for(edf).agg(
            F.count("*").alias("n_entries"),
            F.round(F.sum(F.abs("cov")), 6).alias("abs_mass"),
        )

    def pca_case(edf):
        # power-iteration PCA: corpus cost = the covariance pass, the
        # k=6 iteration loop after it is d-sized (its slope vs
        # cov_matrix's is the overhead of the checkpointed loop)
        from data_pipeline_etl_spark.operators.llm_similarity import pca_power_for

        return pca_power_for(edf).agg(
            F.count("*").alias("n_dims"),
            F.round(F.max("lam"), 6).alias("lam"),
            F.round(F.sum(F.abs("loading")), 6).alias("l1_mass"),
        )

    def novelty(ddf):
        # trigram inverted index: the probe's token prefixes keep each
        # replica's gram space disjoint, so the (source, gram) df table
        # grows linearly — the honest new-content corpus model
        from data_pipeline_etl_spark.operators.llm_text import novelty_for

        return novelty_for(ddf).agg(
            F.count("*").alias("n_docs"),
            F.sum("n_novel").alias("novel"),
            F.round(F.avg("novelty"), 6).alias("avg_nov"),
        )

    def pca2_case(edf):
        # PC2 by deflation + reorthogonalization: corpus cost is STILL
        # the one covariance pass (shared checkpoint); the second k=6
        # ladder and the per-round projection are d-/d^2-sized, so the
        # slope should track embed_pca's
        from data_pipeline_etl_spark.operators.llm_similarity import pca_deflate_for

        return pca_deflate_for(edf).agg(
            F.count("*").alias("n_dims"),
            F.round(F.max("lam"), 6).alias("lam2"),
            F.round(F.max("evr2"), 6).alias("evr2"),
        )

    def pqenc(edf):
        # corpus-side PQ encode (the at-scale cost of q_sim_pq_adc; the
        # ADC scoring joins are shortlist-sized). Codebook = the declared
        # query's fixed sample ids, present at every factor because
        # replication preserves original vec_ids.
        from data_pipeline_etl_spark.operators.llm_similarity import pq_codes_for

        cb = edf.where(F.col("vec_id").between(8, 15)).select(
            (F.col("vec_id") - 8).alias("code"), F.col("embedding").alias("cbe")
        )
        return pq_codes_for(edf, cb).agg(
            F.count("*").alias("n_vecs"),
            F.countDistinct("c0", "c1", "c2", "c3").alias("n_code_combos"),
        )

    def _items(ldf):
        return ldf.select("l_orderkey", "l_partkey").distinct()

    def basket(ldf):
        # summarize (pair count + co-count mass) — per-pair rows stay out
        from data_pipeline_etl_spark.operators.warehouse import basket_affinity_for

        return basket_affinity_for(_items(ldf)).agg(
            F.count("*").alias("n_pairs"), F.sum("c_ab").alias("c_mass")
        )

    def pagerank(ldf):
        from data_pipeline_etl_spark.operators.warehouse import pagerank_for

        return pagerank_for(_items(ldf)).agg(
            F.count("*").alias("n_nodes"),
            F.round(F.sum("pr_rel"), 3).alias("pr_mass"),
        )

    def triangles(ldf):
        from data_pipeline_etl_spark.operators.warehouse import triangles_for

        return triangles_for(_items(ldf)).agg(F.count("*").alias("n_tris"))

    def ingest(ddf):
        from data_pipeline_etl_spark.operators.llm_dedup import (
            ingest_disposition_for,
        )

        # summarize dispositions; per-replica token prefixes mean
        # cross-half collisions shrink as N grows (an honest new-content
        # corpus), so this row measures the signature-build + semi/anti
        # join machinery — the collision-rate dial is the LSH rows' job
        return ingest_disposition_for(ddf).groupBy("disposition").agg(
            F.count("*").alias("n")
        )

    def bfs(ldf):
        from data_pipeline_etl_spark.operators.warehouse import bfs_hops_for

        return bfs_hops_for(_items(ldf)).agg(
            F.count("*").alias("n_reached"), F.sum("hops").alias("hop_mass")
        )

    def cluster(ddf):
        from data_pipeline_etl_spark.operators.llm_dedup import dedup_clusters_for

        # summarize labels (cluster/doc counts) — the label frame is
        # corpus-sized and Arrow transfer must stay out of the measure.
        # Per-replica token prefixes keep within-replica dup structure
        # (so pair density per replica is constant) and forbid
        # cross-replica edges: components grow in COUNT, not diameter —
        # the honest corpus-growth model for the CC convergence loop.
        return dedup_clusters_for(ddf).agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("cluster_id").alias("n_clusters"),
        )

    def split_leak(ddf):
        from data_pipeline_etl_spark.operators.llm_pipeline import split_leakage_for

        # summarize the assignment (the label frame is corpus-sized;
        # Arrow transfer must stay out of the measure) — the body is
        # dedup_clusters_for plus one map-side hash projection, so the
        # slope should track the dedup_cluster row
        return split_leakage_for(ddf).groupBy("split").agg(
            F.count("*").alias("n"),
            F.count_distinct("cluster_id").alias("n_clusters"),
        )

    def mixdedup(ddf):
        from data_pipeline_etl_spark.operators.llm_pipeline import mix_dedup_aware_for

        # |source x replica|-row report — tiny output, the measure is
        # the cluster body + the doc_id-keyed token join
        return mix_dedup_aware_for(ddf).agg(
            F.count("*").alias("n_sources"),
            F.sum("tokens_dedup").alias("dedup_mass"),
        )

    def compact(ddf):
        from data_pipeline_etl_spark.operators.llm_dedup import store_compact_for

        # summarize kept/evicted by origin — the audit frame is
        # store-sized; the measurement targets the signature build +
        # bucket-min survivorship machinery
        return store_compact_for(ddf).groupBy("origin", "status").agg(
            F.count("*").alias("n")
        )

    def bpe(ddf):
        from data_pipeline_etl_spark.operators.llm_text import (
            _bpe_vocab_of,
            bpe_train_for,
        )

        # k=6 trainer (the declared q_text_bpe_train shape, via the SAME
        # vocab aggregation the queries use). Per-replica token prefixes
        # mint a fresh vocabulary per replica, so |vocab| grows ~Nx —
        # the conservative growth model for the per-round vocab pass
        # (real corpora grow vocab sub-linearly via Heaps' law). Output
        # is <=6 rows; the agg keeps the one-row convention.
        return bpe_train_for(_bpe_vocab_of(ddf), 6).agg(
            F.count("*").alias("n_merges"),
            F.sum("pair_count").alias("merge_mass"),
        )

    def bpe_enc(ddf):
        from data_pipeline_etl_spark.operators.llm_text import bpe_encode_for

        # k=4 per-document encode (the declared q_text_bpe_encode
        # shape): merge loop at |vocab| size, then ONE corpus pass
        # broadcast-joined against the tokenized vocab. Same per-replica
        # vocab-growth model as bpe_train; the per-doc result frame is
        # corpus-sized, so summarize to keep Arrow transfer out of the
        # measurement.
        return bpe_encode_for(ddf.select("doc_id", "text"), 4).agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("token_mass"),
        )

    def bpe_dec(ddf):
        from data_pipeline_etl_spark.operators.llm_text import bpe_decode_for

        # k=4 roundtrip decode (the declared q_text_bpe_decode shape):
        # same single corpus scan + broadcast joins as encode, plus the
        # two-level ordered reassembly (word groupBy, then doc groupBy)
        # and the doc_id-pruned totality join. Summarize the per-doc
        # report; the mismatch count must be 0 at every factor — a
        # scale-up that corrupts reassembly order shows up here as a
        # value, not just a slope.
        return bpe_decode_for(ddf.select("doc_id", "text"), 4).agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("token_mass"),
            F.sum(F.when(F.col("roundtrip") != "ok", 1).otherwise(0)).alias(
                "n_mismatch"
            ),
        )

    def kmeans(edf):
        from data_pipeline_etl_spark.operators.llm_similarity import kmeans_lloyd

        # the IVF centroid trainer (test-surface helper, the at-scale
        # path behind q_sim_ivf_*): k=8, 3 Lloyd iterations — per
        # iteration one broadcast-model assignment pass + one
        # (cell, pos)-keyed update shuffle, superseded checkpoints
        # freed. The model is k x dim; summarize to one row.
        cents, wcss = kmeans_lloyd(edf.select("vec_id", "embedding"), 8, 3)
        return cents.agg(
            F.count("*").alias("k"),
            F.round(F.lit(float(wcss[-1])), 2).alias("final_wcss"),
        )

    def decontam(ddf):
        from data_pipeline_etl_spark.operators.llm_corpus import (
            decontaminate_for,
        )

        # train-side decontamination (the declared q_decontaminate
        # shape): broadcast eval bigrams, one train-corpus shuffle.
        # Per-replica token prefixes keep each replica's eval/train
        # overlap structure intact while eval and train both grow ~Nx.
        # The disposition frame is corpus-sized — summarize.
        return decontaminate_for(ddf).groupBy("disposition").agg(
            F.count("*").alias("n")
        )

    def concurrency(vdf):
        from data_pipeline_etl_spark.streaming.batch_windows import concurrency_for

        # summarize (curve points + peak) — the boundary curve itself
        # stays distributed
        return concurrency_for(vdf).agg(
            F.count("*").alias("n_points"), F.max("n_active").alias("peak")
        )

    cases = {
        "q1_groupby": lambda L, O, E, D, V: q1(L),
        "join_agg": lambda L, O, E, D, V: join_agg(L, O),
        "dedup_exact": lambda L, O, E, D, V: dedup(L),
        "win_topn": lambda L, O, E, D, V: wtopn(L),
        "substr_spans": lambda L, O, E, D, V: substr(D),
        "cov_matrix": lambda L, O, E, D, V: covm(E),
        "embed_pca": lambda L, O, E, D, V: pca_case(E),
        "embed_pca2": lambda L, O, E, D, V: pca2_case(E),
        "text_novelty": lambda L, O, E, D, V: novelty(D),
        "bigram_lm": lambda L, O, E, D, V: bigram(D),
        "pq_encode": lambda L, O, E, D, V: pqenc(E),
        "basket_aff": lambda L, O, E, D, V: basket(L),
        "pagerank": lambda L, O, E, D, V: pagerank(L),
        "triangles": lambda L, O, E, D, V: triangles(L),
        "bfs": lambda L, O, E, D, V: bfs(L),
        "ingest": lambda L, O, E, D, V: ingest(D),
        "dedup_cluster": lambda L, O, E, D, V: cluster(D),
        "split_leakage": lambda L, O, E, D, V: split_leak(D),
        "mix_dedup": lambda L, O, E, D, V: mixdedup(D),
        "store_compact": lambda L, O, E, D, V: compact(D),
        "bpe_train": lambda L, O, E, D, V: bpe(D),
        "bpe_encode": lambda L, O, E, D, V: bpe_enc(D),
        "bpe_decode": lambda L, O, E, D, V: bpe_dec(D),
        "decontam": lambda L, O, E, D, V: decontam(D),
        "kmeans": lambda L, O, E, D, V: kmeans(E),
        "concurrency": lambda L, O, E, D, V: concurrency(V),
    }

    def scaled_rows(factor):
        # bits-per-band must grow with log2(corpus) to hold bucket
        # OCCUPANCY (not count) constant; 8 = the declared-query config
        return 8 + max(0, (factor - 1).bit_length())

    # every band width any requested factor will use — measured at 1x too,
    # so each *_scaledN row has its own per-vector-cost reference
    all_ns = sorted({8} | {scaled_rows(f) for f in factors})

    def measure(tag, factor, lp, op, ep, dp, vp):
        L = spark.read.parquet(lp) if lp else None
        O = spark.read.parquet(op) if op else None
        D = spark.read.parquet(dp) if dp else None
        V = _norm_events(spark.read.parquet(vp)) if vp else None
        # spread the signature folds (the declared query does this via
        # fanout(); the small fixture parquet is otherwise one partition)
        E = spark.read.parquet(ep).repartition(
            spark.sparkContext.defaultParallelism, "vec_id"
        )
        todo = dict(cases)
        # fixed-width bands (the declared-query config) vs occupancy-
        # scaled bands: both are measured so the quadratic knee AND its
        # documented mitigation are on record
        ns = all_ns if factor == 1 else sorted({8, scaled_rows(factor)})
        for n in ns:
            label = "fixed8" if n == 8 else f"scaled{n}"
            if factor <= LSH_MAX_FACTOR:
                todo[f"lsh_{label}"] = (lambda nn: lambda L, O, E, D, V: lsh(E, nn))(n)
            todo[f"lshv_{label}"] = (lambda nn: lambda L, O, E, D, V: lshv(E, nn))(n)
        if factor <= LSH_MAX_FACTOR:
            todo["lshv_hot10"] = lambda L, O, E, D, V: lshv_hot(E, 8)
        if only:
            todo = {k: v for k, v in todo.items() if any(s in k for s in only)}
        out = {}
        for name, fn in todo.items():
            warm = fn(L, O, E, D, V).toPandas()  # warm
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn(L, O, E, D, V).toPandas()
                ts.append(time.perf_counter() - t0)
            out[name] = statistics.median(ts)
            note = ""
            if name.startswith("lsh") and "n_pairs" in warm.columns:
                note = f"  (n_pairs={int(warm['n_pairs'].iloc[0])})"
            print(f"  {tag} {name}: {out[name]:.3f}s{note}", flush=True)
        return out

    base = measure(
        "1x",
        1,
        f"{sf}/lineitem.parquet",
        f"{sf}/orders.parquet",
        f"{sf}/embeddings.parquet",
        f"{sf}/documents.parquet",
        f"{sf}/events.parquet",
    )
    results = {"1x": base}
    base_cases = (
        "q1_groupby", "join_agg", "dedup_exact", "win_topn",
        "basket_aff", "pagerank", "triangles", "bfs",
    )
    for factor in factors:
        tmp = tempfile.mkdtemp(prefix=f"scaling_probe_{factor}x_")
        try:
            need_base = (only is None) or any(
                s in n for n in base_cases for s in only
            )
            paths = replicate(tmp, factor, need_base=need_base)
            results[f"{factor}x"] = measure(
                f"{factor}x",
                factor,
                paths["lineitem"],
                paths["orders"],
                paths["embeddings"],
                paths["documents"],
                paths["events"],
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    names = list(dict.fromkeys(n for vals in results.values() for n in vals))
    print(f"\n{'query':16s}", end="")
    for tag in results:
        print(f" {tag:>9s}", end="")
    print("   slopes vs same-case 1x (ideal <= factor; * = vs fixed8@1x,")
    print(" " * 16 + " " * 10 * len(results)
          + "   i.e. the extra per-vector fold cost is counted in the slope)")
    for name in names:
        ref = base.get(name)
        mark = ""
        if ref is None:
            fam = "lshv_fixed8" if name.startswith("lshv") else "lsh_fixed8"
            ref, mark = base.get(fam), "*"
        print(f"{name:16s}", end="")
        for tag, vals in results.items():
            v = vals.get(name)
            print(f" {v:9.3f}" if v is not None else f" {'-':>9s}", end="")
        slopes = [
            f"{tag}:{vals[name] / ref:.1f}x{mark}"
            for tag, vals in results.items()
            if tag != "1x" and name in vals and ref
        ]
        print("   " + " ".join(slopes))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
