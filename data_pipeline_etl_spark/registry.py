"""Query registry: the SURVEY.md §2 contract surface.

Every declared operator registers itself here with a name (exactly the §2
key), a callable ``(spark, sf_dir) -> DataFrame``, and (when the semantics
are ANSI-SQL-expressible) a DuckDB oracle SQL string. ``__spark_entry__.py``
exposes these dicts verbatim to the driver.

Rules enforced by convention (SURVEY.md §5.3):
- every computed column is aliased identically in the Spark query and the
  oracle SQL (schema participates in the driver's hash check);
- float aggregates of float32 inputs and similarity scores are rounded to
  <= 6 dp on both sides;
- no bare LIMIT without a total order + key tiebreak.
"""

from __future__ import annotations

import textwrap
from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
QUERY_MODULES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared operator. ``oracle=None`` => rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = fn
        QUERY_MODULES[name] = fn.__module__.rsplit("data_pipeline_etl_spark.", 1)[-1]
        if oracle is not None:
            ORACLES[name] = textwrap.dedent(oracle).strip()
        return fn

    return deco


# Driver-facing grading order. The driver's per-round correctness pass has a
# finite budget (~50 of 115+ queries per round, in queries() dict order), so
# ``ordered_names()`` derives the order from the cross-round grading record
# (CORRECTNESS_r*.json at the repo root): never-graded queries first, then
# least-recently-graded, so the budget always extends driver-visible coverage
# instead of re-treading green rows. ``_FORCE_FRONT`` is a manual escape hatch
# for queries modified since their last grade, which must be re-graded even
# though the record shows them green (empty when nothing was touched).
# Discipline (tightened round 5 per VERDICT r4 item 2): ANY query touched
# since its last driver grade re-grades next round, whether or not the
# change is believed value-preserving. Local parity at sf0.01 + sf0.1
# covers them, but the driver record is the ledger.
#
# name -> round in which it was last touched. An entry is FORCED only
# while its newest grade is older than its touch round, so a forced query
# drops out of the front automatically once the post-touch grade lands —
# a stale static list would otherwise re-burn ~30 budget slots every
# subsequent round. Entries whose grades have caught up are harmless and
# may be pruned on any later edit.
#
# Invariant (implicit in the round-granularity comparison): grades land
# at round close against HEAD, so a touch is always graded in a LATER
# round than it was made. If that ever changes — a query touched again
# AFTER its same-round grade already landed — bump that entry's touch
# round to the NEXT round, or the expiry check would wrongly treat the
# pre-touch grade as post-touch.
#
# (All r4/r5 entries pruned at r6 open: CORRECTNESS_r05.json graded every
# one of them green post-touch, so each had expired by its own rule.)
_FORCE_FRONT: dict[str, int] = {
    # (r15 entries pruned at r16 open: CORRECTNESS_r15 graded all eight
    # post-touch queries — q_xml_roundtrip, q_variant_extract,
    # q_mix_weighted, q_mix_epochs, and the four PCA queries riding the
    # fused _pca_power_loop — hash-green, so every entry expired by its
    # own rule. Add only queries r16 touches.)
    # round-16 touch (VERDICT r15 item 4): the five cluster-riding
    # queries now read ONE session-materialized label frame
    # (dedup_clusters_table) instead of each rebuilding the pair graph
    # + CC fixpoint, and the four PCA queries read session-materialized
    # axes (_pca_axis1_cached/_pca_axes_cached) instead of each
    # rebuilding the covariance pass + ladders; q_split_incremental
    # additionally shares ONE checkpointed store element index between
    # its CC body and its batch screen (ADVICE r15 item 1). Values
    # bit-identical (deterministic builds; parity/planted/property pins
    # re-run), plans changed, re-graded regardless:
    "q_dedup_cluster": 16,
    "q_dedup_cluster_stats": 16,
    "q_split_leakage_safe": 16,
    "q_mix_dedup_aware": 16,
    "q_split_incremental": 16,
    "q_embed_pca": 16,
    "q_embed_pca2": 16,
    "q_embed_pca_project": 16,
    "q_embed_pca_project2": 16,
    # round-16 touch: the assignment body moved into the shared
    # ivf_assign_for (now also the cell key of the new
    # q_sample_cluster_balanced); same expressions, rounding moved to
    # the declared query's final select. Value-identical, re-graded
    # regardless:
    "q_sim_ivf_assign": 16,
    # round-16 touch (continuation): the sparsified top-2 edge build
    # moved into the shared _topk_affinity_edges helper (now also the
    # graph of the new q_graph_neighbor_jaccard), and BOTH declared
    # graph queries now read the session-materialized edge frame
    # (topk_edges_table — measured: edge build ~3 s warm at sf0.1 paid
    # twice per pass before; triangles settles 0.34 s, neighbor_jaccard
    # 2.0 s warm after). Values identical (deterministic build, parity
    # green both SFs), re-graded regardless (q_graph_neighbor_jaccard
    # is r0-ungraded and fronts on its own):
    "q_graph_triangles": 16,
    # round-16 touch: both now read the session-materialized near-dup
    # pair table (neardup_pairs_table) instead of rebuilding the
    # blocked inverted-index join per call; the cluster-label build
    # rides the same pair frame. Values identical, re-graded
    # regardless:
    "q_sim_jaccard": 16,
    "q_dedup_degree": 16,
    # round-16 touch: the five k=4 BPE consumers now read ONE
    # session-materialized tokenized vocabulary (_bpe_toks_cached)
    # instead of each re-running the sequential merge ladder; the
    # trainer queries (q_text_bpe_merge k=3, q_text_bpe_train k=6)
    # stay fresh (single-consumer artifacts). Values identical,
    # re-graded regardless:
    "q_text_bpe_apply": 16,
    "q_text_bpe_vocab": 16,
    "q_text_bpe_encode": 16,
    "q_text_bpe_decode": 16,
    "q_text_bpe_fertility": 16,
    # round-16 touch: the LSH dedup loop reads the session-materialized
    # MinHash signature table (minhash_sig_table — per-doc signatures
    # are split-independent, so the store/batch halves filter the one
    # frame), and q_embed_covariance + the PCA axis build share the
    # materialized covariance (covariance_table). Values identical,
    # re-graded regardless:
    "q_dedup_minhash_sig": 16,
    "q_dedup_lsh_candidates": 16,
    "q_dedup_incremental": 16,
    "q_dedup_ingest": 16,
    "q_dedup_store_compact": 16,
    "q_embed_covariance": 16,
    # round-16 touch: the hyperplane-LSH trio reads the session-
    # materialized candidate pair table (_band_candidate_pairs).
    # Values identical, re-graded regardless:
    "q_sim_neardup": 16,
    "q_sim_pairs_lsh": 16,
    "q_dedup_semantic": 16,
    # round-16 touch: the pagerank edge checkpoint is clustered on dst
    # so each iteration's partial aggregate emits ~|nodes| rows into the
    # shuffle instead of ~|nodes| x P (warehouse.py pagerank_for
    # comment). Values bit-identical warm x5, parity green both SFs:
    "q_graph_pagerank": 16,
    # round-16 touch (conservative): the dst-clustering experiment on
    # the BFS edge checkpoint was REVERTED after its 100x probe cell
    # OOM'd (SCALE.md r16 rejection) — the landed diff is comment-only
    # and the plan is byte-identical to the graded one, but the ledger
    # rule fronts ANY touched query:
    "q_graph_bfs": 16,
}


def _last_graded_round() -> dict[str, int]:
    """name -> highest round number whose CORRECTNESS file graded it.

    Reads ``CORRECTNESS_r*.json`` beside the repo's ``__spark_entry__.py``
    (one directory above this package). Missing/corrupt files are skipped so
    a fresh checkout degrades to registration order.
    """
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                graded = json.load(f)
        except (OSError, ValueError):
            continue
        for name in graded:
            last[name] = max(last.get(name, 0), rnd)
    return last


def ordered_names() -> list[str]:
    """Registry keys in driver-grading priority order (see above)."""
    last = _last_graded_round()
    names = list(QUERIES)  # insertion order

    def rank(name: str) -> tuple[int, int, int]:
        # forced only while the newest grade predates the touch round
        forced = 0 if _FORCE_FRONT.get(name, 0) > last.get(name, 0) else 1
        # never graded -> round 0 -> sorts before every graded query
        return (forced, last.get(name, 0), names.index(name))

    return sorted(names, key=rank)


def load_all_operators() -> None:
    """Import every operator module so decorators run (idempotent)."""
    import data_pipeline_etl_spark.operators  # noqa: F401
    import data_pipeline_etl_spark.functions  # noqa: F401
    import data_pipeline_etl_spark.streaming  # noqa: F401
