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
    # (All r16 entries pruned at r17 open: CORRECTNESS_r16 graded every
    # one of the 29 post-touch queries — the materialize-once artifact
    # consumers, the pagerank layout change, the decode fusion and the
    # graph/BPE/LSH riders — hash-green, so each entry had expired by
    # its own rule. Add only queries r17 touches.)
    # round-17 touch: fanout() parallelism floor on the per-row-
    # expression-heavy corpus scans (values partition-invariant,
    # measured wins in OPTIMIZATION_r17.md):
    "q_text_novelty": 17,
    "q_text_charngrams": 17,
    "q_dedup_substring": 17,
    "q_decontaminate": 17,
    # round-17 touch: q_dedup_ngram's bigram element frame is now a
    # per-call localCheckpoint barrier (the self-join otherwise
    # evaluates the tokenize→window→distinct subtree twice):
    "q_dedup_ngram": 17,
    # round-17 touch: the shared unigram element table
    # (unigram_elements_table) now feeds BOTH q_dedup_containment and
    # the neardup_pairs_table build — containment's plan changed, and
    # every neardup/cluster rider's build lineage changed (values
    # identical, deterministic; re-graded regardless per the ledger
    # rule):
    "q_dedup_containment": 17,
    "q_sim_jaccard": 17,
    "q_dedup_degree": 17,
    "q_dedup_cluster": 17,
    "q_dedup_cluster_stats": 17,
    "q_split_leakage_safe": 17,
    "q_mix_dedup_aware": 17,
    # round-17 touch: the shared co-order pair table
    # (co_order_pairs_table) now feeds q_basket_affinity directly and
    # the topk_edges_table build (q_graph_triangles /
    # q_graph_neighbor_jaccard lineage):
    "q_basket_affinity": 17,
    "q_graph_triangles": 17,
    "q_graph_neighbor_jaccard": 17,
    # round-17 touch (second fanout batch, same A/B discipline —
    # measured 1.16–1.57× wins; the seven measured LOSS/flat
    # candidates were left alone, table in OPTIMIZATION_r17.md):
    "q_text_repetition": 17,
    "q_dedup_simhash": 17,
    "q_sim_knn_label": 17,
    "q_sim_rank_fusion": 17,
    "q_sim_ndcg": 17,
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
