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
_FORCE_FRONT: list[str] = [
    # Discipline (tightened round 5 per VERDICT r4 item 2): ANY query
    # touched since its last driver grade re-grades next round, whether
    # or not the change is believed value-preserving. Local parity at
    # sf0.01 + sf0.1 covers them, but the driver record is the ledger.
    #
    # (a) round-4 touches excluded from the r4 force-front on
    # "value-preserving" grounds — re-grade them now:
    # (q_agg_stringagg, also touched r4, was graded green IN r4 —
    # CORRECTNESS_r04.json — so its record is already post-touch.)
    "q_mix_weighted",        # exact-integer total restructure (r4)
    "q_str_regexp2",         # NULL/empty-semantics touch (r4)
    "q_array_funcs2",        # NULL/empty-semantics touch (r4)
    "q_text_chunk",          # NULL/empty-semantics touch (r4)
    "q_dedup_chunkdup",      # touched r4
    "q_stream_tumbling_live",  # touched r4
    # (b) round-5 touches:
    "q_math_funcs",     # output-affecting: bounded to 1-in-10 orderkey stripe
    "q_embed_whiten",   # nullif(sd,0) degenerate-dimension guard (both engines)
    "q_dedup_minhash_sig",     # k=8->12, 2x4->4x3 bands (recall-first LSH)
    "q_dedup_lsh_candidates",  # same band reconfiguration
    # module-level r5 edit in llm_similarity.py (hyperplane_bits_pandas
    # helper + docstrings). The two r4-graded queries in that module are
    # value-unaffected, but touched-module ⇒ re-grade is cheaper than
    # being wrong about that:
    "q_sim_neardup",
    "q_sim_pairs_lsh",
    # (c) round-5 second-segment touches: run_to_memory_sink gained a
    # state_partitions knob (streaming/jobs.py) — physical state layout
    # only, values identical, but it is in the execution path of every
    # live streaming query. The two with an r4 grade re-grade now; the
    # rest are r0 (never graded) or already forced above.
    "q_stream_dedup_live",
    "q_stream_session_live",
    "q_agg_percentile",  # array-form shared quantile buffer (bit-identical, measured)
]


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
        forced = 0 if name in _FORCE_FRONT else 1
        # never graded -> round 0 -> sorts before every graded query
        return (forced, last.get(name, 0), names.index(name))

    return sorted(names, key=rank)


def load_all_operators() -> None:
    """Import every operator module so decorators run (idempotent)."""
    import data_pipeline_etl_spark.operators  # noqa: F401
    import data_pipeline_etl_spark.functions  # noqa: F401
    import data_pipeline_etl_spark.streaming  # noqa: F401
