"""Session-scoped materialize-once artifacts (VERDICT r15 item 4).

Five declared queries rebuild the identical near-dup pair graph + CC
fixpoint per driver call (q_dedup_cluster, q_dedup_cluster_stats,
q_split_leakage_safe, q_mix_dedup_aware, and — at half corpus —
q_split_incremental), and four rebuild the same covariance pass +
power-iteration ladders (the q_embed_pca family). At 100 TB a
production pipeline materializes these ONCE — cluster labels and PCA
axes are tables/artifacts, not per-query subplans — and every consumer
reads them. This cache models that topology on the driver surface: the
first caller in a session runs the probed build (plans unchanged —
scaling_probe still measures the ``*_for`` bodies directly), later
callers read the localCheckpoint'ed result.

Value-invisible by construction: every cached build is deterministic
(repeat-run bit-identity and partition-invariance pinned in
tests/test_properties.py, which force fresh builds via :func:`uncached`
so those pins never go vacuous), so a cache hit returns bit-identical
frames. Risks from the VERDICT r15 item-4 list, addressed:

- keys include BOTH ``id(spark)`` (the house key of the table-loader
  cache in sources/tables.py) and the normalized ``sf_dir``, so
  correctness runs at sf0.01 and bench runs at sf0.1 never cross;
- cached frames are NEVER freed (checkpoints.free_local_checkpoint
  discipline: a returned frame reads them) — entries die with the
  session's JVM state;
- sizes are bounded per (session, sf): |docs|-row label frames, d-row
  eigenvectors, a d^2-row covariance, and q_split_incremental's
  store-half split + element-index pair (the one index-sized entry —
  the materialized store inverted index production screens batches
  against, q_dedup_incremental's topology);
- stale-path caveat (ADVICE r16): keys are (id(spark), sf_dir[, k]) —
  if the driver regenerates fixtures AT THE SAME PATH while a session
  is live, every cached artifact (including the r16 graph edge frames
  pagerank_graph_table / bfs_graph_table and the r17 element/pair
  tables) would serve the pre-regeneration data. No live-regeneration
  scenario exists in the driver contract, and
  scripts/round_start_check.py catches cross-round regenerations —
  informational, not a defect.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Any, Callable, Iterator

from pyspark.sql import SparkSession

_MATERIALIZED: dict[tuple, Any] = {}
_DISABLED: bool = False

# First-touch build wall seconds per artifact, keyed by the artifact's own
# key tuple rendered "name:part:part" (sf_dir shortened to its basename).
# VERDICT r16 item 1: bench median-of-3 discards the one pass that pays a
# build, so a build regression would otherwise be invisible — bench.py
# copies this map into BENCH_QUERIES.json (additive side-file field; the
# stdout metric is unchanged). Cleared per-process only by tests.
BUILD_SECONDS: dict[str, float] = {}


def _build_label(key: tuple) -> str:
    parts = []
    for p in key:
        s = str(p)
        if "/" in s:
            s = s.rstrip("/").rsplit("/", 1)[-1]
        parts.append(s)
    return ":".join(parts)


def materialize_once(
    spark: SparkSession, key: tuple, build: Callable[[], Any]
) -> Any:
    """Return the cached artifact for ``(id(spark), *key)``, running
    ``build()`` (which must end in eager localCheckpoints for every
    returned frame, so a hit never replays corpus work) on first use.
    Under :func:`uncached`, builds fresh and caches nothing."""
    if _DISABLED:
        return build()
    k = (id(spark), *key)
    if k not in _MATERIALIZED:
        t0 = time.perf_counter()
        _MATERIALIZED[k] = build()
        BUILD_SECONDS[_build_label(key)] = round(time.perf_counter() - t0, 4)
    return _MATERIALIZED[k]


@contextmanager
def uncached() -> Iterator[None]:
    """Force fresh builds inside the block (and cache nothing): the
    escape hatch for tests that pin build determinism, plan shape, or
    partition-invariance THROUGH the declared query surface — with the
    cache active their second run would read the first run's frames and
    the pin would be vacuous."""
    global _DISABLED
    prev = _DISABLED
    _DISABLED = True
    try:
        yield
    finally:
        _DISABLED = prev
