#!/usr/bin/env python
"""Capture `.explain("formatted")` output for a list of declared queries.

Usage:
    python scripts/capture_plans.py OUT_DIR SUFFIX [QUERY ...]

Writes OUT_DIR/<query>_<SUFFIX>.txt for each named query (default: the
r16-touched set below). Run from the repo/worktree whose plans you want:
the script imports the registry relative to its own location, so a copy
executed inside a `git worktree` of an older commit captures THAT tree's
plans — how the plans/r16/*_before.txt files were produced.

$SPARK_GRAFT_SF_DIR picks the fixture dir (default /root/testdata/sf0.1,
the bench scale, so the captured shapes are the ones the bench claims
are about). Queries whose construction runs eager localCheckpoint
builds (PCA ladder, pagerank, materialized artifacts) execute those
builds here — capture is therefore minutes, not seconds.
"""

from __future__ import annotations

import os
import sys

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

# The r16-touched set: every _FORCE_FRONT(16) query (registry.py).
R16_TOUCHED = [
    "q_dedup_cluster",
    "q_dedup_cluster_stats",
    "q_split_leakage_safe",
    "q_mix_dedup_aware",
    "q_split_incremental",
    "q_embed_pca",
    "q_embed_pca2",
    "q_embed_pca_project",
    "q_embed_pca_project2",
    "q_sim_ivf_assign",
    "q_graph_triangles",
    "q_sim_jaccard",
    "q_dedup_degree",
    "q_text_bpe_apply",
    "q_text_bpe_vocab",
    "q_text_bpe_encode",
    "q_text_bpe_decode",
    "q_text_bpe_fertility",
    "q_dedup_minhash_sig",
    "q_dedup_lsh_candidates",
    "q_dedup_incremental",
    "q_dedup_ingest",
    "q_dedup_store_compact",
    "q_embed_covariance",
    "q_sim_neardup",
    "q_sim_pairs_lsh",
    "q_dedup_semantic",
    "q_graph_pagerank",
    "q_graph_bfs",
]


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or R16_TOUCHED
    os.makedirs(out_dir, exist_ok=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from data_pipeline_etl_spark.registry import QUERIES, load_all_operators
    from data_pipeline_etl_spark.session import get_spark

    load_all_operators()
    spark = get_spark(f"capture-plans-{suffix}")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    for name in names:
        if name not in QUERIES:
            print(f"SKIP {name}: not registered in this tree", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"capture:{name}")
        df = QUERIES[name](spark, sf_dir)
        text = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {sf_dir} — explain('formatted'), suffix={suffix}\n")
            f.write(text)
        print(f"wrote {path} ({len(text)} chars)")
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
