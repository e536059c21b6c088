"""Real storage release for superseded localCheckpoint frames.

``DataFrame.unpersist()`` is a no-op on a localCheckpoint-backed frame:
the checkpoint's RDD blocks are registered in the SparkContext's
persistent-RDD registry (``RDD.persist`` inside
``LocalRDDCheckpointData``), NOT in the SQL CacheManager that
``DataFrame.unpersist`` talks to — so iterative operators that "free"
superseded checkpoints that way actually pin one |frame|-row RDD per
iteration in executor storage until driver GC gets around to it
(ADVICE r11, verified empirically on PySpark 4.1: after
``cp.unpersist()`` the RDD id is still in
``sc._jsc.getPersistentRDDs()``; after ``LogicalRDD.rdd().unpersist``
it is gone and the blocks are deleted).

The fix: ``Dataset.localCheckpoint`` returns a frame whose analyzed
plan is exactly one ``LogicalRDD`` node wrapping the checkpointed
(persisted) internal RDD, for both eager and lazy checkpoints. Grab
that JVM RDD handle and call the RDD-level ``unpersist`` on it.

Safety contract (same as localCheckpoint itself): freeing a checkpoint
deletes the only copy of its data — the lineage was truncated — so a
caller must free a checkpoint only once every frame derived from it has
been materialized into its OWN checkpoint/cache/output. The BPE trainer
(operators/llm_text.py ``_bpe_rounds``) frees round r-2's vocab only
after round r's eager argmax has fully materialized round r-1's.

Degradation: the handle walk uses the classic-session py4j surface
(``df._jdf``). If that surface is absent (Spark Connect) or the plan
shape ever changes, ``free_local_checkpoint`` returns False and the
checkpoint stays merely GC-eligible — a slow leak, never a wrong
result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def checkpoint_rdd_handle(df: DataFrame):
    """The JVM RDD backing a localCheckpoint-ed frame, or None.

    Only a frame returned by ``localCheckpoint``/``checkpoint`` has a
    bare ``LogicalRDD`` as its whole analyzed plan; anything else (a
    transformation ON a checkpoint, a parquet scan, a Connect proxy)
    yields None rather than a handle to the wrong RDD.
    """
    try:
        node = df._jdf.queryExecution().analyzed()
        if node.getClass().getSimpleName() != "LogicalRDD":
            return None
        return node.rdd()
    except Exception:  # Spark Connect / internals drift: degrade to no-op
        return None


def free_local_checkpoint(df: DataFrame) -> bool:
    """Release a superseded localCheckpoint's blocks NOW (best effort).

    Returns True if the backing RDD was found and unpersisted, False if
    the frame wasn't a recognizable checkpoint (then it is merely
    GC-eligible once the caller drops the reference). After a True
    return the frame is UNREADABLE — its lineage was truncated at
    checkpoint time — so only call this on frames nothing will read
    again.
    """
    handle = checkpoint_rdd_handle(df)
    if handle is None:
        return False
    handle.unpersist(False)  # non-blocking: removal proceeds async
    return True
