"""Unit pins for checkpoints.free_local_checkpoint (ADVICE r11).

The storage-boundedness of the three iterative loops that USE the
helper is pinned in tests/test_plans.py; these tests pin the helper's
own contract — exact handle for eager and lazy checkpoints, and the
degrade-to-no-op path for every frame that is NOT a bare checkpoint
(freeing the wrong RDD would be far worse than leaking).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_etl_spark.checkpoints import (
    checkpoint_rdd_handle,
    free_local_checkpoint,
)
from tests.conftest import SF_DIR


def _persisted(spark) -> set[int]:
    jsc = spark.sparkContext._jsc
    return {int(i) for i in jsc.getPersistentRDDs().keySet().toArray()}


def test_handle_found_and_freed_for_eager_and_lazy(spark):
    """Both checkpoint flavors register a persistent RDD at call time;
    the handle resolves to exactly that RDD and freeing removes it from
    the registry (DataFrame.unpersist leaves it — the ADVICE r11 bug
    this module exists to fix)."""
    for eager in (True, False):
        df = spark.range(1000).select("id", (F.col("id") * 2).alias("v"))
        before = _persisted(spark)
        cp = df.localCheckpoint(eager=eager)
        new = _persisted(spark) - before
        assert len(new) == 1, (eager, new)
        cp.count()  # materialize the lazy one too
        cp.unpersist()  # the documented no-op
        assert new <= _persisted(spark), "DataFrame.unpersist freed it?!"
        assert free_local_checkpoint(cp) is True
        assert not (new & _persisted(spark)), (eager, new)


def test_non_checkpoint_frames_degrade_to_none(spark):
    """Anything that is not a bare checkpoint must yield no handle:
    a parquet scan, a plain in-memory frame, and — the dangerous case —
    a TRANSFORMATION on a checkpoint (its analyzed plan has a Project
    over the LogicalRDD; freeing the underlying RDD there would
    invalidate a frame the caller still uses)."""
    scan = spark.read.parquet(f"{SF_DIR}/region.parquet")
    assert checkpoint_rdd_handle(scan) is None
    assert free_local_checkpoint(scan) is False

    plain = spark.range(10)
    assert checkpoint_rdd_handle(plain) is None

    cp = spark.range(100).localCheckpoint(eager=True)
    derived = cp.select((F.col("id") + 1).alias("j"))
    assert checkpoint_rdd_handle(derived) is None
    assert free_local_checkpoint(derived) is False
    assert derived.count() == 100  # untouched — the checkpoint survived
    assert free_local_checkpoint(cp) is True  # cleanup
