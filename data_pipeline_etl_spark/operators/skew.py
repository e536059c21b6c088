"""Skew-mitigation utilities (SCALE.md; tests-only — no declared query).

AQE's skew-join split handles most runtime skew, but a *known* hot key
(bot user, null-ish sentinel, celebrity entity) is better handled
structurally: salt the build side, replicate the probe side, and the hot
key's rows spread over N partitions instead of one straggler task.

``salted_join`` is the reusable form: results are identical to a plain
equi join (asserted in tests/test_skew.py) while the shuffle key becomes
(key, salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi join with the left (large/skewed) side salted.

    The salt must NOT be a function of the join key alone — that would
    send the hot key back to a single bucket. It is derived from a hash
    of the whole left row (deterministic, unlike rand() or
    monotonically_increasing_id), so a hot key's rows spread across
    buckets as long as any other column varies. The right side is
    replicated n_salts times so every (key, salt) bucket finds its match.
    """
    salt = (F.abs(F.hash(*[F.col(c) for c in left.columns], F.lit("salt"))) % n_salts).alias(
        "__salt"
    )
    salted_left = left.withColumn("__salt", salt)
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    replicated_right = right.select("*", salts)
    joined = salted_left.join(
        replicated_right,
        (F.col(left_key) == F.col(right_key))
        & (salted_left["__salt"] == replicated_right["__salt"]),
        how,
    )
    return joined.drop("__salt")
