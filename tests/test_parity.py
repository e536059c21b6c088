"""Local replica of the driver's t2 gate (SURVEY.md §5.2.3).

For every declared query, run the Spark DataFrame and the DuckDB oracle on
the same parquet fixtures and require the result *multisets* to be equal
after type canonicalization (column-name sort, timestamps → ISO strings,
arrays → tuples, exact value equality — no fuzzy float comparison, because
the driver hashes exact values).
"""

from __future__ import annotations

import math
from collections import Counter
from datetime import date, datetime
from decimal import Decimal

import numpy as np
import pandas as pd
import pytest

from data_pipeline_etl_spark.registry import QUERIES, ORACLES, load_all_operators
from tests.conftest import SF_DIR

load_all_operators()


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        # repr-strict: distinguishes -0.0 from 0.0 and every ULP — the
        # driver hashes exact values, so the local gate must too (a -0.0
        # mismatch in round(cos) slipped past a laxer canon once).
        return repr(f)
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (np.integer, int)):
        return int(v)
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, (pd.Timestamp, datetime)):
        if v is pd.NaT or (isinstance(v, pd.Timestamp) and pd.isna(v)):
            return None
        return pd.Timestamp(v).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_canon_value(x) for x in v)
    if v is pd.NaT:
        return None
    if isinstance(v, float) and pd.isna(v):
        return None
    return v


def _canon_frame(df: pd.DataFrame) -> Counter:
    cols = sorted(df.columns)
    rows = Counter()
    for row in df[cols].itertuples(index=False, name=None):
        rows[tuple(_canon_value(v) for v in row)] += 1
    return rows


def _diff_sample(a: Counter, b: Counter, n: int = 3) -> str:
    only_a = list((a - b).keys())[:n]
    only_b = list((b - a).keys())[:n]
    return f"spark-only={only_a}\nduck-only={only_b}"


DECLARED = sorted(ORACLES.keys())


@pytest.mark.parametrize("name", DECLARED)
def test_oracle_parity(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    ddf = duck.sql(ORACLES[name]).df()
    assert sorted(sdf.columns) == sorted(ddf.columns), (
        f"{name}: column mismatch spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}"
    )
    assert len(sdf) == len(ddf), f"{name}: row count {len(sdf)} vs {len(ddf)}"
    # Driver-faithful canonicalization probe: the driver's canonicalizer
    # HASHES cells (sort_values alone only compares and would pass on
    # list-valued cells — verified empirically), so run drop_duplicates,
    # which does hash every cell and raises TypeError on unhashable
    # (list/dict) outputs. Driver-incompatible outputs fail HERE, not in
    # CORRECTNESS_r{N}.json (round-1 lesson: q_agg_collect).
    cols = sorted(sdf.columns)
    sdf[cols].drop_duplicates()
    ddf[cols].drop_duplicates()
    ca, cb = _canon_frame(sdf), _canon_frame(ddf)
    assert ca == cb, f"{name}: value mismatch\n{_diff_sample(ca, cb)}"


ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(name, spark):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0
