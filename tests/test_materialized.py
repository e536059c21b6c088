"""materialize_once cache mechanics (no Spark needed: the session arg
only feeds ``id()``).

The build-seconds ledger (VERDICT r16 item 2) must record exactly the
first-touch builds — a cache hit re-recording would overwrite a real
build time with ~0, and an uncached() build leaking into the ledger
would let test runs pollute bench numbers.
"""

from __future__ import annotations

import time

from data_pipeline_etl_spark.operators import materialized
from data_pipeline_etl_spark.operators.materialized import (
    BUILD_SECONDS,
    materialize_once,
    uncached,
)


def test_build_seconds_records_first_touch_only(monkeypatch):
    monkeypatch.setattr(materialized, "_MATERIALIZED", {})
    monkeypatch.setattr(materialized, "BUILD_SECONDS", {})
    fake_spark = object()
    calls = []

    def build():
        calls.append(1)
        time.sleep(0.02)
        return "artifact"

    key = ("unit_probe", "/root/testdata/sf0.01")
    assert materialize_once(fake_spark, key, build) == "artifact"
    assert materialize_once(fake_spark, key, build) == "artifact"
    assert calls == [1], "second call must be a cache hit"
    # path components shorten to their basename in the ledger label
    assert list(materialized.BUILD_SECONDS) == ["unit_probe:sf0.01"]
    first = materialized.BUILD_SECONDS["unit_probe:sf0.01"]
    assert first >= 0.02, "ledger must carry the build wall time"


def test_uncached_builds_do_not_touch_the_ledger(monkeypatch):
    monkeypatch.setattr(materialized, "_MATERIALIZED", {})
    monkeypatch.setattr(materialized, "BUILD_SECONDS", {})
    fake_spark = object()
    calls = []
    with uncached():
        materialize_once(fake_spark, ("unit_probe2",), lambda: calls.append(1))
        materialize_once(fake_spark, ("unit_probe2",), lambda: calls.append(1))
    assert len(calls) == 2, "uncached() must force fresh builds"
    assert materialized.BUILD_SECONDS == {}
    assert materialized._MATERIALIZED == {}


def test_module_level_ledger_is_the_bench_import_surface():
    # bench.py imports BUILD_SECONDS by name; keep the surface stable.
    assert isinstance(BUILD_SECONDS, dict)
