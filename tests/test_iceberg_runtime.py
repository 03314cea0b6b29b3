"""Real-Iceberg-runtime integration test (feature-flagged).

The container this repo is built in has no iceberg-spark-runtime jar and no
network, so the table lifecycle ops (time travel, MERGE, snapshot expiry,
compaction) are modeled over DataFrame manifests (README "Iceberg note";
reference itself simulates manifests in pure Python —
poc/utils/manifest_generator.py:31-127). This test is the probe for the real
path: when a runtime jar IS present (SPARK_GRAFT_ICEBERG_JAR, or dropped
into pyspark/jars), get_spark() wires the Iceberg extensions + a hadoop
catalog, and this test certifies that the semantics the modeled queries
implement (snapshot-versioned reads, merge upsert, snapshot expiry) hold
verbatim against a real catalog table. Without the jar it skips — visibly,
not silently.
"""

from __future__ import annotations

import pytest

from iceberg_benchmark_poc_spark.core.session import iceberg_runtime_jar

jar = iceberg_runtime_jar()
pytestmark = pytest.mark.skipif(
    jar is None,
    reason="no iceberg-spark-runtime jar available offline (README 'Iceberg note'); "
    "set SPARK_GRAFT_ICEBERG_JAR to enable the real-catalog path",
)


@pytest.fixture(scope="module")
def iceberg_spark(tmp_path_factory):
    from iceberg_benchmark_poc_spark.core.session import get_spark

    warehouse = str(tmp_path_factory.mktemp("warehouse"))
    import os

    os.environ["SPARK_GRAFT_ICEBERG_WAREHOUSE"] = warehouse
    spark = get_spark(app_name="iceberg-runtime-test")
    yield spark


def test_time_travel_versions(iceberg_spark):
    """VERSION AS OF must reproduce each commit's row count — the contract
    q_time_travel models with a snapshot-tagged manifest DataFrame."""
    s = iceberg_spark
    s.sql("DROP TABLE IF EXISTS local.db.tt")
    s.sql("CREATE TABLE local.db.tt (id BIGINT, v DOUBLE) USING iceberg")
    s.sql("INSERT INTO local.db.tt SELECT id, CAST(id AS DOUBLE) FROM range(100)")
    s.sql("INSERT INTO local.db.tt SELECT id + 100, CAST(id AS DOUBLE) FROM range(50)")
    snaps = [
        r["snapshot_id"]
        for r in s.sql(
            "SELECT snapshot_id FROM local.db.tt.snapshots ORDER BY committed_at"
        ).collect()
    ]
    assert len(snaps) == 2
    c0 = s.sql(f"SELECT count(*) AS n FROM local.db.tt VERSION AS OF {snaps[0]}").collect()[0]["n"]
    c1 = s.sql(f"SELECT count(*) AS n FROM local.db.tt VERSION AS OF {snaps[1]}").collect()[0]["n"]
    assert (c0, c1) == (100, 150)


def test_merge_upsert_semantics(iceberg_spark):
    """MERGE matched-update/not-matched-insert — the contract q_merge_upsert
    models with a coalesce-join over base + updates DataFrames."""
    s = iceberg_spark
    s.sql("DROP TABLE IF EXISTS local.db.mu")
    s.sql("CREATE TABLE local.db.mu (id BIGINT, v BIGINT) USING iceberg")
    s.sql("INSERT INTO local.db.mu SELECT id, 0 FROM range(10)")
    s.sql(
        """
        MERGE INTO local.db.mu t
        USING (SELECT id + 5 AS id, 1 AS v FROM range(10)) u
        ON t.id = u.id
        WHEN MATCHED THEN UPDATE SET t.v = u.v
        WHEN NOT MATCHED THEN INSERT (id, v) VALUES (u.id, u.v)
        """
    )
    rows = {r["id"]: r["v"] for r in s.sql("SELECT id, v FROM local.db.mu").collect()}
    assert len(rows) == 15
    assert all(rows[i] == 0 for i in range(5))  # untouched
    assert all(rows[i] == 1 for i in range(5, 15))  # updated + inserted


def test_expire_snapshots(iceberg_spark):
    """expire_snapshots drops history but keeps current data — the contract
    q_expire_snapshots models over its manifest DataFrame."""
    s = iceberg_spark
    s.sql("DROP TABLE IF EXISTS local.db.ex")
    s.sql("CREATE TABLE local.db.ex (id BIGINT) USING iceberg")
    for _ in range(3):
        s.sql("INSERT INTO local.db.ex SELECT id FROM range(10)")
    before = s.sql("SELECT count(*) AS n FROM local.db.ex.snapshots").collect()[0]["n"]
    assert before == 3
    s.sql(
        "CALL local.system.expire_snapshots(table => 'db.ex', retain_last => 1, "
        "older_than => TIMESTAMP '9999-01-01 00:00:00')"
    )
    after = s.sql("SELECT count(*) AS n FROM local.db.ex.snapshots").collect()[0]["n"]
    assert after == 1
    assert s.sql("SELECT count(*) AS n FROM local.db.ex").collect()[0]["n"] == 30
