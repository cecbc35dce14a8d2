"""Declarative CHECK constraints (cdc/constraints.py + LakeTable.add/
drop_constraint): named SQL predicates stored in table metadata and
enforced by every write path — batch replay, streaming epochs,
predicate DML — under the fail/quarantine/drop policy triple.

SQL-standard semantics under test: only FALSE violates (NULL passes),
delete tombstones are exempt, and adding a constraint validates the
existing rows first (Delta ``ALTER TABLE ADD CONSTRAINT`` analog).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from medallion_etl_spark.cdc.replay import replay
from medallion_etl_spark.cdc.table import LakeTable
from medallion_etl_spark.synth import gen_events

from .cdc_oracle import assert_frames_equal, expected_final_state

N_EVENTS = 3_000
N_KEYS = 200

# gen_events draws n_tok uniformly from [8, 64]: `n_tok <= 40` is
# violated by a large minority of upserts, satisfied by the rest and
# by every delete (NULL n_tok — exempt twice over)
CHECK_NAME = "tok_cap"
CHECK_SQL = "n_tok <= 40"


@pytest.fixture(scope="module")
def stream(spark, tmp_path_factory):
    """(events_path, n_violating): one materialized stream, plus how
    many of its events violate CHECK (n_tok <= 40)."""
    root = tmp_path_factory.mktemp("constraints")
    events = gen_events(spark, n_events=N_EVENTS, n_keys=N_KEYS)
    path = str(root / "events")
    events.coalesce(4).write.parquet(path)
    n_viol = (
        spark.read.parquet(path)
        .filter((F.col("op") != "D") & (F.col("n_tok") > 40))
        .count()
    )
    assert 0 < n_viol < N_EVENTS
    return path, n_viol


def _passing(spark, path):
    """The stream minus its violating events — what quarantine/drop
    must be equivalent to replaying."""
    return spark.read.parquet(path).filter(
        (F.col("op") == "D") | F.col("n_tok").isNull() | (F.col("n_tok") <= 40)
    )


def _final(spark, root):
    return LakeTable.load(root).read(spark).toPandas()


def test_fail_mode_applies_nothing(spark, tmp_path, stream):
    path, n_viol = stream
    table = LakeTable.create(
        str(tmp_path / "t"), n_buckets=8, constraints={CHECK_NAME: CHECK_SQL}
    )
    with pytest.raises(ValueError, match=rf"check:{CHECK_NAME}: {n_viol}"):
        replay(spark, spark.read.parquet(path), table, chunk_size=1_000)
    reloaded = LakeTable.load(table.root)
    assert reloaded.committed_batches() == {}
    assert reloaded.read(spark).count() == 0


def test_quarantine_diverts_and_matches_filtered_replay(spark, tmp_path, stream):
    path, n_viol = stream
    table = LakeTable.create(
        str(tmp_path / "t"), n_buckets=8, constraints={CHECK_NAME: CHECK_SQL}
    )
    res = replay(
        spark,
        spark.read.parquet(path),
        table,
        chunk_size=1_000,
        on_violation="quarantine",
    )
    assert res["rows_violating"] == n_viol
    # every planned chunk committed: resume never re-reads the stream
    assert res["batches_applied"] == res["planned_chunks"]

    qdf = spark.read.parquet(res["violations_path"])
    assert qdf.count() == n_viol
    assert set(r["_reason"] for r in qdf.select("_reason").distinct().collect()) == {
        f"check:{CHECK_NAME}"
    }

    expected = expected_final_state(_passing(spark, path).toPandas())
    assert_frames_equal(_final(spark, table.root), expected)

    # redelivery: all chunks committed, nothing re-applies
    res2 = replay(
        spark,
        spark.read.parquet(path),
        LakeTable.load(table.root),
        chunk_size=1_000,
        on_violation="quarantine",
    )
    assert res2["batches_applied"] == 0


def test_drop_mode_counts_and_matches(spark, tmp_path, stream):
    path, n_viol = stream
    table = LakeTable.create(
        str(tmp_path / "t"), n_buckets=8, constraints={CHECK_NAME: CHECK_SQL}
    )
    res = replay(
        spark, spark.read.parquet(path), table, chunk_size=1_000, on_violation="drop"
    )
    assert res["rows_violating"] == n_viol
    assert "violations_path" not in res
    assert not os.path.exists(os.path.join(table.root, "_quarantine"))
    expected = expected_final_state(_passing(spark, path).toPandas())
    assert_frames_equal(_final(spark, table.root), expected)


def test_null_passes_and_deletes_are_exempt(spark, tmp_path, stream):
    """SQL-standard CHECK: NULL/UNKNOWN passes; tombstones name a key,
    not a payload, so payload predicates never see them. A stream whose
    only NULL n_tok rows are deletes plus one explicit NULL-payload
    upsert must replay clean under fail mode."""
    path, _ = stream
    clean = _passing(spark, path)
    null_upsert = (
        clean.filter(F.col("op") != "D")
        .orderBy("lsn")
        .limit(1)
        .withColumn("lsn", F.col("lsn") + F.lit(N_EVENTS).cast("long"))
        .withColumn("n_tok", F.lit(None).cast("long"))
    )
    table = LakeTable.create(
        str(tmp_path / "t"), n_buckets=8, constraints={CHECK_NAME: CHECK_SQL}
    )
    res = replay(
        spark, clean.unionByName(null_upsert), table, chunk_size=1_000
    )
    assert res["batches_applied"] > 0
    assert "rows_violating" not in res


def test_add_constraint_validates_existing_rows(spark, tmp_path, stream):
    path, _ = stream
    root = str(tmp_path / "t")
    replay(spark, spark.read.parquet(path), LakeTable.create(root, n_buckets=8), chunk_size=1_000)

    # current rows include n_tok > 40 survivors: adding the cap must refuse
    table = LakeTable.load(root)
    v_before = table.version
    with pytest.raises(ValueError, match="existing row"):
        table.add_constraint(spark, CHECK_NAME, CHECK_SQL)
    assert LakeTable.load(root).version == v_before

    # a satisfiable constraint commits (metadata-only) and is enforced
    # against the next replay
    table = LakeTable.load(root)
    res = table.add_constraint(spark, "tok_sane", "n_tok <= 64")
    assert res["version"] == v_before + 1
    assert LakeTable.load(root).constraints == {"tok_sane": "n_tok <= 64"}

    # a later event violating the new constraint must be rejected at
    # apply time (apply_batch's own stats pass — the direct-caller
    # enforcement path; the replay upfront path is covered above)
    from medallion_etl_spark.cdc.apply import apply_batch

    tail = (
        spark.read.parquet(path)
        .orderBy("lsn")
        .limit(1)
        .withColumn("lsn", F.lit(10 * N_EVENTS).cast("long"))
        .withColumn("op", F.lit("U"))
        .withColumn("n_tok", F.lit(65).cast("long"))
    )
    with pytest.raises(ValueError, match="check:tok_sane"):
        apply_batch(
            spark,
            LakeTable.load(root),
            tail,
            batch_id=99,
            lsn_lo=10 * N_EVENTS,
            lsn_hi=10 * N_EVENTS,
        )

    with pytest.raises(ValueError, match="already exists"):
        LakeTable.load(root).add_constraint(spark, "tok_sane", "n_tok <= 9")


def test_drop_constraint_lifts_enforcement(spark, tmp_path, stream):
    path, _ = stream
    root = str(tmp_path / "t")
    LakeTable.create(root, n_buckets=8, constraints={CHECK_NAME: CHECK_SQL})

    with pytest.raises(ValueError, match="no constraint"):
        LakeTable.load(root).drop_constraint("nope")

    LakeTable.load(root).drop_constraint(CHECK_NAME)
    assert LakeTable.load(root).constraints == {}
    res = replay(
        spark, spark.read.parquet(path), LakeTable.load(root), chunk_size=1_000
    )
    assert res["batches_applied"] > 0
    expected = expected_final_state(spark.read.parquet(path).toPandas())
    assert_frames_equal(_final(spark, root), expected)


def test_update_where_enforces_constraints(spark, tmp_path, stream):
    """Predicate DML rides apply_batch, so an UPDATE writing a value
    that violates a CHECK must raise and commit nothing — and a DELETE
    stays exempt (its tombstones carry NULL payloads)."""
    from medallion_etl_spark.cdc.dml import delete_where, update_where

    path, _ = stream
    root = str(tmp_path / "t")
    replay(spark, _passing(spark, path), LakeTable.create(root, n_buckets=8), chunk_size=1_000)
    LakeTable.load(root).add_constraint(spark, CHECK_NAME, CHECK_SQL)

    table = LakeTable.load(root)
    v = table.version
    with pytest.raises(ValueError, match=f"check:{CHECK_NAME}"):
        update_where(spark, table, "true", {"n_tok": "n_tok + 100"})
    assert LakeTable.load(root).version == v

    ok = update_where(spark, LakeTable.load(root), "n_tok > 35", {"n_tok": "n_tok - 10"})
    assert ok["committed"] and ok["rows_updated"] > 0

    dele = delete_where(spark, LakeTable.load(root), "n_tok <= 10")
    assert dele["committed"] and dele["rows_deleted"] > 0


def test_streaming_fail_and_quarantine(spark, tmp_path, stream):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from medallion_etl_spark.streaming.stream_replay import stream_replay

    path, n_viol = stream
    root = str(tmp_path / "t")
    LakeTable.create(root, n_buckets=8, constraints={CHECK_NAME: CHECK_SQL})
    with pytest.raises(StreamingQueryException, match=f"check:{CHECK_NAME}"):
        stream_replay(spark, path, root, str(tmp_path / "ckpt-fail"))

    root2 = str(tmp_path / "t2")
    LakeTable.create(root2, n_buckets=8, constraints={CHECK_NAME: CHECK_SQL})
    totals = stream_replay(
        spark,
        path,
        root2,
        str(tmp_path / "ckpt-q"),
        max_files_per_trigger=2,
        on_violation="quarantine",
    )
    assert totals["rows_violating"] == n_viol
    expected = expected_final_state(_passing(spark, path).toPandas())
    assert_frames_equal(_final(spark, root2), expected)
    qdir = os.path.join(root2, "_quarantine")
    epochs = [d for d in os.listdir(qdir) if d.endswith("-checks")]
    assert epochs
    assert (
        sum(spark.read.parquet(os.path.join(qdir, d)).count() for d in epochs)
        == n_viol
    )
