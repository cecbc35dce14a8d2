"""Merge-on-read write path (apply.py write_mode='mor'): delta appends
converge to the same state as copy-on-write, tombstones in deltas
delete and block resurrection, COW applies / compaction fold deltas,
the change feed (batch + stream) stays net-change and reads ONLY delta
files across a delta-append span, and the 'auto' policy appends when
the chunk is small against its base and folds at the delta cap."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from medallion_etl_spark.cdc.apply import apply_batch
from medallion_etl_spark.cdc.replay import replay
from medallion_etl_spark.cdc.table import LakeTable
from medallion_etl_spark.synth import gen_events, write_events_shuffled

from .cdc_oracle import assert_frames_equal, expected_final_state

N_EVENTS = 6_000
N_KEYS = 500


@pytest.fixture(scope="module")
def events_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mor_events") / "stream")
    df = gen_events(spark, n_events=N_EVENTS, n_keys=N_KEYS, hot_fraction=0.25, n_hot=3)
    write_events_shuffled(df, path, n_files=8)
    return path


@pytest.fixture(scope="module")
def events_pdf(spark, events_path):
    return spark.read.parquet(events_path).toPandas()


def _delta_counts(table: LakeTable) -> dict[int, int]:
    return {
        int(b): len(e.get("deltas", []))
        for b, e in table.meta["buckets"].items()
        if e.get("deltas")
    }


def _apply(spark, table, events, batch_id, lo, hi, **kw):
    chunk = events.filter(F.col("lsn").between(lo, hi))
    apply_batch(spark, table, chunk, batch_id=batch_id, lsn_lo=lo, lsn_hi=hi, **kw)
    return LakeTable.load(table.root)


def test_mor_replay_matches_oracle_and_appends_deltas(spark, tmp_path, events_path, events_pdf):
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    events = spark.read.parquet(events_path)
    res = replay(spark, events, table, chunk_size=1_500, write_mode="mor")
    assert res["batches_applied"] == res["planned_chunks"] == 4
    table = LakeTable.load(table.root)
    # deltas stacked, base pointers only from the first-touch commits
    assert _delta_counts(table), "MOR replay left no delta appends"
    assert_frames_equal(table.read(spark).toPandas(), expected_final_state(events_pdf))
    # schema evolved along the way exactly as the COW path does
    assert table.schema_version == 3
    assert dict(table.read(spark).dtypes)["n_tok"] == "bigint"


def test_mor_out_of_order_redelivery_and_tombstones(spark, tmp_path):
    events = spark.createDataFrame(
        [
            (0, "I", "a", [0], 1, "s"),
            (1, "I", "b", [1], 1, "s"),
            (4, "D", "a", None, None, "s"),  # delete wins over...
            (2, "U", "a", [2], 1, "s"),  # ...this stale update, applied LAST
            (3, "U", "b", [3], 1, "s"),
        ],
        "lsn long, op string, doc_id string, tokens array<int>, n_tok int, source string",
    )
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=4)
    # scrambled chunk order, every chunk a MOR delta append
    for bid, lo, hi in [(2, 4, 4), (0, 0, 1), (1, 2, 3)]:
        table = _apply(spark, table, events, bid, lo, hi, write_mode="mor")
        # at-least-once redelivery of a committed delta is a no-op
        res = apply_batch(
            spark,
            table,
            events.filter(F.col("lsn").between(lo, hi)),
            batch_id=bid,
            lsn_lo=lo,
            lsn_hi=hi,
            write_mode="mor",
        )
        assert res.get("skipped")
    rows = {r["doc_id"]: r["tokens"] for r in table.read(spark).collect()}
    assert rows == {"b": [3]}  # 'a' deleted; stale lsn=2 update cannot resurrect it
    # the tombstone is still stored raw (resurrection guard), just not surfaced
    raw = {r["doc_id"]: r["_deleted"] for r in table.read(spark, raw=True).collect()}
    assert raw["a"] is True


def test_cow_apply_and_compact_fold_deltas(spark, tmp_path, events_path, events_pdf):
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    events = spark.read.parquet(events_path)
    replay(spark, events.filter(F.col("lsn") < 3_000), table, chunk_size=1_500, write_mode="mor")
    table = LakeTable.load(table.root)
    assert _delta_counts(table)
    # a COW apply rewrites its touched buckets -> their deltas fold away
    # (batch id 99: replay()'s small-int chunk ids are derived from the
    # stream's LSN minimum, so a second filtered replay would collide)
    table = _apply(
        spark,
        LakeTable.load(table.root),
        events,
        99,
        3_000,
        N_EVENTS - 1,
        write_mode="cow",
    )
    assert_frames_equal(table.read(spark).toPandas(), expected_final_state(events_pdf))
    # compaction folds the rest and purges nothing it shouldn't
    table.compact(spark, watermark_lsn=N_EVENTS)
    table = LakeTable.load(table.root)
    assert not _delta_counts(table), "compaction must fold every delta"
    deleted = expected_final_state(events_pdf)
    assert_frames_equal(table.read(spark).toPandas(), deleted)
    # raw state has no tombstones left (all purgeable at this watermark)
    assert table.read(spark, raw=True).filter(F.col("_deleted")).count() == 0


def test_change_feed_across_mor_span_reads_only_delta_files(spark, tmp_path):
    events = gen_events(spark, n_events=4_000, n_keys=400).cache()
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    table = _apply(spark, table, events, 0, 0, 1_999, write_mode="cow")
    v0 = table.version
    table = _apply(spark, table, events, 1, 2_000, 2_999, write_mode="mor")
    table = _apply(spark, table, events, 2, 3_000, 3_999, write_mode="mor")

    feed = table.read_changes(spark, since_version=v0)
    # net change: one row per key changed in the span, at its max LSN
    span = events.filter(F.col("lsn") >= 2_000).toPandas()
    want = span.sort_values("lsn").drop_duplicates("doc_id", keep="last")
    got = feed.select("doc_id", "_lsn", "_change_type").toPandas()
    assert len(got) == len(want)
    assert sorted(got["doc_id"]) == sorted(want["doc_id"])
    assert set(zip(got["doc_id"], got["_lsn"])) == set(zip(want["doc_id"], want["lsn"]))
    # the span only APPENDED deltas: the base files (all rows <= the
    # feed watermark, proven by their footer max_lsn) must not be
    # opened at all — O(|appended data|), the MOR feed-cost invariant
    base_dirs = {e["dir"] for e in LakeTable.load_version(table.root, v0).meta["buckets"].values()}
    assert feed.inputFiles(), "feed should read the appended delta files"
    for f in feed.inputFiles():
        assert not any(b in f for b in base_dirs), f"feed opened base file {f}"


def test_mor_lookup_expire_and_history(spark, tmp_path):
    events = gen_events(spark, n_events=3_000, n_keys=300).cache()
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    table = _apply(spark, table, events, 0, 0, 1_499, write_mode="cow")
    table = _apply(spark, table, events, 1, 1_500, 2_999, write_mode="mor")
    pdf = events.toPandas()
    want = expected_final_state(pdf)
    some_keys = list(want["doc_id"].head(5))
    got = table.lookup(spark, some_keys).toPandas()
    assert_frames_equal(got, want[want["doc_id"].isin(some_keys)])
    # history: the MOR commit counts as a bucket layout change
    hist = table.history()
    assert hist[-1]["batches_added"] == [1] and hist[-1]["buckets_changed"] > 0
    # expire to head only: delta dirs stay referenced, state intact
    res = table.expire_snapshots(keep_last=1, grace_seconds=0)
    assert res["expired_versions"]
    table = LakeTable.load(table.root)
    assert _delta_counts(table)  # deltas survived expiry
    assert_frames_equal(table.read(spark).toPandas(), want)


def test_feed_stream_over_mor_equals_batch(spark, tmp_path):
    from medallion_etl_spark.streaming.feed_source import read_feed_stream

    events = gen_events(spark, n_events=3_000, n_keys=300).cache()
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    table = _apply(spark, table, events, 0, 0, 999, write_mode="cow")
    v0 = table.version
    # two stacked deltas so the stream partition must LWW-dedup across
    # sources (a key updated in both batches would otherwise double)
    table = _apply(spark, table, events, 1, 1_000, 1_999, write_mode="mor")
    table = _apply(spark, table, events, 2, 2_000, 2_999, write_mode="mor")

    feed = read_feed_stream(spark, table.root, start_version=v0)
    q = (
        feed.writeStream.format("memory")
        .queryName("mor_feed_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive
    got = sorted(
        (r["doc_id"], r["_lsn"], r["_change_type"])
        for r in spark.sql("SELECT * FROM mor_feed_sink").collect()
    )
    want = sorted(
        (r["doc_id"], r["_lsn"], r["_change_type"])
        for r in table.read_changes(spark, since_version=v0).collect()
    )
    assert got == want and got  # non-empty and identical to the batch feed


def test_auto_write_mode_appends_small_chunks_and_folds_at_cap(spark, tmp_path):
    events = gen_events(spark, n_events=5_000, n_keys=450).cache()
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    # big bootstrap chunk: auto must pick COW (chunk IS the base)
    table = _apply(spark, table, events, 0, 0, 3_999, write_mode="auto")
    assert not _delta_counts(table)
    # small chunk against a big base: auto appends a delta
    table = _apply(spark, table, events, 1, 4_000, 4_049, write_mode="auto")
    assert _delta_counts(table)
    # cap reached: the next auto apply folds its touched buckets via
    # COW (mor_max_deltas=1); buckets the chunk doesn't touch keep
    # their deltas — folding is work-proportional, not table-wide
    from medallion_etl_spark.cdc.table import bucket_expr

    chunk2 = events.filter(F.col("lsn").between(4_050, 4_099))
    touched = {
        r[0] for r in chunk2.select(bucket_expr("doc_id", 8)).distinct().collect()
    }
    table = _apply(
        spark, table, events, 2, 4_050, 4_099, write_mode="auto", mor_max_deltas=1
    )
    assert not (
        set(_delta_counts(table)) & touched
    ), "hitting the delta cap must fold the touched buckets via COW"
    assert_frames_equal(
        table.read(spark).toPandas(),
        expected_final_state(events.filter(F.col("lsn") < 4_100).toPandas()),
    )


def test_mor_schema_evolution_delta_over_old_base(spark, tmp_path):
    """A delta written at a NEWER schema version over a v1 base: the
    read aligns the old base files (add-column -> NULL, widen -> cast)
    and the merged state is exact."""
    v1_events = spark.createDataFrame(
        [(0, "I", "a", [0], 1, "s", 1), (1, "I", "b", [1], 1, "s", 1)],
        "lsn long, op string, doc_id string, tokens array<int>, n_tok int, "
        "source string, schema_version int",
    )
    v3_events = spark.createDataFrame(
        [(2, "U", "a", [2], 2, "s", "en", 3)],
        "lsn long, op string, doc_id string, tokens array<int>, n_tok long, "
        "source string, lang string, schema_version int",
    )
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=4, schema_version=1)
    table = _apply(spark, table, v1_events, 0, 0, 1, write_mode="cow")
    table = _apply(spark, table, v3_events, 1, 2, 2, write_mode="mor")
    assert table.schema_version == 3
    rows = {r["doc_id"]: (r["tokens"], r["n_tok"], r["lang"]) for r in table.read(spark).collect()}
    assert rows == {"a": ([2], 2, "en"), "b": ([1], 1, None)}
    assert dict(table.read(spark).dtypes)["n_tok"] == "bigint"


def test_fold_is_scoped_to_delta_carrying_buckets(spark, tmp_path):
    """The read-side LWW fold must shuffle ONLY rows from buckets that
    actually carry deltas. A key lives in exactly one bucket and a
    clean bucket is one COW dir already holding one row per key, so
    clean buckets legally bypass the groupBy fold — at scale the merge
    cost is O(|delta buckets|), not O(|table|)."""
    from medallion_etl_spark.cdc.table import bucket_expr

    events = gen_events(spark, n_events=4_000, n_keys=400, hot_fraction=0.0).cache()
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    table = _apply(spark, table, events, 0, 0, 2_999, write_mode="cow")
    # MOR-append a chunk filtered to the keys of ONE bucket
    tail = events.filter(F.col("lsn") >= 3_000).filter(bucket_expr("doc_id", 8) == 5)
    hi = tail.agg(F.max("lsn")).collect()[0][0]
    apply_batch(spark, table, tail, batch_id=1, lsn_lo=3_000, lsn_hi=hi, write_mode="mor")
    table = LakeTable.load(table.root)
    assert set(_delta_counts(table)) == {5}

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    # pruned read of a clean bucket: no fold node at all
    assert "Aggregate" not in plan(table.read(spark, buckets=[4]))
    # pruned read of the delta bucket: the fold is there
    assert "Aggregate" in plan(table.read(spark, buckets=[5]))
    # full read: clean-bucket scans sit ABOVE/OUTSIDE the fold — a scan
    # line precedes the first aggregate node in the plan tree
    full = table.read(spark)
    lines = plan(full).splitlines()
    first_agg = next(i for i, l in enumerate(lines) if "Aggregate" in l)
    assert any(
        "FileScan" in l or "Scan parquet" in l for l in lines[:first_agg]
    ), "clean buckets were routed through the fold"
    # and the result is still the exact LWW state
    applied = events.filter(
        (F.col("lsn") < 3_000)
        | ((F.col("lsn") >= 3_000) & (bucket_expr("doc_id", 8) == 5))
    )
    assert_frames_equal(full.toPandas(), expected_final_state(applied.toPandas()))


def test_projected_read_prunes_payload_through_the_fold(spark, tmp_path):
    """read(columns=...) projects BEFORE the MOR fold, so the parquet
    scans of delta-carrying buckets never read the payload columns the
    caller didn't ask for — Catalyst can't prune through the fold's
    struct aggregate on its own."""
    import contextlib
    import io

    events = gen_events(spark, n_events=3_000, n_keys=300).cache()
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=4)
    table = _apply(spark, table, events, 0, 0, 1_999, write_mode="cow")
    table = _apply(spark, table, events, 1, 2_000, 2_999, write_mode="mor")
    assert _delta_counts(table), "setup must leave MOR deltas in place"

    narrow = table.read(spark, columns=["n_tok"])
    assert set(narrow.columns) == {"doc_id", "n_tok"}
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        narrow.explain(mode="formatted")
    schema_lines = [l for l in buf.getvalue().splitlines() if "ReadSchema" in l]
    assert schema_lines, "expected parquet scans in the plan"
    assert all(
        "tokens" not in l for l in schema_lines
    ), "un-requested payload column reached a scan"

    full = table.read(spark).select("doc_id", "n_tok")
    a = narrow.toPandas().sort_values("doc_id").reset_index(drop=True)
    b = full.toPandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)

    with pytest.raises(ValueError):
        table.read(spark, columns=["no_such_col"])

    keys = [r["doc_id"] for r in full.limit(3).collect()]
    got = table.lookup(spark, keys, columns=["n_tok"]).toPandas()
    assert set(got.columns) == {"doc_id", "n_tok"}
    assert len(got) == len(keys)


def test_fold_deltas_targets_only_delta_buckets(spark, tmp_path, events_path, events_pdf):
    """Standing MOR maintenance (LakeTable.fold_deltas): folds base ∪
    deltas to a new base for delta-carrying buckets only — state
    unchanged, delta lists gone, CLEAN buckets' entries keep their
    exact dir strings, tombstones and the compaction watermark
    untouched, and a feed spanning the fold reads zero rows."""
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    events = spark.read.parquet(events_path)
    replay(spark, events, table, chunk_size=1_500, write_mode="mor")
    table = LakeTable.load(table.root)
    pre_version = table.version
    before = table.read(spark).toPandas()
    pre_deltas = _delta_counts(table)
    assert pre_deltas
    clean_entries = {
        b: e["dir"]
        for b, e in table.meta["buckets"].items()
        if not e.get("deltas")
    }
    pre_raw = table.read(spark, raw=True).toPandas()
    n_tombstones = int(pre_raw["_deleted"].fillna(False).sum())
    assert n_tombstones > 0  # the stream carries deletes

    res = table.fold_deltas(spark)
    assert res["committed"]
    assert sorted(res["folded_buckets"]) == sorted(pre_deltas)

    head = LakeTable.load(table.root)
    assert not _delta_counts(head), "deltas survived the fold"
    for b, d in clean_entries.items():
        assert head.meta["buckets"][b]["dir"] == d  # untouched pointers
    assert_frames_equal(head.read(spark).toPandas(), before)
    # tombstones NOT purged (fold is not compact): same raw tombstone count
    post_raw = head.read(spark, raw=True).toPandas()
    assert int(post_raw["_deleted"].fillna(False).sum()) == n_tombstones
    assert head.meta.get("compaction_watermark_lsn", -1) == table.meta.get(
        "compaction_watermark_lsn", -1
    )
    # feed across the fold: pointers moved, no new LSNs -> zero rows,
    # and the footer stats make it a pure metadata decision
    feed = head.read_changes(spark, since_version=pre_version)
    assert feed.count() == 0

    # threshold: nothing left at or above 1 delta -> no-op, no commit
    again = LakeTable.load(table.root).fold_deltas(spark)
    assert again == {"folded_buckets": [], "committed": False}
    assert LakeTable.load(table.root).version == head.version


def test_fold_deltas_honors_zorder_clustering(spark, tmp_path, events_path):
    """Folding a z-ordered table must re-sort the rewritten buckets by
    the RECORDED Z-spec — otherwise the folded buckets silently lose
    the row-group pruning the metadata still claims."""
    from medallion_etl_spark.cdc.zorder import zvalue_col

    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    events = spark.read.parquet(events_path)
    replay(spark, events, table, chunk_size=N_EVENTS)
    table = LakeTable.load(table.root)
    table.compact(spark, watermark_lsn=-1, zorder_by=["source"])
    # stack deltas on a couple of buckets
    tail = (
        events.orderBy("lsn")
        .limit(300)
        .withColumn("lsn", F.col("lsn") + F.lit(N_EVENTS).cast("long"))
    )
    t = LakeTable.load(table.root)
    apply_batch(
        spark, t, tail, batch_id=77, lsn_lo=N_EVENTS, lsn_hi=N_EVENTS + 300,
        write_mode="mor",
    )
    t = LakeTable.load(table.root)
    folded = t.fold_deltas(spark)
    assert folded["committed"] and folded["folded_buckets"]
    head = LakeTable.load(table.root)
    assert head.meta["clustering"]["kind"] == "zorder"  # unchanged claim
    b = folded["folded_buckets"][0]
    entry = head.meta["buckets"][str(b)]
    bdf = spark.read.parquet(os.path.join(table.root, entry["dir"]))
    vals = [
        r[0]
        for r in bdf.select(zvalue_col(bdf, ["source"], coding="linear")).collect()
    ]
    assert vals == sorted(vals), "folded bucket lost its Z-sort"
