"""Incremental MinHash signature maintenance over the change feed
(operators/dedup_incremental.py): after any sequence of refreshes the
signature table must equal a full recompute from the corpus's current
state, refreshes must be exactly-once, and the changed-docs candidate
probe must match the full batch probe restricted to the changed set."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medallion_etl_spark.cdc.replay import replay
from medallion_etl_spark.cdc.table import LakeTable
from medallion_etl_spark.operators.dedup_incremental import (
    create_signature_table,
    incremental_candidates,
    refresh_signatures,
    token_minhash,
)
from medallion_etl_spark.synth import gen_events

N_EVENTS = 4000
N_KEYS = 300


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    """Corpus replayed in two spans; signatures refreshed after each:
    bootstrap (since v0, i.e. the full feed) then incremental."""
    root = str(tmp_path_factory.mktemp("inc") / "corpus")
    sroot = str(tmp_path_factory.mktemp("inc") / "sig")
    events = gen_events(
        spark, n_events=N_EVENTS, n_keys=N_KEYS, with_evolution=False
    ).persist()
    corpus = LakeTable.create(root, n_buckets=8, schema_version=2)
    sig = create_signature_table(sroot, n_buckets=8)

    replay(spark, events, corpus, chunk_size=N_EVENTS // 2, max_batches=1)
    corpus = LakeTable.load(root)
    v_mid = corpus.version
    refresh_signatures(spark, corpus, sig, since_version=0)
    sig = LakeTable.load(sroot)

    replay(spark, events, corpus, chunk_size=N_EVENTS // 2)  # resumes the tail
    corpus = LakeTable.load(root)
    refresh_signatures(spark, corpus, sig, since_version=v_mid)
    events.unpersist()
    return {
        "corpus": LakeTable.load(root),
        "sig": LakeTable.load(sroot),
        "v_mid": v_mid,
    }


def _sig_state(spark, sig):
    return {
        r["doc_id"]: tuple(r["mh"]) for r in sig.read(spark).collect()
    }


def _full_recompute(spark, corpus):
    rows = (
        corpus.read(spark)
        .select("doc_id", token_minhash(F.col("tokens")).alias("mh"))
        .collect()
    )
    return {r["doc_id"]: tuple(r["mh"]) for r in rows}


def test_incremental_equals_full_recompute(spark, built):
    got = _sig_state(spark, built["sig"])
    exp = _full_recompute(spark, built["corpus"])
    assert got == exp
    assert len(got) > 0  # deletes tombstoned, live docs present


def test_refresh_is_exactly_once(spark, built):
    corpus, sig = built["corpus"], built["sig"]
    before = sig.version
    # redelivery of the SAME span: manifest no-op, no new version
    out = refresh_signatures(spark, corpus, sig, since_version=built["v_mid"])
    assert out.get("skipped") is True
    assert LakeTable.load(sig.root).version == before
    # same target version re-presented as a DIFFERENT span must raise
    with pytest.raises(RuntimeError, match="batch-id collision"):
        refresh_signatures(spark, corpus, sig, since_version=0)


def test_noop_when_already_current(spark, built):
    out = refresh_signatures(
        spark, built["corpus"], built["sig"], since_version=built["corpus"].version
    )
    assert out.get("skipped_empty") is True


def test_candidates_match_full_probe_on_changed_docs(spark, built):
    corpus, sig = built["corpus"], built["sig"]
    changed = (
        corpus.read_changes(spark, built["v_mid"])
        .filter(F.col("_change_type") == "upsert")
        .select("doc_id")
        .distinct()
    )
    got = {
        (r["doc_id"], r["candidate_id"], r["n_shared_bands"], r["est_jaccard"])
        for r in incremental_candidates(spark, sig, changed).collect()
    }
    # full probe = every doc as "changed", then restrict to the set
    all_keys = sig.read(spark).select("doc_id")
    changed_set = {r["doc_id"] for r in changed.collect()}
    full = {
        (r["doc_id"], r["candidate_id"], r["n_shared_bands"], r["est_jaccard"])
        for r in incremental_candidates(spark, sig, all_keys).collect()
        if r["doc_id"] in changed_set
    }
    assert got == full


def test_deleted_docs_leave_no_signature(spark, built):
    corpus, sig = built["corpus"], built["sig"]
    live = {r["doc_id"] for r in corpus.read(spark).select("doc_id").collect()}
    sig_keys = set(_sig_state(spark, sig))
    assert sig_keys == live


def test_probe_broadcasts_changed_side_only(spark, built):
    """The standing signature table must never shuffle for a probe:
    the changed side broadcasts, so the join is BroadcastHashJoin with
    no SortMergeJoin/Exchange on the big side before the join."""
    corpus, sig = built["corpus"], built["sig"]
    changed = corpus.read_changes(spark, built["v_mid"]).select("doc_id").distinct()
    plan = (
        incremental_candidates(spark, sig, changed)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_custom_schema_bootstrap_validation(tmp_path):
    import pyspark.sql.types as T

    with pytest.raises(ValueError, match="not in the bootstrap"):
        LakeTable.create(
            str(tmp_path / "a"),
            schema_version=2,
            schemas={1: T.StructType([T.StructField("doc_id", T.StringType())])},
        )
    with pytest.raises(ValueError, match="key column"):
        LakeTable.create(
            str(tmp_path / "b"),
            schema_version=1,
            schemas={1: T.StructType([T.StructField("other", T.StringType())])},
        )


def test_streaming_refresh_follows_the_corpus(spark, built, tmp_path):
    """A lake_feed-driven streaming drain maintains the SAME state the
    batch refreshes produced: bootstrap a second signature table purely
    from the stream, compare, then verify a re-drain is a no-op
    (checkpoint + manifest exactly-once)."""
    from medallion_etl_spark.operators.dedup_incremental import (
        stream_refresh_signatures,
    )

    corpus = built["corpus"]
    sroot = str(tmp_path / "sig_stream")
    ckpt = str(tmp_path / "ckpt")
    create_signature_table(sroot, n_buckets=8)
    # availableNow + a version cap drains ONE bounded batch per run
    # (feed_source.py docstring), so the full bootstrap drain runs
    # uncapped; backpressure pacing itself is test_feed_backpressure's
    # job.
    totals = stream_refresh_signatures(spark, corpus.root, sroot, ckpt)
    assert totals["epochs"] >= 1
    got = _sig_state(spark, LakeTable.load(sroot))
    assert got == _sig_state(spark, built["sig"])
    # second drain from the same checkpoint: nothing new
    v = LakeTable.load(sroot).version
    stream_refresh_signatures(spark, corpus.root, sroot, ckpt)
    assert LakeTable.load(sroot).version == v
