"""Write-audit-publish (LakeTable.publish_from): the Iceberg WAP /
branch-fast-forward analog. Stage = shallow clone; CDC lands on the
stage; audits run against the stage; ONE atomic source commit adopts
everything. Until publish, the source serves its unchanged snapshot."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from medallion_etl_spark.cdc.dml import delete_where
from medallion_etl_spark.cdc.replay import replay
from medallion_etl_spark.cdc.table import LakeTable
from medallion_etl_spark.synth import gen_events

from .cdc_oracle import assert_frames_equal, canon

N_EVENTS = 3_000
N_KEYS = 200
CHUNK = 1_000


@pytest.fixture()
def staged(spark, tmp_path):
    """Source with the first 2 chunks applied; stage (clone) with the
    full stream applied — the classic WAP shape — plus a control table
    that replayed everything directly."""
    events = gen_events(spark, n_events=N_EVENTS, n_keys=N_KEYS)
    src_root = str(tmp_path / "src")
    replay(
        spark,
        events.filter(F.col("lsn") < 2 * CHUNK),
        LakeTable.create(src_root, n_buckets=8),
        chunk_size=CHUNK,
    )
    stage_root = str(tmp_path / "stage")
    LakeTable.load(src_root).clone_to(stage_root)
    replay(spark, events, LakeTable.load(stage_root), chunk_size=CHUNK)

    ctl_root = str(tmp_path / "ctl")
    replay(spark, events, LakeTable.create(ctl_root, n_buckets=8), chunk_size=CHUNK)
    return src_root, stage_root, ctl_root


def test_publish_fast_forwards_to_the_staged_state(spark, tmp_path, staged):
    src_root, stage_root, ctl_root = staged
    src = LakeTable.load(src_root)
    before = src.version
    pre_publish = src.read(spark).toPandas()

    res = src.publish_from(stage_root)
    assert res["published"] and res["version"] == before + 1
    assert res["staged_batches"]  # the staged chunk ids, for lineage

    head = LakeTable.load(src_root)
    assert head.version == before + 1
    # published state ≡ replaying the stream directly (no stage detour)
    assert_frames_equal(
        head.read(spark).toPandas(),
        canon(LakeTable.load(ctl_root).read(spark).toPandas()),
    )
    # manifest adopted: re-feeding the same stream applies nothing
    assert replay(spark, gen_events(spark, n_events=N_EVENTS, n_keys=N_KEYS),
                  LakeTable.load(src_root), chunk_size=CHUNK)["batches_applied"] == 0
    # time travel to the pre-publish snapshot still serves the old state
    assert_frames_equal(
        LakeTable.load_version(src_root, before).read(spark).toPandas(),
        canon(pre_publish),
    )
    # the stage is invalidated loudly and deregistered from the source
    assert not LakeTable.exists(stage_root)
    assert os.path.exists(os.path.join(stage_root, "metadata", "PUBLISHED"))
    assert os.path.abspath(stage_root) not in head.meta.get("clones", [])


def test_change_feed_spans_the_publish_as_if_applied_directly(spark, staged):
    src_root, stage_root, ctl_root = staged
    src = LakeTable.load(src_root)
    fork = src.version
    src.publish_from(stage_root)
    feed = LakeTable.load(src_root).read_changes(spark, fork).toPandas()
    # the staged chunks' rows, and only those, appear in the feed
    assert len(feed) > 0
    watermark = LakeTable.load_version(src_root, fork).max_committed_lsn()
    assert feed["_lsn"].min() > watermark


def test_publish_refuses_a_diverged_source(spark, tmp_path, staged):
    src_root, stage_root, _ = staged
    # the source moves on after the fork: fast-forward must refuse
    delete_where(spark, LakeTable.load(src_root), "source = 'web'")
    with pytest.raises(RuntimeError, match="source advanced"):
        LakeTable.load(src_root).publish_from(stage_root)
    # refusal left the stage fully intact and loadable
    assert LakeTable.exists(stage_root)
    assert LakeTable.load(stage_root).read(spark).count() > 0


def test_publish_refuses_a_foreign_table(spark, tmp_path, staged):
    src_root, _, ctl_root = staged
    with pytest.raises(ValueError, match="not a clone"):
        LakeTable.load(src_root).publish_from(ctl_root)


def test_publish_refuses_a_restored_stage(spark, staged):
    src_root, stage_root, _ = staged
    LakeTable.load(stage_root).restore(0)
    with pytest.raises(ValueError, match="RESTOREd"):
        LakeTable.load(src_root).publish_from(stage_root)


def test_empty_stage_is_a_noop(spark, tmp_path, staged):
    src_root, _, _ = staged
    empty_root = str(tmp_path / "empty-stage")
    LakeTable.load(src_root).clone_to(empty_root)
    before = LakeTable.load(src_root).version
    res = LakeTable.load(src_root).publish_from(empty_root)
    assert res["published"] is False
    assert LakeTable.load(src_root).version == before
    assert LakeTable.exists(empty_root)  # untouched, still a clone


def test_staged_schema_evolution_publishes(spark, tmp_path):
    """add-column DDL inside the stage: publish adopts the stage's
    schema map, and pre-evolution rows read as NULL in the new column
    exactly as if the DDL had run on the source."""
    events = gen_events(spark, n_events=1_000, n_keys=50, with_evolution=False)
    src_root = str(tmp_path / "src")
    replay(spark, events, LakeTable.create(src_root, n_buckets=4), chunk_size=500)
    stage_root = str(tmp_path / "stage")
    LakeTable.load(src_root).clone_to(stage_root)
    stage = LakeTable.load(stage_root)
    stage.add_column("wap_tag", "string")
    res = LakeTable.load(src_root).publish_from(stage_root)
    assert res["published"]
    head = LakeTable.load(src_root)
    assert "wap_tag" in [f.name for f in head.schema().fields]
    got = head.read(spark)
    assert got.filter(F.col("wap_tag").isNull()).count() == got.count()


def test_republish_after_crashed_invalidation(spark, tmp_path, staged):
    """Crash window between the source commit and the stage
    invalidation: a re-run must detect that the head's data state IS
    the stage's adopted state, finish the invalidation, and report
    already_published — not mis-diagnose divergence."""
    src_root, stage_root, _ = staged
    md = os.path.join(stage_root, "metadata")
    with open(os.path.join(md, "CURRENT")) as f:
        cur = f.read()

    res = LakeTable.load(src_root).publish_from(stage_root)
    assert res["published"] and not res.get("already_published")

    # resurrect CURRENT: the state a crash-before-invalidate leaves
    os.remove(os.path.join(md, "PUBLISHED"))
    with open(os.path.join(md, "CURRENT"), "w") as f:
        f.write(cur)

    again = LakeTable.load(src_root).publish_from(stage_root)
    assert again["published"] and again["already_published"]
    assert not LakeTable.exists(stage_root)  # invalidation finished
    assert os.path.exists(os.path.join(md, "PUBLISHED"))


def test_wap_equals_direct_for_any_stage_program(spark, tmp_path_factory):
    """Property: for ANY random program of staged operations — chunk
    applies (COW or MOR, any order), predicate DML, add-column DDL —
    publish_from produces exactly the state the same program produces
    applied directly to the source. The stage detour must be
    semantically invisible."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from medallion_etl_spark.cdc.apply import apply_batch
    from medallion_etl_spark.cdc.dml import delete_where, update_where

    KEYS = [f"k{i}" for i in range(6)]

    @settings(
        max_examples=4,  # each example runs the program TWICE (stage+direct)
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        events=st.lists(
            st.tuples(
                st.sampled_from(range(len(KEYS))),
                st.sampled_from(["U", "U", "U", "D"]),
            ),
            min_size=4,
            max_size=16,
        ),
        data=st.data(),
    )
    def run(events, data):
        n = len(events)
        base_n = data.draw(st.integers(min_value=1, max_value=n - 1))
        rows = [
            (lsn, op, KEYS[ki], [lsn], 1, "s", None, 1)
            for lsn, (ki, op) in enumerate(events)
        ]
        df = spark.createDataFrame(
            rows,
            "lsn long, op string, doc_id string, tokens array<int>, n_tok int, "
            "source string, lang string, schema_version int",
        )
        mode = data.draw(st.sampled_from(["cow", "mor"]))
        do_dml = data.draw(st.sampled_from([None, "delete", "update"]))
        do_ddl = data.draw(st.booleans())

        def program(root: str) -> None:
            t = LakeTable.load(root)
            tail = df.filter(F.col("lsn") >= base_n)
            apply_batch(
                spark, t, tail, batch_id=7, lsn_lo=base_n, lsn_hi=n - 1,
                write_mode=mode,
            )
            t = LakeTable.load(root)
            if do_ddl:
                t.add_column("wap_extra", "string")
                t = LakeTable.load(root)
            if do_dml == "delete":
                delete_where(spark, t, "n_tok = 1 AND doc_id = 'k0'")
            elif do_dml == "update":
                update_where(spark, t, "doc_id = 'k1'", {"source": "'patched'"})

        tmp = tmp_path_factory.mktemp("wapprop")
        src_root, ctl_root = str(tmp / "src"), str(tmp / "ctl")
        for root in (src_root, ctl_root):
            t = LakeTable.create(root, n_buckets=4, schema_version=1)
            apply_batch(
                spark, t,
                df.filter(F.col("lsn") < base_n),
                batch_id=1, lsn_lo=0, lsn_hi=base_n - 1,
            )
        # staged on a clone of src; direct on ctl
        stage_root = str(tmp / "stage")
        LakeTable.load(src_root).clone_to(stage_root)
        program(stage_root)
        res = LakeTable.load(src_root).publish_from(stage_root)
        assert res["published"]
        program(ctl_root)

        from .cdc_oracle import assert_frames_equal, canon

        assert_frames_equal(
            LakeTable.load(src_root).read(spark).toPandas(),
            canon(LakeTable.load(ctl_root).read(spark).toPandas()),
        )

    run()


def test_streaming_stage_publish_then_seamless_continuation(spark, tmp_path):
    """Streaming WAP: drain a stream into a staged clone, publish, then
    CONTINUE the same stream against the SOURCE with the same
    checkpoint once new files arrive. The adopted manifest carries the
    stage's epoch batch ids, and the checkpoint carries the offsets, so
    the continuation reads only the new files and the final state
    equals the full-stream oracle — the stage detour is invisible to
    the stream."""
    from medallion_etl_spark.streaming.stream_replay import stream_replay
    from medallion_etl_spark.synth import write_events_shuffled

    from .cdc_oracle import expected_final_state

    df = gen_events(spark, n_events=3_000, n_keys=200)
    events_dir = str(tmp_path / "stream")
    write_events_shuffled(df.filter(F.col("lsn") < 2_000), events_dir, n_files=4)

    src_root = str(tmp_path / "src")
    LakeTable.create(src_root, n_buckets=8)
    stage_root = str(tmp_path / "stage")
    LakeTable.load(src_root).clone_to(stage_root)
    ckpt = str(tmp_path / "ckpt")

    t1 = stream_replay(spark, events_dir, stage_root, ckpt, max_files_per_trigger=2)
    assert t1["epochs"] >= 1 and t1["rows_applied"] == 2_000

    res = LakeTable.load(src_root).publish_from(stage_root)
    assert res["published"]
    # the staged epoch ids live in the source manifest now
    assert any(b >= (1 << 40) for b in LakeTable.load(src_root).committed_batches())

    # the stream grows; continuation points at the SOURCE, same checkpoint
    df.filter(F.col("lsn") >= 2_000).coalesce(2).write.mode("append").parquet(
        events_dir
    )
    t2 = stream_replay(spark, events_dir, src_root, ckpt, max_files_per_trigger=2)
    assert t2["rows_applied"] == 1_000  # only the new files were read

    assert_frames_equal(
        LakeTable.load(src_root).read(spark).toPandas(),
        expected_final_state(df.toPandas()),
    )


def test_metadata_only_staged_commit_publishes(spark, tmp_path):
    """A stage whose only commits are metadata (add_constraint) must
    PUBLISH that metadata — regression: a partial data-state comparison
    once swallowed this as already_published, destroying the stage
    without committing anything."""
    events = gen_events(spark, n_events=500, n_keys=40, with_evolution=False)
    src_root = str(tmp_path / "src")
    replay(spark, events, LakeTable.create(src_root, n_buckets=4), chunk_size=500)
    stage_root = str(tmp_path / "stage")
    LakeTable.load(src_root).clone_to(stage_root)
    LakeTable.load(stage_root).add_constraint(spark, "tok_pos", "n_tok >= 0")

    res = LakeTable.load(src_root).publish_from(stage_root)
    assert res["published"] and not res.get("already_published")
    head = LakeTable.load(src_root)
    assert "tok_pos" in head.meta.get("constraints", {})
    assert os.path.abspath(stage_root) not in head.meta.get("clones", [])
