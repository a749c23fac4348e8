"""Streaming tests: file-source stream + availableNow trigger + memory sink,
asserting stream results == the batch twin over the same parquet."""

from __future__ import annotations

import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from dedupe_spark.streaming.ops import (
    running_totals_stateful,
    sessionize,
    streaming_exact_dedupe,
    windowed_event_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Events parquet restaged into a stream-source directory."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    # watermarks require TIMESTAMP (with tz); the source parquet is NTZ
    spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).coalesce(2).write.mode("overwrite").parquet(d)
    return d


def _stream(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    return spark.readStream.schema(schema).parquet(events_dir)


def _run_to_memory(df, name: str, mode: str = "append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def _rows(spark, name):
    return {tuple(r) for r in spark.sql(f"SELECT * FROM {name}").collect()}


def test_windowed_counts_stream_equals_batch(spark, events_dir):
    """Append-mode emits exactly the windows the final watermark has closed;
    those must match the batch twin, and nothing outside batch may appear."""
    import datetime as dt

    name = f"win_{uuid.uuid4().hex[:8]}"
    _run_to_memory(
        windowed_event_counts(_stream(spark, events_dir)), name, mode="append"
    )
    batch = windowed_event_counts(spark.read.parquet(events_dir)).collect()
    max_ts = spark.read.parquet(events_dir).agg(F.max("ts")).first()[0]
    cutoff = max_ts - dt.timedelta(hours=2)
    got = _rows(spark, name)
    allb = {tuple(r) for r in batch}
    closed = {
        tuple(r) for r in batch if r["hour"] + dt.timedelta(hours=1) < cutoff
    }
    assert got, "stream emitted nothing"
    assert closed <= got <= allb, (
        len(closed), len(got), len(allb)
    )


def test_sessionize_stream_equals_batch(spark, events_dir):
    import datetime as dt

    name = f"sess_{uuid.uuid4().hex[:8]}"
    _run_to_memory(sessionize(_stream(spark, events_dir)), name, mode="append")
    src = spark.read.parquet(events_dir)
    batch_full = (
        src.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
        .collect()
    )
    max_ts = src.agg(F.max("ts")).first()[0]
    cutoff = max_ts - dt.timedelta(hours=2)
    got = _rows(spark, name)
    allb = {(r["user_id"], r["session_start"], r["n_events"]) for r in batch_full}
    closed = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in batch_full
        if r["session_end"] < cutoff - dt.timedelta(seconds=1)
    }
    assert got, "stream emitted nothing"
    assert closed <= got <= allb, (len(closed), len(got), len(allb))


def test_streaming_exact_dedupe_one_row_per_sha(spark, tmp_path):
    src = str(tmp_path / "files_stream")
    rows = [
        ("r1", "a.py", "def f(): pass"),
        ("r2", "b.py", "def f(): pass"),  # exact dup of a.py
        ("r3", "c.py", "def g(): pass"),
    ]
    df = spark.createDataFrame(rows, ["repo", "path", "content"]).withColumn(
        "ts", F.timestamp_seconds(F.lit(1700000000))
    )
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    name = f"dd_{uuid.uuid4().hex[:8]}"
    _run_to_memory(
        streaming_exact_dedupe(stream, ts_col="ts", watermark="10 minutes"), name
    )
    out = spark.sql(f"SELECT content_sha FROM {name}").collect()
    assert len(out) == 2  # 3 rows, one duplicate sha collapsed
    assert len({r["content_sha"] for r in out}) == 2


def test_stateful_running_totals(spark, events_dir):
    name = f"tot_{uuid.uuid4().hex[:8]}"
    _run_to_memory(
        running_totals_stateful(_stream(spark, events_dir)), name, mode="update"
    )
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql(
            f"SELECT user_id, max(n_events) AS n_events, max(total_value) AS total_value "
            f"FROM {name} GROUP BY user_id"
        ).collect()
    }
    batch = {
        r["user_id"]: (r["n"], r["t"])
        for r in spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("t"))
        .collect()
    }
    assert set(got) == set(batch)
    for uid, (n, t) in batch.items():
        assert got[uid][0] == n
        assert abs(got[uid][1] - t) < 1e-6


def test_split_operator_is_streaming_compatible(spark, tmp_path):
    """with_split is a stateless projection — identical assignments on a
    stream and on the same data as a batch (training-data splits must not
    depend on execution mode)."""
    from dedupe_spark.operators.sampling import with_split

    src = str(tmp_path / "docs")
    docs = spark.range(0, 200).toDF("doc_id")
    docs.write.parquet(src)

    batch = {
        (r["doc_id"], r["split"])
        for r in with_split(docs, "doc_id").collect()
    }
    stream = spark.readStream.schema("doc_id long").parquet(src)
    out = str(tmp_path / "out")
    q = (
        with_split(stream, "doc_id")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["split"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == batch


def test_incremental_ingest_feeds_staged_pipeline(spark, corpus, tmp_path):
    """Stream-ingest fingerprints in two arrivals, then run the staged
    pipeline from the checkpoint (files=None): clusters must equal the
    all-batch run — incremental ingest is semantically invisible."""
    from dedupe_spark.config import PipelineConfig
    from dedupe_spark.fixtures import files_dataframe
    from dedupe_spark.plans.staged import StagedPipeline
    from dedupe_spark.streaming.ingest import ingest_files_stream

    wh = str(tmp_path / "wh")
    src = str(tmp_path / "files")
    cfg = PipelineConfig(run_id="stream1", warehouse=wh)

    all_files = files_dataframe(spark, corpus).cache()
    half1 = all_files.filter(F.crc32(F.col("path")) % 2 == 0)
    half2 = all_files.filter(F.crc32(F.col("path")) % 2 == 1)

    half1.write.mode("append").parquet(src)
    q = ingest_files_stream(spark, src, cfg)
    q.awaitTermination(180)
    half2.write.mode("append").parquet(src)
    q = ingest_files_stream(spark, src, cfg)
    q.awaitTermination(180)

    pipe = StagedPipeline(spark, cfg)
    ran = pipe.run(files=None, resume=True)
    assert ran["fingerprints"] is False  # stream-ingested, not recomputed
    stream_clusters = {
        r["file_id"]: r["cluster_id"]
        for r in pipe.result().select("file_id", "cluster_id").collect()
    }

    cfg2 = PipelineConfig(run_id="batch1", warehouse=wh)
    pipe2 = StagedPipeline(spark, cfg2)
    pipe2.run(all_files)
    batch_clusters = {
        r["file_id"]: r["cluster_id"]
        for r in pipe2.result().select("file_id", "cluster_id").collect()
    }
    assert stream_clusters == batch_clusters


def test_ingest_threads_normalize_knob(spark, tmp_path):
    """cfg.normalize must reach the streamed fingerprint projection: a
    type1-normalized run keys content_sha on the normalized text, so the
    streamed shas equal the batch twin's and reformatted copies share a
    sha on BOTH paths (they'd silently diverge if ingest dropped the
    knob while batch/staged honored it)."""
    from dedupe_spark.config import PipelineConfig
    from dedupe_spark.functions.fingerprint import with_fingerprints
    from dedupe_spark.sources.catalog import Catalog
    from dedupe_spark.streaming.ingest import ingest_files_stream

    body = "def f(x):\n    return x + 1\n"
    rows = [
        ("r1", "a.py", "c", "py", body),
        ("r2", "b.py", "c", "py", "# reviewed\n" + body.replace("    ", "\t")),
    ]
    schema = "repo string, path string, commit string, lang string, content string"
    df = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "files")
    df.write.mode("append").parquet(src)

    cfg = PipelineConfig(
        run_id="norm_stream", warehouse=str(tmp_path / "wh"), normalize="type1"
    )
    q = ingest_files_stream(spark, src, cfg)
    q.awaitTermination(120)

    streamed = {
        r["path"]: r["content_sha"]
        for r in Catalog(spark, cfg.warehouse)
        .read(f"{cfg.run_id}/fingerprints")
        .select("path", "content_sha")
        .collect()
    }
    batch = {
        r["path"]: r["content_sha"]
        for r in with_fingerprints(df, normalize="type1")
        .select("path", "content_sha")
        .collect()
    }
    assert streamed == batch
    assert streamed["a.py"] == streamed["b.py"]  # reformatted copies merge


def test_ingest_rearrived_file_id_not_duplicated(spark, corpus, tmp_path):
    """A file legitimately re-arriving in a LATER batch (same repo/path/
    commit ⇒ same file_id) must not duplicate: the keyed append drops it,
    so the table is identical whether or not the arrivals were split —
    and identical to a crash-retry run (the convergence property)."""
    from dedupe_spark.config import PipelineConfig
    from dedupe_spark.fixtures import files_dataframe
    from dedupe_spark.sources.catalog import Catalog
    from dedupe_spark.streaming.ingest import ingest_files_stream

    wh, src = str(tmp_path / "wh"), str(tmp_path / "files")
    cfg = PipelineConfig(run_id="rearr1", warehouse=wh)
    files = files_dataframe(spark, corpus).cache()
    n = files.count()

    files.write.mode("append").parquet(src)
    q = ingest_files_stream(spark, src, cfg)
    q.awaitTermination(180)
    # the SAME rows arrive again as new source files (new parquet part
    # files → the stream treats them as a fresh batch)
    files.limit(max(1, n // 3)).write.mode("append").parquet(src)
    q = ingest_files_stream(spark, src, cfg)
    q.awaitTermination(180)

    tbl = Catalog(spark, wh).read("rearr1/fingerprints")
    assert tbl.count() == n
    assert tbl.select("file_id").distinct().count() == n


def test_ingest_retry_after_partial_append_is_exactly_once(spark, corpus, tmp_path):
    """Crash window between append and done-marker: simulate an attempt that
    landed PART of batch 0 but died before the done marker. The replay's
    keyed append must repair — every file_id ends up exactly once, never
    duplicated, never dropped."""
    from dedupe_spark.config import PipelineConfig
    from dedupe_spark.fixtures import files_dataframe
    from dedupe_spark.functions.fingerprint import with_fingerprints
    from dedupe_spark.sources.catalog import Catalog
    from dedupe_spark.streaming.ingest import ingest_files_stream

    wh, src = str(tmp_path / "wh"), str(tmp_path / "files")
    cfg = PipelineConfig(run_id="crash1", warehouse=wh)
    files = files_dataframe(spark, corpus).cache()
    files.write.parquet(src)
    n = files.count()

    cat = Catalog(spark, wh)
    fp = with_fingerprints(
        spark.read.parquet(src),
        shingle_k=cfg.shingle_k,
        num_perm=cfg.num_perm,
        bands=cfg.lsh_bands,
        rows=cfg.lsh_rows,
    )
    cat.append(fp.limit(n // 2), "crash1/fingerprints")      # partial rows
    cat.write(spark.range(1).toDF("one"), "_ingested_batches/crash1/0_pending")
    # (no done marker — exactly the crash state)

    q = ingest_files_stream(spark, src, cfg)
    q.awaitTermination(180)

    tbl = cat.read("crash1/fingerprints")
    assert tbl.count() == n
    assert tbl.select("file_id").distinct().count() == n


def test_ingest_first_append_crash_before_manifest_commit(spark, corpus, tmp_path):
    """The FIRST-append crash window: parquet data files exist but the
    manifest commit never landed, so Catalog.exists() is still False. The
    retry must key against the data files directly — skipping the
    anti-join here appended the whole batch twice."""
    from dedupe_spark.config import PipelineConfig
    from dedupe_spark.fixtures import files_dataframe
    from dedupe_spark.functions.fingerprint import with_fingerprints
    from dedupe_spark.sources.catalog import Catalog
    from dedupe_spark.streaming.ingest import ingest_files_stream

    wh, src = str(tmp_path / "wh"), str(tmp_path / "files")
    cfg = PipelineConfig(run_id="crash2", warehouse=wh)
    files = files_dataframe(spark, corpus).cache()
    files.write.parquet(src)
    n = files.count()

    cat = Catalog(spark, wh)
    fp = with_fingerprints(
        spark.read.parquet(src),
        shingle_k=cfg.shingle_k,
        num_perm=cfg.num_perm,
        bands=cfg.lsh_bands,
        rows=cfg.lsh_rows,
    )
    # data files WITHOUT a manifest entry — the pre-commit crash state
    fp.limit(n // 2).write.parquet(cat.path("crash2/fingerprints"))
    assert not cat.exists("crash2/fingerprints")

    q = ingest_files_stream(spark, src, cfg)
    q.awaitTermination(180)

    tbl = cat.read("crash2/fingerprints")
    assert tbl.count() == n
    assert tbl.select("file_id").distinct().count() == n


def test_streaming_exact_dedupe_null_content_rows_pass_through(spark):
    """Distinct null-content files are NOT duplicates of each other — all
    must survive (batch twin of the streaming split)."""
    from dedupe_spark.streaming.ops import streaming_exact_dedupe

    df = spark.createDataFrame(
        [("a", "same"), ("b", "same"), ("c", None), ("d", None), ("e", None)],
        "path string, content string",
    )
    out = streaming_exact_dedupe(df)
    assert out.count() == 4  # 1 winner for 'same' + all 3 null rows
    assert out.filter("content is null").count() == 3


def test_streaming_linkage_equals_one_shot(spark, tmp_path):
    """Two entity micro-batches through link_entities_stream must land on
    exactly the one-shot link_records assignment over the union."""
    from dedupe_spark.operators.linkage import link_records
    from dedupe_spark.streaming.linkstream import link_entities_stream

    schema = "rid INT, blk STRING, name STRING"
    b1 = [(1, "A", "jonathan smith"), (2, "A", "jonathon smith"),
          (4, "A", "maria garcia"), (7, "B", "zz top")]
    b2 = [(3, "A", "jonathan smyth"), (5, "A", "mariah garcia"),
          (8, "B", "aa bottom")]
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    wh = str(tmp_path / "wh")
    ck = str(tmp_path / "ck")
    kw = dict(id_col="rid", block_cols=["blk"], compare_col="name",
              max_distance=2)

    def run_stream():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = link_entities_stream(
            stream, warehouse=wh, checkpoint=ck, **kw
        )
        q.awaitTermination(120)

    run_stream()
    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run_stream()

    from dedupe_spark.sources.catalog import Catalog

    cat = Catalog(spark, wh)
    got = sorted(map(tuple, cat.read("assignments").collect()))
    union = spark.createDataFrame(b1 + b2, schema)
    want = sorted(map(tuple, link_records(union, **kw).collect()))
    assert got == want
    assert cat.read("entities").count() == 7


def test_streaming_linkage_batch_replay_is_idempotent(spark, tmp_path):
    """Re-running link_batch with an already-ingested batch must change
    nothing (foreachBatch replays are at-least-once)."""
    from dedupe_spark.operators.linkage import link_records
    from dedupe_spark.sources.catalog import Catalog
    from dedupe_spark.streaming.linkstream import link_batch

    schema = "rid INT, blk STRING, name STRING"
    rows = [(1, "A", "aaaa"), (2, "A", "aaab"), (3, "B", "zzzz")]
    df = spark.createDataFrame(rows, schema)
    wh = str(tmp_path / "wh")
    kw = dict(warehouse=wh, id_col="rid", block_cols=["blk"],
              compare_col="name", max_distance=2)
    link_batch(df, **kw)
    first = sorted(map(tuple, Catalog(spark, wh).read("assignments").collect()))
    link_batch(df, **kw)  # replay
    second = sorted(map(tuple, Catalog(spark, wh).read("assignments").collect()))
    assert first == second
    assert Catalog(spark, wh).read("entities").count() == 3
    want = sorted(map(tuple, link_records(
        df, id_col="rid", block_cols=["blk"], compare_col="name",
        max_distance=2).collect()))
    assert first == want
