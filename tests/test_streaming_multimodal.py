import struct
import zlib

from pyspark.sql import functions as F

from simsearch_spark.multimodal.binary import (
    MEDIA_SCHEMA,
    decode_image_meta,
    extract_pixel_features,
    frame_sample_plan,
)
from simsearch_spark.queries.pipeline import q_events_hourly, q_events_sessionize
from simsearch_spark.sources.registry import load_table
from simsearch_spark.streaming.events import (
    hourly_rollup_stream,
    read_events_stream,
    run_stream_to_memory,
    sessionize_stream,
)


def _png(w: int, h: int) -> bytes:
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
    )


def _media_df(spark):
    rows = [
        (1, "image", _png(640, 480), "image/png"),
        (2, "image", b"\xff\xd8\xff\xe0\x00\x10JFIF", "image/jpeg"),
        (3, "video", b"\x00" * 4096, "video/mp4"),
        (4, "image", None, "image/png"),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_image_meta_png_header(spark):
    meta = {r.media_id: r for r in decode_image_meta(_media_df(spark)).collect()}
    assert (meta[1].format, meta[1].width, meta[1].height) == ("png", 640, 480)
    assert meta[2].format == "jpeg"  # no SOF0 in the stub payload → dims -1
    assert meta[3].format == "unknown"
    assert meta[4].n_bytes == 0


def test_pixel_features_schema_and_null_contract(spark):
    """r9: the byte-histogram fake is retired — features are real pixels or
    NULL (the valid_embeddings structural contract), same schema."""
    feats = extract_pixel_features(_media_df(spark))
    assert dict(feats.dtypes) == {"media_id": "bigint", "embedding": "array<float>"}
    rows = {r.media_id: r.embedding for r in feats.collect()}
    # the header-only PNG stub, the JPEG stub, the unknown container, and
    # the NULL payload all fail real decode → NULL embedding, no fake numbers
    assert rows[2] is None and rows[3] is None and rows[4] is None
    # and valid_embeddings drops exactly those rows
    from simsearch_spark.operators.ann import valid_embeddings

    kept = [r.media_id for r in valid_embeddings(feats, "embedding", dim=16).collect()]
    assert 2 not in kept and 3 not in kept and 4 not in kept


def test_resize_images_geometry_and_stub_seam(spark):
    """Aspect-preserving bound: real target geometry from real headers, pixel
    re-encode stubbed (payload passes through, tagged)."""
    from simsearch_spark.multimodal.binary import resize_images

    rows = [
        (1, "image", _png(640, 480), "image/png"),     # downscale 512-bound
        (2, "image", _png(100, 200), "image/png"),     # within bounds
        (3, "image", _png(2000, 1000), "image/png"),   # wide downscale
        (4, "image", None, "image/png"),               # unparseable
    ]
    out = {r.media_id: r for r in
           resize_images(spark.createDataFrame(rows, MEDIA_SCHEMA), 512, 512).collect()}
    assert (out[1].dst_width, out[1].dst_height, out[1].resized) == (512, 384, "stub")
    assert (out[2].dst_width, out[2].dst_height, out[2].resized) == (100, 200, "pass-through")
    assert (out[3].dst_width, out[3].dst_height, out[3].resized) == (512, 256, "stub")
    assert (out[4].dst_width, out[4].resized) == (-1, "unknown")
    # stub seam: payload byte-identical until a real decoder is wired in
    assert bytes(out[1].payload) == _png(640, 480)


def test_frame_sample_plan(spark):
    plan = frame_sample_plan(_media_df(spark).where(F.col("media_id") == 3), every_n=2)
    idxs = [r.frame_idx for r in plan.collect()]
    assert idxs == [0, 2]  # 4096 bytes → 4 est. frames, stride 2


def _staged_events_dir(sf_dir, tmp_path):
    """File-source streams need a directory; stage the fixture file into one."""
    import shutil

    d = tmp_path / "events_stream"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "part-0.parquet")
    return str(d)


def test_streaming_hourly_matches_batch(spark, sf_dir, tmp_path):
    """Replayed bounded stream must agree with the batch rollup (the batch
    query doubles as the streaming oracle)."""
    stream = read_events_stream(
        spark, _staged_events_dir(sf_dir, tmp_path),
        schema=spark.read.parquet(f"{sf_dir}/events.parquet").schema,
    )
    # complete mode: append would hold back windows the watermark has not
    # passed at end-of-replay (they live in state, never emitted)
    q = run_stream_to_memory(hourly_rollup_stream(stream), "hourly_t", mode="complete")
    got = {
        (r.hour, r.event_type): (r.n, r.avg_value, r.sum_value)
        for r in spark.table("hourly_t").collect()
    }
    want = {
        (r.hour, r.event_type): (r.n, r.avg_value, r.sum_value)
        for r in q_events_hourly(spark, sf_dir).collect()
    }
    assert got == want
    q.stop()


def test_streaming_sessionize_counts(spark, sf_dir, tmp_path):
    stream = read_events_stream(
        spark, _staged_events_dir(sf_dir, tmp_path),
        schema=spark.read.parquet(f"{sf_dir}/events.parquet").schema,
    )
    q = run_stream_to_memory(sessionize_stream(stream), "sessions_t", mode="complete")
    sess = spark.table("sessions_t")
    per_user = sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"), F.sum("n_events").alias("n_events")
    )
    got = {r.user_id: (r.n_sessions, r.n_events) for r in per_user.collect()}
    want = {r.user_id: (r.n_sessions, r.n_events) for r in q_events_sessionize(spark, sf_dir).collect()}
    assert got == want
    q.stop()


def test_load_table_recovers_bare_session_nanos(spark, sf_dir):
    """Harness sessions are built WITHOUT spark.sql.legacy.parquet.nanosAsLong
    (CORRECTNESS_r01: 4 queries red on PARQUET_TYPE_ILLEGAL).  load_table must
    set the conf at call time, not rely on session construction."""
    from simsearch_spark.sources.registry import load_table

    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        ev = load_table(spark, sf_dir, "events")
        assert dict(ev.dtypes)["ts"] == "timestamp"
        assert ev.limit(1).count() == 1
        assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def test_load_table_recovers_non_utc_session_tz(spark, sf_dir):
    """A harness session pinned to a non-UTC zone must not shift event time:
    the NTZ→TIMESTAMP normalization cast reinterprets wall time in the
    session zone, so load_table pins UTC at call time (ensure_nanos_conf)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from simsearch_spark.sources.registry import load_table

    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])
    unit = t.schema.field("ts").type.unit
    div = 1000 if unit == "ns" else 1
    raw_us = dict(zip(t.column("event_id").to_pylist(),
                      (v // div for v in t.column("ts").cast(pa.int64()).to_pylist())))

    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        ev = load_table(spark, sf_dir, "events")
        got = dict(ev.select("event_id", F.unix_micros("ts").alias("us")).collect())
        assert got == raw_us
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_stream_queries_recover_bare_session_nanos(spark, sf_dir):
    """The streaming declared queries read events.parquet directly for the
    schema; they must also survive a session missing the nanos conf."""
    from simsearch_spark.queries.streaming import q_stream_events_hourly

    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        out = q_stream_events_hourly(spark, sf_dir)
        assert out.count() > 0
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def test_stream_dedup_two_batch_oracle_parity(spark, sf_dir, tmp_path):
    """applyInPandasWithState dedup, MULTI-batch: split the corpus into two
    files so duplicate-fingerprint groups straddle the micro-batch boundary
    (maxFilesPerTrigger=1 forces two batches).  The latest-snapshot view of
    the append sink must equal the batch exact-dedup result on the full
    corpus — the r2-r4 first-wins contract failed exactly this."""
    from simsearch_spark.operators.dedup import exact_dedup_groups
    from simsearch_spark.streaming.dedup import dedup_docs_stream, latest_snapshots

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet")
    parity = pc.bit_wise_and(t.column("doc_id"), 1)
    b0, b1 = t.filter(pc.equal(parity, 0)), t.filter(pc.equal(parity, 1))
    # the fixture has no exact dups (every fingerprint is a singleton), so
    # inject them: re-emit 20 batch-0 docs in batch 1 under new ids with
    # whitespace jitter the fingerprint normalizes away -> groups straddle
    max_id = pc.max(t.column("doc_id")).as_py()
    echo = b0.slice(0, 20).to_pylist()
    for i, row in enumerate(echo):
        row["doc_id"] = max_id + 1 + i
        row["text"] = "  " + row["text"].replace(" ", "  ") + " "
    b1 = pa.concat_tables([b1, pa.Table.from_pylist(echo, schema=t.schema)])
    d = tmp_path / "docs_stream"
    d.mkdir()
    pq.write_table(b0, str(d / "b0.parquet"))
    pq.write_table(b1, str(d / "b1.parquet"))
    full = tmp_path / "docs_full.parquet"
    pq.write_table(pa.concat_tables([b0, b1]), str(full))
    docs = spark.read.parquet(str(full))
    stream = spark.readStream.format("parquet").schema(docs.schema).option(
        "maxFilesPerTrigger", 1
    ).load(str(d))
    q = (
        dedup_docs_stream(stream)
        .writeStream.format("memory").queryName("t_stream_dedup2b")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 2, "split replay should deliver >=2 micro-batches"
    sink = spark.table("t_stream_dedup2b")
    # at least one fingerprint straddled the boundary -> got two snapshots
    assert sink.groupBy("fingerprint").count().where("count > 1").count() > 0
    got = {r.fingerprint: (r.keeper, r.n_docs) for r in latest_snapshots(sink).collect()}
    batch = {
        r.fingerprint: (r.keeper, r.n_docs)
        for r in exact_dedup_groups(docs, "doc_id", "text").collect()
    }
    assert got == batch


def test_stream_asof_click_state_carries_across_batches(spark, tmp_path):
    """A click in batch 0 must attribute a purchase arriving in batch 1
    (state carry), and a user with no prior click gets NULLs."""
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from simsearch_spark.streaming.asof import asof_click_stream

    us = 1_000_000
    schema = pa.schema(
        [("event_id", pa.int64()), ("ts", pa.timestamp("us")),
         ("user_id", pa.int64()), ("event_type", pa.string()),
         ("value", pa.float64()), ("props", pa.string())]
    )

    def tbl(rows):
        return pa.Table.from_pylist(
            [dict(zip(("event_id", "ts", "user_id", "event_type", "value", "props"), r))
             for r in rows], schema=schema)

    d = tmp_path / "ev"
    d.mkdir()
    # batch 0: user 7 clicks; user 8 purchases with no prior click
    pq.write_table(tbl([
        (1, 1000 * us, 7, "click", 0.0, ""),
        (2, 1500 * us, 8, "purchase", 1.0, ""),
    ]), str(d / "b0.parquet"))
    # batch 1: user 7 purchases (attributes to the batch-0 click), then a
    # newer click and another purchase within the same batch
    pq.write_table(tbl([
        (3, 2000 * us, 7, "purchase", 1.0, ""),
        (4, 2500 * us, 7, "click", 0.0, ""),
        (5, 3000 * us, 7, "purchase", 1.0, ""),
    ]), str(d / "b1.parquet"))
    now = _time.time()
    os.utime(str(d / "b0.parquet"), (now, now))
    os.utime(str(d / "b1.parquet"), (now + 1, now + 1))

    stream = (
        spark.readStream.format("parquet")
        .schema("event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string")
        .option("maxFilesPerTrigger", 1).load(str(d))
    )
    from simsearch_spark.sources.registry import normalize_events_ts
    q = (
        asof_click_stream(normalize_events_ts(stream))
        .writeStream.format("memory").queryName("t_stream_asof_unit")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    assert len([p for p in q.recentProgress if p["numInputRows"] > 0]) == 2
    got = {r.event_id: (r.click_id, r.delta_us)
           for r in spark.table("t_stream_asof_unit").collect()}
    assert got == {
        2: (None, None),
        3: (1, 1000 * us),
        5: (4, 500 * us),
    }


def test_stream_asof_slice_count_invariance(spark, sf_dir):
    """The ordered-replay contract must be batch-split-invariant: replaying
    the fixture as 2 or 5 time-ordered slices yields identical attribution
    (and equals the batch as-of query)."""
    from simsearch_spark.queries.pipeline import q_events_asof_click
    from simsearch_spark.queries.streaming import _staged_time_slices, _unique
    from simsearch_spark.streaming.asof import asof_click_stream
    from simsearch_spark.streaming.events import read_events_stream, run_stream_to_memory

    want = {r.event_id: (r.click_id, r.delta_us)
            for r in q_events_asof_click(spark, sf_dir).collect()}
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    for n_slices in (2, 5):
        staged = _staged_time_slices(sf_dir, "events", n_slices=n_slices)
        try:
            stream = read_events_stream(spark, staged, schema=schema, max_files_per_trigger=1)
            sink = _unique(f"t_asof_inv{n_slices}")
            run_stream_to_memory(asof_click_stream(stream), sink, mode="append")
            got = {r.event_id: (r.click_id, r.delta_us)
                   for r in spark.table(sink).collect()}
        finally:
            import shutil as _sh
            _sh.rmtree(staged, ignore_errors=True)
        assert got == want, f"n_slices={n_slices}"


def test_events_asof_click_semantics(spark, monkeypatch):
    """As-of: each purchase takes the latest (ts, event_id)-prior click of
    its user; no prior click -> NULLs."""
    import datetime as dt

    from simsearch_spark.queries import pipeline as P

    T = dt.datetime
    df = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 10, 0), 7, "click", 0.0, ""),
            (2, T(2024, 1, 1, 11, 0), 7, "purchase", 1.0, ""),
            (3, T(2024, 1, 1, 12, 0), 7, "click", 0.0, ""),
            (4, T(2024, 1, 1, 12, 30), 7, "purchase", 1.0, ""),
            (5, T(2024, 1, 1, 9, 0), 8, "purchase", 1.0, ""),  # no prior click
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    monkeypatch.setattr(P, "load_table", lambda spark, sf_dir, name: df)
    rows = {r.event_id: (r.click_id, r.delta_us) for r in
            P.q_events_asof_click(spark, "x").collect()}
    assert rows[2] == (1, 3_600_000_000)
    assert rows[4] == (3, 1_800_000_000)
    assert rows[5] == (None, None)


def test_events_range_join_bucketed_plan_and_counts(spark, monkeypatch):
    """Range join must compile to a bucketed equi-join (no nested-loop theta
    join) and count window membership inclusively, zero-filling purchases
    with no prior clicks."""
    import datetime as dt

    from simsearch_spark.queries import pipeline as P

    T = dt.datetime
    df = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 10, 0), 7, "click", 0.0, ""),
            (2, T(2024, 1, 1, 10, 29), 7, "click", 0.0, ""),
            (3, T(2024, 1, 1, 10, 30), 7, "purchase", 1.0, ""),  # both clicks in window
            (4, T(2024, 1, 1, 11, 30), 7, "purchase", 1.0, ""),  # none (10:00 exp, 10:29 exp)
            (5, T(2024, 1, 1, 11, 0, 0), 8, "purchase", 1.0, ""),  # user 8: no clicks
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    monkeypatch.setattr(P, "load_table", lambda spark, sf_dir, name: df)
    out = P.q_events_range_join(spark, "x")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    rows = {r.event_id: r.n_clicks_30m for r in out.collect()}
    assert rows == {3: 2, 4: 0, 5: 0}


def test_sessionize_gap_boundary_contract(spark, monkeypatch):
    """Pins the FIXTURES.md §F5 boundary: a gap of EXACTLY 30 min stays in
    the session (split is strictly > gap), matching session_window's merge
    rule — batch window-function sessionize and the native session_window
    aggregation must agree event-for-event at the boundary."""
    import datetime as dt

    from simsearch_spark.queries import pipeline as P
    from simsearch_spark.streaming.events import SESSION_GAP

    T = dt.datetime(2024, 1, 1)
    us = dt.timedelta(microseconds=1)
    gap = dt.timedelta(seconds=1800)
    rows = [
        # user 1: exact-gap chain -> ONE session of 3 events
        (1, T, 1), (2, T + gap, 1), (3, T + 2 * gap, 1),
        # user 2: one µs over the gap -> TWO sessions
        (4, T, 2), (5, T + gap + us, 2),
        # user 3: one µs under -> ONE session
        (6, T, 3), (7, T + gap - us, 3),
    ]
    df = spark.createDataFrame(
        [(eid, ts, uid, "click", 0.0, "") for eid, ts, uid in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    monkeypatch.setattr(P, "load_table", lambda spark, sf_dir, name: df)
    batch = {r.user_id: (r.n_sessions, r.n_events) for r in
             P.q_events_sessionize(spark, "x").collect()}
    assert batch == {1: (1, 3), 2: (2, 2), 3: (1, 2)}
    # session_window (the streaming operator, run in batch mode) must agree
    sw = (df.groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_sessions"), F.sum("n_events").alias("n_events")))
    stream = {r.user_id: (r.n_sessions, r.n_events) for r in sw.collect()}
    assert stream == batch


def test_oracle_us_contract_matches_raw_fixture(spark, sf_dir):
    """The integer-µs contract (FIXTURES.md §F5), encoding-agnostic: whatever
    physical type the driver's fixture writer emits (TIMESTAMP(NANOS),
    µs-NTZ, or µs-UTC), Spark's canonical post-load view (``unix_micros``)
    and the DuckDB oracle expression ``epoch_ns(ts) // 1000`` must BOTH equal
    the raw parquet value floored to µs.  Guards the r2 sessionize hash-fail
    and the r4 NTZ regression from recurring."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from simsearch_spark.sources.registry import load_table

    path = f"{sf_dir}/events.parquet"
    t = pq.read_table(path, columns=["event_id", "ts"])
    ts_type = t.schema.field("ts").type
    raw = dict(zip(t.column("event_id").to_pylist(),
                   t.column("ts").cast(pa.int64()).to_pylist()))
    assert pa.types.is_timestamp(ts_type), f"unexpected fixture type {ts_type}"
    div = {"s": None, "ms": None, "us": 1, "ns": 1000}[ts_type.unit]
    assert div is not None, f"fixture unit {ts_type.unit} coarser than µs"
    expect_us = {k: v // div for k, v in raw.items()}

    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"  # canonical post-load dtype
    spark_us = dict(ev.select("event_id", F.unix_micros("ts").alias("us")).collect())
    assert spark_us == expect_us

    con = duckdb.connect()
    duck_us = dict(con.execute(
        f"SELECT event_id, epoch_ns(ts) // 1000 FROM read_parquet('{path}')").fetchall())
    assert duck_us == spark_us


def test_sessionize_segmented_equals_plain(spark, sf_dir):
    """The two-phase skew-guarded sessionize must be row-identical to the
    single-window form on the fixture, for segment widths well above, near,
    and BELOW the gap (sessions spanning 3+ segments exercise the
    one-merge-per-boundary accounting)."""
    from simsearch_spark.operators.sessionize import sessionize_segmented
    from simsearch_spark.queries.pipeline import SESSION_GAP_US, q_events_sessionize
    from simsearch_spark.sources.registry import load_table

    want = {r.user_id: (r.n_sessions, r.n_events) for r in
            q_events_sessionize(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    for seg_us in (86_400_000_000, 2 * SESSION_GAP_US, SESSION_GAP_US // 3):
        got = {r.user_id: (r.n_sessions, r.n_events) for r in
               sessionize_segmented(ev, gap_us=SESSION_GAP_US, seg_us=seg_us).collect()}
        assert got == want, f"seg_us={seg_us}"


def test_sessionize_segmented_boundary_chain(spark):
    """A session chained across many segments at exact-gap spacing must stay
    ONE session (merge accounting + the strict > split at every boundary)."""
    import datetime as dt

    from simsearch_spark.operators.sessionize import sessionize_segmented

    T = dt.datetime(2024, 1, 1)
    gap = dt.timedelta(seconds=1800)
    rows = [(i, T + i * gap, 1) for i in range(10)]          # one long chain
    rows += [(100, T, 2), (101, T + 3 * gap + dt.timedelta(microseconds=1), 2)]
    df = spark.createDataFrame(
        [(eid, ts, uid) for eid, ts, uid in rows],
        "event_id long, ts timestamp, user_id long",
    )
    # segment width BELOW the gap: every consecutive pair crosses >=1 boundary
    got = {r.user_id: (r.n_sessions, r.n_events) for r in
           sessionize_segmented(df, gap_us=1_800_000_000, seg_us=600_000_000).collect()}
    assert got == {1: (1, 10), 2: (2, 2)}
