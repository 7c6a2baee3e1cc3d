"""Tests for the Structured Streaming operators and batch readers."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_reconciliation_spark.sources.readers import (
    file_type_allowed,
    preview_columns,
    read_csv_with_fallback,
    same_system_gate,
    validate_file_structure,
)
from data_reconciliation_spark.streaming.incremental import (
    incremental_exception_stream,
    windowed_event_dedup,
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _ts(h: int, m: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, h, m)


def test_windowed_event_dedup_stream(spark, tmp_path):
    src = str(tmp_path / "events_src")
    rows = [
        (1, _ts(0), 1, "click", 1.0),
        (2, _ts(1), 1, "click", 2.0),   # dup key within watermark
        (3, _ts(2), 2, "click", 3.0),   # different user
    ]
    spark.createDataFrame(rows, EVENT_SCHEMA).write.parquet(src)

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    deduped = windowed_event_dedup(stream, ["user_id", "event_type"], "ts", "24 hours")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["event_id"] for r in spark.sql("select * from dedup_out").collect()}
    # one event per (user, type) within the watermark window
    assert len(got) == 2 and 3 in got and (1 in got or 2 in got)


def test_incremental_exception_stream(spark, tmp_path):
    src = str(tmp_path / "new_src")
    baseline = spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", 20.0), (3, "carol", 30.0)],
        "id long, name string, amount double",
    )
    new_rows = [
        (1, _ts(0), "alice", 10.005),   # within tolerance
        (2, _ts(1), "robert", 20.0),    # name mismatch
        (3, _ts(2), "carol", 31.0),     # amount exceeds tolerance
    ]
    spark.createDataFrame(
        new_rows, "id long, ts timestamp, name string, amount double"
    ).write.parquet(src)

    stream = spark.readStream.schema(
        "id long, ts timestamp, name string, amount double"
    ).parquet(src)
    exc = incremental_exception_stream(
        stream,
        baseline,
        ["id"],
        {"fields": {"amount": {"type": "decimal", "tolerance": 0.01}}},
    )
    q = (
        exc.writeStream.format("memory")
        .queryName("exc_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["id"], r["field"]) for r in spark.sql("select * from exc_out").collect()}
    assert got == {(2, "name"), (3, "amount")}


def test_readers_and_validators(spark, tmp_path):
    assert file_type_allowed("data.csv") and not file_type_allowed("evil.exe")
    # legacy BIFF .xls is admitted since round 4 (pure-stdlib BIFF8
    # reader in sources/xls.py; reference parity via helpers.py:6-19)
    assert file_type_allowed("book.xlsx") and file_type_allowed("book.xls")
    assert not file_type_allowed("book.exe") and not file_type_allowed("noext")
    assert same_system_gate("sales_2024.csv", "sales-old.xlsx")
    assert not same_system_gate("sales_2024.csv", "inventory_2024.csv")

    # latin-1 csv exercises the encoding fallback chain
    p = tmp_path / "latin.csv"
    p.write_bytes("id,name\n1,caf\xe9\n2,na\xefve\n".encode("latin-1"))
    df = read_csv_with_fallback(spark, str(p))
    names = {r["name"] for r in df.collect()}
    assert "café" in names or "caf\xe9" in names

    cols, preview = preview_columns(df, max_rows=1)
    assert cols == ["id", "name"] and len(preview) == 1

    assert validate_file_structure(df) == []
    empty = spark.createDataFrame([], "a int")
    assert any("rows" in p for p in validate_file_structure(empty))


def test_sessionize_events_stateful(spark, tmp_path):
    """applyInPandasWithState sessionization: two micro-batches; the
    first session closes by gap, the last by end-of-stream timeout once
    the watermark advances past it."""
    src = str(tmp_path / "sess_src")
    # batch 1: user 1 events at 00:00, 00:10 (one session);
    # then a 2h gap; batch 2: event at 02:30 (new session) and a late
    # high-watermark event from user 2 at 06:00 that pushes the
    # watermark far enough to time out user 1's second session.
    b1 = [(1, _ts(0, 0), 1, "click", 1.0), (2, _ts(0, 10), 1, "click", 1.0)]
    b2 = [(3, _ts(2, 30), 1, "click", 1.0), (4, _ts(6, 0), 2, "click", 1.0)]
    # one part file per batch: maxFilesPerTrigger=1 must see each batch
    # whole and in order, otherwise the zero watermark drops the earlier
    # half of a split batch as late data
    spark.createDataFrame(b1, EVENT_SCHEMA).coalesce(1).write.parquet(src + "/d1")
    spark.createDataFrame(b2, EVENT_SCHEMA).coalesce(1).write.parquet(src + "/d2")

    from data_reconciliation_spark.streaming.incremental import sessionize_events

    stream = spark.readStream.schema(EVENT_SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src + "/*")
    sessions = sessionize_events(stream, gap_seconds=1800, watermark="0 seconds")
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start"].minute + 60 * r["session_start"].hour, r["n_events"])
        for r in spark.sql("select * from sessions_out").collect()
    }
    # user 1's first session (00:00-00:10, 2 events) must have closed
    assert (1, 0, 2) in got


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Both sides bucketed on the join key => join plan contains no
    Exchange (co-located join)."""
    import contextlib
    import io

    import shutil

    from data_reconciliation_spark.sources.readers import write_bucketed_table

    for t in ("bkt_a", "bkt_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    a = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed_table(a, "bkt_a", "k", num_buckets=8, sort_col="k")
    write_bucketed_table(b, "bkt_b", "k", num_buckets=8, sort_col="k")

    # force sort-merge (tiny tables would otherwise broadcast, which
    # proves nothing about co-location)
    joined = spark.table("bkt_a").hint("merge").join(spark.table("bkt_b"), "k")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" in plan, plan
    # bucketed-by-key on both sides: no shuffle exchange anywhere
    assert "Exchange hashpartitioning" not in plan, plan
    assert joined.count() == 1000


def _make_xlsx(path, header, rows):
    """Minimal .xlsx writer (stdlib zip + hand-built XML) so the S2 shim
    can be tested without any Excel library."""
    import zipfile

    def col_letter(j):
        s = ""
        j += 1
        while j:
            j, r = divmod(j - 1, 26)
            s = chr(65 + r) + s
        return s

    strings, sidx = [], {}

    def sref(v):
        if v not in sidx:
            sidx[v] = len(strings)
            strings.append(v)
        return sidx[v]

    def row_xml(i, vals):
        cells = []
        for j, v in enumerate(vals):
            ref = f"{col_letter(j)}{i + 1}"
            if v is None:
                continue
            if isinstance(v, (int, float)):
                cells.append(f'<c r="{ref}"><v>{v}</v></c>')
            else:
                cells.append(f'<c r="{ref}" t="s"><v>{sref(str(v))}</v></c>')
        return f'<row r="{i + 1}">{"".join(cells)}</row>'

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    sheet = (
        f'<?xml version="1.0"?><worksheet {ns}><sheetData>'
        + row_xml(0, header)
        + "".join(row_xml(i + 1, r) for i, r in enumerate(rows))
        + "</sheetData></worksheet>"
    )
    sst = (
        f'<?xml version="1.0"?><sst {ns} count="{len(strings)}" uniqueCount="{len(strings)}">'
        + "".join(f"<si><t>{s}</t></si>" for s in strings)
        + "</sst>"
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/worksheets/sheet1.xml", sheet)
        z.writestr("xl/sharedStrings.xml", sst)
        z.writestr("[Content_Types].xml", "<Types/>")


def test_read_excel_small(spark, tmp_path):
    from data_reconciliation_spark.sources.readers import read_excel_small

    p = tmp_path / "book.xlsx"
    _make_xlsx(
        str(p),
        ["id", "name", "amount"],
        [[1, "alice", 10.5], [2, "bob", 20.0], [3, None, 7]],
    )
    df = read_excel_small(spark, str(p))
    assert df.columns == ["id", "name", "amount"]
    assert dict(df.dtypes) == {"id": "bigint", "name": "string", "amount": "double"}
    rows = {r["id"]: (r["name"], r["amount"]) for r in df.collect()}
    assert rows == {1: ("alice", 10.5), 2: ("bob", 20.0), 3: (None, 7.0)}


def test_read_xml_small(spark, tmp_path):
    from data_reconciliation_spark.sources.readers import read_xml_small

    p = tmp_path / "recs.xml"
    p.write_text(
        """<root>
             <meta>ignored-minority-tag</meta>
             <rec><id>1</id><name>alice</name></rec>
             <rec><id>2</id><name>bob</name></rec>
             <rec><id>3</id><name></name></rec>
           </root>"""
    )
    df = read_xml_small(spark, str(p))
    # most-common-child-tag fallback picks <rec> (reference helpers.py:100-107)
    assert df.columns == ["id", "name"]
    rows = {r["id"]: r["name"] for r in df.collect()}
    assert rows == {1: "alice", 2: "bob", 3: None}


def test_sessionize_batch_and_streaming_parity(spark, tmp_path):
    """sessionize_batch must (a) match a pure-python gap-split oracle and
    (b) agree with every session the streaming operator closes."""
    from data_reconciliation_spark.operators.temporal import sessionize_batch
    from data_reconciliation_spark.streaming.incremental import sessionize_events

    b1 = [(1, _ts(0, 0), 1, "click", 1.0), (2, _ts(0, 10), 1, "click", 1.0)]
    b2 = [(3, _ts(2, 30), 1, "click", 1.0), (4, _ts(6, 0), 2, "click", 1.0)]
    events = spark.createDataFrame(b1 + b2, EVENT_SCHEMA)

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize_batch(events, gap_seconds=1800).collect()
    }
    # python oracle: gap-split per user
    import itertools

    want = set()
    rows = sorted(b1 + b2, key=lambda r: (r[2], r[1]))
    for uid, grp in itertools.groupby(rows, key=lambda r: r[2]):
        cur = []
        for r in grp:
            if cur and (r[1] - cur[-1]).total_seconds() > 1800:
                want.add((uid, cur[0], cur[-1], len(cur)))
                cur = []
            cur.append(r[1])
        want.add((uid, cur[0], cur[-1], len(cur)))
    assert got == want

    # streaming agreement: every CLOSED streaming session is a batch session
    src = str(tmp_path / "sess_parity")
    spark.createDataFrame(b1, EVENT_SCHEMA).coalesce(1).write.parquet(src + "/d1")
    spark.createDataFrame(b2, EVENT_SCHEMA).coalesce(1).write.parquet(src + "/d2")
    stream = spark.readStream.schema(EVENT_SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src + "/*")
    q = (
        sessionize_events(stream, gap_seconds=1800, watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("sess_parity_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    closed = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("select * from sess_parity_out").collect()
    }
    assert closed and closed <= got


def test_sessionize_with_rocksdb_state_store(spark, tmp_path):
    """The documented cluster-scale state store (RocksDB) must run the
    stateful sessionization end-to-end, not just be a config note."""
    from data_reconciliation_spark.streaming.incremental import sessionize_events

    src = str(tmp_path / "sess_rocks")
    b1 = [(1, _ts(0, 0), 1, "click", 1.0), (2, _ts(0, 10), 1, "click", 1.0)]
    b2 = [(3, _ts(2, 30), 1, "click", 1.0), (4, _ts(6, 0), 2, "click", 1.0)]
    spark.createDataFrame(b1, EVENT_SCHEMA).coalesce(1).write.parquet(src + "/d1")
    spark.createDataFrame(b2, EVENT_SCHEMA).coalesce(1).write.parquet(src + "/d2")

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(EVENT_SCHEMA).option(
            "maxFilesPerTrigger", "1"
        ).parquet(src + "/*")
        q = (
            sessionize_events(stream, gap_seconds=1800, watermark="0 seconds")
            .writeStream.format("memory")
            .queryName("sessions_rocks")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r["user_id"], r["session_start"].minute + 60 * r["session_start"].hour,
             r["n_events"])
            for r in spark.sql("select * from sessions_rocks").collect()
        }
        assert (1, 0, 2) in got
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_compact_table(spark, tmp_path):
    """Many tiny part files collapse to the size-targeted count and the
    data round-trips exactly."""
    from data_reconciliation_spark.sources.readers import compact_table

    p = str(tmp_path / "frag")
    spark.range(10_000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    ).repartition(64).write.parquet(p)
    import glob

    assert len(glob.glob(p + "/*.parquet")) == 64
    n_files = compact_table(spark, p, target_file_mb=256, sort_col="id")
    assert n_files == 1  # 10k rows compress far below one 256 MB target
    back = spark.read.parquet(p)
    assert back.count() == 10_000
    assert back.agg(F.sum("id")).first()[0] == 10_000 * 9_999 // 2


def test_sessionize_stream_random_batch_splits_match_batch(spark, tmp_path):
    """Differential fuzz (round-2 verdict #10): random event sets,
    randomly permuted and split across micro-batches, must close exactly
    the sessions ``sessionize_batch`` computes — the stateful operator's
    out-of-order interval merge cannot depend on arrival order.

    The watermark delay is larger than the whole event horizon so no
    permutation makes an event "late"; a far-future flush event then
    advances the watermark past every session's timeout."""
    import random

    from data_reconciliation_spark.operators.temporal import sessionize_batch
    from data_reconciliation_spark.streaming.incremental import sessionize_events

    rng = random.Random(1234)
    base = dt.datetime(2024, 1, 1)
    for trial in range(4):
        n_users = rng.randint(1, 3)
        rows = []
        eid = 0
        for uid in range(1, n_users + 1):
            t = 0
            for _ in range(rng.randint(1, 10)):
                t += rng.choice([60, 600, 1700, 1900, 4000, 7200])
                eid += 1
                rows.append(
                    (eid, base + dt.timedelta(seconds=t), uid, "click", 1.0)
                )
        flush_uid = 99
        flush = (10_000, base + dt.timedelta(days=30), flush_uid, "flush", 0.0)

        events = spark.createDataFrame(rows, EVENT_SCHEMA)
        want = {
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in sessionize_batch(events, gap_seconds=1800).collect()
        }

        shuffled = rows[:]
        rng.shuffle(shuffled)
        n_batches = rng.randint(1, 4)
        batches = [shuffled[i::n_batches] for i in range(n_batches)]
        batches = [b for b in batches if b] + [[flush]]

        src = str(tmp_path / f"fuzz_{trial}")
        for i, b in enumerate(batches):
            spark.createDataFrame(b, EVENT_SCHEMA).coalesce(1).write.parquet(
                f"{src}/d{i:02d}"
            )
        stream = spark.readStream.schema(EVENT_SCHEMA).option(
            "maxFilesPerTrigger", "1"
        ).parquet(src + "/*")
        qname = f"sess_fuzz_{trial}"
        q = (
            sessionize_events(stream, gap_seconds=1800, watermark="10 days")
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in spark.sql(f"select * from {qname}").collect()
            if r["user_id"] != flush_uid
        }
        assert got == want, f"trial {trial}: {got ^ want}"


def test_sessionize_state_cap_evicts_and_conserves(spark, tmp_path):
    """State-cap guard (round-3 verdict #9): a huge watermark plus
    sparse event times keeps every session open, so per-key state would
    grow without bound; with ``max_open_sessions_per_key`` the operator
    force-closes the oldest open sessions FLAGGED ``evicted = true``,
    keeps at most the cap in state, and — when no late bridging event
    arrives — still emits exactly the batch session set with per-event
    counts conserved."""
    import random

    from data_reconciliation_spark.operators.temporal import sessionize_batch
    from data_reconciliation_spark.streaming.incremental import sessionize_events

    base = dt.datetime(2024, 1, 1)
    n_sessions, cap = 60, 8
    # one user, sessions separated by > gap: all stay open under the
    # 10-day watermark until the far-future flush
    rows = [
        (i, base + dt.timedelta(seconds=i * 4000), 1, "click", 1.0)
        for i in range(n_sessions)
    ]
    flush = (10_000, base + dt.timedelta(days=30), 99, "flush", 0.0)
    events = spark.createDataFrame(rows, EVENT_SCHEMA)
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize_batch(events, gap_seconds=1800).collect()
    }
    assert len(want) == n_sessions

    # pathological late arrival: random permutation across batches, so
    # evictions interleave with out-of-order merges
    rng = random.Random(7)
    shuffled = rows[:]
    rng.shuffle(shuffled)
    batches = [shuffled[i::3] for i in range(3)] + [[flush]]
    src = str(tmp_path / "sess_cap")
    for i, b in enumerate(batches):
        spark.createDataFrame(b, EVENT_SCHEMA).coalesce(1).write.parquet(
            f"{src}/d{i:02d}"
        )
    stream = spark.readStream.schema(EVENT_SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src + "/*")
    q = (
        sessionize_events(
            stream,
            gap_seconds=1800,
            watermark="10 days",
            max_open_sessions_per_key=cap,
        )
        .writeStream.format("memory")
        .queryName("sess_cap_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = [r for r in spark.sql("select * from sess_cap_out").collect()
           if r["user_id"] != 99]
    evicted = [r for r in out if r["evicted"]]
    # bounded state forces most sessions out early, and they are flagged
    assert len(evicted) >= n_sessions - cap - 1
    # session-splitting cannot occur here (each session is one event and
    # events never bridge), so the emitted set must equal batch exactly
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in out
    }
    assert got == want
    # per-event conservation
    assert sum(r["n_events"] for r in out) == n_sessions
    # eviction metric (round-4 verdict #6): the observed per-batch
    # metrics must account for every eviction without scanning output —
    # sum across micro-batch progress events equals the flagged rows
    # (including the flush user's sessions, which the row-scan above
    # excluded, so compare against the unfiltered output)
    all_rows = spark.sql("select * from sess_cap_out").collect()
    observed = [
        p["observedMetrics"]["sessionizer"]
        for p in q.recentProgress
        if p["observedMetrics"].get("sessionizer")
    ]
    assert observed, "no sessionizer observedMetrics in streaming progress"
    metric_evicted = sum(m["evicted_sessions"] or 0 for m in observed)
    metric_closed = sum(m["closed_sessions"] or 0 for m in observed)
    assert metric_evicted == sum(1 for r in all_rows if r["evicted"])
    assert metric_closed == len(all_rows)
    assert metric_evicted >= n_sessions - cap - 1


def test_sessionize_state_cap_split_conserves_events(spark, tmp_path):
    """When an evicted session IS later bridged, the session splits
    instead of merging — the documented semantic cost of the cap; the
    total event count must still be conserved and every emitted session
    must be a contiguous sub-range of a batch session."""
    from data_reconciliation_spark.operators.temporal import sessionize_batch
    from data_reconciliation_spark.streaming.incremental import sessionize_events

    base = dt.datetime(2024, 1, 1)
    # 12 separate 1-event sessions arrive first (cap 2 evicts 10 of
    # them), then bridging events that would have merged each pair of
    # adjacent sessions arrive in a later batch
    first = [
        (i, base + dt.timedelta(seconds=i * 4000), 1, "click", 1.0)
        for i in range(12)
    ]
    # two bridges per inter-session interval: +1500s and +3000s keep
    # every inter-event gap <= 1800s, merging everything into ONE
    # batch-semantics session
    bridges = [
        (100 + 2 * i + j, base + dt.timedelta(seconds=i * 4000 + 1500 * (j + 1)), 1, "click", 1.0)
        for i in range(11)
        for j in range(2)
    ]
    flush = (10_000, base + dt.timedelta(days=30), 99, "flush", 0.0)
    src = str(tmp_path / "sess_split")
    for i, b in enumerate([first, bridges, [flush]]):
        spark.createDataFrame(b, EVENT_SCHEMA).coalesce(1).write.parquet(
            f"{src}/d{i:02d}"
        )
    stream = spark.readStream.schema(EVENT_SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src + "/*")
    q = (
        sessionize_events(
            stream, gap_seconds=1800, watermark="10 days",
            max_open_sessions_per_key=2,
        )
        .writeStream.format("memory")
        .queryName("sess_split_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = [r for r in spark.sql("select * from sess_split_out").collect()
           if r["user_id"] != 99]
    assert any(r["evicted"] for r in out)
    # conservation: every event lands in exactly one emitted session
    assert sum(r["n_events"] for r in out) == len(first) + len(bridges)
    # every emitted session fits inside the single batch super-session
    events = spark.createDataFrame(first + bridges, EVENT_SCHEMA)
    batch = sessionize_batch(events, gap_seconds=1800).collect()
    assert len(batch) == 1
    lo, hi = batch[0]["session_start"], batch[0]["session_end"]
    assert all(lo <= r["session_start"] <= r["session_end"] <= hi for r in out)


def test_sessionize_eviction_metric_persisted_to_audit(spark, tmp_path):
    """Round-5 verdict #6: the sessionizer's observed eviction metric
    must land in the audit/lineage store, not just in live progress.
    Pathological fixture (huge watermark + sparse one-event sessions
    over a small cap) forces evictions; the listener must persist one
    lineage row per metric-bearing micro-batch whose sums equal the
    flagged output rows."""
    import random
    import time

    from data_reconciliation_spark.sources.state import CheckpointManager
    from data_reconciliation_spark.streaming.incremental import (
        SessionMetricsAuditListener,
        sessionize_events,
    )

    base = dt.datetime(2024, 1, 1)
    n_sessions, cap = 40, 6
    rows = [
        (i, base + dt.timedelta(seconds=i * 4000), 1, "click", 1.0)
        for i in range(n_sessions)
    ]
    flush = (10_000, base + dt.timedelta(days=30), 99, "flush", 0.0)
    rng = random.Random(11)
    shuffled = rows[:]
    rng.shuffle(shuffled)
    batches = [shuffled[i::3] for i in range(3)] + [[flush]]
    src = str(tmp_path / "sess_audit")
    for i, b in enumerate(batches):
        spark.createDataFrame(b, EVENT_SCHEMA).coalesce(1).write.parquet(
            f"{src}/d{i:02d}"
        )

    mgr = CheckpointManager(spark, str(tmp_path / "audit_ckpt"))
    listener = SessionMetricsAuditListener(mgr)
    spark.streams.addListener(listener)
    try:
        stream = spark.readStream.schema(EVENT_SCHEMA).option(
            "maxFilesPerTrigger", "1"
        ).parquet(src + "/*")
        q = (
            sessionize_events(
                stream,
                gap_seconds=1800,
                watermark="10 days",
                max_open_sessions_per_key=cap,
            )
            .writeStream.format("memory")
            .queryName("sess_audit_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        out = spark.sql("select * from sess_audit_out").collect()
        n_evicted = sum(1 for r in out if r["evicted"])
        assert n_evicted >= n_sessions - cap - 1  # the fixture really evicts

        # the listener bus is async — poll briefly for the last append
        deadline = time.time() + 60
        while time.time() < deadline:
            lin = mgr.lineage()
            sess_rows = (
                []
                if lin is None
                else lin.where("stage = 'sessionizer'").collect()
            )
            if sess_rows and sum(r["closed_sessions"] for r in sess_rows) >= len(out):
                break
            time.sleep(1)
        assert listener.last_error is None
        assert sess_rows, "no sessionizer rows persisted to lineage"
        assert sum(r["evicted_sessions"] for r in sess_rows) == n_evicted
        assert sum(r["closed_sessions"] for r in sess_rows) == len(out)
        # one row per metric-bearing micro-batch, each tagged with the
        # query id and batch id so history is attributable
        assert all(r["query_id"] == str(q.id) for r in sess_rows)
        assert len({r["iteration"] for r in sess_rows}) == len(sess_rows)
    finally:
        spark.streams.removeListener(listener)


def test_sessionize_audit_listener_batched_flush(spark, tmp_path):
    """Round-6 verdict #7: the audit listener can buffer N micro-batches
    per lineage append (small-files churn at fast triggers).  With
    flush_every larger than the batch count, all rows must still land —
    flushed by onQueryTerminated — and sums must match the output."""
    import time

    from data_reconciliation_spark.sources.state import CheckpointManager
    from data_reconciliation_spark.streaming.incremental import (
        SessionMetricsAuditListener,
        sessionize_events,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=i * 4000), 1, "click", 1.0)
        for i in range(12)
    ]
    flush = (10_000, base + dt.timedelta(days=30), 99, "flush", 0.0)
    batches = [rows[0:4], rows[4:8], rows[8:12], [flush]]
    src = str(tmp_path / "sess_batched")
    for i, b in enumerate(batches):
        spark.createDataFrame(b, EVENT_SCHEMA).coalesce(1).write.parquet(
            f"{src}/d{i:02d}"
        )

    mgr = CheckpointManager(spark, str(tmp_path / "audit_ckpt_batched"))
    listener = SessionMetricsAuditListener(mgr, flush_every=100)
    spark.streams.addListener(listener)
    try:
        stream = spark.readStream.schema(EVENT_SCHEMA).option(
            "maxFilesPerTrigger", "1"
        ).parquet(src + "/*")
        q = (
            sessionize_events(stream, gap_seconds=1800, watermark="10 days")
            .writeStream.format("memory")
            .queryName("sess_batched_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        out = spark.sql("select * from sess_batched_out").collect()

        deadline = time.time() + 60
        sess_rows = []
        while time.time() < deadline:
            lin = mgr.lineage()
            sess_rows = (
                [] if lin is None
                else lin.where("stage = 'sessionizer'").collect()
            )
            if sess_rows and sum(
                r["closed_sessions"] for r in sess_rows
            ) >= len(out):
                break
            time.sleep(1)
        assert listener.last_error is None
        assert sess_rows, "termination flush did not persist buffered rows"
        assert sum(r["closed_sessions"] for r in sess_rows) == len(out)
        # buffered: far fewer lineage files than micro-batches — the
        # termination flush wrote the whole buffer in one append
        assert len({r["saved_at"] for r in sess_rows}) == 1
    finally:
        spark.streams.removeListener(listener)
