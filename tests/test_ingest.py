"""Ingestion-layer tests: the paginated source's resilience ladder,
offset checkpoint resume, partitioned sink layout, and upsert
idempotence — the reference's whole operational loop
(fetch_data.py:45-165) under failure injection."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from agri_market_data_pipeline_spark.sources.checkpoint import OffsetCheckpoint
from agri_market_data_pipeline_spark.sources.paginated_api import (
    fetch_page_with_resilience,
    read_paginated_api,
)
from agri_market_data_pipeline_spark.sources.sinks import (
    merge_upsert,
    sink_partitioned_append,
)

SCHEMA = StructType(
    [StructField("id", IntegerType()), StructField("commodity", StringType())]
)


def _fake_feed(n_records: int):
    """Deterministic fake API: records 0..n-1, page (offset, limit)."""

    def fetch(offset: int, limit: int) -> list[dict]:
        return [
            {"id": i, "commodity": f"crop{i % 3}"}
            for i in range(offset, min(offset + limit, n_records))
        ]

    return fetch


def test_source_reads_all_pages_in_parallel(spark):
    records, dead = read_paginated_api(
        spark,
        _fake_feed(250),
        max_offset=300,  # last page intentionally empty (skip_empty_page)
        limit=100,
        schema=SCHEMA,
        num_partitions=3,
        pace=0.0,
        throttle_s=0.0,
    )
    rows = records.collect()
    assert len(rows) == 250
    assert {r.id for r in rows} == set(range(250))
    assert dead.count() == 0


def test_retry_ladder_then_dead_letter(spark):
    calls = {"n": 0}

    def flaky(offset: int, limit: int) -> list[dict]:
        calls["n"] += 1
        if offset == 100:
            raise ConnectionError("boom")
        return [{"id": offset, "commodity": "c"}]

    sleeps: list[float] = []
    records, err = fetch_page_with_resilience(
        flaky, 100, 100, pace=1.0, sleep=sleeps.append
    )
    assert records == [] and "boom" in err
    # ladder: 2 rounds × 5 attempts, backoffs 1,2,4,8,16 + 300/900 cool-downs
    assert calls["n"] == 10
    assert sleeps == [1, 2, 4, 8, 16, 300.0, 1, 2, 4, 8, 16, 900.0]

    records, dead = read_paginated_api(
        spark,
        flaky,
        max_offset=300,
        limit=100,
        schema=SCHEMA,
        num_partitions=2,
        pace=0.0,
        throttle_s=0.0,
    )
    assert records.count() == 2  # pages 0 and 200
    dl = dead.collect()
    assert len(dl) == 1 and dl[0].offset == 100 and "boom" in dl[0].error


def test_checkpoint_resume_plus_upsert_is_effectively_once(spark, tmp_path):
    """Crash between data write and checkpoint write (the reference's
    at-least-once window, fetch_data.py:158-162): the replayed page
    appends duplicates; merge_upsert collapses them."""
    ckpt = OffsetCheckpoint(str(tmp_path / "progress.json"))
    target = str(tmp_path / "table")
    fetch = _fake_feed(200)

    def run_once(crash_before_checkpoint: bool):
        offset = ckpt.load()
        while offset < 200:
            records, _ = read_paginated_api(
                spark, fetch, start_offset=offset, max_offset=offset + 100,
                limit=100, schema=SCHEMA, num_partitions=1, pace=0.0, throttle_s=0.0,
            )
            merge_upsert(
                spark, target, records.withColumn("v", F.lit(1)),
                keys=["id"], order_col="v",
            )
            if crash_before_checkpoint:
                return  # crashed: data written, checkpoint NOT advanced
            offset += 100
            ckpt.save(offset)

    run_once(crash_before_checkpoint=True)
    assert ckpt.load() == 0  # checkpoint still at 0
    run_once(crash_before_checkpoint=False)  # replays page 0, continues
    final = spark.read.parquet(target)
    assert final.count() == 200  # no duplicates despite the replay
    assert ckpt.load() == 200


def test_corrupt_checkpoint_restarts_at_zero(tmp_path):
    p = tmp_path / "progress.json"
    p.write_text("{not json")
    assert OffsetCheckpoint(str(p)).load() == 0


def test_partitioned_append_layout(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "apple", 10.0), (2, "apple", 11.0), (3, "tea", 5.0)],
        "id int, Commodity string, price double",
    )
    path = str(tmp_path / "crops")
    sink_partitioned_append(df, path)
    dirs = {d for d in os.listdir(path) if d.startswith("Commodity=")}
    assert dirs == {"Commodity=apple", "Commodity=tea"}
    back = spark.read.parquet(path)
    assert back.count() == 3
    # append (not overwrite): second write adds rows
    sink_partitioned_append(df.filter("id = 3"), path)
    assert spark.read.parquet(path).filter("Commodity = 'tea'").count() == 2


def test_merge_upsert_keeps_latest(spark, tmp_path):
    target = str(tmp_path / "t")
    v1 = spark.createDataFrame([(1, "a", 1), (2, "b", 1)], "k int, val string, ver int")
    merge_upsert(spark, target, v1, keys=["k"], order_col="ver")
    v2 = spark.createDataFrame([(2, "B2", 2), (3, "c", 2)], "k int, val string, ver int")
    merge_upsert(spark, target, v2, keys=["k"], order_col="ver")
    got = {r.k: (r.val, r.ver) for r in spark.read.parquet(target).collect()}
    assert got == {1: ("a", 1), 2: ("B2", 2), 3: ("c", 2)}


def test_merge_upsert_swap_is_crash_safe(spark, tmp_path):
    """The parquet fallback must never expose a half-written table:
    (a) a normal merge leaves no .old/.stage residue; (b) a swap that
    died between its two renames (target gone, .old intact) is healed
    by the next merge_upsert call with zero data loss; (c) the
    'file:' URI form probes the same directory (r4 advice: the fixed
    7-char slice silently emptied existing tables)."""
    import os

    target = str(tmp_path / "t")
    v1 = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1)], "k int, val string, ver int"
    )
    merge_upsert(spark, target, v1, keys=["k"], order_col="ver")
    assert not os.path.exists(target + ".old")
    assert not [p for p in os.listdir(tmp_path) if ".stage-" in p]

    # simulate the crash window: target renamed away, .old left behind
    os.rename(target, target + ".old")
    v2 = spark.createDataFrame([(3, "c", 2)], "k int, val string, ver int")
    merge_upsert(spark, target, v2, keys=["k"], order_col="ver")
    got = {r.k: (r.val, r.ver) for r in spark.read.parquet(target).collect()}
    assert got == {1: ("a", 1), 2: ("b", 1), 3: ("c", 2)}  # v1 recovered

    # file:-scheme form must see the same existing table, not restart it
    v3 = spark.createDataFrame([(4, "d", 3)], "k int, val string, ver int")
    merge_upsert(spark, "file:" + target, v3, keys=["k"], order_col="ver")
    got = {r.k: r.val for r in spark.read.parquet(target).collect()}
    assert got == {1: "a", 2: "b", 3: "c", 4: "d"}


def test_merge_upsert_sweeps_stale_stage_dirs(spark, tmp_path):
    """A SIGKILL after the staging write runs no finally and leaks its
    .stage-<uuid> dir (ADVICE r5). The next merge_upsert must sweep
    stage dirs older than the grace window, keep young ones (a
    concurrent writer's live staging), and never touch a dir that
    doesn't match the 8-hex stage slot exactly."""
    import os
    import time

    target = str(tmp_path / "t")
    v1 = spark.createDataFrame([(1, "a", 1)], "k int, val string, ver int")
    merge_upsert(spark, target, v1, keys=["k"], order_col="ver")

    stale = target + ".stage-deadbeef"
    young = target + ".stage-cafebabe"
    nonslot = target + ".stage-deadbeefX"  # extends past the 8-hex slot
    for d in (stale, young, nonslot):
        os.makedirs(d)
    past = time.time() - 7200  # beyond the 1 h grace window
    os.utime(stale, (past, past))
    os.utime(nonslot, (past, past))

    v2 = spark.createDataFrame([(2, "b", 2)], "k int, val string, ver int")
    merge_upsert(spark, target, v2, keys=["k"], order_col="ver")

    assert not os.path.exists(stale), "stale stage dir not swept"
    assert os.path.exists(young), "live (young) stage dir was deleted"
    assert os.path.exists(nonslot), "non-slot-matching sibling was deleted"
    got = {r.k: r.val for r in spark.read.parquet(target).collect()}
    assert got == {1: "a", 2: "b"}


def test_merge_upsert_serializes_concurrent_writers(spark, tmp_path):
    """Two concurrent merge_upserts on one table must not both read the
    same base and last-rename-wins (lost update, ADVICE r6): while one
    writer holds the table lock, a second raises instead of clobbering.
    A dead holder's lock is stolen, so a crashed writer never wedges
    the table."""
    import pytest

    from agri_market_data_pipeline_spark.sources.snapshots import (
        ConcurrentPublishError,
        table_lock,
    )

    target = str(tmp_path / "t")
    v1 = spark.createDataFrame([(1, "a", 1)], "k int, val string, ver int")
    merge_upsert(spark, target, v1, keys=["k"], order_col="ver")
    with table_lock(target + ".lock"):  # a live concurrent writer
        with pytest.raises(ConcurrentPublishError):
            merge_upsert(spark, target, v1, keys=["k"], order_col="ver")
    # lock released on exit — the next upsert proceeds
    v2 = spark.createDataFrame([(1, "A2", 2)], "k int, val string, ver int")
    merge_upsert(spark, target, v2, keys=["k"], order_col="ver")
    got = {r.k: r.val for r in spark.read.parquet(target).collect()}
    assert got == {1: "A2"}
    # dead holder (pid that cannot exist) is stolen, not fatal
    with open(target + ".lock", "w") as fh:
        fh.write("99999999")
    merge_upsert(spark, target, v1, keys=["k"], order_col="ver")
    assert not os.path.exists(target + ".lock")


def test_merge_upsert_sweep_survives_glob_metachars(spark, tmp_path):
    """A table path containing glob metacharacters ([, ?, *) must still
    sweep ITS stale .stage-* dirs (ADVICE r6: unescaped glob silently
    matched nothing). Spark's own readers glob input paths, so such a
    table can't be re-READ without escaping — but the write-side sweep
    must not silently skip it."""
    import time as _time

    target = str(tmp_path / "t[1]")
    stale = target + ".stage-deadbeef"
    os.makedirs(stale)
    old = _time.time() - 7200
    os.utime(stale, (old, old))
    v1 = spark.createDataFrame([(1, "a", 1)], "k int, val string, ver int")
    merge_upsert(spark, target, v1, keys=["k"], order_col="ver")
    assert not os.path.exists(stale)  # swept despite the metachar
    assert os.path.isdir(target)  # table written at the literal path


def test_delta_merge_conditions_strings():
    """The MERGE INTO condition builder is pure string construction —
    unit-testable without a Delta classpath (VERDICT r5 item 5)."""
    import pytest

    from agri_market_data_pipeline_spark.sources.sinks import (
        delta_merge_conditions,
    )

    on, when = delta_merge_conditions(["k"], "ver")
    assert on == "t.`k` = s.`k`"
    assert when == "s.`ver` >= t.`ver`"

    on2, _ = delta_merge_conditions(["region", "market id"], "fetched_at")
    assert on2 == "t.`region` = s.`region` AND t.`market id` = s.`market id`"

    # embedded backticks are doubled, not truncated
    on3, _ = delta_merge_conditions(["we`ird"], "v")
    assert on3 == "t.`we``ird` = s.`we``ird`"

    with pytest.raises(ValueError):
        delta_merge_conditions([], "ver")

    # composite order columns: lexicographic newer-or-equal guard
    # (ADVICE r7 — a truncated packed key needs a total tiebreak),
    # outer-parenthesized so 'WHEN MATCHED AND ' + guard composes
    # without OR rebinding under the caller's AND (ADVICE r8)
    _, when2 = delta_merge_conditions(["k"], ["ord", "event_id"])
    assert when2 == (
        "(s.`ord` > t.`ord` OR (s.`ord` = t.`ord` "
        "AND (s.`event_id` >= t.`event_id`)))"
    )
    with pytest.raises(ValueError):
        delta_merge_conditions(["k"], [])


def test_merge_upsert_composite_order(spark, tmp_path):
    """A list order_col must break primary-key ties by the secondary
    column — the exact case ADVICE r7 flagged in stream_upsert_sink
    (same packed `ord`, different event_id)."""
    target = str(tmp_path / "t")
    v1 = spark.createDataFrame(
        [(1, 10, 3, "low"), (1, 10, 7, "high")],
        "k int, ord long, event_id long, val string",
    )
    merge_upsert(spark, target, v1, keys=["k"], order_col=["ord", "event_id"])
    rows = spark.read.parquet(target).collect()
    assert len(rows) == 1 and rows[0]["val"] == "high"
    # a later merge with equal ord but lower event_id must NOT win
    v2 = spark.createDataFrame(
        [(1, 10, 5, "mid")], "k int, ord long, event_id long, val string"
    )
    merge_upsert(spark, target, v2, keys=["k"], order_col=["ord", "event_id"])
    rows = spark.read.parquet(target).collect()
    assert len(rows) == 1 and rows[0]["val"] == "high"


def test_merge_upsert_rejects_empty_keys(spark, tmp_path):
    import pytest

    v = spark.createDataFrame([(1, 1)], "k int, ver int")
    with pytest.raises(ValueError):
        merge_upsert(spark, str(tmp_path / "t"), v, keys=[], order_col="ver")


def test_hadoop_path_exists_probe(spark, tmp_path):
    """The remote-scheme existence probe goes through the Hadoop
    FileSystem API (ADVICE r5: urlparse().path sent s3://bucket/t to the
    LOCAL filesystem). file: URIs exercise the same API locally. An
    unresolvable scheme RAISES (ADVICE r6): degrading it to False would
    route merge_upsert into the first-write overwrite branch on a
    transient error against an existing remote table — silent data
    loss. fs.exists returns False only for genuinely absent paths."""
    import pytest
    from agri_market_data_pipeline_spark.sources.sinks import (
        _hadoop_path_exists,
    )

    d = tmp_path / "x"
    d.mkdir()
    assert _hadoop_path_exists(spark, "file://" + str(d)) is True
    assert _hadoop_path_exists(spark, "file://" + str(tmp_path / "no")) is False
    with pytest.raises(Exception):
        _hadoop_path_exists(spark, "nosuchscheme://bucket/t")


def test_last_page_clamped_to_max_offset(spark):
    """Non-limit-aligned ranges must not overshoot [start, max_offset)."""
    asked = []

    def fetch(offset: int, limit: int) -> list[dict]:
        asked.append((offset, limit))
        return [{"id": i, "commodity": "c"} for i in range(offset, offset + limit)]

    records, _ = read_paginated_api(
        spark, fetch, max_offset=1500, limit=1000, schema=SCHEMA,
        num_partitions=1, pace=0.0, throttle_s=0.0,
    )
    rows = records.collect()
    assert len(rows) == 1500
    assert max(r.id for r in rows) == 1499  # no overshoot past the bound


def test_throttle_independent_of_pace(spark):
    """The API-quota throttle must apply even when pace=0 collapses the
    retry backoffs."""
    import time as _time

    t0 = _time.time()
    read_paginated_api(
        spark, _fake_feed(500), max_offset=500, limit=100, schema=SCHEMA,
        num_partitions=1, pace=0.0, throttle_s=0.05,
    )
    assert _time.time() - t0 >= 0.25  # 5 pages x 50ms on one partition


def test_paginated_api_over_live_http(spark):
    """The last parity gap vs the reference's network path
    (fetch_data.py:68-77): ingest through REAL sockets. An in-process
    loopback HTTP server serves the JSON `records` envelope with
    offset/limit paging; one page 500s on its first hit so the retry
    ladder is exercised over HTTP, not a fake. Spark's Python workers
    are separate processes — the fetch callable carries only
    (host, port) and opens its own connections."""
    import http.server
    import json
    import threading
    from urllib.parse import parse_qs, urlparse

    n_records = 137
    flaky_offset = 40
    seen: dict[int, int] = {}
    lock = threading.Lock()

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):  # keep pytest output clean
            pass

        def do_GET(self):
            q = parse_qs(urlparse(self.path).query)
            offset = int(q["offset"][0])
            limit = int(q["limit"][0])
            with lock:
                seen[offset] = seen.get(offset, 0) + 1
                fail = offset == flaky_offset and seen[offset] == 1
            if fail:
                self.send_response(500)
                self.end_headers()
                return
            records = [
                {"id": i, "commodity": f"crop{i % 3}"}
                for i in range(offset, min(offset + limit, n_records))
            ]
            body = json.dumps({"records": records}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    host, port = server.server_address
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:

        def http_fetch(offset: int, limit: int) -> list[dict]:
            import json as _json
            import urllib.request

            url = (
                f"http://{host}:{port}/api/resource"
                f"?offset={offset}&limit={limit}"
            )
            with urllib.request.urlopen(url, timeout=10) as resp:
                if resp.status != 200:
                    raise RuntimeError(f"status {resp.status}")
                return _json.loads(resp.read())["records"]

        records, dead = read_paginated_api(
            spark,
            http_fetch,
            max_offset=n_records,
            schema=SCHEMA,
            limit=20,
            num_partitions=4,
            pace=0.0,
            throttle_s=0.0,
        )
        assert dead.count() == 0
        rows = records.orderBy("id").collect()
        assert [r.id for r in rows] == list(range(n_records))
        assert all(r.commodity == f"crop{r.id % 3}" for r in rows)
        # the flaky page was retried over the wire, then succeeded
        assert seen[flaky_offset] >= 2
    finally:
        server.shutdown()
        server.server_close()


def test_http_fetcher_factory_over_live_http(spark, monkeypatch):
    """The shipped production client (http_fetcher) end-to-end over real
    sockets: api-key read from the env on the worker, format=json in
    the querystring, records envelope unwrapped, non-200 raising into
    the retry ladder (one page 401s until the 2nd attempt)."""
    import http.server
    import json
    import threading
    from urllib.parse import parse_qs, urlparse

    from agri_market_data_pipeline_spark.sources.paginated_api import (
        http_fetcher,
    )

    n_records = 57
    flaky_offset = 20
    seen: dict[int, int] = {}
    lock = threading.Lock()

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            q = parse_qs(urlparse(self.path).query)
            offset = int(q["offset"][0])
            limit = int(q["limit"][0])
            if q.get("api-key") != ["sekrit"] or q.get("format") != ["json"]:
                self.send_response(403)
                self.end_headers()
                return
            with lock:
                seen[offset] = seen.get(offset, 0) + 1
                fail = offset == flaky_offset and seen[offset] == 1
            if fail:
                self.send_response(401)
                self.end_headers()
                return
            records = [
                {"id": i, "commodity": f"c{i % 2}"}
                for i in range(offset, min(offset + limit, n_records))
            ]
            body = json.dumps({"records": records}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    host, port = server.server_address
    threading.Thread(target=server.serve_forever, daemon=True).start()
    monkeypatch.setenv("DATA_GOV_API_KEY", "sekrit")
    try:
        # env-sourced api key: exercised with a direct (driver-side)
        # call — Spark's local-mode Python workers inherit the JVM's
        # env from session startup, so a monkeypatched var can't reach
        # them; the distributed run below passes the key via params.
        env_fetch = http_fetcher(f"http://{host}:{port}/api/resource")
        assert [r["id"] for r in env_fetch(0, 10)] == list(range(10))

        fetch = http_fetcher(
            f"http://{host}:{port}/api/resource",
            params={"api-key": "sekrit"},
        )
        records, dead = read_paginated_api(
            spark,
            fetch,
            max_offset=n_records,
            schema=SCHEMA,
            limit=10,
            num_partitions=2,
            pace=0.0,
            throttle_s=0.0,
        )
        assert dead.count() == 0
        rows = records.orderBy("id").collect()
        assert [r.id for r in rows] == list(range(n_records))
        assert seen[flaky_offset] >= 2  # 401 retried through the ladder
    finally:
        server.shutdown()
        server.server_close()


def test_coerce_to_schema_nulls_fractional_in_integer_field():
    """A feed delivering 12.5 in a long-typed field must null the value,
    not raise 'cannot safely cast' and fail the whole page (ADVICE r3)."""
    import pandas as pd

    from pyspark.sql.types import DoubleType, LongType
    from agri_market_data_pipeline_spark.sources.paginated_api import (
        _coerce_to_schema,
    )

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("price", DoubleType()),
        ]
    )
    page = pd.DataFrame(
        {
            "id": [1, 12.5, "oops", None, 7.0],
            "name": [1, "ok", 2.5, None, True],
            "price": ["3.5", "bad", None, 2, 1],
        }
    )
    out = _coerce_to_schema(page, schema)
    ids = out["id"].tolist()
    assert ids[0] == 1 and ids[4] == 7
    assert pd.isna(ids[1]) and pd.isna(ids[2]) and pd.isna(ids[3])
    assert str(out["id"].dtype) == "Int64"
    assert out["name"].tolist()[0] == "1" and out["name"].tolist()[4] == "True"
    assert out["price"].tolist()[0] == 3.5
