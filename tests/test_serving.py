"""S7 BI/HTTP serving endpoint tests — the reference's Superset→HTTP contract
re-expressed Spark-side (read-only gold-only catalog, 50k row cap, 60 s
timeout)."""

from __future__ import annotations

import json
import urllib.parse
import urllib.request

import pytest

from dev_clickhouse_spark.serving import SqlServingEndpoint


@pytest.fixture(scope="module")
def endpoint(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("gold")
    spark.createDataFrame(
        [("EU", 10.0), ("EU", 5.0), ("US", 7.5)], "region string, revenue double"
    ).write.parquet(str(root / "gold_revenue"))
    spark.createDataFrame([(1, "x")], "id long, secret string").write.parquet(
        str(root / "bronze_private")
    )
    ep = SqlServingEndpoint(spark, {"gold_revenue": str(root / "gold_revenue")})
    ep._test_bronze_path = str(root / "bronze_private")
    port = ep.start()
    yield ep, port
    ep.stop()


def _get(port: int, sql: str, extra: str = ""):
    q = urllib.parse.urlencode({"q": sql}) + extra
    req = urllib.request.Request(f"http://127.0.0.1:{port}/query?{q}")
    try:
        with urllib.request.urlopen(req, timeout=90) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_query_roundtrip(endpoint):
    _ep, port = endpoint
    status, body = _get(
        port,
        "SELECT region, sum(revenue) AS rev FROM gold_revenue "
        "GROUP BY region ORDER BY region",
    )
    assert status == 200
    assert body["rows"] == [
        {"region": "EU", "rev": 15.0},
        {"region": "US", "rev": 7.5},
    ]


def test_non_gold_table_is_invisible(endpoint):
    """The serving session's catalog holds gold views only — the bi_reader
    visibility analog: other tables fail analysis, not leak."""
    _ep, port = endpoint
    status, body = _get(port, "SELECT * FROM bronze_private")
    assert status == 400
    assert "TABLE_OR_VIEW_NOT_FOUND" in body["error"]


def test_writes_are_refused(endpoint):
    _ep, port = endpoint
    for sql in (
        "INSERT INTO gold_revenue VALUES ('X', 1.0)",
        "DROP TABLE gold_revenue",
        "CREATE TABLE t AS SELECT 1",
        "SET spark.sql.shuffle.partitions=1",
        "SELECT 1; DROP TABLE gold_revenue",
    ):
        status, body = _get(port, sql)
        assert status == 403, sql
    # the underlying view still serves
    status, _ = _get(port, "SELECT count(*) AS n FROM gold_revenue")
    assert status == 200


def test_path_based_table_access_is_refused(endpoint):
    """runSQLOnFiles must be off in the serving session: ``parquet.`path```
    / ``text.`path``` would otherwise read arbitrary files (bronze tables,
    /etc/…) straight past the gold-only catalog."""
    ep, port = endpoint
    bronze = ep._test_bronze_path
    for sql in (
        f"SELECT * FROM parquet.`{bronze}`",
        "SELECT * FROM text.`/etc/hostname`",
        "SELECT * FROM json.`/etc/hosts`",
    ):
        status, body = _get(port, sql)
        assert status == 400, (sql, body)
        err = body["error"]
        assert "UNSUPPORTED_FEATURE" in err or "NOT_FOUND" in err, (sql, err)


def test_global_temp_views_are_refused(spark, endpoint):
    """global_temp is shared across all sessions — a serving query must not
    see it, even backtick-quoted."""
    _ep, port = endpoint
    spark.createDataFrame([(42,)], "leak int").createOrReplaceGlobalTempView(
        "leaky"
    )
    try:
        for sql in (
            "SELECT * FROM global_temp.leaky",
            "SELECT * FROM `global_temp`.`leaky`",
            "SELECT * FROM GLOBAL_TEMP.leaky",
        ):
            status, body = _get(port, sql)
            assert status == 403, (sql, body)
    finally:
        spark.catalog.dropGlobalTempView("leaky")


def test_masker_bypass_attempts_are_refused(spark, endpoint):
    """The lexical scans must track comments and backtick regions exactly
    like the SQL lexer: a quote inside a comment or backtick identifier is
    plain text — treating it as a string opener desynchronizes the mask and
    hides deny-listed identifiers behind it."""
    _ep, port = endpoint
    spark.createDataFrame([(42,)], "leak int").createOrReplaceGlobalTempView(
        "leaky2"
    )
    try:
        for sql in (
            "SELECT /* ' */ * FROM global_temp.leaky2 WHERE 'x' = 'x'",
            "SELECT `x'`, 1 FROM global_temp.leaky2"
            " CROSS JOIN (SELECT 1 AS `x'`)",
            "SELECT -- '\n * FROM global_temp.leaky2",
        ):
            status, body = _get(port, sql)
            assert status == 403, (sql, body)
        # …and a comment must not hide a statement separator either
        status, _ = _get(
            port, "SELECT 1 /* x */; DROP TABLE gold_revenue"
        )
        assert status == 403
        # benign: the word inside a LITERAL is served
        status, body = _get(port, "SELECT 'global_temp' AS s")
        assert status == 200 and body["rows"] == [{"s": "global_temp"}]
    finally:
        spark.catalog.dropGlobalTempView("leaky2")


def test_semicolon_inside_literal_is_served(endpoint):
    _ep, port = endpoint
    status, body = _get(port, "SELECT ';' AS sep")
    assert status == 200
    assert body["rows"] == [{"sep": ";"}]
    status, body = _get(port, "SELECT \"a;b\" AS s, `x;y` FROM (SELECT 1 AS `x;y`)")
    assert status == 200
    # …while real multi-statement stays refused
    status, _ = _get(port, "SELECT ';' AS sep; DROP TABLE gold_revenue")
    assert status == 403


def test_timeout_cancels_spark_jobs(spark, tmp_path):
    """A 504 must release the cluster: the tagged job group is cancelled, so
    the runaway query stops consuming the shared SparkContext."""
    import time

    spark.range(0, 50).write.parquet(str(tmp_path / "g"))
    ep = SqlServingEndpoint(spark, {"g": str(tmp_path / "g")}, timeout_sec=2.0)
    port = ep.start()
    try:
        # the sleep lives in a subquery PROJECTION (Spark 4 rejects
        # non-deterministic expressions as aggregate arguments) and is
        # count(s)-referenced so column pruning can't drop it
        slow = (
            "SELECT count(s) AS n FROM (SELECT java_method("
            "'java.lang.Thread', 'sleep', 400L) AS s FROM g)"
        )
        status, body = _get(port, slow)
        assert status == 504, body
        # the cancelled group's jobs must drain, not run to completion
        deadline = time.time() + 30
        while time.time() < deadline:
            tracker = spark.sparkContext.statusTracker()
            if not tracker.getActiveJobsIds():
                break
            time.sleep(0.5)
        assert not spark.sparkContext.statusTracker().getActiveJobsIds()
    finally:
        ep.stop()


def test_row_cap(spark, tmp_path):
    spark.range(0, 100).write.parquet(str(tmp_path / "g"))
    ep = SqlServingEndpoint(spark, {"g": str(tmp_path / "g")}, max_rows=10)
    rows = ep.execute("SELECT id FROM g")
    assert len(rows) == 10


def test_serving_isolation_from_parent_session(spark, endpoint):
    """Registering gold views for serving must not pollute the engine's own
    session catalog."""
    assert not any(
        t.name == "gold_revenue" for t in spark.catalog.listTables()
    )


def test_comment_prefixed_query_is_served(endpoint):
    """BI tools prepend '-- tool: …' / '/* tag */' to legitimate SELECTs;
    the statement-kind check must read the first REAL token (comment-masked
    text), not reject the query as statement kind '--'."""
    _ep, port = endpoint
    for sql in (
        "-- Superset dashboard 42\nSELECT count(*) AS n FROM gold_revenue",
        "/* Metabase card 7 */ SELECT count(*) AS n FROM gold_revenue",
        "  /* a */ -- b\n  SELECT count(*) AS n FROM gold_revenue",
    ):
        status, body = _get(port, sql)
        assert status == 200, (sql, body)
        assert body["rows"] == [{"n": 3}]
    # comment-wrapped writes stay refused, and comment-only input is refused
    status, _ = _get(port, "/* x */ DROP TABLE gold_revenue")
    assert status == 403
    status, _ = _get(port, "-- nothing here")
    assert status == 403


def test_concurrent_slow_queries_cancel_without_cross_cancel(spark, tmp_path):
    """N simultaneous 504s must each cancel their OWN job group and a
    concurrent fast query must still be served: job groups are per-request
    (thread-local under pinned-thread mode), so one timeout's cancel must
    not kill another request's jobs or starve the endpoint."""
    import concurrent.futures
    import time

    spark.range(0, 64).coalesce(4).write.parquet(str(tmp_path / "g"))
    ep = SqlServingEndpoint(spark, {"g": str(tmp_path / "g")}, timeout_sec=3.0)
    port = ep.start()
    try:
        # 4 slow queries: 4 tasks each (16 rows x 500 ms sleep per task =
        # ~8 s >> timeout), leaving 16+ cores free for the fast one; the
        # sleep sits in a subquery projection (Spark 4 rejects it as an
        # aggregate argument) and count(s) keeps it from being pruned
        slow = (
            "SELECT count(s) AS n FROM (SELECT java_method("
            "'java.lang.Thread', 'sleep', 500L) AS s FROM g)"
        )
        fast = "SELECT count(*) AS n FROM g"
        with concurrent.futures.ThreadPoolExecutor(max_workers=5) as pool:
            slow_futs = [pool.submit(_get, port, slow) for _ in range(4)]
            time.sleep(0.5)  # slow requests in flight first
            fast_status, fast_body = pool.submit(_get, port, fast).result()
            slow_results = [f.result() for f in slow_futs]
        # the fast query was NOT starved or cross-cancelled
        assert fast_status == 200, fast_body
        assert fast_body["rows"] == [{"n": 64}]
        # every slow query timed out (400 iff its cancel landed pre-join)
        for status, body in slow_results:
            assert status in (504, 400), body
        assert sum(1 for s, _ in slow_results if s == 504) >= 3
        # ...and ALL their job groups drain instead of running to completion
        deadline = time.time() + 60
        while time.time() < deadline:
            if not spark.sparkContext.statusTracker().getActiveJobsIds():
                break
            time.sleep(0.5)
        assert not spark.sparkContext.statusTracker().getActiveJobsIds()
    finally:
        ep.stop()


def test_discovery_endpoints(endpoint):
    """BI connectors probe the catalog before issuing SQL; /tables lists
    the served views and /healthz answers without running a query."""
    import urllib.request as _rq

    _ep, port = endpoint
    with _rq.urlopen(f"http://127.0.0.1:{port}/tables", timeout=30) as r:
        assert r.status == 200
        assert json.loads(r.read()) == {"tables": ["gold_revenue"]}
    with _rq.urlopen(f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
        assert r.status == 200
        assert json.loads(r.read()) == {"ok": True, "tables": 1}


def test_row_policy_filters_per_role(endpoint):
    """ROW POLICY analog: a role sees the OR of its policies; a role with
    no policy on a policy-bearing table sees nothing; admin (no role)
    bypasses."""
    ep, port = endpoint
    ep.add_row_policy("gold_revenue", "eu_analyst", "region = 'EU'")
    try:
        rows = ep.execute(
            "SELECT region, revenue FROM gold_revenue ORDER BY revenue",
            role="eu_analyst",
        )
        assert {r["region"] for r in rows} == {"EU"}
        assert len(rows) == 2
        # a second permissive policy widens the same role (OR semantics)
        ep.add_row_policy(
            "gold_revenue", "eu_analyst", "region = 'US' AND revenue > 7"
        )
        rows = ep.execute(
            "SELECT region FROM gold_revenue", role="eu_analyst"
        )
        assert sorted(r["region"] for r in rows) == ["EU", "EU", "US"]
        # unknown role on a policy-bearing table: zero rows, not an error
        assert ep.execute(
            "SELECT * FROM gold_revenue", role="intern"
        ) == []
        # admin path bypasses
        assert len(ep.execute("SELECT * FROM gold_revenue")) == 3
        # HTTP carries the role as a query parameter
        q = urllib.parse.urlencode(
            {"q": "SELECT count(*) AS n FROM gold_revenue",
             "role": "eu_analyst"}
        )
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/query?{q}", timeout=90
        ) as resp:
            body = json.loads(resp.read())
        assert body["rows"] == [{"n": 3}]
    finally:
        ep._policies.clear()
        ep._role_sessions.clear()


def _get_raw(port: int, params: dict):
    q = urllib.parse.urlencode(params)
    req = urllib.request.Request(f"http://127.0.0.1:{port}/query?{q}")
    try:
        with urllib.request.urlopen(req, timeout=90) as resp:
            return resp.status, resp.headers.get("Content-Type"), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type"), e.read()


def test_output_formats(endpoint):
    """ClickHouse HTTP FORMAT clause: CSV/TSV/JSONEachRow renderings, the
    WithNames header variants, and in-SQL FORMAT beating ?default_format."""
    _ep, port = endpoint
    base = ("SELECT region, sum(revenue) AS rev FROM gold_revenue "
            "GROUP BY region ORDER BY region")
    st, ct, body = _get_raw(port, {"q": base + " FORMAT CSVWithNames"})
    assert st == 200 and ct.startswith("text/csv")
    assert body.decode() == "region,rev\nEU,15.0\nUS,7.5\n"
    st, ct, body = _get_raw(port, {"q": base + " FORMAT TSVWithNames"})
    assert st == 200 and ct.startswith("text/tab-separated-values")
    assert body.decode() == "region\trev\nEU\t15.0\nUS\t7.5\n"
    st, ct, body = _get_raw(port, {"q": base + " FORMAT JSONEachRow"})
    assert st == 200 and ct.startswith("application/x-ndjson")
    lines = [json.loads(x) for x in body.decode().splitlines()]
    assert lines == [{"region": "EU", "rev": 15.0},
                     {"region": "US", "rev": 7.5}]
    # FORMAT JSON: the ClickHouse meta/data/rows envelope
    st, _ct, body = _get_raw(port, {"q": base + " FORMAT JSON"})
    doc = json.loads(body)
    assert [m["name"] for m in doc["meta"]] == ["region", "rev"]
    assert doc["rows"] == 2
    # ?default_format applies when no in-SQL FORMAT...
    st, ct, _b = _get_raw(port, {"q": base, "default_format": "CSV"})
    assert st == 200 and ct.startswith("text/csv")
    # ...and the in-SQL clause wins over it
    st, ct, _b = _get_raw(
        port, {"q": base + " FORMAT TSV", "default_format": "CSV"}
    )
    assert st == 200 and ct.startswith("text/tab-separated-values")
    # a literal ending in 'FORMAT CSV' is data, not a clause
    st, _ct, body = _get_raw(
        port, {"q": "SELECT 'no FORMAT CSV' AS s"}
    )
    assert st == 200 and json.loads(body)["rows"] == [{"s": "no FORMAT CSV"}]
    # unknown format → 400, not a served query
    st, _ct, _b = _get_raw(port, {"q": base + " FORMAT Parquet"})
    assert st == 400


def test_quota_per_role(endpoint):
    """CREATE QUOTA analog: the role's sliding window admits max_queries,
    the next request 429s, and admin calls are never metered."""
    ep, port = endpoint
    ep.set_quota("capped", max_queries=2, window_sec=3600)
    try:
        q = {"q": "SELECT 1 AS x", "role": "capped"}
        assert _get_raw(port, q)[0] == 200
        assert _get_raw(port, q)[0] == 200
        st, _ct, body = _get_raw(port, q)
        assert st == 429 and b"quota exceeded" in body
        # other roles and admin stay unmetered
        assert _get_raw(port, {"q": "SELECT 1 AS x"})[0] == 200
        assert _get_raw(port, {"q": "SELECT 1 AS x", "role": "open"})[0] == 200
        # denied statements never consume quota: the charge happens after
        # the read-only check admits the statement
        ep.set_quota("capped2", max_queries=1, window_sec=3600)
        st, _c, _b = _get_raw(
            port, {"q": "DROP TABLE gold_revenue", "role": "capped2"}
        )
        assert st == 403
        assert _get_raw(
            port, {"q": "SELECT 1 AS x", "role": "capped2"}
        )[0] == 200
    finally:
        ep._quotas.clear()
        ep._quota_hits.clear()


def test_settings_clause_consumed_and_row_cap_honored(endpoint):
    """A trailing ClickHouse SETTINGS clause is consumed (Spark's parser
    never sees it); max_result_rows tightens the row cap, unknown knobs
    are accepted and ignored."""
    ep, port = endpoint
    rows = ep.execute(
        "SELECT region FROM gold_revenue ORDER BY region "
        "SETTINGS max_result_rows = 2, max_threads = 8"
    )
    assert len(rows) == 2
    # works over HTTP together with FORMAT (grammar order: SETTINGS, FORMAT)
    st, _ct, body = _get_raw(
        port,
        {"q": "SELECT region FROM gold_revenue ORDER BY region "
              "SETTINGS max_result_rows = 1 FORMAT CSV"},
    )
    assert st == 200 and body.decode() == "EU\n"
    # a literal containing 'SETTINGS x = 1' is data, not a clause
    rows = ep.execute("SELECT 'keep SETTINGS x = 1' AS s")
    assert rows == [{"s": "keep SETTINGS x = 1"}]


def test_query_log_records_statements(endpoint):
    """system.query_log analog: ok/denied statements recorded with role,
    status, rows and duration; served over /system/query_log."""
    ep, port = endpoint
    ep.execute("SELECT count(*) AS n FROM gold_revenue", role=None)
    with pytest.raises(PermissionError):
        ep.execute("DROP TABLE gold_revenue")
    log = ep.query_log(10)
    assert log[0]["status"] == "denied"
    assert log[1]["status"] == "ok" and log[1]["result_rows"] == 1
    assert log[1]["duration_ms"] >= 0
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}/system/query_log?limit=5", timeout=30
    ) as resp:
        doc = json.loads(resp.read())
    assert doc["entries"][0]["status"] == "denied"


def test_query_parameters_typed_substitution(endpoint):
    """ClickHouse HTTP query parameters: {name:Type} placeholders filled
    from param_* with type validation — injection through a numeric
    parameter is impossible, strings are quoted, placeholders inside
    literals stay data."""
    ep, port = endpoint
    st, _ct, body = _get_raw(
        port,
        {"q": "SELECT region, revenue FROM gold_revenue "
              "WHERE revenue > {minrev:Float64} AND region = {r:String} "
              "ORDER BY revenue",
         "param_minrev": "6", "param_r": "EU"},
    )
    assert st == 200
    assert json.loads(body)["rows"] == [{"region": "EU", "revenue": 10.0}]
    # numeric params must parse: an injection payload 400s before parse
    st, _ct, body = _get_raw(
        port,
        {"q": "SELECT * FROM gold_revenue WHERE revenue > {v:Int64}",
         "param_v": "0; DROP TABLE gold_revenue"},
    )
    assert st == 400
    # string quoting: embedded quote cannot escape the literal
    st, _ct, body = _get_raw(
        port,
        {"q": "SELECT count(*) AS n FROM gold_revenue "
              "WHERE region = {r:String}",
         "param_r": "EU' OR '1'='1"},
    )
    assert st == 200 and json.loads(body)["rows"] == [{"n": 0}]
    # a placeholder-shaped substring inside a literal is data
    st, _ct, body = _get_raw(
        port, {"q": "SELECT '{notparam:Int64}' AS s"}
    )
    assert st == 200
    assert json.loads(body)["rows"] == [{"s": "{notparam:Int64}"}]
    # missing parameter -> 400
    st, _ct, _b = _get_raw(
        port, {"q": "SELECT {missing:Int64} AS x"}
    )
    assert st == 400


def test_role_keys_enforce_credentials(spark, tmp_path):
    """ADVICE r9 (medium): with ``role_keys`` configured the endpoint is
    default-deny — a role claim needs its shared secret, an unknown role
    or missing key is 403, and omitting the role entirely no longer
    grants admin visibility past row policies."""
    root = tmp_path / "gold_auth"
    spark.createDataFrame(
        [("EU", 10.0), ("US", 7.5)], "region string, revenue double"
    ).write.parquet(str(root / "rev"))
    ep = SqlServingEndpoint(
        spark, {"rev": str(root / "rev")},
        role_keys={"eu_analyst": "s3cret"},
        admin_key="adm1n",
    )
    ep.add_row_policy("rev", "eu_analyst", "region = 'EU'")
    port = ep.start()
    try:
        def call(qs_extra=""):
            q = urllib.parse.urlencode({"q": "SELECT region FROM rev"})
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/query?{q}{qs_extra}"
            )
            try:
                with urllib.request.urlopen(req, timeout=90) as resp:
                    return resp.status, json.loads(resp.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        # no role, no admin key → default-deny
        status, _ = call()
        assert status == 403
        # wrong key → 403
        status, _ = call("&role=eu_analyst&role_key=wrong")
        assert status == 403
        # unknown role → 403 (also bounds the per-role session cache)
        status, _ = call("&role=nobody&role_key=s3cret")
        assert status == 403
        # right key → policy-filtered rows
        status, body = call("&role=eu_analyst&role_key=s3cret")
        assert status == 200
        assert {r["region"] for r in body["rows"]} == {"EU"}
        # admin key → unfiltered
        status, body = call("&admin_key=adm1n")
        assert status == 200
        assert {r["region"] for r in body["rows"]} == {"EU", "US"}
    finally:
        ep.stop()


def test_role_sessions_lru_bounded(spark, tmp_path):
    root = tmp_path / "gold_lru"
    spark.createDataFrame(
        [(1,)], "id long"
    ).write.parquet(str(root / "t"))
    ep = SqlServingEndpoint(spark, {"t": str(root / "t")})
    cap = ep._MAX_ROLE_SESSIONS
    for i in range(cap + 5):
        ep._session_for(f"role-{i}")
    assert len(ep._role_sessions) == cap
    # the stalest roles were evicted, the freshest survive
    assert f"role-{cap + 4}" in ep._role_sessions
    assert "role-0" not in ep._role_sessions


def test_query_cache_hit_miss_ttl_and_drop(endpoint):
    """ClickHouse query cache analog: SETTINGS use_query_cache=1 stores the
    result; an identical re-run (any whitespace variant) is served from the
    cache (query_log status 'cached'); TTL expiry and SYSTEM DROP QUERY
    CACHE evict."""
    ep, _port = endpoint
    ep.drop_query_cache()
    base = ep.query_cache_stats()
    sql = ("SELECT region, sum(revenue) AS rev FROM gold_revenue "
           "GROUP BY region ORDER BY region SETTINGS use_query_cache = 1")
    cols1, rows1 = ep.execute_columns(sql)
    st = ep.query_cache_stats()
    assert st["entries"] == 1
    assert st["misses"] == base["misses"] + 1
    # whitespace-variant of the same statement hits the same entry
    cols2, rows2 = ep.execute_columns(sql.replace("GROUP BY", "GROUP   BY"))
    assert (cols2, rows2) == (cols1, rows1)
    assert ep.query_cache_stats()["hits"] == base["hits"] + 1
    assert ep.query_log(1)[0]["status"] == "cached"
    entries = ep.query_cache_entries()
    assert len(entries) == 1 and entries[0]["hits"] == 1
    # without the setting, the same text runs uncached
    ep.execute_columns(sql.rsplit("SETTINGS", 1)[0])
    assert ep.query_cache_stats()["hits"] == base["hits"] + 1
    # TTL expiry: a zero-TTL entry is stale immediately
    ep.drop_query_cache()
    ep.execute_columns(sql + ", query_cache_ttl = 0")
    assert ep.query_cache_entries()[0]["stale"]
    _c, _r = ep.execute_columns(sql + ", query_cache_ttl = 0")
    assert ep.query_log(1)[0]["status"] == "ok"  # expired -> re-executed
    ep.drop_query_cache()
    assert ep.query_cache_stats()["entries"] == 0


def test_query_cache_distinguishes_string_literals(endpoint):
    """Two statements that differ ONLY inside a string literal must key to
    distinct cache entries: the whitespace-folding normalizer operates on a
    masked copy and must not erase literal contents from the key (a
    collision would serve query A's rows to query B)."""
    ep, _port = endpoint
    ep.drop_query_cache()
    a = ("SELECT count(*) AS n FROM gold_revenue WHERE region = 'US' "
         "SETTINGS use_query_cache = 1")
    b = ("SELECT count(*) AS n FROM gold_revenue WHERE region = 'EU' "
         "SETTINGS use_query_cache = 1")
    _c, rows_a = ep.execute_columns(a)
    _c, rows_b = ep.execute_columns(b)
    assert ep.query_cache_stats()["entries"] == 2
    assert rows_a != rows_b
    # re-run of b is a hit on ITS OWN entry, returning b's rows
    _c, again_b = ep.execute_columns(b)
    assert again_b == rows_b
    assert ep.query_log(1)[0]["status"] == "cached"
    # whitespace INSIDE a literal is preserved verbatim in the key, while
    # whitespace outside literals still folds to a shared entry
    c1 = ("SELECT 'a  b' AS s FROM gold_revenue LIMIT 1 "
          "SETTINGS use_query_cache = 1")
    c2 = ("SELECT 'a b' AS s FROM gold_revenue LIMIT 1 "
          "SETTINGS use_query_cache = 1")
    ep.drop_query_cache()
    ep.execute_columns(c1)
    ep.execute_columns(c2)
    assert ep.query_cache_stats()["entries"] == 2
    ep.execute_columns(c1.replace("FROM", "  FROM  "))
    assert ep.query_cache_stats()["entries"] == 2  # folded -> hit on c1


def test_query_cache_is_per_role_and_policy_invalidated(endpoint):
    """Entries are keyed per role (query_cache_share_between_users=0): a
    policy-restricted role never sees the admin entry, and adding a policy
    drops the whole cache."""
    ep, _port = endpoint
    ep.drop_query_cache()
    sql = ("SELECT count(*) AS n FROM gold_revenue "
           "SETTINGS use_query_cache = 1")
    _cols, admin_rows = ep.execute_columns(sql)
    ep.add_row_policy("gold_revenue", "cache_probe", "region = 'US'")
    # policy change dropped the cache entirely
    assert ep.query_cache_stats()["entries"] == 0
    _cols, admin_rows = ep.execute_columns(sql)
    _cols, role_rows = ep.execute_columns(sql, role="cache_probe")
    assert admin_rows[0][0] == 3 and role_rows[0][0] == 1
    assert ep.query_cache_stats()["entries"] == 2
    # each keyed independently: both re-runs are cache hits with their own
    # role's rows
    _c, again = ep.execute_columns(sql, role="cache_probe")
    assert again == role_rows


def test_query_cache_nondeterministic_handling(endpoint):
    """Default 'throw' refuses to cache a now()/rand() statement; 'ignore'
    runs it uncached; 'save' caches it anyway (ClickHouse setting
    query_cache_nondeterministic_function_handling)."""
    ep, _port = endpoint
    ep.drop_query_cache()
    nd = "SELECT region, current_date() AS d FROM gold_revenue LIMIT 1"
    with pytest.raises(ValueError, match="nondeterministic"):
        ep.execute_columns(nd + " SETTINGS use_query_cache = 1")
    ep.execute_columns(
        nd + " SETTINGS use_query_cache = 1, "
        "query_cache_nondeterministic_function_handling = 'ignore'"
    )
    assert ep.query_cache_stats()["entries"] == 0
    ep.execute_columns(
        nd + " SETTINGS use_query_cache = 1, "
        "query_cache_nondeterministic_function_handling = 'save'"
    )
    assert ep.query_cache_stats()["entries"] == 1
    # a literal containing 'now' is NOT nondeterministic (masked scan)
    ep.execute_columns(
        "SELECT 'now()' AS s FROM gold_revenue LIMIT 1 "
        "SETTINGS use_query_cache = 1"
    )
    ep.drop_query_cache()


def test_query_cache_lru_eviction(spark, tmp_path):
    root = tmp_path / "g"
    spark.range(5).write.parquet(str(root))
    ep = SqlServingEndpoint(
        spark, {"g": str(root)}, query_cache_max_entries=2
    )
    for i in range(4):
        ep.execute_columns(
            f"SELECT count(*) AS n FROM g WHERE id >= {i} "
            "SETTINGS use_query_cache = 1"
        )
    st = ep.query_cache_stats()
    assert st["entries"] == 2
    # oldest evicted: re-running the first statement is a miss
    ep.execute_columns(
        "SELECT count(*) AS n FROM g WHERE id >= 0 "
        "SETTINGS use_query_cache = 1"
    )
    assert ep.query_cache_stats()["hits"] == 0


def test_system_processes_and_kill_query(spark, tmp_path):
    """system.processes analog + KILL QUERY: a running statement is
    visible with its client-supplied query_id, KILL cancels its Spark
    jobs (the request errors out instead of completing), the entry
    drains, and unknown ids report killed=0."""
    import concurrent.futures
    import time

    spark.range(0, 64).coalesce(4).write.parquet(str(tmp_path / "g"))
    ep = SqlServingEndpoint(
        spark, {"g": str(tmp_path / "g")}, timeout_sec=60.0
    )
    port = ep.start()
    try:
        slow = (
            "SELECT count(s) AS n FROM (SELECT java_method("
            "'java.lang.Thread', 'sleep', 500L) AS s FROM g)"
        )
        with concurrent.futures.ThreadPoolExecutor(max_workers=2) as pool:
            fut = pool.submit(
                lambda: _get(port, slow, extra="&query_id=victim-1")
            )
            # wait until the statement shows up in system.processes
            deadline = time.time() + 30
            seen = []
            while time.time() < deadline:
                _s, body = _get_path(port, "/system/processes")
                seen = body["entries"]
                if any(
                    e["query_id"] == "victim-1" for e in seen
                ) and spark.sparkContext.statusTracker().getActiveJobsIds():
                    break
                time.sleep(0.2)
            assert any(e["query_id"] == "victim-1" for e in seen), seen
            # role-bearing callers may not kill
            st, body = _get(
                port, "KILL QUERY WHERE query_id = 'victim-1'",
                extra="&role=analyst",
            )
            assert st == 403
            # admin kill lands
            st, body = _get(port, "KILL QUERY WHERE query_id = 'victim-1'")
            assert (st, body["killed"]) == (200, 1), body
            st, body = fut.result()
            assert st == 400  # cancelled, not completed
        # entry drained; unknown id reports killed=0
        _s, body = _get_path(port, "/system/processes")
        assert body["entries"] == []
        st, body = _get(port, "KILL QUERY WHERE query_id = 'victim-1'")
        assert (st, body["killed"]) == (200, 0)
    finally:
        ep.stop()


def _get_path(port: int, path: str):
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}")
    with urllib.request.urlopen(req, timeout=30) as resp:
        return resp.status, json.loads(resp.read())


def test_jsoncompact_and_vertical_formats(endpoint):
    ep, port = endpoint
    status, ctype, body = _get_raw(port, {
        "q": "SELECT region, sum(revenue) AS rev FROM gold_revenue "
             "GROUP BY region ORDER BY region FORMAT JSONCompact",
    })
    assert status == 200 and ctype.startswith("application/json")
    parsed = json.loads(body)
    assert [m["name"] for m in parsed["meta"]] == ["region", "rev"]
    assert parsed["data"] == [["EU", 15.0], ["US", 7.5]]
    status, ctype, body = _get_raw(port, {
        "q": "SELECT region FROM gold_revenue ORDER BY region LIMIT 1 "
             "FORMAT Vertical",
    })
    assert status == 200 and ctype.startswith("text/plain")
    assert "Row 1:" in body.decode() and "region: EU" in body.decode()


def test_max_execution_time_setting_times_out(spark, tmp_path):
    import time

    spark.range(0, 8).coalesce(4).write.parquet(str(tmp_path / "g"))
    ep = SqlServingEndpoint(
        spark, {"g": str(tmp_path / "g")}, timeout_sec=60.0
    )
    port = ep.start()
    try:
        slow = (
            "SELECT count(s) AS n FROM (SELECT java_method("
            "'java.lang.Thread', 'sleep', 2000L) AS s FROM g) "
            "SETTINGS max_execution_time = 1"
        )
        t0 = time.monotonic()
        status, _body = _get(port, slow)
        took = time.monotonic() - t0
        assert status in (504, 400)
        assert took < 30  # the 60s endpoint ceiling did NOT apply
    finally:
        ep.stop()


def test_system_metrics_counters(spark, tmp_path):
    spark.range(3).write.parquet(str(tmp_path / "g"))
    ep = SqlServingEndpoint(spark, {"g": str(tmp_path / "g")})
    port = ep.start()
    try:
        _get(port, "SELECT count(*) AS n FROM g")
        _get(port, "DROP TABLE g")          # denied
        _get(port, "SELECT broken syntax")  # error
        _get(port, "SELECT id FROM g SETTINGS use_query_cache = 1")
        _get(port, "SELECT id FROM g SETTINGS use_query_cache = 1")  # hit
        _s, m = _get_path(port, "/system/metrics")
        assert m["queries"] == 5
        assert m["queries_ok"] == 2 and m["queries_cached"] == 1
        assert m["queries_denied"] == 1 and m["queries_error"] == 1
        assert m["result_rows"] == 1 + 3 + 3
        assert m["query_cache_hits"] == 1 and m["running_queries"] == 0
    finally:
        ep.stop()


def test_explain_statement_is_served(endpoint):
    """EXPLAIN is a read statement (CH serves it): the endpoint returns
    the plan text instead of refusing."""
    _ep, port = endpoint
    status, body = _get(
        port, "EXPLAIN SELECT region FROM gold_revenue WHERE region = 'EU'"
    )
    assert status == 200
    plan_text = json.dumps(body["rows"])
    assert "Filter" in plan_text or "Scan" in plan_text
