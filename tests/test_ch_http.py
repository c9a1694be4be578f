"""The CH-dialect wire endpoint (`ch_http.py`, r11 VERDICT r10 #4):
verbatim ClickHouse SELECT text over a real HTTP wire — FINAL, LIMIT
BY, CH formats — plus the global-view bridge to the r7 Thrift/JDBC
endpoint."""

from __future__ import annotations

import json
import urllib.parse
import urllib.request

import pytest
from pyspark.sql import functions as F

from postgre_to_clickhouse_spark.ch_http import (
    register_ch_global_view,
    serve_ch_http,
)
from postgre_to_clickhouse_spark.ch_select import ChContext


def _users(spark):
    rows = [
        (1, "john", "Gold", "2024-03-01 10:00:00"),
        (1, "john", "Silver", "2024-03-02 09:00:00"),
        (2, "jane", "Bronze", "2024-03-01 11:00:00"),
    ]
    return spark.createDataFrame(
        rows, "user_id long, username string, account_type string, updated_at string"
    ).withColumn("updated_at", F.to_timestamp("updated_at"))


@pytest.fixture()
def ep(spark):
    ctx = ChContext(
        {"users": _users(spark)},
        final_specs={"users": (("user_id",), ("updated_at",))},
    )
    endpoint = serve_ch_http(spark, ctx)
    yield endpoint
    endpoint.stop()


def _get(ep, query: str) -> tuple[int, str]:
    url = ep.url + "?query=" + urllib.parse.quote(query)
    try:
        with urllib.request.urlopen(url, timeout=120) as r:
            return r.status, r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def _post(ep, query: str) -> tuple[int, str]:
    req = urllib.request.Request(ep.url, data=query.encode(), method="POST")
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def test_ping(ep):
    code, body = _get(ep, "")
    assert code == 400  # empty query refuses
    with urllib.request.urlopen(ep.url + "ping", timeout=30) as r:
        assert r.status == 200 and r.read() == b"Ok.\n"


def test_verbatim_final_over_the_wire(ep):
    """`SELECT ... FINAL` — CH-only syntax no Spark parser accepts —
    sent as-is by an HTTP wire client, answered with the latest-wins
    rows in CH TabSeparated encoding."""
    code, body = _post(
        ep,
        "SELECT user_id, username, account_type FROM users FINAL "
        "ORDER BY user_id",
    )
    assert code == 200
    assert body == "1\tjohn\tSilver\n2\tjane\tBronze\n"


def test_verbatim_limit_by_and_formats(ep):
    q = (
        "SELECT user_id, account_type FROM users "
        "ORDER BY user_id, account_type LIMIT 1 BY user_id"
    )
    code, tsv = _post(ep, q + " FORMAT TabSeparatedWithNames")
    assert code == 200
    lines = tsv.splitlines()
    assert lines[0] == "user_id\taccount_type"
    assert lines[1:] == ["1\tGold", "2\tBronze"]

    code, nd = _post(ep, q + " FORMAT JSONEachRow")
    assert code == 200
    got = [json.loads(line) for line in nd.splitlines()]
    assert got == [
        {"user_id": 1, "account_type": "Gold"},
        {"user_id": 2, "account_type": "Bronze"},
    ]


def test_get_and_post_agree_and_escaping(spark, ep):
    # a string cell containing a tab and a NULL survive TSV encoding
    ctx_df = spark.createDataFrame(
        [(1, "a\tb"), (2, None)], "id long, s string"
    )
    ep2 = serve_ch_http(spark, ChContext({"t": ctx_df}))
    try:
        code, body = _get(ep2, "SELECT id, s FROM t ORDER BY id")
        assert code == 200 and body == "1\ta\\tb\n2\t\\N\n"
        assert _post(ep2, "SELECT id, s FROM t ORDER BY id") == (code, body)
    finally:
        ep2.stop()


def test_wire_errors_are_loud(ep):
    code, body = _post(ep, "SELECT nope FROM users")
    assert code == 500 and "nope" in body
    code, body = _post(ep, "DROP TABLE users")
    assert code == 500 and "SELECT statements" in body
    # r13: Parquet and (s3) Native both joined the subset; a format
    # the engine does not speak still refuses loudly
    code, body = _post(ep, "SELECT user_id FROM users FORMAT Arrow")
    assert code == 500 and "outside the subset" in body


def test_max_result_rows_guard(spark):
    ep3 = serve_ch_http(
        spark, ChContext({"t": spark.range(100).toDF("id")}),
        max_result_rows=10,
    )
    try:
        code, body = _post(ep3, "SELECT id FROM t")
        assert code == 500 and "max_result_rows" in body
        code, body = _post(ep3, "SELECT id FROM t ORDER BY id LIMIT 5")
        assert code == 200 and body.splitlines() == ["0", "1", "2", "3", "4"]
    finally:
        ep3.stop()


def test_ch_view_served_over_thrift_jdbc(spark):
    """The JDBC bridge: verbatim CH text (FINAL + LIMIT BY) compiled
    into a global temp view, then fetched over a REAL hive-jdbc wire
    connection to the r7 Thrift endpoint — the CH dialect reaching the
    reference's other wire surface (README.md:156 TCP/HTTP; here the
    JDBC analog)."""
    from postgre_to_clickhouse_spark.ddl import serve_sql_endpoint

    ctx = ChContext(
        {"users": _users(spark)},
        final_specs={"users": (("user_id",), ("updated_at",))},
    )
    register_ch_global_view(
        spark, "ch_latest_users",
        "SELECT user_id, account_type FROM users FINAL ORDER BY user_id",
        ctx,
    )
    ep = serve_sql_endpoint(spark)
    try:
        jvm = spark.sparkContext._jvm
        conn = jvm.java.sql.DriverManager.getConnection(ep.url, "anon", "")
        try:
            rs = conn.createStatement().executeQuery(
                "SELECT user_id, account_type FROM global_temp.ch_latest_users "
                "ORDER BY user_id"
            )
            got = []
            while rs.next():
                got.append((rs.getLong(1), rs.getString(2)))
            assert got == [(1, "Silver"), (2, "Bronze")]
        finally:
            conn.close()
    finally:
        ep.stop()
        spark.catalog.dropGlobalTempView("ch_latest_users")


def test_full_terminal_over_the_wire(spark, tmp_path):
    """A catalog-backed endpoint is the full CH terminal: CREATE /
    INSERT / OPTIMIZE FINAL / SELECT — every statement verbatim over
    HTTP, like a curl session against the reference's 8123 port."""
    from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog

    cat = ChDdlCatalog(storage_root=str(tmp_path))
    ep = serve_ch_http(spark, cat)
    try:
        for stmt in (
            "CREATE TABLE u (user_id UInt32, v String, ts DateTime) "
            "ENGINE = ReplacingMergeTree(ts) ORDER BY (user_id)",
            "INSERT INTO u VALUES "
            "(1, 'old', toDateTime('2024-03-01 10:00:00')), "
            "(2, 'b', toDateTime('2024-03-01 11:00:00'))",
            "INSERT INTO u VALUES "
            "(1, 'new', toDateTime('2024-03-02 10:00:00'))",
            "OPTIMIZE TABLE u FINAL",
        ):
            code, body = _post(ep, stmt)
            assert code == 200, (stmt, body)
        code, body = _post(
            ep, "SELECT user_id, v FROM u ORDER BY user_id")
        assert code == 200 and body == "1\tnew\n2\tb\n"
        # loud wire errors for bad DDL too
        code, body = _post(ep, "ALTER TABLE nope DELETE WHERE 1=1")
        assert code == 500 and "undeclared" in body
    finally:
        ep.stop()


def test_introspection_over_the_wire(spark, tmp_path):
    """SHOW TABLES / DESCRIBE TABLE / EXISTS TABLE answer result rows
    over the wire, like a CH server."""
    from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog

    cat = ChDdlCatalog(storage_root=str(tmp_path))
    ep = serve_ch_http(spark, cat)
    try:
        _post(ep, "CREATE TABLE t (a UInt32, s String DEFAULT 'x') "
                  "ENGINE = MergeTree ORDER BY (a)")
        _post(ep, "CREATE TABLE u (b UInt32) ENGINE = MergeTree "
                  "ORDER BY (b)")
        code, body = _post(ep, "SHOW TABLES")
        assert code == 200 and body.splitlines() == ["t", "u"]
        code, body = _post(ep, "DESCRIBE TABLE t")
        # r12: DESCRIBE carries CH's default_type/default_expression
        # pair; r13: plus comment/codec_expression/ttl_expression
        assert code == 200 and body.splitlines() == [
            "a\tbigint\t\t\t\t\t", "s\tstring\tDEFAULT\t'x'\t\t\t"]
        code, body = _post(ep, "EXISTS TABLE t")
        assert (code, body) == (200, "1\n")
        code, body = _post(ep, "EXISTS TABLE nope")
        assert (code, body) == (200, "0\n")
    finally:
        ep.stop()


def _post_data(ep, query: str, data: str) -> tuple[int, str]:
    url = ep.url + "?query=" + urllib.parse.quote(query)
    req = urllib.request.Request(url, data=data.encode(), method="POST")
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def test_insert_jsoneachrow_data_upload(spark, tmp_path):
    """The CH HTTP upload split: `?query=INSERT INTO t FORMAT
    JSONEachRow` with ndjson rows in the body. Absent fields
    materialize the column DEFAULT, explicit nulls stay NULL, values
    coerce to the declared types."""
    from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog

    cat = ChDdlCatalog(storage_root=str(tmp_path))
    ep = serve_ch_http(spark, cat)
    try:
        _post(ep, "CREATE TABLE t (user_id UInt32, score Float64, "
                  "tier Nullable(String) DEFAULT 'basic') "
                  "ENGINE = MergeTree ORDER BY (user_id)")
        code, body = _post_data(
            ep, "INSERT INTO t FORMAT JSONEachRow",
            '{"user_id": 1, "score": 2.5}\n'
            '{"user_id": 2, "score": 4.0, "tier": null}\n'
            '{"user_id": 3, "score": 1.0, "tier": "gold"}\n',
        )
        assert code == 200, body
        code, body = _post(
            ep, "SELECT user_id, score, tier FROM t ORDER BY user_id")
        assert code == 200
        assert body == "1\t2.5\tbasic\n2\t4.0\t\\N\n3\t1.0\tgold\n"
        # column-list subset + absent-field default
        code, body = _post_data(
            ep, "INSERT INTO t (user_id, score) FORMAT JSONEachRow",
            '{"user_id": 4, "score": 9.0}\n',
        )
        assert code == 200, body
        code, body = _post(ep, "SELECT tier FROM t WHERE user_id = 4")
        assert body == "basic\n"
        # loud refusals: undeclared field, bad json, read-only endpoint
        code, body = _post_data(
            ep, "INSERT INTO t FORMAT JSONEachRow", '{"nope": 1}\n')
        assert code == 500 and "undeclared" in body
        code, body = _post_data(
            ep, "INSERT INTO t FORMAT JSONEachRow", "not json\n")
        assert code == 500 and "bad JSONEachRow" in body
        code, body = _post_data(
            ep, "SELECT 1", "stray body")
        assert code == 400
    finally:
        ep.stop()


def test_format_json_envelope(ep):
    """r12 (VERDICT r11 #5): FORMAT JSON answers the CH object
    envelope — meta (CH type text per column), data, rows — with
    NULL and datetime rendered per CH's documented JSON escaping."""
    code, body = _post(
        ep,
        "SELECT user_id, username, updated_at, "
        "if(user_id = 2, NULL, account_type) AS acct "
        "FROM users ORDER BY user_id, updated_at FORMAT JSON",
    )
    assert code == 200
    doc = json.loads(body)
    assert doc["rows"] == 3 and len(doc["data"]) == 3
    meta = {m["name"]: m["type"] for m in doc["meta"]}
    # nullability mirrors the RESULT schema (Spark marks source-fed
    # columns nullable) — the base CH type names are the contract
    assert meta["user_id"] in ("Int64", "Nullable(Int64)")
    assert meta["username"] in ("String", "Nullable(String)")
    assert meta["updated_at"] in ("DateTime", "Nullable(DateTime)")
    assert meta["acct"] == "Nullable(String)"
    first, last = doc["data"][0], doc["data"][-1]
    assert first["updated_at"] == "2024-03-01 10:00:00"  # CH DateTime text
    assert first["acct"] == "Gold"
    assert last["user_id"] == 2 and last["acct"] is None  # JSON null


def test_format_csv_with_names(ep):
    """r12: CSV/CSVWithNames — strings and datetimes double-quoted
    with "" escaping, numbers bare, NULL as \\N."""
    code, body = _post(
        ep,
        "SELECT user_id, concat(username, '\"q\"') AS u, updated_at, "
        "if(user_id = 2, NULL, account_type) AS acct "
        "FROM users ORDER BY user_id, updated_at FORMAT CSVWithNames",
    )
    assert code == 200
    lines = body.splitlines()
    assert lines[0] == '"user_id","u","updated_at","acct"'
    assert lines[1] == '1,"john""q""","2024-03-01 10:00:00","Gold"'
    assert lines[3] == '2,"jane""q""","2024-03-01 11:00:00",\\N'
    # headerless CSV: same rows, no header
    code, body2 = _post(
        ep,
        "SELECT user_id, concat(username, '\"q\"') AS u, updated_at, "
        "if(user_id = 2, NULL, account_type) AS acct "
        "FROM users ORDER BY user_id, updated_at FORMAT CSV",
    )
    assert code == 200 and body2.splitlines()[0] == lines[1]


def test_format_jsoncompact_and_pretty(ep):
    """r12: JSONCompact (envelope with row ARRAYS) and Pretty (the
    box-drawing table, numbers right-aligned)."""
    code, body = _post(
        ep,
        "SELECT user_id, account_type FROM users FINAL "
        "ORDER BY user_id FORMAT JSONCompact",
    )
    assert code == 200
    doc = json.loads(body)
    assert doc["rows"] == 2
    assert doc["data"] == [[1, "Silver"], [2, "Bronze"]]
    assert [m["name"] for m in doc["meta"]] == ["user_id", "account_type"]

    code, body = _post(
        ep,
        "SELECT user_id, account_type FROM users FINAL "
        "ORDER BY user_id FORMAT Pretty",
    )
    assert code == 200
    lines = body.splitlines()
    assert lines[0].startswith("┌─user_id─") and lines[0].endswith("┐")
    assert lines[1] == "│       1 │ Silver       │"
    assert lines[-1].startswith("└")


def test_url_params_default_format_and_max_result_rows(spark):
    """r12: CH URL parameters — default_format applies to FORMAT-less
    statements (in-query FORMAT wins), and max_result_rows may only
    TIGHTEN the server bound."""
    ep4 = serve_ch_http(
        spark, ChContext({"t": spark.range(20).toDF("id")}),
        max_result_rows=50,
    )
    try:
        url = (ep4.url + "?default_format=JSONEachRow&query="
               + urllib.parse.quote("SELECT id FROM t ORDER BY id LIMIT 2"))
        with urllib.request.urlopen(url, timeout=60) as r:
            assert r.status == 200
            assert r.headers["Content-Type"] == "application/x-ndjson"
            got = [json.loads(x) for x in r.read().decode().splitlines()]
        assert got == [{"id": 0}, {"id": 1}]
        # in-query FORMAT beats the parameter
        url = (ep4.url + "?default_format=JSONEachRow&query="
               + urllib.parse.quote(
                   "SELECT id FROM t ORDER BY id LIMIT 1 FORMAT CSV"))
        with urllib.request.urlopen(url, timeout=60) as r:
            assert r.headers["Content-Type"].startswith("text/csv")
            assert r.read().decode() == "0\n"
        # per-request tightening works; exceeding the bound 500s
        url = (ep4.url + "?max_result_rows=5&query="
               + urllib.parse.quote("SELECT id FROM t"))
        try:
            urllib.request.urlopen(url, timeout=60)
            raised = False
        except urllib.error.HTTPError as e:
            raised = True
            assert "max_result_rows" in e.read().decode()
        assert raised
        # a client cannot LIFT the server bound
        url = (ep4.url + "?max_result_rows=100000&query="
               + urllib.parse.quote("SELECT id FROM t LIMIT 15"))
        with urllib.request.urlopen(url, timeout=60) as r:
            assert len(r.read().decode().splitlines()) == 15
    finally:
        ep4.stop()


def test_csv_insert_upload_over_the_wire(spark, tmp_path):
    """r12: the CSV upload split — INSERT INTO t FORMAT CSV[WithNames]
    in the URL, csv rows in the body (quoted fields, "" escapes, \\N
    NULLs), typed through conform like a CH server."""
    from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog

    cat = ChDdlCatalog(storage_root=str(tmp_path))
    ep5 = serve_ch_http(spark, cat)
    try:
        _post(ep5, "CREATE TABLE t (id UInt32, s Nullable(String), "
                   "ts DateTime) ENGINE = MergeTree ORDER BY (id)")
        code, body = _post_data(
            ep5, "INSERT INTO t FORMAT CSV",
            '1,"a,""x""","2024-03-01 10:00:00"\n'
            '2,\\N,"2024-03-02 11:00:00"\n',
        )
        assert code == 200, body
        code, body = _post_data(
            ep5, "INSERT INTO t (ts, id, s) FORMAT CSVWithNames",
            'ts,id,s\n"2024-03-03 12:00:00",3,plain\n',
        )
        assert code == 200, body
        code, body = _post(
            ep5, "SELECT id, s, ts FROM t ORDER BY id "
                 "FORMAT TabSeparatedWithNames")
        assert code == 200
        assert body.splitlines() == [
            "id\ts\tts",
            '1\ta,"x"\t2024-03-01 10:00:00',
            "2\t\\N\t2024-03-02 11:00:00",
            "3\tplain\t2024-03-03 12:00:00",
        ]
        # malformed width errors loudly
        code, body = _post_data(ep5, "INSERT INTO t FORMAT CSV", "1,2\n")
        assert code == 500 and "fields" in body
    finally:
        ep5.stop()


def test_explain_over_the_wire(spark, tmp_path):
    """r12: EXPLAIN SELECT answers one plan-text row per line over the
    wire — the compiled Catalyst plan, the honest analogue of CH's
    EXPLAIN. r13: EXPLAIN AST answers the front end's own parse tree
    in CH's indented layout, EXPLAIN SYNTAX the statement after the
    dialect's expression rewrites. r14: ESTIMATE answers (database,
    table, parts, rows, marks) from the manifest's own part
    statistics after the read path's zone-map pruning — no-FROM
    statements still refuse."""
    from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog

    cat = ChDdlCatalog(storage_root=str(tmp_path))
    ep = serve_ch_http(spark, cat)
    try:
        _post(ep, "CREATE TABLE t (id UInt32, v Float64) "
                  "ENGINE = MergeTree ORDER BY (id)")
        _post(ep, "INSERT INTO t VALUES (1, 2.5)")
        code, body = _post(
            ep, "EXPLAIN SELECT id, sum(v) AS s FROM t GROUP BY id")
        assert code == 200
        assert "Physical Plan" in body and "HashAggregate" in body
        code, body = _post(
            ep, "EXPLAIN AST SELECT id, sum(v) AS s FROM t FINAL "
                "GROUP BY id ORDER BY id LIMIT 3")
        assert code == 200
        assert "SelectQuery" in body
        assert "TableIdentifier t FINAL" in body
        assert "GroupBy" in body and "Limit 3" in body
        # nodes are indented one space per depth, CH's AST layout
        assert "\n ExpressionList" in body
        code, body = _post(
            ep, "EXPLAIN SYNTAX SELECT toStartOfDay(ts) AS d, uniq(u) "
                "FROM t GROUP BY d")
        assert code == 200
        # the dialect's actual rewrites are visible
        assert "date_trunc('DAY', ts) AS d" in body
        assert "approx_count_distinct(u)" in body
        assert body.startswith("SELECT")
        code, body = _post(ep, "EXPLAIN ESTIMATE SELECT id FROM t "
                               "WHERE id <= 1")
        assert code == 200
        db, tbl, parts, rows, marks = body.strip().split("\t")
        assert (db, tbl) == ("default", "t")
        assert int(rows) >= 1 and int(parts) >= 1 and int(marks) >= 1
        # a statement with no FROM still refuses
        code, body = _post(ep, "EXPLAIN ESTIMATE SELECT 1")
        assert code == 500 and "no FROM table" in body
    finally:
        ep.stop()


def test_system_tables_over_the_wire(spark, tmp_path):
    """r12: system.tables / system.columns / system.parts answer like
    a CH server — metadata-only frames (parts reads parquet footers
    through the manifest)."""
    from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog

    cat = ChDdlCatalog(storage_root=str(tmp_path))
    ep = serve_ch_http(spark, cat)
    try:
        _post(ep, "CREATE TABLE t (id UInt32, v Float64 DEFAULT 0, "
                  "d Float64 ALIAS v * 2) "
                  "ENGINE = MergeTree ORDER BY (id) SAMPLE BY id")
        _post(ep, "INSERT INTO t VALUES (1, 2.5), (2, 3.5)")
        code, body = _post(
            ep, "SELECT name, engine, sorting_key, sampling_key "
                "FROM system.tables FORMAT TabSeparated")
        assert code == 200 and body == "t\tMergeTree\tid\tid\n"
        code, body = _post(
            ep, "SELECT name, type, default_kind FROM system.columns "
                "WHERE table = 't' ORDER BY position")
        assert code == 200
        assert body.splitlines() == [
            "id\tInt64\t", "v\tFloat64\tDEFAULT", "d\tFloat64\tALIAS"]
        code, body = _post(
            ep, "SELECT table, sum(rows) AS r FROM system.parts "
                "GROUP BY table")
        assert code == 200 and body == "t\t2\n"
        # create_table_query carries SHOW CREATE text
        code, body = _post(
            ep, "SELECT create_table_query FROM system.tables "
                "WHERE name = 't'")
        assert code == 200 and "SAMPLE BY id" in body
    finally:
        ep.stop()


def test_csv_array_cells_use_ch_text_encoding():
    """r13 (ADVICE): array values in FORMAT CSV render as CH's array
    TEXT form — single-quoted string elements with backslash escaping,
    bare numbers, NULL elements — the whole bracket CSV-double-quoted;
    no TabSeparated escape leakage inside the quotes."""
    from postgre_to_clickhouse_spark.ch_http import _csv_cell

    assert _csv_cell(["a", "b"]) == "\"['a','b']\""
    assert _csv_cell([1, 2, 3]) == '"[1,2,3]"'
    assert _csv_cell(["it's", None]) == "\"['it\\'s',NULL]\""
    # a tab inside a string element stays a raw tab (CSV quoting
    # protects it) — no TabSeparated \t escape
    assert _csv_cell(["a\tb"]) == "\"['a\tb']\""
    # backslashes escape once
    assert _csv_cell(["a\\b"]) == "\"['a\\\\b']\""
    # nested arrays recurse
    assert _csv_cell([[1], [2, 3]]) == '"[[1],[2,3]]"'


def test_tsv_insert_upload_over_the_wire(spark, tmp_path):
    """r13 (VERDICT r12 #6): the TabSeparated upload split — INSERT
    INTO t FORMAT TabSeparated[WithNames] in the URL, tab-separated
    rows in the body (CH escapes: \\t \\n \\\\ inside fields, an
    unescaped \\N is NULL), typed through conform like a CH server."""
    from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog

    cat = ChDdlCatalog(storage_root=str(tmp_path))
    ep6 = serve_ch_http(spark, cat)
    try:
        _post(ep6, "CREATE TABLE t (id UInt32, s Nullable(String), "
                   "ts DateTime) ENGINE = MergeTree ORDER BY (id)")
        code, body = _post_data(
            ep6, "INSERT INTO t FORMAT TabSeparated",
            "1\ta\\tb\t2024-03-01 10:00:00\n"
            "2\t\\N\t2024-03-02 11:00:00\n"
            "3\tc\\\\d\t2024-03-03 09:00:00\n",
        )
        assert code == 200, body
        code, body = _post_data(
            ep6, "INSERT INTO t (ts, id, s) FORMAT TabSeparatedWithNames",
            "ts\tid\ts\n2024-03-04 12:00:00\t4\tplain\n",
        )
        assert code == 200, body
        code, body = _post(
            ep6, "SELECT id, s, ts FROM t ORDER BY id "
                 "FORMAT TabSeparatedWithNames")
        assert code == 200
        assert body.splitlines() == [
            "id\ts\tts",
            "1\ta\\tb\t2024-03-01 10:00:00",
            "2\t\\N\t2024-03-02 11:00:00",
            "3\tc\\\\d\t2024-03-03 09:00:00",
            "4\tplain\t2024-03-04 12:00:00",
        ]
        # width mismatch errors loudly
        code, body = _post_data(
            ep6, "INSERT INTO t FORMAT TabSeparated", "1\t2\n")
        assert code == 500 and "fields" in body
        # expression columns are excluded from positional binding
        _post(ep6, "CREATE TABLE e (id UInt32, v Float64, "
                   "c Float64 MATERIALIZED v * 100.0) "
                   "ENGINE = MergeTree ORDER BY (id)")
        code, body = _post_data(
            ep6, "INSERT INTO e FORMAT TabSeparated", "1\t1.5\n")
        assert code == 200, body
        code, body = _post(ep6, "SELECT id, v, c FROM e FORMAT CSV")
        assert code == 200 and body == "1,1.5,150.0\n"
    finally:
        ep6.stop()


def test_format_parquet_response(spark, tmp_path):
    """r13 (VERDICT r12 #6): FORMAT Parquet — the bounded result
    serialized via Arrow as one parquet file, NULLs and timestamps
    typed natively (no text round-trip)."""
    import io

    import pyarrow.parquet as pq

    from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog

    cat = ChDdlCatalog(storage_root=str(tmp_path))
    ep7 = serve_ch_http(spark, cat, max_result_rows=10)
    try:
        _post(ep7, "CREATE TABLE t (id UInt32, s Nullable(String), "
                   "ts DateTime) ENGINE = MergeTree ORDER BY (id)")
        _post_data(
            ep7, "INSERT INTO t FORMAT TabSeparated",
            "1\ta\t2024-03-01 10:00:00\n2\t\\N\t2024-03-02 11:00:00\n")
        url = ep7.url + "?query=" + urllib.parse.quote(
            "SELECT id, s, ts FROM t ORDER BY id FORMAT Parquet")
        with urllib.request.urlopen(url, timeout=120) as r:
            assert r.status == 200
            assert r.headers["Content-Type"] == "application/octet-stream"
            raw = r.read()
        table = pq.read_table(io.BytesIO(raw))
        d = table.to_pydict()
        assert d["id"] == [1, 2]
        assert d["s"] == ["a", None]
        assert [str(v)[:19] for v in d["ts"]] == [
            "2024-03-01 10:00:00", "2024-03-02 11:00:00"]
        # the max_result_rows guard holds for the binary format too
        for i in range(3, 14):
            _post_data(ep7, "INSERT INTO t FORMAT TabSeparated",
                       f"{i}\tx\t2024-03-05 00:00:00\n")
        code, body = _post(ep7, "SELECT id FROM t FORMAT Parquet")
        assert code == 500 and "max_result_rows" in body
    finally:
        ep7.stop()


def test_jsoncompacteachrow_and_system_probes(spark, tmp_path):
    """r13: FORMAT JSONCompactEachRow (one JSON array per line) and
    the client-probe surface — SHOW DATABASES, system.one,
    system.databases — answer like a CH server."""
    from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog

    cat = ChDdlCatalog(storage_root=str(tmp_path))
    ep8 = serve_ch_http(spark, cat)
    try:
        _post(ep8, "CREATE TABLE shop.t (id UInt32, s Nullable(String)) "
                   "ENGINE = MergeTree ORDER BY (id)")
        _post(ep8, "INSERT INTO t VALUES (1, 'a'), (2, NULL)")
        code, body = _post(
            ep8, "SELECT id, s FROM t ORDER BY id "
                 "FORMAT JSONCompactEachRow")
        assert code == 200
        assert [json.loads(ln) for ln in body.splitlines()] == [
            [1, "a"], [2, None]]
        code, body = _post(ep8, "SHOW DATABASES")
        assert code == 200
        assert body.splitlines() == ["default", "shop", "system"]
        code, body = _post(ep8, "SELECT 1 AS ping FROM system.one")
        assert (code, body) == (200, "1\n")
        code, body = _post(
            ep8, "SELECT name FROM system.databases ORDER BY name")
        assert code == 200 and body.splitlines() == [
            "default", "shop", "system"]
    finally:
        ep8.stop()


def test_tabseparated_with_names_and_types(spark, tmp_path):
    """r13: TabSeparatedWithNamesAndTypes — names row, then a CH type
    text row (the typed-header read format CH clients use)."""
    from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog

    cat = ChDdlCatalog(storage_root=str(tmp_path))
    ep9 = serve_ch_http(spark, cat)
    try:
        _post(ep9, "CREATE TABLE t (id UInt32, s Nullable(String), "
                   "ts DateTime) ENGINE = MergeTree ORDER BY (id)")
        _post_data(ep9, "INSERT INTO t FORMAT TabSeparated",
                   "1\ta\t2024-03-01 10:00:00\n2\t\\N\t2024-03-02 11:00:00\n")
        code, body = _post(
            ep9, "SELECT id, s, ts FROM t ORDER BY id "
                 "FORMAT TabSeparatedWithNamesAndTypes")
        assert code == 200
        lines = body.splitlines()
        assert lines[0] == "id\ts\tts"
        # the type row describes the RESULT frame (like FORMAT JSON's
        # meta): declared UInt32 widens to the signed envelope and the
        # conform-cast read marks result columns nullable
        assert lines[1] == ("Nullable(Int64)\tNullable(String)\t"
                            "Nullable(DateTime)")
        assert lines[2:] == ["1\ta\t2024-03-01 10:00:00",
                             "2\t\\N\t2024-03-02 11:00:00"]
    finally:
        ep9.stop()


def test_format_native_roundtrip(spark, tmp_path):
    """r13 s3: FORMAT Native both directions over HTTP — CH's binary
    columnar body (the standalone block layout, no TCP framing). The
    upload binds by the block's own header names; the response
    carries typed NULLs, timestamps and decimals with no text
    round-trip."""
    import urllib.parse
    import urllib.request

    from pyspark.sql import types as T

    from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog
    from postgre_to_clickhouse_spark.ch_native import (
        iter_blocks_bytes,
        serialize_native,
    )

    cat = ChDdlCatalog(storage_root=str(tmp_path))
    ep = serve_ch_http(spark, cat)
    try:
        _post(ep, "CREATE TABLE t (id UInt64, name Nullable(String), "
                  "ts DateTime, amount Decimal(10, 2)) "
                  "ENGINE = MergeTree ORDER BY (id)")
        fields = [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("amount", T.DecimalType(10, 2), False),
        ]
        import datetime as dt
        from decimal import Decimal

        body = serialize_native(
            fields,
            [(1, "ada", dt.datetime(2024, 3, 1, 10, 0, 0), Decimal("1.50")),
             (2, None, dt.datetime(2024, 3, 2, 9, 30, 0), Decimal("2.25"))],
        )
        url = ep.url + "?query=" + urllib.parse.quote(
            "INSERT INTO t FORMAT Native")
        req = urllib.request.Request(url, data=body, method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 200
        url = ep.url + "?query=" + urllib.parse.quote(
            "SELECT id, name, ts, amount FROM t ORDER BY id FORMAT Native")
        with urllib.request.urlopen(url, timeout=120) as r:
            assert r.status == 200
            assert r.headers["Content-Type"] == "application/octet-stream"
            payload = r.read()
        blocks = list(iter_blocks_bytes(payload))
        assert len(blocks) == 1
        names, types, cols = blocks[0]
        assert names == ["id", "name", "ts", "amount"]
        by = dict(zip(names, types))
        # nullability mirrors the Spark result schema (stored parquet
        # columns read back nullable)
        assert by["amount"] in ("Decimal(10, 2)", "Nullable(Decimal(10, 2))")
        assert by["name"] == "Nullable(String)"
        rows = list(zip(*cols))
        assert rows[0] == (1, "ada", dt.datetime(2024, 3, 1, 10, 0, 0),
                           Decimal("1.50"))
        assert rows[1][1] is None and rows[1][3] == Decimal("2.25")
    finally:
        ep.stop()


def test_format_native_upload_refuses_bad_columns(spark, tmp_path):
    import urllib.parse
    import urllib.request

    from pyspark.sql import types as T

    from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog
    from postgre_to_clickhouse_spark.ch_native import serialize_native

    cat = ChDdlCatalog(storage_root=str(tmp_path))
    ep = serve_ch_http(spark, cat)
    try:
        _post(ep, "CREATE TABLE t (a Int64, m Int64 MATERIALIZED a + 1) "
                  "ENGINE = MergeTree ORDER BY (a)")
        body = serialize_native(
            [T.StructField("a", T.LongType(), False),
             T.StructField("m", T.LongType(), False)],
            [(1, 2)],
        )
        url = ep.url + "?query=" + urllib.parse.quote(
            "INSERT INTO t FORMAT Native")
        req = urllib.request.Request(url, data=body, method="POST")
        try:
            with urllib.request.urlopen(req, timeout=120) as r:
                code, text = r.status, r.read().decode()
        except urllib.error.HTTPError as e:
            code, text = e.code, e.read().decode()
        assert code == 500 and "not insertable" in text
    finally:
        ep.stop()


def test_tsv_with_names_and_types_roundtrip_over_wire(spark, tmp_path):
    """r13 s3 (review): the TabSeparatedWithNamesAndTypes DOWNLOAD can
    be POSTed straight back as an INSERT body — the standard CH
    round-trip the upload matrix was missing."""
    from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog

    cat = ChDdlCatalog(storage_root=str(tmp_path))
    ep = serve_ch_http(spark, cat)
    try:
        _post(ep, "CREATE TABLE t (id UInt32, v Float64) "
                  "ENGINE = MergeTree ORDER BY id")
        _post(ep, "INSERT INTO t VALUES (1, 2.5), (2, 3.5)")
        code, body = _post(
            ep, "SELECT id, v FROM t ORDER BY id "
                "FORMAT TabSeparatedWithNamesAndTypes")
        assert code == 200 and body.splitlines()[0] == "id\tv"
        _post(ep, "CREATE TABLE t2 (id UInt32, v Float64) "
                  "ENGINE = MergeTree ORDER BY id")
        code, _ = _post_data(
            ep, "INSERT INTO t2 FORMAT TabSeparatedWithNamesAndTypes",
            body)
        assert code == 200
        code, got = _post(ep, "SELECT id, v FROM t2 ORDER BY id")
        assert code == 200 and got == "1\t2.5\n2\t3.5\n"
    finally:
        ep.stop()


def test_insert_upload_with_empty_body_is_noop_commit(spark, tmp_path):
    """r15 (ADVICE r14): an INSERT-data-split URL with an EMPTY POST
    body is a successful 0-row insert (HTTP 200) — real CH accepts an
    empty body for row formats, and clients legitimately flush empty
    batches. It must still not fall through to executing the
    INSERT ... FORMAT text as a terminal statement."""
    from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog

    cat = ChDdlCatalog(storage_root=str(tmp_path))
    ep = serve_ch_http(spark, cat)
    try:
        _post(ep, "CREATE TABLE te (user_id UInt32) "
                  "ENGINE = MergeTree ORDER BY (user_id)")
        code, _body = _post_data(ep, "INSERT INTO te FORMAT JSONEachRow", "")
        assert code == 200
        # whitespace-only body is the same no-op commit
        code, _body = _post_data(ep, "INSERT INTO te FORMAT CSV", "  \n ")
        assert code == 200
        # the no-op really inserted nothing
        code, got = _post(ep, "SELECT count() AS n FROM te")
        assert code == 200 and got.strip() == "0"
    finally:
        ep.stop()


def _get_raw(ep, query: str, headers=None, params: str = ""):
    """GET returning (status, headers, raw bytes) — for compression
    tests that must see Content-Encoding and the undecoded body."""
    url = ep.url + "?query=" + urllib.parse.quote(query) + params
    req = urllib.request.Request(url, headers=headers or {})
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, dict(r.headers), r.read()
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers), e.read()


def test_http_response_compression_negotiated(ep):
    """r16 (VERDICT r15 #4): CH HTTP compression semantics — a
    response compresses ONLY under enable_http_compression=1 AND a
    client Accept-Encoding; gzip preferred, zstd served when pinned
    alone, identity otherwise; Content-Encoding names the codec."""
    import gzip

    plain_q = "SELECT user_id, username FROM users ORDER BY user_id, " \
              "username, updated_at"
    # no setting -> identity even WITH Accept-Encoding
    code, hdr, body = _get_raw(ep, plain_q,
                               headers={"Accept-Encoding": "gzip"})
    assert code == 200 and "Content-Encoding" not in hdr
    plain = body
    # setting on + gzip accepted -> gzip'd, decodes to the same bytes
    code, hdr, body = _get_raw(
        ep, plain_q, headers={"Accept-Encoding": "gzip"},
        params="&enable_http_compression=1")
    assert code == 200 and hdr.get("Content-Encoding") == "gzip"
    assert gzip.decompress(body) == plain
    # setting on, NO Accept-Encoding -> identity
    code, hdr, body = _get_raw(ep, plain_q,
                               params="&enable_http_compression=1")
    assert code == 200 and "Content-Encoding" not in hdr
    assert body == plain
    # q=0 excludes a codec; deflate falls through
    import zlib

    code, hdr, body = _get_raw(
        ep, plain_q,
        headers={"Accept-Encoding": "gzip;q=0, deflate"},
        params="&enable_http_compression=1")
    assert code == 200 and hdr.get("Content-Encoding") == "deflate"
    assert zlib.decompress(body) == plain
    # r16 review: q=0 with EXTRA parameters / uppercase Q still
    # excludes — a one-partition parse served gzip to a client that
    # refused it
    code, hdr, body = _get_raw(
        ep, plain_q,
        headers={"Accept-Encoding": "gzip;q=0;x=y, deflate"},
        params="&enable_http_compression=1")
    assert code == 200 and hdr.get("Content-Encoding") == "deflate"
    code, hdr, body = _get_raw(
        ep, plain_q,
        headers={"Accept-Encoding": "gzip;Q=0, deflate;Q=0.5"},
        params="&enable_http_compression=1")
    assert code == 200 and hdr.get("Content-Encoding") == "deflate"
    # zstd pinned alone -> zstd frame (pyarrow codec bundled here)
    from postgre_to_clickhouse_spark import ch_compress as cc

    if cc._ZSTD is not None:
        code, hdr, body = _get_raw(
            ep, plain_q, headers={"Accept-Encoding": "zstd"},
            params="&enable_http_compression=1")
        assert code == 200 and hdr.get("Content-Encoding") == "zstd"
        assert body[:4] == cc._ZSTD_MAGIC
        assert cc.zstd_decompress_block(body, len(plain)) == plain
    # errors compress too when negotiated (the whole response surface
    # honors the negotiation, never a mid-stream switch)
    code, hdr, body = _get_raw(
        ep, "SELECT nope FROM users",
        headers={"Accept-Encoding": "gzip"},
        params="&enable_http_compression=1")
    assert code == 500 and hdr.get("Content-Encoding") == "gzip"
    assert b"nope" in gzip.decompress(body) or b"Error" in gzip.decompress(body)


def test_http_gzip_request_body(spark, tmp_path):
    """r16: a gzip'd POST body (query or INSERT rows) decompresses per
    Content-Encoding — no setting gates the request side; a zstd
    request body refuses loudly naming gzip; a corrupt gzip body is a
    400, not a stack trace."""
    import gzip

    from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog

    cat = ChDdlCatalog(storage_root=str(tmp_path))
    ep = serve_ch_http(spark, cat)
    try:
        _post(ep, "CREATE TABLE tz (id UInt32, v Float64) "
                  "ENGINE = MergeTree ORDER BY (id)")
        # gzip'd INSERT data body
        url = ep.url + "?query=" + urllib.parse.quote(
            "INSERT INTO tz FORMAT JSONEachRow")
        rows = '{"id": 1, "v": 2.5}\n{"id": 2, "v": 3.5}\n'
        req = urllib.request.Request(
            url, data=gzip.compress(rows.encode()), method="POST",
            headers={"Content-Encoding": "gzip"})
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 200
        code, got = _post(ep, "SELECT id, v FROM tz ORDER BY id")
        assert code == 200 and got == "1\t2.5\n2\t3.5\n"
        # gzip'd query-in-body
        req = urllib.request.Request(
            ep.url, data=gzip.compress(b"SELECT count() AS n FROM tz"),
            method="POST", headers={"Content-Encoding": "gzip"})
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 200 and r.read().strip() == b"2"
        # zstd request body refuses loudly, naming the alternative
        req = urllib.request.Request(
            ep.url, data=b"\x28\xb5\x2f\xfdxxxx", method="POST",
            headers={"Content-Encoding": "zstd"})
        try:
            urllib.request.urlopen(req, timeout=120)
            raise AssertionError("zstd request body must refuse")
        except urllib.error.HTTPError as e:
            assert e.code == 400 and b"gzip" in e.read()
        # corrupt gzip is a loud 400
        req = urllib.request.Request(
            ep.url, data=b"\x1f\x8bgarbage", method="POST",
            headers={"Content-Encoding": "gzip"})
        try:
            urllib.request.urlopen(req, timeout=120)
            raise AssertionError("corrupt gzip must refuse")
        except urllib.error.HTTPError as e:
            assert e.code == 400 and b"gzip" in e.read()
        # r16 review: a compression BOMB refuses at the output cap —
        # a ~70 KiB gzip of 70 MiB of zeros must never materialize
        bomb = gzip.compress(b"\x00" * (70 * 1024 * 1024), 9)
        assert len(bomb) < 1024 * 1024
        req = urllib.request.Request(
            ep.url, data=bomb, method="POST",
            headers={"Content-Encoding": "gzip"})
        try:
            urllib.request.urlopen(req, timeout=120)
            raise AssertionError("gzip bomb must refuse")
        except urllib.error.HTTPError as e:
            assert e.code == 400 and b"exceeds" in e.read()
        # truncated stream refuses loudly too
        half = gzip.compress(b"SELECT 1")[:-4]
        req = urllib.request.Request(
            ep.url, data=half, method="POST",
            headers={"Content-Encoding": "gzip"})
        try:
            urllib.request.urlopen(req, timeout=120)
            raise AssertionError("truncated gzip must refuse")
        except urllib.error.HTTPError as e:
            assert e.code == 400 and b"truncated" in e.read()
    finally:
        ep.stop()
