"""The MySQL wire endpoint (`ch_mysql.py`, r13 VERDICT r12 missing #2):
the reference's 9004 surface. No MySQL client library exists in this
container, so these tests drive the endpoint with a minimal
hand-rolled client implementing the documented client side of the
protocol (handshake response 41, COM_QUERY, text-resultset parsing)
and pin the server's packet layouts with golden-byte assertions — the
repo's Confluent-Avro-framing strategy applied to this wire."""

from __future__ import annotations

import socket
import struct

import pytest
from pyspark.sql import functions as F

from postgre_to_clickhouse_spark.ch_mysql import (
    _lenenc_int,
    _read_lenenc_int,
    serve_ch_mysql,
)
from postgre_to_clickhouse_spark.ch_select import ChContext


def _users(spark):
    rows = [
        (1, "john", "Gold", "2024-03-01 10:00:00"),
        (1, "john", "Silver", "2024-03-02 09:00:00"),
        (2, None, "Bronze", "2024-03-01 11:00:00"),
    ]
    return spark.createDataFrame(
        rows,
        "user_id long, username string, account_type string, "
        "updated_at string",
    ).withColumn("updated_at", F.to_timestamp("updated_at"))


# -- a minimal MySQL client (the documented protocol, client side) ----
class _Client:
    def __init__(self, host: str, port: int):
        self.sock = socket.create_connection((host, port), 30)
        self.seq = 0

    def close(self):
        self.sock.close()

    def _read_n(self, n: int) -> bytes:
        out = b""
        while len(out) < n:
            chunk = self.sock.recv(n - len(out))
            assert chunk, "server closed mid-packet"
            out += chunk
        return out

    def recv_packet(self) -> bytes:
        head = self._read_n(4)
        n = int.from_bytes(head[:3], "little")
        self.seq = head[3] + 1
        return self._read_n(n)

    def send_packet(self, payload: bytes) -> None:
        self.sock.sendall(
            struct.pack("<I", len(payload))[:3]
            + bytes([self.seq & 0xFF]) + payload)
        self.seq += 1

    def handshake(self) -> dict:
        g = self.recv_packet()
        assert g[0] == 0x0A  # protocol version 10
        z = g.index(b"\x00", 1)
        version = g[1:z].decode()
        # after the version NUL: thread id (4) + auth-data-1 (8) +
        # filler (1) -> caps_lo, then charset (1) + status (2) -> caps_hi
        caps_lo = struct.unpack_from("<H", g, z + 14)[0]
        caps_hi = struct.unpack_from("<H", g, z + 19)[0]
        assert g.endswith(b"mysql_native_password\x00")
        # HandshakeResponse41: caps, max packet, charset, 23 zeros,
        # user NUL, lenenc auth response, plugin name NUL
        resp = (
            struct.pack("<I", 0x0200 | 0x8000 | 0x00080000)
            + struct.pack("<I", 1 << 24) + bytes([33]) + b"\x00" * 23
            + b"bi_tool\x00" + b"\x00"
            + b"mysql_native_password\x00"
        )
        self.send_packet(resp)
        ok = self.recv_packet()
        assert ok[0] == 0x00, ok
        return {"version": version,
                "caps": caps_lo | (caps_hi << 16)}

    def query(self, sql: str):
        """COM_QUERY → ('ok', info) | ('err', code, msg) |
        ('rows', cols, rows)."""
        self.seq = 0
        self.send_packet(b"\x03" + sql.encode())
        first = self.recv_packet()
        if first[0] == 0x00:
            return ("ok",)
        if first[0] == 0xFF:
            code = struct.unpack_from("<H", first, 1)[0]
            return ("err", code, first[9:].decode())
        ncols, _ = _read_lenenc_int(first, 0)
        cols = []
        for _i in range(ncols):
            d = self.recv_packet()
            at = 0
            parts = []
            for _f in range(6):  # catalog schema table org_table name org_name
                ln, at = _read_lenenc_int(d, at)
                parts.append(d[at:at + ln].decode())
                at += ln
            cols.append(parts[4])
        eof = self.recv_packet()
        assert eof[0] == 0xFE
        rows = []
        while True:
            p = self.recv_packet()
            if p[0] == 0xFE and len(p) < 9:
                break
            at, row = 0, []
            for _c in range(ncols):
                if p[at] == 0xFB:
                    row.append(None)
                    at += 1
                else:
                    ln, at = _read_lenenc_int(p, at)
                    row.append(p[at:at + ln].decode())
                    at += ln
            rows.append(tuple(row))
        return ("rows", cols, rows)


@pytest.fixture()
def myep(spark):
    ctx = ChContext(
        {"users": _users(spark)},
        final_specs={"users": (("user_id",), ("updated_at",))},
    )
    ep = serve_ch_mysql(spark, ctx)
    yield ep
    ep.stop()


def test_lenenc_golden_bytes():
    """The length-encoded integer layout, pinned to the documented
    byte values (protocol basics)."""
    assert _lenenc_int(0) == b"\x00"
    assert _lenenc_int(0xFA) == b"\xfa"
    assert _lenenc_int(0xFB) == b"\xfc\xfb\x00"
    assert _lenenc_int(0xFFFF) == b"\xfc\xff\xff"
    assert _lenenc_int(0x10000) == b"\xfd\x00\x00\x01"
    assert _lenenc_int(0x1000000) == b"\xfe" + (0x1000000).to_bytes(8, "little")
    for n in (0, 1, 250, 251, 65535, 65536, 2 ** 24, 2 ** 24 - 1):
        v, at = _read_lenenc_int(_lenenc_int(n), 0)
        assert (v, at) == (n, len(_lenenc_int(n)))


def test_handshake_and_verbatim_final(myep):
    """Full connection phase against the documented v10 layout, then
    verbatim CH `SELECT ... FINAL` text over the mysql wire."""
    c = _Client(myep.host, myep.port)
    try:
        info = c.handshake()
        assert info["version"].startswith("8.0.0")
        assert info["caps"] & 0x0200  # CLIENT_PROTOCOL_41
        kind, cols, rows = c.query(
            "SELECT user_id, username, account_type FROM users FINAL "
            "ORDER BY user_id")
        assert kind == "rows"
        assert cols == ["user_id", "username", "account_type"]
        assert rows == [("1", "john", "Silver"), ("2", None, "Bronze")]
    finally:
        c.close()


def test_bi_preamble_and_errors(myep):
    c = _Client(myep.host, myep.port)
    try:
        c.handshake()
        assert c.query("SET NAMES utf8mb4") == ("ok",)
        assert c.query("SET autocommit=1") == ("ok",)
        kind, cols, rows = c.query("SELECT @@version_comment")
        assert (kind, cols) == ("rows", ["@@version_comment"])
        assert "CH dialect" in rows[0][0]
        kind, cols, rows = c.query(
            "SELECT @@max_allowed_packet AS mp, @@nonexistent_thing")
        assert cols == ["mp", "@@nonexistent_thing"]
        assert rows == [("67108864", None)]
        kind, code, msg = c.query("SELECT nope FROM users")
        assert kind == "err" and code == 1064 and "nope" in msg
        kind, code, msg = c.query("DROP TABLE users")
        assert kind == "err" and "SELECT statements" in msg
        # ping stays alive after errors
        c.seq = 0
        c.send_packet(b"\x0e")
        assert c.recv_packet()[0] == 0x00
    finally:
        c.close()


def test_full_terminal_over_mysql_wire(spark, tmp_path):
    """Catalog-backed: CREATE / INSERT / OPTIMIZE / SELECT — the full
    CH terminal loop, every statement over the mysql wire (the 9004
    parity: README runbook statements through a BI-tool connection)."""
    from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog

    cat = ChDdlCatalog(storage_root=str(tmp_path))
    ep = serve_ch_mysql(spark, cat)
    c = _Client(ep.host, ep.port)
    try:
        c.handshake()
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
            assert c.query(stmt) == ("ok",), stmt
        kind, cols, rows = c.query(
            "SELECT user_id, v FROM u ORDER BY user_id")
        assert rows == [("1", "new"), ("2", "b")]
        # introspection answers resultsets like a CH server
        kind, cols, rows = c.query("SHOW TABLES")
        assert (cols, rows) == (["name"], [("u",)])
    finally:
        c.close()
        ep.stop()


def test_max_result_rows_guard_over_mysql(spark):
    ep = serve_ch_mysql(
        spark, ChContext({"t": spark.range(100).toDF("id")}),
        max_result_rows=10)
    c = _Client(ep.host, ep.port)
    try:
        c.handshake()
        kind, code, msg = c.query("SELECT id FROM t")
        assert kind == "err" and "max_result_rows" in msg
        kind, cols, rows = c.query("SELECT id FROM t ORDER BY id LIMIT 3")
        assert rows == [("0",), ("1",), ("2",)]
    finally:
        c.close()
        ep.stop()


def test_err_packet_never_splits_a_codepoint():
    """r13 s3 (review): the ERR payload truncates on CODEPOINTS — a
    byte-slice could cut a multi-byte UTF-8 character in half."""
    from postgre_to_clickhouse_spark.ch_mysql import _Conn

    conn = _Conn.__new__(_Conn)  # only _err is exercised
    msg = "таблица" * 200  # Cyrillic: 2 bytes per letter
    payload = conn._err(msg)
    # header: 0xff + code(2) + '#' + state(5)
    payload[9:].decode("utf-8")  # must not raise


def test_version_comment_probe_with_limit(spark):
    """r13 s3 (review 3): the stock mysql client's FIRST query is
    `select @@version_comment limit 1` — the shim must answer it."""
    ctx = ChContext({"t": spark.range(3).toDF("id")})
    ep = serve_ch_mysql(spark, ctx)
    c = _Client(ep.host, ep.port)
    try:
        c.handshake()
        kind, cols, rows = c.query("select @@version_comment limit 1")
        assert kind == "rows" and len(rows) == 1
        assert "dialect" in rows[0][0]
    finally:
        c.close()
        ep.stop()


def test_send_splits_16mb_packets():
    """r13 s3 (review 3): payloads >= 0xFFFFFF bytes split into
    16MB-1 chunks (with the empty terminator on exact multiples) —
    the mandatory MySQL framing rule."""
    class _FakeSock:
        def __init__(self):
            self.sent = b""

        def sendall(self, b):
            self.sent += b

    from postgre_to_clickhouse_spark.ch_mysql import _Conn

    conn = _Conn.__new__(_Conn)
    conn.sock = _FakeSock()
    conn.seq = 0
    conn._send(b"x" * 0xFFFFFF)  # exactly one full chunk
    data = conn.sock.sent
    # packet 1: len 0xFFFFFF seq 0; packet 2: len 0 seq 1 (terminator)
    assert data[:3] == b"\xff\xff\xff" and data[3] == 0
    tail = data[4 + 0xFFFFFF:]
    assert tail == b"\x00\x00\x00\x01"
    conn2 = _Conn.__new__(_Conn)
    conn2.sock = _FakeSock()
    conn2.seq = 0
    conn2._send(b"ab")
    assert conn2.sock.sent == b"\x02\x00\x00\x00ab"
