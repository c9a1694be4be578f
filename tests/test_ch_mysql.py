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
        # r14: EXPLAIN ESTIMATE answers part statistics over this wire
        kind, cols, rows = c.query(
            "EXPLAIN ESTIMATE SELECT v FROM u WHERE user_id <= 1")
        assert kind == "rows"
        assert cols == ["database", "table", "parts", "rows", "marks"]
        assert rows[0][1] == "u" and int(rows[0][3]) >= 1
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


# -- the binary (prepared-statement) protocol, client side --------------
def _bt(v):
    """Pick a wire type for a python value: (type_code, unsigned, enc)."""
    import datetime as dt

    if v is None:
        return (0x06, 0, b"")
    if isinstance(v, int):
        return (0x08, 0, struct.pack("<q", v))
    if isinstance(v, float):
        return (0x05, 0, struct.pack("<d", v))
    if isinstance(v, dt.datetime):
        return (0x0C, 0, struct.pack("<BHBBBBB", 7, v.year, v.month, v.day,
                                     v.hour, v.minute, v.second))
    if isinstance(v, dt.date):
        return (0x0A, 0, struct.pack("<BHBB", 4, v.year, v.month, v.day))
    b = v.encode()
    return (0xFD, 0, _lenenc_int(len(b)) + b)


class _StmtClient(_Client):
    def stmt_prepare(self, sql: str):
        self.seq = 0
        self.send_packet(b"\x16" + sql.encode())
        first = self.recv_packet()
        if first[0] == 0xFF:
            return ("err", struct.unpack_from("<H", first, 1)[0],
                    first[9:].decode())
        assert first[0] == 0x00
        sid, ncols, nparams = struct.unpack_from("<IHH", first, 1)
        if nparams:
            for _ in range(nparams):
                self.recv_packet()
            assert self.recv_packet()[0] == 0xFE
        cols = []
        if ncols:
            for _ in range(ncols):
                d = self.recv_packet()
                at = 0
                parts = []
                for _f in range(6):
                    ln, at = _read_lenenc_int(d, at)
                    parts.append(d[at:at + ln].decode())
                    at += ln
                # fixed tail: 0x0c, charset u16, len u32, TYPE byte
                cols.append((parts[4], d[at + 7]))
            assert self.recv_packet()[0] == 0xFE
        return ("ok", sid, ncols, nparams, cols)

    def stmt_execute(self, sid: int, params=(), send_types: bool = True,
                     flags: int = 0):
        self.seq = 0
        pkt = b"\x17" + struct.pack("<IBI", sid, flags, 1)
        if params:
            n = len(params)
            bitmap = bytearray((n + 7) // 8)
            types = b""
            vals = b""
            for i, p in enumerate(params):
                t, u, enc = _bt(p)
                if p is None:
                    bitmap[i // 8] |= 1 << (i % 8)
                types += bytes([t, u])
                vals += enc
            pkt += bytes(bitmap)
            pkt += b"\x01" + types if send_types else b"\x00"
            pkt += vals
        self.send_packet(pkt)
        first = self.recv_packet()
        if first[0] == 0x00:
            # OK packet (a resultset's first packet is the lenenc
            # column count, never 0x00 — resultsets have >= 1 column)
            return ("ok",)
        if first[0] == 0xFF:
            return ("err", struct.unpack_from("<H", first, 1)[0],
                    first[9:].decode())
        ncols, _ = _read_lenenc_int(first, 0)
        cols = []
        for _i in range(ncols):
            d = self.recv_packet()
            at = 0
            parts = []
            for _f in range(6):
                ln, at = _read_lenenc_int(d, at)
                parts.append(d[at:at + ln].decode())
                at += ln
            cols.append((parts[4], d[at + 7]))
        assert self.recv_packet()[0] == 0xFE
        rows = []
        while True:
            p = self.recv_packet()
            if p[0] == 0xFE and len(p) < 9:
                break
            assert p[0] == 0x00
            nb = p[1:1 + (ncols + 2 + 7) // 8]
            at = 1 + len(nb)
            row = []
            for i, (_name, tcode) in enumerate(cols):
                if nb[(i + 2) // 8] & (1 << ((i + 2) % 8)):
                    row.append(None)
                    continue
                if tcode == 0x08:
                    row.append(struct.unpack_from("<q", p, at)[0]); at += 8
                elif tcode == 0x03:
                    row.append(struct.unpack_from("<i", p, at)[0]); at += 4
                elif tcode == 0x01:
                    row.append(struct.unpack_from("<b", p, at)[0]); at += 1
                elif tcode == 0x05:
                    row.append(struct.unpack_from("<d", p, at)[0]); at += 8
                elif tcode in (0x0C, 0x0A):
                    import datetime as dt

                    ln = p[at]; at += 1
                    y, mo, d_ = struct.unpack_from("<HBB", p, at)
                    h = mi = s = us = 0
                    if ln >= 7:
                        h, mi, s = p[at + 4], p[at + 5], p[at + 6]
                    if ln >= 11:
                        us = struct.unpack_from("<I", p, at + 7)[0]
                    at += ln
                    v = dt.datetime(y, mo, d_, h, mi, s, us)
                    row.append(v.date() if tcode == 0x0A else v)
                else:
                    ln, at = _read_lenenc_int(p, at)
                    row.append(p[at:at + ln].decode()); at += ln
            rows.append(tuple(row))
        return ("rows", [c[0] for c in cols], rows)

    def stmt_close(self, sid: int):
        self.seq = 0
        self.send_packet(b"\x19" + struct.pack("<I", sid))  # no response


def test_stmt_prepare_execute_no_params(myep):
    """r14: a param-free SELECT reports exact metadata at prepare and
    answers a BINARY resultset at execute (typed cells, null bitmap
    at offset 2)."""
    c = _StmtClient(myep.host, myep.port)
    try:
        c.handshake()
        kind, sid, ncols, nparams, cols = c.stmt_prepare(
            "SELECT user_id, username, count() AS n FROM users "
            "GROUP BY user_id, username ORDER BY user_id, username")
        assert (kind, ncols, nparams) == ("ok", 3, 0)
        assert [c0 for c0, _t in cols] == ["user_id", "username", "n"]
        kind, names, rows = c.stmt_execute(sid)
        assert kind == "rows"
        assert rows == [(1, "john", 2), (2, None, 1)]  # typed ints, real NULL
    finally:
        c.close()


def test_stmt_execute_with_params_and_type_reuse(myep):
    c = _StmtClient(myep.host, myep.port)
    try:
        c.handshake()
        kind, sid, ncols, nparams, _ = c.stmt_prepare(
            "SELECT user_id, account_type FROM users "
            "WHERE user_id = ? AND account_type != ? ORDER BY account_type")
        assert (kind, ncols, nparams) == ("ok", 0, 2)  # metadata deferred
        kind, names, rows = c.stmt_execute(sid, [1, "never"])
        assert kind == "rows" and names == ["user_id", "account_type"]
        assert rows == [(1, "Gold"), (1, "Silver")]
        # second execute WITHOUT types (new-params-bound = 0) reuses them
        kind, _n, rows = c.stmt_execute(sid, [2, "x"], send_types=False)
        assert kind == "rows" and rows == [(2, "Bronze")]
        # a '?' inside a string literal is NOT a parameter
        kind, sid2, _nc, np2, _ = c.stmt_prepare(
            "SELECT count() AS n FROM users WHERE account_type != '?'")
        assert np2 == 0
        kind, _n, rows = c.stmt_execute(sid2)
        assert rows == [(3,)]
    finally:
        c.close()


def test_stmt_full_terminal_and_datetime_param(spark, tmp_path):
    """DDL + INSERT with bound parameters (incl. a binary DATETIME)
    through the prepared-statement path, read back over COM_QUERY."""
    import datetime as dt

    from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog

    cat = ChDdlCatalog(storage_root=str(tmp_path))
    ep = serve_ch_mysql(spark, cat)
    c = _StmtClient(ep.host, ep.port)
    try:
        c.handshake()
        kind, sid, *_ = c.stmt_prepare(
            "CREATE TABLE p (user_id UInt32, v String, ts DateTime) "
            "ENGINE = MergeTree ORDER BY (user_id)")
        assert kind == "ok"
        assert c.stmt_execute(sid) == ("ok",)
        kind, sid2, _nc, np2, _ = c.stmt_prepare(
            "INSERT INTO p VALUES (?, ?, toDateTime(?))")
        assert (kind, np2) == ("ok", 3)
        ts = dt.datetime(2024, 3, 1, 10, 0, 0)
        assert c.stmt_execute(sid2, [1, "it's", ts]) == ("ok",)
        kind, cols, rows = c.query("SELECT user_id, v, ts FROM p")
        assert rows == [("1", "it's", "2024-03-01 10:00:00")]
    finally:
        c.close()
        ep.stop()


def test_stmt_guards(myep):
    """Close invalidates the handle; cursor flags, unknown types and
    SEND_LONG_DATA refuse loudly (the latter at the NEXT execute —
    the protocol defines no response to the command itself)."""
    c = _StmtClient(myep.host, myep.port)
    try:
        c.handshake()
        kind, sid, *_ = c.stmt_prepare("SELECT count() AS n FROM users")
        c.stmt_close(sid)
        kind, code, msg = c.stmt_execute(sid)
        assert (kind, code) == ("err", 1243)
        kind, sid, *_ = c.stmt_prepare(
            "SELECT count() AS n FROM users WHERE user_id = ?")
        # r15: READ_ONLY cursors are served (test_stmt_cursor_fetch);
        # SCROLLABLE (0x04) stays a loud refusal
        res = c.stmt_execute(sid, [1], flags=4)
        assert res[0] == "err" and "CURSOR_TYPE_SCROLLABLE" in res[2]
        # unknown parameter type 0x0B (TIME) -> loud refusal... TIME is
        # actually decoded? No: TIME (0x0B) is NOT in the decoded set.
        self_pkt = b"\x17" + struct.pack("<IBI", sid, 0, 1)
        self_pkt += b"\x00"          # null bitmap (1 param)
        self_pkt += b"\x01" + bytes([0x0B, 0])  # bind as TIME
        self_pkt += b"\x09" + b"\x00" * 9       # 8-byte TIME body + sign
        c.seq = 0
        c.send_packet(self_pkt)
        first = c.recv_packet()
        assert first[0] == 0xFF and b"outside the subset" in first
        # SEND_LONG_DATA with an OUT-OF-RANGE index: no response is
        # defined, so the statement poisons and refuses at execute
        c.seq = 0
        c.send_packet(b"\x18" + struct.pack("<IH", sid, 5) + b"blob")
        res = c.stmt_execute(sid, [1])
        assert res[0] == "err" and "out of range" in res[2]
    finally:
        c.close()


def test_stmt_string_params_escape_backslashes(myep):
    r"""r15 (ADVICE r14 high): a bound string containing backslashes
    must round-trip as DATA. The dialect lexer treats backslash as an
    escape inside string literals, so `_sql_literal` must escape it —
    otherwise a value ending in '\' consumes the closing quote and
    parameter content escapes into SQL structure (live OR 1=1)."""
    c = _StmtClient(myep.host, myep.port)
    try:
        c.handshake()
        kind, sid, _nc, np_, _ = c.stmt_prepare(
            "SELECT count() AS n FROM users "
            "WHERE account_type = ? AND username = ?")
        assert (kind, np_) == ("ok", 2)
        # the ADVICE repro: p1 ends in a backslash, p2 is an injection
        # payload — without backslash escaping these lex as ONE string
        # token followed by live SQL
        kind, _names, rows = c.stmt_execute(sid, ["G\\", " OR 1=1 --"])
        assert (kind, rows) == ("rows", [(0,)])
        # backslash/quote combinations round-trip as data (count 0 —
        # no such rows — but every execute must LEX, not error)
        for a, b in (("G\\old", "jo\\"), ("G\\'", "\\'x"),
                     ("\\", "\\\\"), ("a'b\\", "\\'")):
            kind, _n, rows = c.stmt_execute(sid, [a, b])
            assert (kind, rows) == ("rows", [(0,)]), (a, b)
        # and a real match still matches
        kind, _n, rows = c.stmt_execute(sid, ["Gold", "john"])
        assert rows == [(1,)]
    finally:
        c.close()


def test_stmt_send_long_data_binds_and_reset_discards(myep):
    """r15: COM_STMT_SEND_LONG_DATA accumulates chunks per parameter
    and the parameter binds as a string at EXECUTE (absent from the
    EXECUTE payload, per protocol); RESET discards the accumulated
    data so inline binding works again afterwards."""
    c = _StmtClient(myep.host, myep.port)
    try:
        c.handshake()
        kind, sid, _nc, np_, _ = c.stmt_prepare(
            "SELECT count() AS n FROM users WHERE account_type = ?")
        assert (kind, np_) == ("ok", 1)
        # two chunks: 'Go' + 'ld' -> the bound value is 'Gold'
        c.seq = 0
        c.send_packet(b"\x18" + struct.pack("<IH", sid, 0) + b"Go")
        c.seq = 0
        c.send_packet(b"\x18" + struct.pack("<IH", sid, 0) + b"ld")
        # EXECUTE: null bitmap, new-params-bound=1, type BLOB, NO value
        c.seq = 0
        pkt = (b"\x17" + struct.pack("<IBI", sid, 0, 1)
               + b"\x00" + b"\x01" + bytes([0xFC, 0]))
        c.send_packet(pkt)
        first = c.recv_packet()
        assert first[0] not in (0x00, 0xFF), first
        ncols, _ = _read_lenenc_int(first, 0)
        for _i in range(ncols):
            c.recv_packet()
        assert c.recv_packet()[0] == 0xFE
        row = c.recv_packet()
        assert row[0] == 0x00
        n = struct.unpack_from("<q", row, 2)[0]
        assert n == 1  # exactly the Gold row
        assert c.recv_packet()[0] == 0xFE
        # RESET discards the accumulated data; inline binding works
        c.seq = 0
        c.send_packet(b"\x1a" + struct.pack("<I", sid))
        assert c.recv_packet()[0] == 0x00
        kind, _names, rows = c.stmt_execute(sid, ["Silver"])
        assert (kind, rows) == ("rows", [(1,)])
    finally:
        c.close()


def test_stmt_send_long_data_non_utf8_refuses(myep):
    """ADVICE r15: a binary (non-UTF-8) SEND_LONG_DATA payload must
    refuse loudly at EXECUTE instead of silently mangling bytes to
    U+FFFD; RESET clears it and the statement serves again."""
    c = _StmtClient(myep.host, myep.port)
    try:
        c.handshake()
        kind, sid, _nc, np_, _ = c.stmt_prepare(
            "SELECT count() AS n FROM users WHERE account_type = ?")
        assert (kind, np_) == ("ok", 1)
        c.seq = 0
        c.send_packet(b"\x18" + struct.pack("<IH", sid, 0)
                      + b"\xff\xfe\x80Gold")
        c.seq = 0
        pkt = (b"\x17" + struct.pack("<IBI", sid, 0, 1)
               + b"\x00" + b"\x01" + bytes([0xFC, 0]))
        c.send_packet(pkt)
        err = c.recv_packet()
        assert err[0] == 0xFF
        assert b"not valid UTF-8" in err
        # RESET discards the poisoned bytes; inline binding works
        c.seq = 0
        c.send_packet(b"\x1a" + struct.pack("<I", sid))
        assert c.recv_packet()[0] == 0x00
        kind, _names, rows = c.stmt_execute(sid, ["Gold"])
        assert (kind, rows) == ("rows", [(1,)])
    finally:
        c.close()


class _CursorClient(_StmtClient):
    def stmt_execute_cursor(self, sid: int, params=()):
        """EXECUTE with CURSOR_TYPE_READ_ONLY: expect column defs +
        EOF carrying SERVER_STATUS_CURSOR_EXISTS, NO rows."""
        self.seq = 0
        pkt = b"\x17" + struct.pack("<IBI", sid, 1, 1)
        if params:
            n = len(params)
            bitmap = bytearray((n + 7) // 8)
            types = b""
            vals = b""
            for i, p in enumerate(params):
                t, u, enc = _bt(p)
                if p is None:
                    bitmap[i // 8] |= 1 << (i % 8)
                types += bytes([t, u])
                vals += enc
            pkt += bytes(bitmap) + b"\x01" + types + vals
        self.send_packet(pkt)
        first = self.recv_packet()
        if first[0] == 0xFF:
            return ("err", first[9:].decode())
        ncols, _ = _read_lenenc_int(first, 0)
        cols = []
        for _i in range(ncols):
            d = self.recv_packet()
            at = 0
            parts = []
            for _f in range(6):
                ln, at = _read_lenenc_int(d, at)
                parts.append(d[at:at + ln].decode())
                at += ln
            cols.append((parts[4], d[at + 7]))
        eof = self.recv_packet()
        assert eof[0] == 0xFE
        status = struct.unpack_from("<H", eof, 3)[0]
        return ("cursor", cols, status)

    def stmt_fetch(self, sid: int, n: int, cols):
        self.seq = 0
        self.send_packet(b"\x1c" + struct.pack("<II", sid, n))
        rows = []
        while True:
            p = self.recv_packet()
            if p[0] == 0xFE and len(p) < 9:
                status = struct.unpack_from("<H", p, 3)[0]
                return ("rows", rows, status)
            if p[0] == 0xFF:
                return ("err", p[9:].decode(), 0)
            nb = p[1:1 + (len(cols) + 2 + 7) // 8]
            at = 1 + len(nb)
            row = []
            for i, (_name, tcode) in enumerate(cols):
                if nb[(i + 2) // 8] & (1 << ((i + 2) % 8)):
                    row.append(None)
                    continue
                if tcode == 0x08:
                    row.append(struct.unpack_from("<q", p, at)[0]); at += 8
                else:
                    ln, at = _read_lenenc_int(p, at)
                    row.append(p[at:at + ln].decode()); at += ln
            rows.append(tuple(row))


def test_stmt_cursor_fetch(myep):
    """r15 (VERDICT r14 boundary list): CURSOR_TYPE_READ_ONLY +
    COM_STMT_FETCH — the execute answers column defs with
    CURSOR_EXISTS and no rows; fetches stream binary rows in the
    requested chunk sizes; the final EOF flips to LAST_ROW_SENT;
    RESET discards the cursor."""
    CURSOR_EXISTS, LAST_ROW_SENT = 0x0040, 0x0080
    c = _CursorClient(myep.host, myep.port)
    try:
        c.handshake()
        kind, sid, *_ = c.stmt_prepare(
            "SELECT user_id, account_type FROM users "
            "ORDER BY user_id, account_type")
        assert kind == "ok"
        kind, cols, status = c.stmt_execute_cursor(sid)
        assert kind == "cursor" and [n for n, _t in cols] == [
            "user_id", "account_type"]
        assert status & CURSOR_EXISTS and not status & LAST_ROW_SENT
        # fetch 2 of the 3 rows, then the rest
        kind, rows, status = c.stmt_fetch(sid, 2, cols)
        assert (kind, rows) == ("rows", [(1, "Gold"), (1, "Silver")])
        assert status & CURSOR_EXISTS and not status & LAST_ROW_SENT
        kind, rows, status = c.stmt_fetch(sid, 10, cols)
        assert rows == [(2, "Bronze")]
        assert status & LAST_ROW_SENT
        # fetching past the end: zero rows, still LAST_ROW_SENT
        kind, rows, status = c.stmt_fetch(sid, 5, cols)
        assert rows == [] and status & LAST_ROW_SENT
        # a PARAMETRIZED cursor re-executes with fresh rows
        kind, sid2, *_ = c.stmt_prepare(
            "SELECT account_type FROM users WHERE user_id = ? "
            "ORDER BY account_type")
        kind, cols2, status = c.stmt_execute_cursor(sid2, [1])
        assert kind == "cursor"
        kind, rows, status = c.stmt_fetch(sid2, 10, cols2)
        assert [r[0] for r in rows] == ["Gold", "Silver"]
        assert status & LAST_ROW_SENT
        # RESET discards the cursor: the next fetch refuses loudly
        c.seq = 0
        c.send_packet(b"\x1a" + struct.pack("<I", sid))
        assert c.recv_packet()[0] == 0x00
        kind, msg, _ = c.stmt_fetch(sid, 1, cols)
        assert kind == "err" and "no open cursor" in msg
        # fetch on a never-opened statement refuses too
        kind, sid3, *_ = c.stmt_prepare("SELECT count() AS x FROM users")
        assert kind == "ok"
        kind2, msg, _ = c.stmt_fetch(sid3, 1, [("x", 0x08)])
        assert kind2 == "err" and "no open cursor" in msg
    finally:
        c.close()
