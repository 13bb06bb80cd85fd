"""Type-fidelity round-trips over the reference's canonical fixture
(FIXTURES.md §1 / reference test/conftest.py:64-128): integer, double,
text, UTF-8 text with non-Latin chars + embedded newline, date,
timestamp — written through load and read back bit-identical. Plus the
40k-char/byte LOB round-trip (reference test_oracle.py:293-328) and
binary payloads."""

import datetime as dt

from etlhelper_spark import fetchall, load

GOLDEN_ROWS = [
    {
        "id": 1,
        "value": 1.234,
        "simple_text": "text",
        "utf8_text": "Öæ°\nz",
        "day": dt.date(2018, 12, 7),
        "date_time": dt.datetime(2018, 12, 7, 13, 1, 59),
    },
    {
        "id": 2,
        "value": 2.234,
        "simple_text": "text",
        "utf8_text": "Öæ°\nz",
        "day": dt.date(2018, 12, 8),
        "date_time": dt.datetime(2018, 12, 8, 13, 1, 59),
    },
    {
        "id": 3,
        "value": 2.234,
        "simple_text": "text",
        "utf8_text": "Öæ°\nz",
        "day": dt.date(2018, 12, 9),
        "date_time": dt.datetime(2018, 12, 9, 13, 1, 59),
    },
]


def test_canonical_fixture_roundtrip(dest_conn):
    processed, failed = load("src", dest_conn, GOLDEN_ROWS)
    assert (processed, failed) == (3, 0)
    out = fetchall("SELECT * FROM src ORDER BY id", dest_conn)
    assert len(out) == 3
    for got, want in zip(out, GOLDEN_ROWS):
        assert got["id"] == want["id"]
        assert got["value"] == want["value"]  # exact double
        assert got["simple_text"] == want["simple_text"]
        assert got["utf8_text"] == want["utf8_text"]  # unicode + \n
        assert got["day"] == want["day"]
        assert got["date_time"] == want["date_time"]


def test_nulls_roundtrip(dest_conn):
    rows = [
        {"id": 1, "value": 1.0, "simple_text": "a"},
        {"id": 2, "value": 2.234, "simple_text": None},
    ]
    load("t_nulls", dest_conn, rows)
    out = fetchall("SELECT * FROM t_nulls ORDER BY id", dest_conn)
    assert out[1] == {"id": 2, "value": 2.234, "simple_text": None}


def test_lob_roundtrip(dest_conn):
    big_text = "x" * 40_000
    big_bytes = bytes(range(256)) * 157  # ~40 KB
    load("t_lob", dest_conn, [{"id": 1, "my_clob": big_text, "my_blob": big_bytes}])
    out = fetchall("SELECT * FROM t_lob", dest_conn)
    assert out[0]["my_clob"] == big_text
    assert out[0]["my_blob"] == bytearray(big_bytes) or out[0]["my_blob"] == big_bytes


def test_utf8_in_query_literal(src_conn, dest_conn):
    load("t_u", dest_conn, [{"id": 1, "s": "Öæ°\nz"}])
    out = fetchall(
        "SELECT id FROM t_u WHERE s = :s", dest_conn, parameters={"s": "Öæ°\nz"}
    )
    assert out == [{"id": 1}]
