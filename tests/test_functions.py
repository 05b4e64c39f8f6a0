"""Unit tests for scalar functions.

parse_ts is property-tested against Python datetime over 0-9
fractional digits (reference DateParser.java handles 1..n digits via
its generated format string; SURVEY.md §7 hard-part 2).
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_precisely_demo_spark.functions.datetime_fns import (
    format_ts,
    parse_ts,
    parse_ts_millis,
)
from flink_precisely_demo_spark.functions.text import (
    doc_fingerprint,
    language_id,
    token_count,
)


@st.composite
def cdc_timestamps(draw):
    dt = draw(st.datetimes(min_value=datetime(1970, 1, 2),
                           max_value=datetime(2100, 1, 1)))
    n_frac = draw(st.integers(min_value=0, max_value=9))
    frac = draw(st.integers(min_value=0, max_value=10 ** n_frac - 1)) \
        if n_frac else 0
    s = dt.strftime("%Y%m%d%H%M%S") + (f"{frac:0{n_frac}d}" if n_frac else "")
    # expected: micros = fraction right-padded to 6, truncated past 6
    frac_str = (f"{frac:0{n_frac}d}" if n_frac else "").ljust(6, "0")[:6]
    expected = dt.replace(tzinfo=timezone.utc, microsecond=int(frac_str))
    return s, expected


class TestParseTs:
    @pytest.fixture(autouse=True)
    def _spark(self, spark):
        self.spark = spark

    @settings(max_examples=30, deadline=None)
    @given(cases=st.lists(cdc_timestamps(), min_size=1, max_size=50))
    def test_property_roundtrip(self, cases):
        df = self.spark.createDataFrame([(s,) for s, _ in cases], ["s"])
        got = [r["ts"] for r in
               df.select(parse_ts("s").alias("ts")).collect()]
        want = [e for _, e in cases]
        assert [g.replace(tzinfo=timezone.utc) for g in got] == want

    def test_fraction_digit_counts(self):
        """1, 3, 6, 9 fractional digits (FIXTURES.md requirement)."""
        rows = [
            ("20200402103015", (2020, 4, 2, 10, 30, 15, 0)),
            ("202004021030151", (2020, 4, 2, 10, 30, 15, 100000)),
            ("20200402103015123", (2020, 4, 2, 10, 30, 15, 123000)),
            ("20200402103015123456", (2020, 4, 2, 10, 30, 15, 123456)),
            ("20200402103015123456789", (2020, 4, 2, 10, 30, 15, 123456)),
        ]
        df = self.spark.createDataFrame([(s,) for s, _ in rows], ["s"])
        got = [r["ts"] for r in df.select(parse_ts("s").alias("ts")).collect()]
        assert [tuple(g.timetuple())[:6] + (g.microsecond,) for g in got] == \
            [w for _, w in rows]

    def test_millis_variant_matches_reference_contract(self):
        """DateParser.java returns epoch millis (long)."""
        df = self.spark.createDataFrame([("19700101000001500",)], ["s"])
        assert df.select(parse_ts_millis("s").alias("ms")).first()["ms"] == 1500

    def test_malformed_yields_null(self):
        df = self.spark.createDataFrame(
            [("garbage",), ("2020",), ("",)], ["s"])
        got = df.select(parse_ts("s").alias("ts")).collect()
        assert all(r["ts"] is None for r in got)

    def test_format_parse_inverse(self):
        src = self.spark.createDataFrame(
            [(datetime(2021, 6, 1, 12, 34, 56, 789012),)], ["ts"])
        out = src.select(
            parse_ts(format_ts("ts", 6)).alias("rt")).first()["rt"]
        assert (out.year, out.microsecond) == (2021, 789012)


def test_text_functions_edge_cases(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "the the the"), (4, "Der und das ist gut"),
         (5, None)],
        "doc_id int, text string")
    got = {r["doc_id"]: (r["n"], r["lang"], r["fp"]) for r in df.select(
        "doc_id",
        token_count("text").alias("n"),
        language_id("text").alias("lang"),
        doc_fingerprint("text").alias("fp")).collect()}
    assert got[1][0] == 0 and got[2][0] == 0
    assert got[3] [1] == "en"
    assert got[4][1] == "de"
    assert got[5][0] is None  # null text propagates null, not a crash
    assert got[1][2] == got[2][2]  # whitespace-only normalizes equal


def test_repetition_stats_and_gopher_gate(spark):
    from flink_precisely_demo_spark.functions.text import (
        gopher_pass,
        repetition_stats,
    )
    from pyspark.sql import functions as F
    diverse = " ".join(f"word{i}" for i in range(40))          # passes
    spammy = "buy " * 40                                        # top-token 1.0
    rows = [(1, diverse), (2, spammy), (3, "too short")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in df.select(
        "doc_id", repetition_stats("text").alias("s"),
        gopher_pass(repetition_stats("text")).alias("ok")).collect()}
    assert out[1].ok and out[1].s.distinct_ratio == 1.0
    assert not out[2].ok and out[2].s.top_token_frac == 1.0
    assert not out[3].ok  # below the 20-token floor
    assert abs(out[2].s.mean_word_len - 3.0) < 1e-9


def test_scrub_pii_categories_and_order(spark):
    from flink_precisely_demo_spark.functions.text import (
        pii_counts,
        scrub_pii,
    )

    rows = [
        (1, "write to jane.doe+x@corp.example.org today"),
        (2, "server 192.168.001.200 and phone 555-123-4567"),
        (3, "ssn 123-45-6789 card 1234 5678 9012 3456"),
        (4, "no pii here, just 12345 and v1.2 notes"),
        (5, "email-with-ip user5@10.0.0.1.example.com stays one email"),
    ]
    df = spark.createDataFrame(rows, "id int, t string")
    out = {r["id"]: r for r in df.select(
        "id", scrub_pii("t").alias("s"),
        pii_counts("t").alias("c")).collect()}

    assert out[1]["s"] == "write to [EMAIL] today"
    assert out[1]["c"]["n_email"] == 1 and out[1]["c"]["n_phone"] == 0
    assert out[2]["s"] == "server [IP] and phone [PHONE]"
    assert out[3]["s"] == "ssn [SSN] card [CARD]"
    assert out[4]["s"] == rows[3][1]          # untouched
    assert all(v == 0 for v in out[4]["c"].asDict().values())
    # email pattern consumes the dotted host BEFORE the ipv4 rule
    # sees it: attribute-once semantics
    assert out[5]["c"]["n_email"] == 1 and out[5]["c"]["n_ipv4"] == 0


def test_html_to_text_extraction(spark):
    from flink_precisely_demo_spark.functions.text import (
        html_link_count,
        html_title,
        html_to_text,
    )

    rows = [
        (1, "<html><head><title> T1 </title><script>if (a<b && c>d) "
            "alert('x');</script></head><body><p>Hello</p>"
            "<!-- secret --><a href='/'>go</a></body></html>"),
        (2, "plain text, no markup at all"),
        (3, "<p>&amp;lt;one level&gt; &quot;q&quot;&nbsp;end</p>"),
        (4, "<style>body { content: '</p>' }</style><div>kept</div>"),
    ]
    df = spark.createDataFrame(rows, "id int, t string")
    out = {r["id"]: r for r in df.select(
        "id", html_to_text("t").alias("x"), html_title("t").alias("ti"),
        html_link_count("t").alias("n")).collect()}

    # script content (with < > && inside) and comments are gone
    assert out[1]["x"] == "T1 Hello go"
    assert out[1]["ti"] == "T1" and out[1]["n"] == 1
    assert out[2]["x"] == rows[1][1] and out[2]["n"] == 0
    # one-level entity decode: &amp;lt; -> &lt; (not <)
    assert out[3]["x"] == '&lt;one level> "q" end'
    # style block dies wholesale up to its real closing tag
    assert "kept" in out[4]["x"] and "content" not in out[4]["x"]


def test_url_canonicalize(spark):
    from flink_precisely_demo_spark.functions.text import url_canonicalize

    rows = [
        (1, "HTTPS://WWW.Example.COM:443/A/b/?utm_source=x&id=7&b=2#f"),
        (2, "http://Host.org:80"),                  # no path -> '/'
        (3, "https://a.b.c/path?utm_only=1"),       # all params tracked
        (4, "http://h.io:8080/x?q=1"),              # non-default port kept
        (5, "https://dup.com/page"),
        (6, "HTTPS://DUP.com:443/page#section"),    # same page, other crawl
    ]
    df = spark.createDataFrame(rows, "id int, u string")
    out = {r["id"]: r["c"] for r in df.select(
        "id", url_canonicalize("u").alias("c")).collect()}
    assert out[1] == "https://www.example.com/A/b/?id=7&b=2"
    assert out[2] == "http://host.org/"
    assert out[3] == "https://a.b.c/path"
    assert out[4] == "http://h.io:8080/x?q=1"
    assert out[5] == out[6]  # the dedup property the op exists for


def test_winnow_arrow_twin_matches_relational_spec(spark):
    """The Arrow-batched winnowing path must produce EXACTLY the
    (doc_id, n_grams, fp) row set of the relational spec form on
    real corpus text — tokenizer regex semantics, short-doc
    fallback, window-edge handling and all."""
    from flink_precisely_demo_spark.functions.text import (
        winnow_fingerprint_rows,
        winnow_fingerprint_rows_arrow,
    )
    from flink_precisely_demo_spark.sources.parquet import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    spec = winnow_fingerprint_rows(docs)
    arrow = winnow_fingerprint_rows_arrow(docs)
    assert spec.dtypes == arrow.dtypes  # nullability may differ
    a = sorted(map(tuple, spec.collect()))
    b = sorted(map(tuple, arrow.collect()))
    assert a == b and len(a) > 0
    # edge shapes: empty text, single token, exactly k tokens,
    # exactly w grams
    edge = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "a b c"), (4, "a b c d e f"),
         (5, None), (6, "  padded   whitespace\ttabs  ")],
        "doc_id long, text string")
    ea = sorted(map(tuple, winnow_fingerprint_rows(edge).collect()))
    eb = sorted(map(tuple,
                    winnow_fingerprint_rows_arrow(edge).collect()))
    assert ea == eb
