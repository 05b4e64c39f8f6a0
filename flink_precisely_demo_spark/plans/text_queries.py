"""Text-analysis queries over the `documents` table (SURVEY.md §2.3).

Each query pairs the Spark column expressions from functions/text.py
with a DuckDB oracle that replicates the token pipeline exactly
(regexp split + filter + marker counting). All JVM-side built-ins —
no Python UDFs — so at 100 TB these run inside the scan stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    LANG_MARKERS,
    STOPWORDS_EN,
    bpe_ish_token_count,
    doc_fingerprint,
    language_id,
    quality_score,
    token_count,
    tokens,
)
from ..sources.parquet import load_table
from ..operators.broadcast import hint_broadcast_if_small
from .queries import query


def _in_list(vals: tuple[str, ...]) -> str:
    return ", ".join(f"'{v}'" for v in vals)


# DuckDB token pipeline identical to functions.text.tokens()
_TOKS = "list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')"


def _marker_count(markers: tuple[str, ...]) -> str:
    return f"len(list_filter({_TOKS}, t -> t IN ({_in_list(markers)})))"


@query(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
           length(text) AS n_chars_computed,
           COALESCE(CAST(list_aggregate(list_transform(
               list_filter(regexp_split_to_array(lower(text), '[^0-9a-z]+'), t -> t <> ''),
               t -> CAST(ceil(length(t) / 4.0) AS BIGINT)), 'sum') AS BIGINT), 0)
             AS n_bpe_ish,
           substring(md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')), 1, 16)
             AS fingerprint
    FROM documents
    """,
)
def _text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count("text").cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_computed"),
        bpe_ish_token_count("text").alias("n_bpe_ish"),
        doc_fingerprint("text").alias("fingerprint"),
    )


def _lang_case_sql() -> str:
    """Argmax cascade identical to language_id(): first listed language
    with a strictly greater hit count wins; 0 hits -> 'und'."""
    letters = []
    for lang, markers in LANG_MARKERS.items():
        letters.append((lang, _marker_count(markers)))
    # replicate the sequential strict-> comparison fold
    expr = "'und'"
    best = "0"
    for lang, cnt in letters:
        expr = f"CASE WHEN {cnt} > {best} THEN '{lang}' ELSE {expr} END"
        best = f"greatest({cnt}, {best})"
    return expr


@query(
    "text_language_id",
    oracle=f"""
    SELECT doc_id, lang AS labeled_lang,
           {_lang_case_sql()} AS predicted_lang
    FROM documents
    """,
)
def _text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        language_id("text").alias("predicted_lang"),
    )


@query(
    "text_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len({_TOKS}) AS DOUBLE) AS n_tok,
             {_marker_count(STOPWORDS_EN)} AS stop_hits,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
               AS alpha_chars
      FROM documents
    )
    SELECT doc_id,
           round(
             0.4 * least(n_tok / 200.0, 1.0)
           + 0.3 * (CASE WHEN n_tok > 0
                          AND stop_hits / n_tok >= 0.1
                          AND stop_hits / n_tok <= 0.6
                         THEN 1.0 ELSE 0.0 END)
           + 0.3 * (CASE WHEN n_chars > 0 THEN alpha_chars / n_chars ELSE 0.0 END)
           , 6) AS quality
    FROM t
    """,
)
def _text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score("text").alias("quality"))


@query(
    "text_filter_pipeline",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, source,
             CAST(len({_TOKS}) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM t
    WHERE n_tokens >= 10
    GROUP BY lang, source
    """,
)
def _text_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus curation shape: filter short docs, aggregate token budget
    by language and source — the canonical pre-training triage query."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "lang", "source",
                    token_count("text").cast("long").alias("n_tokens"))
    return (toks.filter(F.col("n_tokens") >= 10)
                .groupBy("lang", "source")
                .agg(F.count(F.lit(1)).alias("n_docs"),
                     F.sum("n_tokens").alias("total_tokens")))


@query(
    "text_repetition_quality",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ),
    s AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CASE WHEN len(toks) > 0 THEN
               round(len(list_distinct(toks)) / len(toks), 6)
             ELSE 0.0 END AS distinct_ratio,
             CASE WHEN len(toks) > 0 THEN
               round(list_max(list_transform(list_distinct(toks),
                       t -> len(list_filter(toks, x -> x = t)))) / len(toks), 6)
             ELSE 0.0 END AS top_token_frac,
             CASE WHEN len(toks) > 0 THEN
               round(list_aggregate(list_transform(toks, t -> length(t)),
                                    'sum') / len(toks), 6)
             ELSE 0.0 END AS mean_word_len
      FROM t
    )
    SELECT doc_id, n_tokens, distinct_ratio, top_token_frac, mean_word_len,
           (n_tokens >= 20 AND n_tokens <= 100000
            AND mean_word_len >= 2.0 AND mean_word_len <= 12.0
            AND distinct_ratio >= 0.2 AND top_token_frac <= 0.35)
             AS gopher_ok
    FROM s
    """,
)
def _text_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/quality gate per document: token count,
    distinct-token ratio, top-token share, mean word length, and the
    boolean pretraining filter verdict. Pure column expressions — the
    whole thing runs inside the scan stage at 100 TB."""
    from ..functions.text import gopher_pass, repetition_stats
    d = load_table(spark, sf_dir, "documents")
    st = d.select("doc_id", repetition_stats("text").alias("s"))
    return st.select(
        "doc_id", "s.n_tokens", "s.distinct_ratio", "s.top_token_frac",
        "s.mean_word_len", gopher_pass(F.col("s")).alias("gopher_ok"))


# DuckDB twin of the synthetic-PII augmentation: the fixture corpus
# is token soup, so each row gets a deterministic PII snippet derived
# from doc_id — identical arithmetic on both engines — and the scrub
# runs over text that provably contains every category.
_PII_AUG = """
    substring(text, 1, 40)
    || ' reach user' || CAST(doc_id AS VARCHAR) || '@example.com or '
    || CAST(doc_id % 900 + 100 AS VARCHAR) || '-'
    || CAST(doc_id % 900 + 100 AS VARCHAR) || '-'
    || CAST(doc_id % 9000 + 1000 AS VARCHAR)
    || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'
    || CAST(doc_id % 100 AS VARCHAR)
    || ' ssn ' || CAST(doc_id % 900 + 100 AS VARCHAR) || '-'
    || CAST(doc_id % 90 + 10 AS VARCHAR) || '-'
    || CAST(doc_id % 9000 + 1000 AS VARCHAR)
    || ' card ' || CAST(doc_id % 9000 + 1000 AS VARCHAR) || ' '
    || CAST(doc_id % 9000 + 1000 AS VARCHAR) || ' '
    || CAST(doc_id % 9000 + 1000 AS VARCHAR) || ' '
    || CAST(doc_id % 9000 + 1000 AS VARCHAR)
"""

_PII_SQL_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "[EMAIL]"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
     "[IP]"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "[PHONE]"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
    ("card", r"\b[0-9]{4}[ -][0-9]{4}[ -][0-9]{4}[ -][0-9]{4}\b",
     "[CARD]"),
]


def _pii_oracle() -> str:
    # sequential semantics: each category counted on the text with
    # the previous categories already redacted (mirrors pii_counts)
    cur = "aug"
    selects = []
    for name, pat, repl in _PII_SQL_PATTERNS:
        selects.append(
            f"CAST(len(regexp_extract_all({cur}, '{pat}')) AS BIGINT)"
            f" AS n_{name}")
        cur = f"regexp_replace({cur}, '{pat}', '{repl}', 'g')"
    return f"""
    WITH a AS (
      SELECT doc_id, {_PII_AUG} AS aug
      FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id, {cur} AS scrubbed, {', '.join(selects)}
    FROM a
    """


@query("text_pii_scrub", oracle=_pii_oracle())
def _text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction for training corpora: emails, dotted-quad IPs,
    phone/SSN/credit-card digit shapes replaced with typed
    placeholders, plus per-category counts under sequential
    (attribute-once) semantics. Pure JVM regexp_replace chains
    (functions/text.py::scrub_pii) — the patterns are written to the
    RE2 AND Java regex common subset so the DuckDB oracle runs them
    verbatim; at 100 TB this is a zero-shuffle scan-stage map."""
    from ..functions.text import pii_counts, scrub_pii

    d = load_table(spark, sf_dir, "documents") \
        .filter(F.col("text").isNotNull())
    did = F.col("doc_id")

    def s(col):
        return col.cast("string")

    aug = F.concat(
        F.substring("text", 1, 40),
        F.lit(" reach user"), s(did), F.lit("@example.com or "),
        s(did % 900 + 100), F.lit("-"),
        s(did % 900 + 100), F.lit("-"),
        s(did % 9000 + 1000),
        F.lit(" from 10."), s(did % 256), F.lit(".0."),
        s(did % 100),
        F.lit(" ssn "), s(did % 900 + 100), F.lit("-"),
        s(did % 90 + 10), F.lit("-"), s(did % 9000 + 1000),
        F.lit(" card "), s(did % 9000 + 1000), F.lit(" "),
        s(did % 9000 + 1000), F.lit(" "),
        s(did % 9000 + 1000), F.lit(" "), s(did % 9000 + 1000))
    withc = d.select("doc_id", aug.alias("aug"))
    return withc.select(
        "doc_id",
        scrub_pii("aug").alias("scrubbed"),
        pii_counts("aug").alias("c"),
    ).select("doc_id", "scrubbed", "c.n_email", "c.n_ipv4",
             "c.n_phone", "c.n_ssn", "c.n_card")


# DuckDB twin of the synthetic page builder: the corpus is plain
# token soup, so each row is wrapped in a deterministic HTML shell
# (title, comment, script+style blocks, entities, doc_id-dependent
# link count) — identical string arithmetic on both engines — and
# the extractor provably has markup to strip on every row.
_HTML_AUG = """
    '<!DOCTYPE html><html><head><title> Doc ' || CAST(doc_id AS VARCHAR)
    || ' &amp; friends </title><style>p{color:red}</style>'
    || '<script>var x = doc < 3 && doc > 1;</script></head>'
    || '<!-- crawl id ' || CAST(doc_id AS VARCHAR) || ' --><body><p>'
    || substring(text, 1, 60)
    || '</p><p>&quot;quoted&#39;&nbsp;&amp;lt;kept&gt;</p>'
    || repeat('<a href="/x">link</a> ', CAST(doc_id % 4 AS INTEGER))
    || '<div>tail ' || CAST(doc_id AS VARCHAR) || '</div></body></html>'
"""

_HTML_ENT_SQL = [("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
                 ("&quot;", '"'), ("&#39;", "''"), ("&amp;", "&")]


def _html_oracle() -> str:
    cur = "aug"
    cur = f"regexp_replace({cur}, '(?s)<!--.*?-->', ' ', 'g')"
    cur = (f"regexp_replace({cur}, "
           f"'(?s)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g')")
    cur = f"regexp_replace({cur}, '<[^>]+>', ' ', 'g')"
    for ent, repl in _HTML_ENT_SQL:
        cur = f"regexp_replace({cur}, '{ent}', '{repl}', 'g')"
    cur = f"trim(regexp_replace({cur}, '\\s+', ' ', 'g'))"
    return f"""
    WITH a AS (
      SELECT doc_id, {_HTML_AUG} AS aug
      FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id,
           trim(regexp_extract(aug, '(?s)<title[^>]*>(.*?)</title>', 1))
             AS title,
           {cur} AS extracted,
           CAST(len(regexp_extract_all(aug, '<a[\\s>]')) AS BIGINT)
             AS n_links
    FROM a
    """


@query("text_html_extract", oracle=_html_oracle())
def _text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML -> text extraction, the first stage of every crawl
    pipeline: strip comments + script/style blocks + tags, decode
    entities (one level, &amp; last), collapse whitespace; plus
    <title> capture and anchor-tag counts for the link-density
    boilerplate heuristic. Pure JVM regexp chains held to the
    RE2/Java common subset (the oracle runs the same patterns
    verbatim); zero-shuffle scan-stage map at any scale."""
    from ..functions.text import html_link_count, html_title, html_to_text

    d = load_table(spark, sf_dir, "documents") \
        .filter(F.col("text").isNotNull())
    did = F.col("doc_id").cast("string")
    aug = F.concat(
        F.lit("<!DOCTYPE html><html><head><title> Doc "), did,
        F.lit(" &amp; friends </title><style>p{color:red}</style>"),
        F.lit("<script>var x = doc < 3 && doc > 1;</script></head>"),
        F.lit("<!-- crawl id "), did, F.lit(" --><body><p>"),
        F.substring("text", 1, 60),
        F.lit("</p><p>&quot;quoted&#39;&nbsp;&amp;lt;kept&gt;</p>"),
        F.repeat(F.lit('<a href="/x">link</a> '),
                 (F.col("doc_id") % 4).cast("int")),
        F.lit("<div>tail "), did, F.lit("</div></body></html>"))
    a = d.select("doc_id", aug.alias("aug"))
    return a.select(
        "doc_id",
        html_title("aug").alias("title"),
        html_to_text("aug").alias("extracted"),
        html_link_count("aug").alias("n_links"))


@query(
    "text_chunk_windows",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS toks
      FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id,
           CAST(s // 24 AS BIGINT) AS chunk_idx,
           array_to_string(toks[s+1 : s+32], ' ') AS chunk_text,
           CAST(len(toks[s+1 : s+32]) AS BIGINT) AS n_chunk_tokens
    FROM t, unnest(generate_series(0, len(toks) - 1, 24)) AS u(s)
    WHERE len(toks) > 0
    """,
)
def _text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking, the last step before tokenizer/
    packing in a pretraining pipeline: fixed 32-token windows at
    stride 24 (8-token overlap so no boundary n-gram is lost), one
    output row per (doc, window). All JVM built-ins — sequence/
    slice/posexplode inside the scan stage; the explode multiplies
    rows ~n_tokens/stride with zero shuffle, so at 100 TB this is
    embarrassingly parallel and output-bound, exactly like the real
    thing."""
    from ..functions.text import chunk_starts, tokens

    size, stride = 32, 24
    d = load_table(spark, sf_dir, "documents") \
        .filter(F.col("text").isNotNull())
    t = d.select("doc_id", tokens("text").alias("toks"),
                 chunk_starts("text", stride).alias("starts"))
    e = t.select("doc_id", "toks",
                 F.explode("starts").alias("s"))
    chunk = F.slice("toks", F.col("s") + 1, size)
    return e.select(
        "doc_id",
        (F.col("s") / stride).cast("long").alias("chunk_idx"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"))


# DuckDB twin of url_canonicalize (functions/text.py): the full
# normalization chain re-stated in RE2/list SQL. Synthetic URLs vary
# scheme case, default/explicit ports, utm_* params and fragments by
# doc_id so every branch fires.
_URL_AUG = """
    CASE doc_id % 3 WHEN 0 THEN 'HTTPS://WWW.Site' WHEN 1
         THEN 'https://cdn.site' ELSE 'HTTP://Site' END
    || CAST(doc_id % 50 AS VARCHAR)
    || CASE doc_id % 3 WHEN 0 THEN '.COM:443' WHEN 1 THEN '.com'
            ELSE '.ORG:80' END
    || '/p/' || CAST(doc_id % 17 AS VARCHAR)
    || CASE WHEN doc_id % 2 = 0
            THEN '/?utm_source=a&x=' || CAST(doc_id % 11 AS VARCHAR)
                 || '&utm_b=c'
            ELSE '?id=' || CAST(doc_id % 13 AS VARCHAR) || '#frag' END
"""


def canonical_sql(col: str) -> str:
    """DuckDB expression mirroring functions.text.url_canonicalize
    over the named URL column (shared with the crawl E2E oracle)."""
    scheme = f"lower(regexp_extract({col}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    hostport = (f"lower(regexp_extract({col}, "
                "'^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1))")
    host = f"""CASE WHEN {scheme} = 'https'
                    THEN regexp_replace({hostport}, ':443$', '')
                    WHEN {scheme} = 'http'
                    THEN regexp_replace({hostport}, ':80$', '')
                    ELSE {hostport} END"""
    path = (f"regexp_extract({col}, "
            "'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1)")
    path = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    q = f"regexp_extract({col}, '\\?([^#]*)', 1)"
    kept = (f"array_to_string(list_filter(string_split({q}, '&'), "
            f"p -> NOT starts_with(p, 'utm_') AND p <> ''), '&')")
    return (f"{scheme} || '://' || {host} || {path} || "
            f"CASE WHEN {kept} <> '' THEN '?' || {kept} ELSE '' END")


def _url_oracle() -> str:
    canonical = canonical_sql("aug")
    return f"""
    WITH a AS (
      SELECT doc_id, {_URL_AUG} AS aug
      FROM documents WHERE text IS NOT NULL
    ),
    c AS (
      SELECT doc_id, aug, {canonical} AS canonical_url FROM a
    )
    SELECT doc_id, canonical_url,
           regexp_extract(canonical_url,
                          '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host,
           regexp_extract(regexp_extract(canonical_url,
                          '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1),
                          '([^.]+\\.[^.]+)$', 1) AS registered_domain,
           CAST(len(list_filter(string_split(
                regexp_extract(canonical_url,
                  '^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)', 1), '/'),
                x -> x <> '')) AS BIGINT) AS path_depth,
           CAST(len(list_filter(string_split(
                regexp_extract(aug, '\\?([^#]*)', 1), '&'),
                p -> starts_with(p, 'utm_'))) AS BIGINT)
             AS n_tracking_params
    FROM c
    """


@query("url_canonicalize", oracle=_url_oracle())
def _url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization for crawl dedup: lowercase scheme+host,
    strip default ports, drop fragments and utm_* tracking params —
    two crawls of one page collapse to a single canonical key —
    plus host / registered-domain / path-depth / tracking-param
    stats for source-mix analysis. Pure regexp/array built-ins held
    to the RE2/Java common subset; zero-shuffle scan-stage map."""
    from ..functions.text import url_canonicalize

    d = load_table(spark, sf_dir, "documents") \
        .filter(F.col("text").isNotNull())
    did = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    aug = F.concat(
        F.when(did % 3 == 0, "HTTPS://WWW.Site")
         .when(did % 3 == 1, "https://cdn.site")
         .otherwise("HTTP://Site"),
        s(did % 50),
        F.when(did % 3 == 0, ".COM:443")
         .when(did % 3 == 1, ".com")
         .otherwise(".ORG:80"),
        F.lit("/p/"), s(did % 17),
        F.when(did % 2 == 0,
               F.concat(F.lit("/?utm_source=a&x="), s(did % 11),
                        F.lit("&utm_b=c")))
         .otherwise(F.concat(F.lit("?id="), s(did % 13), F.lit("#frag"))))
    a = d.select("doc_id", aug.alias("aug"))
    c = a.select("doc_id", "aug",
                 url_canonicalize("aug").alias("canonical_url"))
    host = F.regexp_extract("canonical_url",
                            r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)
    path = F.regexp_extract("canonical_url",
                            r"^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    return c.select(
        "doc_id", "canonical_url",
        host.alias("host"),
        F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
         .alias("registered_domain"),
        F.size(F.filter(F.split(path, "/"), lambda x: x != ""))
         .cast("long").alias("path_depth"),
        F.size(F.filter(F.split(F.regexp_extract("aug", r"\?([^#]*)", 1),
                                "&"),
                        lambda p: p.startswith("utm_")))
         .cast("long").alias("n_tracking_params"))


@query(
    "text_tfidf_top_terms",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS toks
      FROM documents WHERE text IS NOT NULL
    ),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM t, unnest(toks) AS u(term)
      GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM t),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             tf.tf * (n.n_docs + 1) / (df.df + 1) AS score
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, score,
           CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY score DESC, term) AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
)
def _text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 salient terms by tf-idf — keyword
    extraction / topic fingerprinting over the corpus. The idf is
    the RATIONAL variant (n_docs+1)/(df+1) rather than its log:
    integer-derived double division is bit-identical across engines,
    so the oracle compares exactly (the log variant's last-ulp
    differences can flip a rounded 6th decimal — the
    embedding_quantize_stats lesson). Plan shape: explode -> two
    map-side-combined aggregations -> broadcast-sized df join (df is
    vocabulary-scale, orders smaller than the corpus) -> per-doc
    top-k window. At 100 TB the only large shuffle keys on
    (doc, term), and the vocabulary table broadcasts."""
    from pyspark.sql import Window

    from ..functions.text import tokens

    d = load_table(spark, sf_dir, "documents") \
        .filter(F.col("text").isNotNull())
    t = d.select("doc_id", tokens("text").alias("toks"))
    n_docs = t.count()  # bounded scalar (dataset metadata, one job)
    tf = (t.select("doc_id", F.explode("toks").alias("term"))
           .groupBy("doc_id", "term")
           .agg(F.count(F.lit(1)).alias("tf")))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(hint_broadcast_if_small(df_), "term").select(
        "doc_id", "term", "tf", "df",
        (F.col("tf") * (F.lit(n_docs) + 1) / (F.col("df") + 1))
        .alias("score"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= 3)
                  .select("doc_id", "term", "tf", "df", "score",
                          F.col("rank").cast("long").alias("rank")))


@query(
    "corpus_health_report",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, lang, text, {_TOKS} AS toks
      FROM documents WHERE text IS NOT NULL
    ),
    s AS (
      SELECT source, lang, md5(text) AS fp,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CASE WHEN len(toks) > 0 THEN
               round(len(list_distinct(toks)) / len(toks), 6)
             ELSE 0.0 END AS distinct_ratio,
             CASE WHEN len(toks) > 0 THEN
               round(list_aggregate(list_transform(toks, x -> length(x)),
                                    'sum') / len(toks), 6)
             ELSE 0.0 END AS mean_word_len,
             CASE WHEN len(toks) > 0 THEN
               round(list_max(list_transform(list_distinct(toks),
                     u -> len(list_filter(toks, x -> x = u)))) / len(toks), 6)
             ELSE 0.0 END AS top_token_frac
      FROM t
    )
    SELECT source, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) AS n_exact_dups,
           CAST(SUM(CASE WHEN n_tokens >= 20 AND n_tokens <= 100000
                     AND mean_word_len >= 2.0 AND mean_word_len <= 12.0
                     AND distinct_ratio >= 0.2 AND top_token_frac <= 0.35
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_gopher_pass,
           CAST(CAST(SUM(CAST(distinct_ratio AS DECIMAL(18,6)))
                AS DECIMAL(28,6)) AS DOUBLE) AS sum_distinct_ratio
    FROM s
    GROUP BY source, lang
    """,
)
def _corpus_health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-(source, language) rollup a curation team watches
    daily: document and token volumes, exact-duplicate counts
    (content-md5), Gopher-gate pass counts, and the distinct-ratio
    mass (decimal-summed so the cross-engine hash is exact — double
    summation order would drift the last ulp — then cast back to
    DOUBLE on both sides, the sum_exact house rule: the driver hash
    distinguishes Decimal objects from float64 even when values
    match). Composes
    repetition_stats + gopher_pass + content fingerprinting into one
    map-side-combined aggregation: per-doc stats run in the scan
    stage, then ONE shuffle on (source, lang) — at 100 TB the
    reduce side sees one row per group, not per document."""
    from ..functions.text import gopher_pass, repetition_stats

    d = load_table(spark, sf_dir, "documents") \
        .filter(F.col("text").isNotNull())
    st = d.select(
        "source", "lang",
        F.md5(F.encode("text", "UTF-8")).alias("fp"),
        repetition_stats("text").alias("s"))
    st = st.select(
        "source", "lang", "fp",
        F.col("s.n_tokens").alias("n_tokens"),
        F.col("s.distinct_ratio").alias("distinct_ratio"),
        gopher_pass(F.col("s")).alias("ok"))
    return (st.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.count(F.lit(1)) - F.countDistinct("fp")).alias("n_exact_dups"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).cast("long")
         .alias("n_gopher_pass"),
        F.sum(F.col("distinct_ratio").cast("decimal(18,6)"))
         .cast("decimal(28,6)").cast("double")
         .alias("sum_distinct_ratio")))


@query(
    "text_winnow_fingerprints",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\\s+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
               i -> substring(md5(array_to_string(
                      toks[CAST(i AS INT):CAST(i + 2 AS INT)], ' ')),
                    1, 16)) AS hs
      FROM toks
    ),
    fps AS (
      SELECT DISTINCT doc_id, len(hs) AS n_grams,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(hs) - 3, 1) + 1),
               i -> list_aggregate(
                      hs[CAST(i AS INT):CAST(i + 3 AS INT)], 'min'))))
               AS fp
      FROM grams
    ),
    dfreq AS (SELECT fp, COUNT(DISTINCT doc_id) AS nd
              FROM fps GROUP BY 1)
    SELECT f.doc_id,
           CAST(MAX(f.n_grams) AS BIGINT) AS n_grams,
           CAST(COUNT(*) AS BIGINT) AS n_fingerprints,
           CAST(SUM(CASE WHEN dfreq.nd > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_shared_fps
    FROM fps f JOIN dfreq USING (fp)
    GROUP BY f.doc_id
    """,
)
def _text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint audit (functions/text.py::
    winnow_fingerprint_rows — Schleimer et al. 2003): per document,
    the 3-token-gram count, the winnowed fingerprint-set size (window
    w=4), and how many of those fingerprints also occur in another
    document (the copy-detection signal: any shared 6-token run
    forces a shared fingerprint). Gram hashes are minted ONCE in the
    scan stage (see winnow_fingerprint_rows on why the all-expression
    form is an O(n^2) trap), then one shuffle on doc_id for the
    window minima, one on fp for the doc-frequency agg, a
    co-partitioned join back, one on doc_id for the rollup — only
    ids and 16-hex strings ever move.

    r9: the serving path is the Arrow-batched twin
    (winnow_fingerprint_rows_arrow) — same rows, pinned by
    tests/test_functions.py parity — which keeps the whole
    tokenize/gram/md5/sliding-min derivation in the narrow map, so
    the first exchange carries already-winnowed fingerprints (~1/w
    of the gram rows the relational form shuffles). The relational
    form above remains the spec and the oracle's mirror."""
    from ..functions.text import winnow_fingerprint_rows_arrow

    docs = load_table(spark, sf_dir, "documents")
    src = docs.select("doc_id", "text")
    # single-file-scan parallelism floor (BASELINE.md): the bench-SF
    # table is ONE parquet file -> one partition, serializing the
    # Arrow map. Fan out only when the scan underfills the cluster —
    # at real scale the condition is false and no exchange is added.
    par = spark.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < par:
        src = src.repartition(par)
    base = winnow_fingerprint_rows_arrow(src)
    dfreq = base.groupBy("fp").agg(
        F.count_distinct("doc_id").alias("nd"))
    return (base.join(dfreq, "fp")
                .groupBy("doc_id")
                .agg(F.max("n_grams").cast("long").alias("n_grams"),
                     F.count(F.lit(1)).alias("n_fingerprints"),
                     F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
                      .cast("long").alias("n_shared_fps")))


@query(
    "corpus_datasheet",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, source,
             CAST(len(list_filter(
               regexp_split_to_array(lower(text), '\\s+'),
               x -> x <> '')) AS BIGINT) AS n_tokens,
             substring(md5(regexp_replace(trim(lower(text)),
                                          '\\s+', ' ', 'g')), 1, 16)
               AS fingerprint
      FROM documents
    ),
    fp AS (
      SELECT fingerprint, COUNT(*) AS n_copies FROM t GROUP BY 1
    )
    SELECT t.lang, t.source,
           COUNT(*) AS n_docs,
           CAST(SUM(t.n_tokens) AS BIGINT) AS total_tokens,
           CAST(MIN(t.n_tokens) AS BIGINT) AS min_tokens,
           round(quantile_cont(t.n_tokens, 0.5), 6) AS p50_tokens,
           round(quantile_cont(t.n_tokens, 0.95), 6) AS p95_tokens,
           CAST(MAX(t.n_tokens) AS BIGINT) AS max_tokens,
           CAST(SUM(CASE WHEN fp.n_copies > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_duplicated_docs
    FROM t JOIN fp USING (fingerprint)
    GROUP BY 1, 2
    """,
)
def _corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datasheets-for-datasets (Gebru et al. 2021) as a query: the
    per-(language, source) shard card every corpus release ships —
    volume, exact interpolated token-length quantiles (the
    percentile/quantile_cont shared definition, 6-dp rounded), and
    how many documents in the shard duplicate content appearing
    anywhere in the corpus (fingerprint doc-frequency > 1). Plan:
    scan-stage tokenize+fingerprint, one shuffle on fingerprint for
    the copy counts, a co-partitioned join back, one shuffle on the
    shard key for the rollup."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "lang", "source",
        F.size(F.filter(F.split(F.lower(F.col("text")), r"\s+"),
                        lambda x: x != "")).cast("long")
         .alias("n_tokens"),
        doc_fingerprint("text").alias("fingerprint"))
    fp = t.groupBy("fingerprint").agg(
        F.count(F.lit(1)).alias("n_copies"))
    return (t.join(fp, "fingerprint")
             .groupBy("lang", "source")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum("n_tokens").cast("bigint").alias("total_tokens"),
                  F.min("n_tokens").cast("bigint").alias("min_tokens"),
                  F.round(F.expr("percentile(n_tokens, 0.5)"), 6)
                   .alias("p50_tokens"),
                  F.round(F.expr("percentile(n_tokens, 0.95)"), 6)
                   .alias("p95_tokens"),
                  F.max("n_tokens").cast("bigint").alias("max_tokens"),
                  F.sum(F.when(F.col("n_copies") > 1, 1).otherwise(0))
                   .cast("bigint").alias("n_duplicated_docs")))


@query(
    "text_bigram_typicality",
    oracle=f"""
    WITH t AS MATERIALIZED (
      SELECT doc_id, {_TOKS} AS toks FROM documents
      WHERE text IS NOT NULL
    ),
    bi AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
               i -> struct_pack(w1 := toks[CAST(i AS INT)],
                                w2 := toks[CAST(i + 1 AS INT)]))) AS s
      FROM t WHERE len(toks) >= 2
    ),
    bg AS MATERIALIZED (SELECT doc_id, s.w1 AS w1, s.w2 AS w2 FROM bi),
    c2 AS MATERIALIZED (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
           FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
    v AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
          FROM (SELECT unnest(toks) AS tok FROM t)),
    scored AS (
      SELECT bg.doc_id,
             CAST(c2.c2 + 1 AS DOUBLE) / CAST(c1.c1 + v.v AS DOUBLE) AS p
      FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
    ),
    per_doc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(CAST(SUM(CAST(p AS DECIMAL(28,6))) / COUNT(*)
                  AS DECIMAL(38,6)) AS DOUBLE) AS typicality
      FROM scored GROUP BY 1
    )
    SELECT t.doc_id,
           COALESCE(p.n_bigrams, 0) AS n_bigrams,
           p.typicality
    FROM t LEFT JOIN per_doc p USING (doc_id)
    """,
)
def _text_bigram_typicality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram language-model typicality score — the
    CCNet-style "perplexity filter" quality signal, reformulated
    without transcendental functions so it is bit-exact across
    engines (the BM25 house trick): instead of avg negative
    log-likelihood, each document scores the ARITHMETIC mean of its
    bigrams' add-1-smoothed conditional probabilities
    p(w2|w1) = (c(w1,w2)+1)/(c(w1,.)+V) — every p is one IEEE
    division of two exact BIGINTs, and the mean is the exact-decimal
    house accumulator. Low typicality = out-of-distribution text
    (boilerplate, noise, wrong language); the model is trained on
    the corpus being scored, the usual self-scoring setup.

    Plan shape: tokenize+posexplode in the scan stage; ONE doc_id
    exchange for the lead() bigram pairing (the array-expression
    alternative risks the documented O(n^2) HOF-lambda CSE trap —
    BASELINE.md house rule); the model aggs shuffle map-side-combined
    (w1,w2) rows bounded by the observed-bigram vocabulary; the
    scoring join reshuffles bigram hits onto the model keys (AQE
    broadcasts the model side when the vocabulary is small); the
    per-doc rollup is the last exchange. Docs with < 2 tokens emit
    n_bigrams=0 with a NULL score rather than dropping out."""
    from pyspark.sql import Window

    from ..operators.windowed_agg import avg_exact

    docs = (load_table(spark, sf_dir, "documents")
            .filter(F.col("text").isNotNull())
            .select("doc_id", tokens("text").alias("toks")))
    tok_rows = docs.select(
        "doc_id", F.posexplode("toks").alias("pos", "w1"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = (tok_rows.withColumn("w2", F.lead("w1").over(w))
                  .filter(F.col("w2").isNotNull())
                  .select("doc_id", "w1", "w2"))
    c2 = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").cast("long").alias("c1"))
    vocab = tok_rows.agg(
        F.count_distinct("w1").cast("long").alias("v"))
    scored = (bg.join(c2, ["w1", "w2"]).join(c1, "w1")
                .crossJoin(F.broadcast(vocab))
                .withColumn("p", (F.col("c2") + 1).cast("double")
                            / (F.col("c1") + F.col("v")).cast("double")))
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        avg_exact(F.col("p")).alias("typicality"))
    return (docs.select("doc_id")
                .join(per_doc, "doc_id", "left")
                .select("doc_id",
                        F.coalesce("n_bigrams", F.lit(0)).cast("long")
                         .alias("n_bigrams"),
                        "typicality"))


def _bpe_oracle_sql(n_merges: int) -> str:
    """Unrolled DuckDB twin of operators/bpe.bpe_merges (the
    _pr_iter_sql house pattern): n_merges chained CTE rounds of
    pair-count -> deterministic best -> literal sentinel replace."""
    sep = "chr(2) || chr(1)"
    strip = "'^' || chr(1) || '|' || chr(2) || '$'"
    ctes = [f"""base AS MATERIALIZED (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        SELECT unnest(list_filter(
          regexp_split_to_array(lower(text), '\\s+'), t -> t <> ''))
          AS word
        FROM documents WHERE text IS NOT NULL)
      GROUP BY 1
      HAVING COUNT(*) >= {_BPE_MIN_FREQ}
    )""", """w0 AS MATERIALIZED (
      SELECT word, freq,
             list_aggregate(list_transform(
               list_append(str_split(word, ''), '</w>'),
               s -> chr(1) || s || chr(2)), 'string_agg', '') AS enc
      FROM base
    )"""]
    for k in range(1, n_merges + 1):
        prev = f"w{k - 1}"
        ctes.append(f"""p{k} AS MATERIALIZED (
      SELECT s.x AS x, s.y AS y, CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (
        SELECT freq,
               unnest(list_transform(range(1, len(syms)),
                 i -> struct_pack(x := syms[CAST(i AS INT)],
                                  y := syms[CAST(i + 1 AS INT)]))) AS s
        FROM (SELECT freq,
                     str_split(regexp_replace(enc, {strip}, '', 'g'),
                               {sep}) AS syms
              FROM {prev})
      ) GROUP BY 1, 2
    )""")
        ctes.append(f"""b{k} AS MATERIALIZED (
      SELECT x, y, cnt FROM p{k}
      ORDER BY cnt DESC, x, y LIMIT 1
    )""")
        ctes.append(f"""w{k} AS MATERIALIZED (
      SELECT w.word, w.freq,
             replace(w.enc,
                     chr(1) || b.x || chr(2) || chr(1) || b.y || chr(2),
                     chr(1) || b.x || b.y || chr(2)) AS enc
      FROM {prev} w CROSS JOIN b{k} b
    )""")
    selects = "\n    UNION ALL ".join(
        f"SELECT {k} AS rank, x AS \"left\", y AS \"right\", "
        f"cnt AS pair_count FROM b{k}"
        for k in range(1, n_merges + 1))
    return "WITH " + ",\n    ".join(ctes) + "\n    " + selects


def _bpe_encode_oracle_sql(n_merges: int) -> str:
    """Corpus encoding under the learned vocabulary: the same
    unrolled training CTEs, then per-document subword totals."""
    train = _bpe_oracle_sql(n_merges)
    # the training SQL ends "...<last cte>)\n    SELECT 1 AS rank..."
    # — splice the final union off and continue the CTE list
    ctes = train[:train.rindex("SELECT 1 AS rank")].rstrip() + ",\n    "
    sep = "chr(2) || chr(1)"
    strip = "'^' || chr(1) || '|' || chr(2) || '$'"
    return ctes + f"""wlen AS (
      SELECT word,
             CAST(len(str_split(regexp_replace(enc, {strip}, '', 'g'),
                                {sep})) AS BIGINT) AS n_sub
      FROM w{n_merges}
    ),
    doc_toks AS (
      SELECT doc_id, unnest({_TOKS}) AS word
      FROM documents WHERE text IS NOT NULL
    ),
    per_doc AS (
      -- out-of-vocabulary words (below the frequency floor) fall
      -- back to character segmentation: length(word) chars + </w>
      SELECT t.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_words,
             CAST(SUM(length(t.word)) AS BIGINT) AS n_chars,
             CAST(SUM(COALESCE(w.n_sub, length(t.word) + 1))
                  AS BIGINT) AS n_subword_tokens
      FROM doc_toks t LEFT JOIN wlen w USING (word)
      GROUP BY 1
    )
    SELECT d.doc_id,
           COALESCE(p.n_words, 0) AS n_words,
           COALESCE(p.n_chars, 0) AS n_chars,
           COALESCE(p.n_subword_tokens, 0) AS n_subword_tokens,
           CASE WHEN p.n_subword_tokens > 0 THEN
             CAST(p.n_chars AS DOUBLE) / p.n_subword_tokens
           ELSE 0.0 END AS chars_per_token
    FROM (SELECT doc_id FROM documents WHERE text IS NOT NULL) d
    LEFT JOIN per_doc p USING (doc_id)"""


_BPE_MERGES = 10
# vocabulary floor: pair statistics come from the repeated (Zipf-head)
# vocabulary — the standard trainer approximation that bounds the word
# table by repeated words instead of the corpus (operators/bpe.py)
_BPE_MIN_FREQ = 2


@query("bpe_vocab_merges", oracle=_bpe_oracle_sql(_BPE_MERGES))
def _bpe_vocab_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first {n} BPE merge rules learned from the corpus
    (operators/bpe.py — Sennrich et al. 2016), the tokenizer-training
    step of an LLM data pipeline. The ONLY corpus-sized work is the
    word-frequency aggregation; all ten merge rounds run on the
    vocabulary-bounded word table with deterministic tie-breaks, so
    the full merge sequence hash-checks against a 10-round unrolled
    SQL twin — an ITERATIVE algorithm under the full oracle gate, not
    a rows-only exemption."""
    from ..operators.bpe import bpe_merges

    docs = load_table(spark, sf_dir, "documents")
    return bpe_merges(docs, "text", _BPE_MERGES, min_freq=_BPE_MIN_FREQ)


@query("bpe_encode_corpus", oracle=_bpe_encode_oracle_sql(_BPE_MERGES))
def _bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode the corpus under the BPE vocabulary learned by
    `bpe_vocab_merges` — train + apply is the complete tokenizer
    loop. The word table already carries its post-merge segmentation
    out of training, so encoding is: count sentinels per word
    (length arithmetic, no split), broadcast the vocab onto the
    exploded corpus tokens, sum per doc. Output per document: word /
    char / subword-token counts and the chars-per-token compression
    ratio (the metric a tokenizer is judged by). Fact-scale work is
    one explode + one broadcast join + one doc_id agg; everything
    else is vocab-bounded."""
    from ..operators.bpe import bpe_train, subword_counts

    docs = load_table(spark, sf_dir, "documents") \
        .filter(F.col("text").isNotNull())
    _, words = bpe_train(docs, "text", _BPE_MERGES,
                         min_freq=_BPE_MIN_FREQ)
    wlen = subword_counts(words).select("word", "n_subwords")
    doc_toks = docs.select(
        "doc_id", F.explode(tokens("text")).alias("word"))
    # OOV words (below the trainer's frequency floor) segment to
    # characters: length(word) chars + the </w> marker
    per_doc = (doc_toks.join(hint_broadcast_if_small(wlen),
                             "word", "left")
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).cast("long").alias("n_words"),
                    F.sum(F.length("word")).cast("long")
                     .alias("n_chars"),
                    F.sum(F.coalesce(F.col("n_subwords"),
                                     F.length("word") + 1))
                     .cast("long").alias("n_subword_tokens")))
    return (docs.select("doc_id")
            .join(per_doc, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("n_words", F.lit(0)).cast("long")
                 .alias("n_words"),
                F.coalesce("n_chars", F.lit(0)).cast("long")
                 .alias("n_chars"),
                F.coalesce("n_subword_tokens", F.lit(0)).cast("long")
                 .alias("n_subword_tokens"),
                F.when(F.col("n_subword_tokens") > 0,
                       F.col("n_chars").cast("double")
                       / F.col("n_subword_tokens"))
                 .otherwise(F.lit(0.0)).alias("chars_per_token")))
