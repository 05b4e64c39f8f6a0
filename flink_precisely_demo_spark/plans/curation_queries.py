"""Dataset-curation queries over `documents` with DuckDB oracles.

Sampling and splitting are hash-deterministic (operators/curation.py)
so the oracles reproduce the exact row sets — no tolerance games.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import token_count
from ..operators.curation import (
    contamination_pairs,
    deterministic_sample,
    pack_token_chunks,
    train_val_test_split,
)
from ..sources.parquet import load_table
from .queries import query

_TOKS = "list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')"


def _bucket_sql(salt: str) -> str:
    return (f"CAST(('0x' || substring(md5('{salt}' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"
            " % 100 AS INT)")


@query(
    "curation_sample",
    oracle=f"""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE {_bucket_sql('')} < 10
    """,
)
def _curation_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable 10% sample: the same rows on every run and engine."""
    docs = load_table(spark, sf_dir, "documents")
    return deterministic_sample(docs, "doc_id", 10) \
        .select("doc_id", "lang", "source", "n_chars")


@query(
    "curation_split",
    oracle=f"""
    WITH b AS (
      SELECT lang, n_chars, {_bucket_sql('split')} AS bucket FROM documents
    ), s AS (
      SELECT CASE WHEN bucket < 80 THEN 'train'
                  WHEN bucket < 90 THEN 'val'
                  ELSE 'test' END AS split,
             lang, n_chars
      FROM b
    )
    SELECT split, COUNT(*) AS n_docs,
           AVG(n_chars) AS avg_chars,
           COUNT(DISTINCT lang) AS n_langs
    FROM s GROUP BY split
    """,
)
def _curation_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 hash split summary — the assignment is growth-stable
    (a doc never changes split when the corpus grows)."""
    docs = load_table(spark, sf_dir, "documents")
    return (train_val_test_split(docs, "doc_id")
            .groupBy("split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.avg("n_chars").alias("avg_chars"),
                 F.countDistinct("lang").alias("n_langs")))


@query(
    "curation_contamination",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             array_to_string(toks[CAST(i AS INT):CAST(i + 4 AS INT)], ' ') AS sh
      FROM (
        SELECT doc_id, toks,
               unnest(range(1, greatest(len(toks) - 4, 1) + 1)) AS i
        FROM toks
      )
    )
    ,
    -- corpus-side document-frequency cap (mirrors max_df=1000)
    sized AS (
      SELECT *, COUNT(*) OVER (PARTITION BY sh) AS df FROM sh
    )
    SELECT c.doc_id AS corpus_id, b.doc_id AS benchmark_id,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM (SELECT * FROM sized WHERE df <= 1000) c
    JOIN (SELECT * FROM sh WHERE doc_id % 50 = 0) b ON c.sh = b.sh
    WHERE c.doc_id <> b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= 3
    """,
)
def _curation_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing >= 3 distinct
    5-gram shingles with any benchmark doc (deterministic benchmark
    subset: doc_id % 50 = 0)."""
    docs = load_table(spark, sf_dir, "documents")
    benchmark = docs.filter(F.col("doc_id") % 50 == 0)
    return contamination_pairs(docs, benchmark, shingle_n=5, min_overlap=3)


@query(
    "curation_pack_chunks",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, source, CAST(len({_TOKS}) AS BIGINT) AS n_tokens
      FROM documents
    ), c AS (
      SELECT lang, source, n_tokens,
             CAST(floor(coalesce(SUM(n_tokens) OVER (
                    PARTITION BY lang, source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  / 512.0) AS BIGINT) AS chunk_id
      FROM t
    )
    SELECT lang, source, chunk_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens
    FROM c GROUP BY 1, 2, 3
    """,
)
def _curation_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget packing (512/chunk) within (lang, source) shard
    groups; reports per-chunk doc count and token totals."""
    docs = load_table(spark, sf_dir, "documents")
    packed = pack_token_chunks(docs, ["lang", "source"],
                               token_count("text").cast("long"),
                               order_col="doc_id", budget=512)
    return (packed.groupBy("lang", "source", "chunk_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("chunk_tokens")))


@query(
    "curation_pipeline_e2e",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang, text,
             CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
             substring(md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')), 1, 16)
               AS fingerprint
      FROM documents
      WHERE text IS NOT NULL
    ),
    kept AS (
      SELECT * FROM (
        SELECT *, MIN(doc_id) OVER (PARTITION BY fingerprint) AS keep_id
        FROM scored WHERE n_tokens >= 10
      ) WHERE doc_id = keep_id
    ),
    split AS (
      SELECT lang, n_tokens,
             CASE WHEN {_bucket_sql('split')} < 80 THEN 'train'
                  WHEN {_bucket_sql('split')} < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM kept
    )
    SELECT split, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM split GROUP BY split, lang
    """,
)
def _curation_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pipeline, end-to-end in one plan:
    quality filter (min token count) -> exact-dedup keeping the
    lowest-id representative -> growth-stable train/val/test split ->
    per-split token budgets. One fingerprint shuffle + one group
    shuffle; the split assignment is a pure map. This is the whole
    pre-training triage flow the individual operators exist for,
    hash-checked as a unit."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    from ..functions.text import doc_fingerprint
    scored = docs.select(
        "doc_id", "lang",
        token_count("text").cast("long").alias("n_tokens"),
        doc_fingerprint("text").alias("fingerprint"),
    ).filter(F.col("n_tokens") >= 10)
    from pyspark.sql import Window
    keep = F.min("doc_id").over(Window.partitionBy("fingerprint"))
    kept = scored.withColumn("keep_id", keep) \
                 .filter(F.col("doc_id") == F.col("keep_id"))
    return (train_val_test_split(kept, "doc_id")
            .groupBy("split", "lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("total_tokens")))


@query(
    "curation_stratified",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY lang, source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS r,
             COUNT(*) OVER (PARTITION BY lang, source) AS n
      FROM documents
    )
    SELECT lang, source,
           COUNT(*) AS n_sampled,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM ranked
    WHERE r <= ceil(n * 10 / 100.0)
    GROUP BY lang, source
    """,
)
def _curation_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 10% per (lang, source) stratum via hash-order ranking —
    the balanced-mixture sampler (`operators/curation.
    stratified_sample`). Aggregated per stratum so the oracle checks
    both quota exactness and WHICH rows were selected (min sampled
    id is selection-sensitive)."""
    from ..operators.curation import stratified_sample
    docs = load_table(spark, sf_dir, "documents")
    s = stratified_sample(docs, ["lang", "source"], "doc_id", 10)
    return (s.groupBy("lang", "source")
             .agg(F.count(F.lit(1)).alias("n_sampled"),
                  F.min("doc_id").alias("min_doc_id")))


_MIX_WEIGHTS = {"en": 0.5, "de": 0.15, "fr": 0.15, "es": 0.12, "zh": 0.08}
_MIX_BUDGET = 0.6
_MIX_GRAIN = 10000

_MIX_W_SQL = ("CASE lang " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in _MIX_WEIGHTS.items()) + " END")


@query(
    "curation_mixture_sample",
    oracle=f"""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n,
             SUM(COUNT(*)) OVER () AS tot
      FROM documents GROUP BY lang
    ),
    thr AS (
      SELECT lang, n,
             CAST(floor({_MIX_GRAIN}.0 * least(1.0,
                  floor({_MIX_BUDGET} * tot) * ({_MIX_W_SQL}) / n))
                  AS BIGINT) AS t
      FROM counts WHERE ({_MIX_W_SQL}) IS NOT NULL
    ),
    kept AS (
      SELECT d.lang, d.doc_id
      FROM documents d JOIN thr ON d.lang = thr.lang
      WHERE CAST(('0x' || substring(md5('mix' || CAST(d.doc_id AS VARCHAR)),
                                    1, 15))::BIGINT % {_MIX_GRAIN} AS BIGINT)
            < thr.t
    )
    SELECT c.lang,
           CAST(c.n AS BIGINT) AS n_docs,
           CAST(floor(floor({_MIX_BUDGET} * c.tot)
                * (CASE c.lang {' '.join(f"WHEN '{k}' THEN {v}" for k, v in _MIX_WEIGHTS.items())} END))
                AS BIGINT) AS n_target,
           CAST(COUNT(k.doc_id) AS BIGINT) AS n_sampled,
           CAST(COUNT(k.doc_id) AS DOUBLE) / c.n AS achieved_rate
    FROM counts c LEFT JOIN kept k ON c.lang = k.lang
    WHERE (CASE c.lang {' '.join(f"WHEN '{k}' THEN {v}" for k, v in _MIX_WEIGHTS.items())} END) IS NOT NULL
    GROUP BY c.lang, c.n, c.tot
    """,
)
def _curation_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture resampling (the DoReMi/Pile 'mixture weights'
    step): downsample each language stratum toward target weights
    (en .5 / de .15 / fr .15 / es .12 / zh .08) within a 60%-of-corpus
    token budget, via the engine-reproducible md5-bucket rate
    (operators/curation.mixture_sample). Reports per-language volume,
    target, sampled count, and achieved rate; the oracle replays the
    identical double arithmetic (floor/least in the same order), so a
    hash match proves the mixture math AND the per-row hash selection
    agree cross-engine. Scale: one count agg broadcast back onto the
    scan; the sampling filter itself is zero-shuffle."""
    from ..operators.curation import mixture_sample

    docs = load_table(spark, sf_dir, "documents")
    kept = mixture_sample(docs, "lang", _MIX_WEIGHTS, _MIX_BUDGET,
                          grain=_MIX_GRAIN)
    wmap = F.create_map(*[x for k, v in _MIX_WEIGHTS.items()
                          for x in (F.lit(k), F.lit(float(v)))])
    counts = (docs.groupBy("lang")
              .agg(F.count(F.lit(1)).alias("n_docs"))
              .withColumn("tot", F.sum("n_docs").over(
                  Window.partitionBy()))
              .filter(wmap[F.col("lang")].isNotNull())
              .withColumn(
                  "n_target",
                  F.floor(F.floor(F.lit(_MIX_BUDGET) * F.col("tot"))
                          * wmap[F.col("lang")]).cast("long")))
    sampled = kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"))
    return (counts.join(sampled, "lang", "left")
            .select("lang",
                    F.col("n_docs").cast("long").alias("n_docs"),
                    "n_target",
                    F.coalesce(F.col("n_sampled"), F.lit(0))
                    .cast("long").alias("n_sampled"),
                    (F.coalesce(F.col("n_sampled"), F.lit(0))
                     .cast("double") / F.col("n_docs"))
                    .alias("achieved_rate")))


@query(
    "corpus_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 7 = 0 THEN upper(text) ELSE text END AS text
      FROM documents WHERE doc_id % 10 <> 9
    ),
    new AS (
      SELECT doc_id, source, text FROM documents WHERE doc_id % 10 <> 0
    ),
    d AS (
      SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
             CASE WHEN o.doc_id IS NULL THEN 'added'
                  WHEN n.doc_id IS NULL THEN 'removed'
                  WHEN md5(coalesce(o.text, '')) <> md5(coalesce(n.text, ''))
                       THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    )
    SELECT dd.source, d.status, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM d JOIN documents dd ON d.doc_id = dd.doc_id
    GROUP BY dd.source, d.status
    """,
)
def _corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot corpus diff (the incremental-refresh
    audit: what must re-embed / re-dedup / re-score after a crawl
    refresh). Two deterministic snapshots derive from the documents
    table — the 'old' crawl is missing the doc_id %% 10 = 9 slice and
    carries pre-edit text (upper-cased) for the %% 7 = 0 slice, the
    'new' crawl is missing %% 10 = 0 — and
    operators/curation.snapshot_diff classifies every key as
    added / removed / changed / unchanged through one co-keyed
    full-outer join over 16-byte md5 digests (text never ships
    through the shuffle). The oracle replays the same derivation, so
    the hash match proves the join classification exactly. Upper() on
    the token-soup corpus is ASCII-only, so both engines agree on the
    mutated bytes."""
    from ..operators.curation import snapshot_diff

    docs = load_table(spark, sf_dir, "documents")
    old = (docs.filter(F.col("doc_id") % 10 != 9)
           .select("doc_id",
                   F.when(F.col("doc_id") % 7 == 0, F.upper("text"))
                    .otherwise(F.col("text")).alias("text")))
    new = docs.filter(F.col("doc_id") % 10 != 0).select("doc_id", "text")
    d = snapshot_diff(old, new)
    return (d.join(docs.select("doc_id", "source"), "doc_id")
            .groupBy("source", "status")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs")))


@query(
    "deletion_propagation_audit",
    oracle="""
    WITH forget AS (
      SELECT doc_id FROM documents WHERE doc_id % 37 = 0
    ),
    remaining AS (
      SELECT * FROM documents WHERE doc_id % 37 <> 0
    ),
    toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\\s+'),
                         t -> t <> '') AS toks,
             doc_id % 37 = 0 AS forgotten
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, forgotten, toks,
             unnest(range(0, (len(toks) + 7) // 8)) AS i
      FROM toks WHERE len(toks) > 0
    ),
    p AS (
      SELECT DISTINCT forgotten,
             substring(md5(array_to_string(
               toks[CAST(i * 8 + 1 AS INT):CAST(i * 8 + 8 AS INT)],
               ' ')), 1, 16) AS h
      FROM chunks
    ),
    fg AS (SELECT h FROM p WHERE forgotten),
    sv AS (SELECT h FROM p WHERE NOT forgotten)
    SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
           (SELECT COUNT(*) FROM forget) AS n_forgotten,
           (SELECT COUNT(*) FROM remaining) AS n_remaining,
           (SELECT COUNT(*) FROM remaining r
             JOIN forget f ON r.doc_id = f.doc_id) AS residue_docs,
           (SELECT COUNT(*) FROM fg WHERE h NOT IN (SELECT h FROM sv))
             AS n_passages_erased,
           (SELECT COUNT(*) FROM fg WHERE h IN (SELECT h FROM sv))
             AS n_passages_surviving_elsewhere
    """,
)
def _deletion_propagation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten propagation audit: apply a deletion
    request list (deterministic doc_id % 37 = 0) to the corpus and
    verify the cascade — zero residue rows in the retained set, plus
    the governance numbers a DPO actually asks for: how many of the
    forgotten documents' 8-token passages are ERASED outright vs
    still present verbatim in surviving documents (content that
    deletion of the requested rows alone cannot remove — the signal
    that passage-level scrubbing or dedup-aware deletion is needed).
    Plan: anti-join for the retained set, passage hashing in the
    scan stage (operators/dedup.passage_hashes), one shuffle on the
    16-hex hash for the erased/surviving split — at 100 TB the same
    shape as dedup_passage_exact."""
    from ..operators.dedup import passage_hashes

    docs = load_table(spark, sf_dir, "documents")
    forget = docs.filter(F.col("doc_id") % 37 == 0).select("doc_id")
    remaining = docs.filter(F.col("doc_id") % 37 != 0)
    residue = remaining.join(forget, "doc_id", "left_semi")

    ph = passage_hashes(docs).withColumn(
        "forgotten", F.col("doc_id") % 37 == 0)
    sides = (ph.select("passage_hash", "forgotten").distinct()
               .groupBy("passage_hash")
               .agg(F.max(F.when(F.col("forgotten"), 1).otherwise(0))
                     .alias("in_fg"),
                    F.max(F.when(~F.col("forgotten"), 1).otherwise(0))
                     .alias("in_sv")))
    erased = sides.filter((F.col("in_fg") == 1) & (F.col("in_sv") == 0))
    shared = sides.filter((F.col("in_fg") == 1) & (F.col("in_sv") == 1))

    def cnt(df, name):
        return df.agg(F.count(F.lit(1)).alias(name))

    out = (cnt(docs, "n_docs")
           .crossJoin(F.broadcast(cnt(forget, "n_forgotten")))
           .crossJoin(F.broadcast(cnt(remaining, "n_remaining")))
           .crossJoin(F.broadcast(cnt(residue, "residue_docs")))
           .crossJoin(F.broadcast(cnt(erased, "n_passages_erased")))
           .crossJoin(F.broadcast(
               cnt(shared, "n_passages_surviving_elsewhere"))))
    return out.select("n_docs", "n_forgotten", "n_remaining",
                      "residue_docs", "n_passages_erased",
                      "n_passages_surviving_elsewhere")
