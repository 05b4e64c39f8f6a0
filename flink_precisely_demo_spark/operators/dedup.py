"""Deduplication operators for training-data pipelines (SURVEY.md §2.3).

Four tiers, all shuffle-conscious:

- exact_dedup: hash-groupBy on a content fingerprint. One shuffle on
  the fingerprint; at 100 TB the fingerprint (16 hex chars) shuffles,
  not the document bodies, when ``payload_cols`` is pruned.
- minhash_near_dup_pairs: shingle -> per-seed min-hash -> band ->
  bucket join. Candidate pairs only ever meet inside a band bucket
  (the LSH trick), so the join is an equi-join on (band_id, band_hash)
  — never a cross join. Classic MinHash/LSH as in Broder '97.
- simhash_fingerprint: per-token hash bit-majority -> 16-bit
  fingerprint; near-dups share fingerprints (Charikar '02).
- ngram_jaccard_pairs: exact Jaccard on shingle sets via an inverted
  index self-join (|A∩B| from a shingle->doc explode, |A∪B| by
  inclusion-exclusion) — no pairwise cross join; cost is bounded by
  shingle collision lists, the standard sparse-similarity-join shape.

Portability: every hash is derived from md5 hex (identical in any
engine) rather than Spark's murmur3, so the DuckDB oracles reproduce
results bit-for-bit. md5-on-string is marginally slower than
murmur3 but still JVM-side codegen; at 100 TB the cost is dominated
by the shuffle, which this layout minimizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import doc_fingerprint, tokens


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative per normalized-content
    fingerprint. Returns (fingerprint, keep_id, n_copies)."""
    return (df.select(doc_fingerprint(text_col).alias("fingerprint"),
                      F.col(id_col))
              .groupBy("fingerprint")
              .agg(F.min(id_col).alias("keep_id"),
                   F.count(F.lit(1)).alias("n_copies")))


def word_shingles(text_col: str = "text", n: int = 3) -> Column:
    """Distinct word n-gram shingles of the lowercased text.

    Built from array slices of the token array — pure built-ins.
    Documents shorter than n tokens yield their full token string as
    the single shingle (so no document silently drops out).
    """
    toks = tokens(text_col)
    k = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(k - (n - 1), F.lit(1)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return F.array_distinct(grams)


def _hex_bucket(c: Column, seed: int, width: int = 12) -> Column:
    """Portable 48-bit hash of a string under a seed: md5 of the
    seeded string, first `width` hex chars. Stays a hex string —
    min() over hex strings == min() over the underlying integer."""
    return F.substring(F.md5(F.concat(F.lit(f"{seed}:"), c)), 1, width)


def minhash_signature(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", num_hashes: int = 16,
                      shingle_n: int = 3) -> DataFrame:
    """(id, seed, minhash) — one row per document per hash seed.

    explode(shingles) -> min(hash) per seed: Spark computes all seeds
    in one pass over the exploded shingles (a single groupBy(id)
    with num_hashes MIN aggregates — map-side partial agg makes the
    shuffle tiny: num_hashes short strings per doc).
    """
    ex = df.select(F.col(id_col), F.explode(word_shingles(text_col, shingle_n)).alias("sh"))
    aggs = [F.min(_hex_bucket(F.col("sh"), s)).alias(f"mh_{s}")
            for s in range(num_hashes)]
    sig = ex.groupBy(id_col).agg(*aggs)
    # unpivot to long form (id, seed, minhash)
    pairs = F.array(*[
        F.struct(F.lit(s).alias("seed"), F.col(f"mh_{s}").alias("minhash"))
        for s in range(num_hashes)])
    return (sig.select(id_col, F.explode(pairs).alias("p"))
               .select(id_col, "p.seed", "p.minhash"))


def minhash_near_dup_pairs(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", num_hashes: int = 16,
                           bands: int = 4, shingle_n: int = 3) -> DataFrame:
    """Candidate near-duplicate pairs (a < b) sharing >= 1 LSH band.

    num_hashes minhashes split into `bands` bands of r = num_hashes /
    bands rows; docs collide when an entire band matches. The pair
    join is an equi-join on (band_id, band_key): at 100 TB the only
    shuffle keys are short band digests, and AQE's skew-join handles
    hot buckets (e.g. boilerplate documents).
    """
    r = num_hashes // bands
    sig = minhash_signature(df, text_col, id_col, num_hashes, shingle_n)
    banded = (sig.withColumn("band_id", (F.col("seed") / r).cast("int"))
                 .groupBy(id_col, "band_id")
                 .agg(F.concat_ws("|", F.array_sort(
                     F.collect_list(F.concat_ws(":", "seed", "minhash"))))
                      .alias("band_key")))
    a = banded.select(F.col(id_col).alias("a"), "band_id", "band_key")
    b = banded.select(F.col(id_col).alias("b"), "band_id", "band_key")
    return (a.join(b, ["band_id", "band_key"])
             .filter(F.col("a") < F.col("b"))
             .select("a", "b").distinct())


def simhash_fingerprint(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", bits: int = 16) -> DataFrame:
    """16-bit SimHash: bit j of the fingerprint is the majority vote
    of bit j across the md5-derived hashes of the document's distinct
    tokens. Computed with explode + conditional sums — one shuffle on
    doc_id with map-side combine. Returns (id, simhash)."""
    tok = df.select(F.col(id_col),
                    F.explode(F.array_distinct(tokens(text_col))).alias("t"))
    # 16 bits from the first 4 md5 hex chars of each token
    h = F.conv(F.substring(F.md5(F.col("t")), 1, 4), 16, 10).cast("int")
    tok = tok.withColumn("h", h)
    votes = [
        F.sum(F.when(F.shiftright(F.col("h"), j).bitwiseAND(1) == 1, 1)
               .otherwise(-1)).alias(f"v_{j}")
        for j in range(bits)]
    agg = tok.groupBy(id_col).agg(*votes)
    fp = F.lit(0)
    for j in range(bits):
        fp = fp + F.when(F.col(f"v_{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return agg.select(id_col, fp.cast("int").alias("simhash"))


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", shingle_n: int = 3,
                        threshold: float = 0.8) -> DataFrame:
    """Exact Jaccard >= threshold pairs via inverted-index self-join.

    |A ∩ B| = count of shared shingles (group the exploded index by
    pair); |A ∪ B| = |A| + |B| − |A∩B|. The self-join key is the
    shingle itself — pairs that share nothing never meet. Returns
    (a, b, jaccard) with a < b; jaccard rounded to 6 dp.
    """
    sh = df.select(F.col(id_col),
                   F.explode(word_shingles(text_col, shingle_n)).alias("sh"))
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("a"), "sh")
    b = sh.select(F.col(id_col).alias("b"), "sh")
    inter = (a.join(b, "sh")
              .filter(F.col("a") < F.col("b"))
              .groupBy("a", "b")
              .agg(F.count(F.lit(1)).alias("n_common")))
    sa = sizes.select(F.col(id_col).alias("a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("n_sh").alias("n_b"))
    j = (inter.join(sa, "a").join(sb, "b")
              .withColumn("jaccard",
                          F.round(F.col("n_common") /
                                  (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6)))
    return (j.filter(F.col("jaccard") >= threshold)
             .select("a", "b", "jaccard"))
