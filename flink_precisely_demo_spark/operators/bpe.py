"""Distributed BPE vocabulary induction (Sennrich, Haddow & Birch,
"Neural Machine Translation of Rare Words with Subword Units", ACL
2016) — the canonical tokenizer-training step of an LLM data
pipeline, expressed Spark-first:

- **One corpus-sized pass, ever.** BPE operates on the WORD
  FREQUENCY TABLE, not the corpus: the only fact-scale work is the
  `groupBy(word).count()` (map-side combined). Everything after runs
  on the vocabulary-bounded table — at 100 TB the corpus is petabytes
  but the word table is millions of rows, which is the entire reason
  this algorithm scales.
- **Merge iterations stay lazy and distributed.** Each round counts
  adjacent symbol pairs (posexplode + lead — overlapping counts,
  faithful to the reference implementation's `get_stats`), picks the
  best pair by (count DESC, pair ASC — a deterministic tie-break, so
  every engine and partitioning converges to the same vocabulary),
  and applies the merge as a LITERAL string replacement broadcast
  onto the word table. No driver-side loop state: the 1-row best
  pair joins in as data (`crossJoin(broadcast(best))`), and each
  round's word table is `localCheckpoint`ed to cut the exponential
  lineage re-evaluation (the PageRank house pattern).
- **Sentinel encoding makes greedy merging a string op.** A word's
  symbol sequence is stored as ``\\x01sym\\x02`` units, so the merge
  "replace adjacent pair (x, y) left-to-right, non-overlapping" is
  exactly one literal `replace()` of ``\\x01x\\x02\\x01y\\x02`` with
  ``\\x01xy\\x02`` — the same greedy semantics as the reference
  merge, identical in Spark and any SQL engine, with no regex
  metacharacter hazards and no shared boundary between adjacent
  matches. (A token whose literal text collides with the ``</w>``
  end-of-word marker could in principle alias a merged symbol; both
  engines compute the identical result either way, so parity is
  unaffected.)

No reference-engine counterpart (SURVEY.md §2.3 extension scope).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

S1 = "\x01"   # symbol start sentinel
S2 = "\x02"   # symbol end sentinel
EOW = "</w>"  # end-of-word marker symbol


def _encode_word(col):
    """token string -> sentinel-encoded symbol sequence:
    characters + the end-of-word marker, each wrapped \\x01..\\x02."""
    # split(limit=-1) keeps a trailing empty element — filter it out
    chars = F.filter(F.split(col, "(?!^)"), lambda s: s != "")
    syms = F.concat(chars, F.array(F.lit(EOW)))
    return F.array_join(
        F.transform(syms, lambda s: F.concat(F.lit(S1), s, F.lit(S2))),
        "")


def word_frequency_table(df: DataFrame, text_col: str = "text",
                         min_freq: int = 1) -> DataFrame:
    """(word, freq, enc) — the single corpus-sized aggregation.

    ``min_freq`` is the standard vocabulary floor real tokenizer
    trainers apply before merging (pair statistics then come from
    the Zipf head rather than the hapax tail — an explicit, standard
    approximation): it bounds the word table by the repeated
    vocabulary instead of the corpus, which on an adversarial
    unique-token corpus is the difference between a vocab-bounded
    iteration and one that scales with the data (measured: the
    unfloored sf1 sweep oracle grew past 45 GB before being
    killed)."""
    from ..functions.text import tokens

    words = (df.filter(F.col(text_col).isNotNull())
               .select(F.explode(tokens(text_col)).alias("word"))
               .groupBy("word")
               .agg(F.count(F.lit(1)).cast("long").alias("freq")))
    if min_freq > 1:
        words = words.filter(F.col("freq") >= min_freq)
    return words.withColumn("enc", _encode_word(F.col("word")))


def _pair_counts(words: DataFrame) -> DataFrame:
    """(x, y, cnt): adjacent symbol pairs weighted by word frequency,
    overlapping occurrences counted (reference get_stats)."""
    syms = words.select(
        "word", "freq",
        F.split(F.regexp_replace("enc", f"^{S1}|{S2}$", ""),
                f"{S2}{S1}").alias("syms"))
    w = Window.partitionBy("word").orderBy("pos")
    pairs = (syms.select("word", "freq",
                         F.posexplode("syms").alias("pos", "x"))
                 .withColumn("y", F.lead("x").over(w))
                 .filter(F.col("y").isNotNull()))
    return pairs.groupBy("x", "y").agg(
        F.sum("freq").cast("long").alias("cnt"))


def bpe_merges(df: DataFrame, text_col: str = "text",
               n_merges: int = 10, min_freq: int = 1) -> DataFrame:
    """Learn ``n_merges`` BPE merge rules; returns (rank, left,
    right, pair_count) — rank 1 is the first (highest-count) merge.
    Deterministic: ties break on (left, right) lexicographically."""
    return bpe_train(df, text_col, n_merges, min_freq)[0]


def bpe_train(df: DataFrame, text_col: str = "text",
              n_merges: int = 10,
              min_freq: int = 1) -> tuple[DataFrame, DataFrame]:
    """(merges, encoded_words): the merge table plus the word table
    AFTER all merges were applied — i.e. the corpus vocabulary in its
    learned subword segmentation, ready for encoding."""
    words = word_frequency_table(df, text_col, min_freq) \
        .localCheckpoint(eager=True)
    merges = []
    for rank in range(1, n_merges + 1):
        best = (_pair_counts(words)
                .orderBy(F.desc("cnt"), "x", "y").limit(1)
                .select(F.lit(rank).alias("rank"),
                        F.col("x").alias("left"),
                        F.col("y").alias("right"),
                        F.col("cnt").alias("pair_count"))
                .localCheckpoint(eager=True))
        merges.append(best)
        pat = F.concat(F.lit(S1), F.col("left"), F.lit(S2),
                       F.lit(S1), F.col("right"), F.lit(S2))
        rep = F.concat(F.lit(S1), F.col("left"), F.col("right"),
                       F.lit(S2))
        words = (words.crossJoin(F.broadcast(
                    best.select("left", "right")))
                 .select("word", "freq",
                         F.replace("enc", pat, rep).alias("enc"))
                 .localCheckpoint(eager=True))
    out = merges[0]
    for m in merges[1:]:
        out = out.unionAll(m)
    return out, words


def subword_counts(words: DataFrame) -> DataFrame:
    """(word, freq, n_subwords) from an encoded word table: the
    symbol count is the number of \\x01 sentinels — pure length
    arithmetic, no split."""
    return words.select(
        "word", "freq",
        ((F.length("enc")
          - F.length(F.replace("enc", F.lit(S1), F.lit(""))))
         .cast("long").alias("n_subwords")))
