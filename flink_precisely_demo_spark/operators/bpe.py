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
- **Merge iterations stay distributed and cheap.** Each round counts
  adjacent symbol pairs with an ARRAY-LEVEL transform over the
  symbol sequence (overlapping counts, faithful to the reference
  implementation's `get_stats`) — no per-word window, so the round's
  only exchange is the map-side-combined (x, y) aggregation — and
  picks the best pair by (count DESC, pair ASC — a deterministic
  tie-break, so every engine and partitioning converges to the same
  vocabulary). The 1-row winner is collected to the driver (bounded
  by construction: exactly one row per round) and applied as a
  LITERAL string replacement — a narrow projection, no broadcast
  machinery, no per-round materialization. Only the initial word
  table is `localCheckpoint`ed; the ≤ n_merges pending replaces are
  re-applied lazily per round, which is linear cheap string work on
  the vocab-bounded table instead of n_merges materialization jobs.
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

from pyspark.sql import DataFrame
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
    overlapping occurrences counted (reference get_stats).

    Adjacency comes straight from the symbol ARRAY (transform over
    the first n-1 positions pairing each symbol with its successor),
    not from a posexplode + per-word window: the window forced an
    exchange on `word` before any counting; this shape's only
    exchange is the partial-aggregated (x, y) count itself."""
    syms = words.select(
        "freq",
        F.split(F.regexp_replace("enc", f"^{S1}|{S2}$", ""),
                f"{S2}{S1}").alias("syms"))
    pairs = syms.select(
        "freq",
        F.explode(F.expr(
            "transform(slice(syms, 1, greatest(size(syms) - 1, 0)), "
            "(s, i) -> struct(s AS x, syms[i + 1] AS y))")).alias("p"))
    return (pairs.select(F.col("p.x").alias("x"),
                         F.col("p.y").alias("y"), "freq")
            .groupBy("x", "y")
            .agg(F.sum("freq").cast("long").alias("cnt")))


def bpe_merges(df: DataFrame, text_col: str = "text",
               n_merges: int = 10, min_freq: int = 1) -> DataFrame:
    """Learn ``n_merges`` BPE merge rules; returns (rank, left,
    right, pair_count) — rank 1 is the first (highest-count) merge.
    Deterministic: ties break on (left, right) lexicographically."""
    return bpe_train(df, text_col, n_merges, min_freq)[0]


#: Vocab-size ceiling for the driver-side merge loop. The word table
#: is vocabulary-bounded (min_freq floors it at the repeated Zipf
#: head), typically thousands of rows — at that size ten distributed
#: rounds are pure job-scheduling overhead (~0.4 s each measured on a
#: 31-row table), while the identical loop over a collected table is
#: microseconds. Above the ceiling (huge corpora, low floors) the
#: distributed loop runs unchanged, so the collect stays bounded by
#: this constant by construction. ~100 B/row => the collect is ≤ a
#: few MB.
DRIVER_VOCAB_MAX = 65536


def _driver_merge_loop(rows: list, n_merges: int):
    """The merge loop on a collected word table — the exact same
    algorithm as the distributed rounds (overlapping pair counts
    weighted by freq; winner by count DESC then pair ASC; literal
    non-overlapping left-to-right replace, which is what both
    str.replace and SQL replace do; pair exhaustion empties the
    table, mirroring the SQL twin's CROSS JOIN with an empty
    winner). Python tuple comparison of str sorts by code point,
    which for valid strings equals Spark's UTF8 binary sort order,
    so tie-breaks agree."""
    table: dict[str, tuple[int, str]] = {
        r["word"]: (r["freq"], r["enc"]) for r in rows}
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        stats: dict[tuple[str, str], int] = {}
        for freq, enc in table.values():
            syms = enc[1:-1].split(S2 + S1)
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                stats[pair] = stats.get(pair, 0) + freq
        if not stats:
            table = {}
            break
        (x, y), cnt = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, x, y, cnt))
        pat, rep = f"{S1}{x}{S2}{S1}{y}{S2}", f"{S1}{x}{y}{S2}"
        table = {w: (f, e.replace(pat, rep))
                 for w, (f, e) in table.items()}
    return merges, table


def bpe_train(df: DataFrame, text_col: str = "text",
              n_merges: int = 10, min_freq: int = 1,
              driver_vocab_max: int = DRIVER_VOCAB_MAX,
              ) -> tuple[DataFrame, DataFrame]:
    """(merges, encoded_words): the merge table plus the word table
    AFTER all merges were applied — i.e. the corpus vocabulary in its
    learned subword segmentation, ready for encoding.

    The corpus-sized aggregation always runs distributed. The merge
    rounds are scale-adaptive: a word table at or under
    ``driver_vocab_max`` rows (checked on the materialized
    checkpoint, so the collect is bounded by construction) iterates
    driver-side; a larger one iterates distributed — one job per
    round (pair counts + TakeOrdered of the single winner, whose
    values become literal replace arguments: a narrow projection, no
    broadcast build, no per-round checkpoint)."""
    spark = df.sparkSession
    words = word_frequency_table(df, text_col, min_freq) \
        .localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    if words.count() <= driver_vocab_max:
        merges, table = _driver_merge_loop(words.collect(), n_merges)
        words = spark.createDataFrame(
            [(w, f, e) for w, (f, e) in table.items()],
            "word string, freq long, enc string")
    else:
        for rank in range(1, n_merges + 1):
            rows = (_pair_counts(words)
                    .orderBy(F.desc("cnt"), "x", "y").limit(1)
                    .collect())
            if not rows:
                # pair exhaustion: the SQL twin's CROSS JOIN with an
                # empty winner empties the word table — mirror that
                words = words.limit(0)
                break
            x, y = rows[0]["x"], rows[0]["y"]
            merges.append((rank, x, y, int(rows[0]["cnt"])))
            words = words.select(
                "word", "freq",
                F.replace("enc", F.lit(f"{S1}{x}{S2}{S1}{y}{S2}"),
                          F.lit(f"{S1}{x}{y}{S2}")).alias("enc"))
    out = spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count long")
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
