"""BPE vocabulary induction vs an independent reference
implementation (the Sennrich et al. 2016 algorithm written the
textbook way: dict-of-tuples word table, get_stats / merge_vocab),
so the distributed string-sentinel formulation is validated against
the ALGORITHM, not just against its own SQL twin."""

from __future__ import annotations

import re


def _ref_bpe(word_freqs: dict[str, int], n_merges: int):
    """Plain-Python BPE: returns [(rank, left, right, count)]."""
    vocab = {tuple(list(w) + ["</w>"]): f for w, f in word_freqs.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        stats: dict = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                stats[pair] = stats.get(pair, 0) + f
        if not stats:
            break
        # count DESC, pair ASC — the operator's tie-break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        (x, y), cnt = best
        merges.append((rank, x, y, cnt))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i < len(syms) - 1
                        and syms[i] == x and syms[i + 1] == y):
                    out.append(x + y)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = f
        vocab = new_vocab
    return merges


def test_bpe_merges_match_reference_implementation(spark):
    """Same corpus, two implementations, identical merge tables —
    including a run-of-repeats word ('aaaa') that exercises the
    greedy non-overlapping merge semantics."""
    from flink_precisely_demo_spark.operators.bpe import bpe_merges

    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "wide wider widest wide",
        "aaaa aaaa aa banana bandana",
        "low new wide aaaa banana",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = [(r["rank"], r["left"], r["right"], r["pair_count"])
           for r in bpe_merges(df, "text", 8).orderBy("rank").collect()]

    freqs: dict[str, int] = {}
    for t in texts:
        for w in re.split(r"[ \t\n\x0b\f\r]+", t.lower()):
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    want = _ref_bpe(freqs, 8)
    assert got == want


def test_bpe_corpus_run_matches_reference(spark):
    """The sf0.001 documents corpus through both implementations."""
    from flink_precisely_demo_spark.operators.bpe import bpe_merges
    from flink_precisely_demo_spark.sources.parquet import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = [(r["rank"], r["left"], r["right"], r["pair_count"])
           for r in bpe_merges(docs, "text", 5).orderBy("rank").collect()]
    freqs: dict[str, int] = {}
    for row in docs.select("text").collect():
        if row["text"] is None:
            continue
        for w in re.split(r"[ \t\n\x0b\f\r]+", row["text"].lower()):
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    assert got == _ref_bpe(freqs, 5)


def test_bpe_distributed_path_equals_driver_path(spark):
    """The scale-adaptive merge loop (r15): the distributed rounds
    (forced via driver_vocab_max=0) and the driver-side loop over the
    collected word table must learn the identical merge table and
    produce the identical final word segmentation."""
    from flink_precisely_demo_spark.operators.bpe import bpe_train
    from flink_precisely_demo_spark.sources.parquet import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    m_drv, w_drv = bpe_train(docs, "text", 6, min_freq=2)
    m_dist, w_dist = bpe_train(docs, "text", 6, min_freq=2,
                               driver_vocab_max=0)
    assert sorted(map(tuple, m_drv.collect())) == \
        sorted(map(tuple, m_dist.collect()))
    assert sorted(map(tuple, w_drv.collect())) == \
        sorted(map(tuple, w_dist.collect()))
