"""BPE trainer/applier: hand-computed golden merges on the classic
Sennrich word table, greedy-apply semantics, determinism, the
word-table cap, and the distributed token-count path."""

import pytest

from rust_dms_cdc_operator_spark.operators.bpe import (
    EOW,
    bpe_segment_word,
    bpe_token_count,
    bpe_vocab,
    train_bpe,
    word_frequency_table,
)

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "low low low low low"),
        (2, "lower lower"),
        (3, "newest newest newest newest newest newest"),
        (4, "widest widest widest"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_frequency_table_cap_and_order(corpus):
    wf = word_frequency_table(corpus, "text", max_word_types=3)
    assert wf == [("newest", 6), ("low", 5), ("widest", 3)]
    # deterministic tie-break on the word itself
    full = word_frequency_table(corpus, "text", max_word_types=10)
    assert full == [
        ("newest", 6), ("low", 5), ("widest", 3), ("lower", 2),
    ]
    with pytest.raises(ValueError):
        word_frequency_table(corpus, "text", max_word_types=0)


def test_train_bpe_golden_merges(corpus):
    """First six merges, hand-computed (count desc, pair-lexicographic
    ties): es, est, est</w>, lo, low, ew."""
    merges = train_bpe(corpus, num_merges=6, max_word_types=100)
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", EOW),
        ("l", "o"),
        ("lo", "w"),
        ("e", "w"),
    ]
    assert bpe_vocab(merges) == ["es", "est", "est" + EOW, "lo", "low", "ew"]
    # determinism: same corpus, same merges
    assert train_bpe(corpus, num_merges=6, max_word_types=100) == merges


def test_train_bpe_stops_on_singletons(spark):
    """No pair with count >= 2 -> training stops early instead of
    memorizing the tail."""
    docs = spark.createDataFrame(
        [(1, "ab cd ef")], "doc_id long, text string"
    )
    merges = train_bpe(docs, num_merges=50)
    assert merges == []


def test_bpe_segment_greedy_rank_order(corpus):
    merges = train_bpe(corpus, num_merges=6, max_word_types=100)
    ranks = {p: i for i, p in enumerate(merges)}
    # unseen word segments through learned subwords: low + est</w>
    assert bpe_segment_word("lowest", ranks) == ["low", "est" + EOW]
    assert bpe_segment_word("newest", ranks) == ["n", "ew", "est" + EOW]
    assert bpe_segment_word("low", ranks) == ["low", EOW]
    # nothing applies: falls back to chars + EOW
    assert bpe_segment_word("xyz", ranks) == ["x", "y", "z", EOW]
    assert bpe_segment_word("", ranks) == [EOW]


def test_bpe_token_count_distributed(spark, corpus):
    merges = train_bpe(corpus, num_merges=6, max_word_types=100)
    docs = spark.createDataFrame(
        [
            (10, "lowest newest"),   # 2 + 3
            (11, "low low"),         # ["low", EOW] x2 -> 4
            (12, None),              # null text -> 0
            (13, ""),                # no words -> 0
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe_token_count(docs, merges).collect()
    }
    assert got == {10: 5, 11: 4, 12: 0, 13: 0}


def test_bpe_feeds_sequence_packing(spark, corpus):
    """The pretraining chain: train BPE → count tokens per doc →
    pack_sequences on the BPE counts. Pack offsets must be the exact
    running BPE-token prefix sums modulo the budget — i.e. the two
    operators agree on where every document's tokens land."""
    from rust_dms_cdc_operator_spark.operators.bpe import (
        bpe_token_count,
        train_bpe,
    )
    from rust_dms_cdc_operator_spark.operators.split import pack_sequences

    merges = train_bpe(corpus, num_merges=6, max_word_types=100)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["lowest newest", "low low low", "widest lower", "newest",
             "low lower lowest", "widest widest"]
        )],
        "doc_id long, text string",
    )
    counted = bpe_token_count(docs, merges)
    packed = {
        r.doc_id: r
        for r in pack_sequences(
            counted, "doc_id", "n_bpe_tokens", budget=7
        ).collect()
    }
    counts = {
        r.doc_id: r.n_bpe_tokens for r in counted.collect()
    }
    prefix = 0
    for did in sorted(counts):
        assert packed[did].pack_id == prefix // 7, did
        assert packed[did].pack_offset == prefix % 7, did
        prefix += counts[did]


def test_bpe_compression_monotone(corpus, spark):
    """More merges never increase the token count of corpus text —
    the property that makes BPE a compressor."""
    docs = spark.createDataFrame(
        [(1, "newest widest lower low lowest")],
        "doc_id long, text string",
    )
    prev = None
    for k in (0, 2, 4, 6):
        merges = train_bpe(corpus, num_merges=k, max_word_types=100)
        n = bpe_token_count(docs, merges).collect()[0].n_bpe_tokens
        if prev is not None:
            assert n <= prev, (k, n, prev)
        prev = n


def test_bpe_oracle_sql_matches_python_segmenter(spark):
    """The docs_bpe_tokens oracle's recursive-CTE greedy apply must
    reproduce bpe_segment_word EXACTLY — same rank-order rule, same
    first-position tie-break — on adversarial words: unseen chars,
    single chars, words where two different merge orders would give
    different lengths if the tie rule were wrong."""
    import duckdb

    from rust_dms_cdc_operator_spark.inventory_llm import (
        _bpe_tokens_oracle_sql,
    )
    from rust_dms_cdc_operator_spark.operators.bpe import (
        bpe_segment_word,
    )

    merges = [("e", "r"), ("e", "</w>"), ("l", "l"), ("ll", "o"),
              ("h", "e"), ("he", "llo"), ("r", "e</w>")]
    ranks = {p: i for i, p in enumerate(merges)}
    words = ["hello", "here", "er", "x", "ll", "lll", "eeee", "rere"]
    want = {w: len(bpe_segment_word(w, ranks)) for w in words}

    con = duckdb.connect()
    rows = ", ".join(f"({i}, '{w}')" for i, w in enumerate(words))
    con.sql(f"CREATE VIEW documents AS SELECT * FROM (VALUES {rows}) "
            "t(doc_id, text)")
    got = dict(
        con.sql(_bpe_tokens_oracle_sql(merges)).fetchall()
    )
    # one word per doc → doc count == word count
    for i, w in enumerate(words):
        assert got[i] == want[w], (w, got[i], want[w])
