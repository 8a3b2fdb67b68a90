"""Byte-pair-encoding tokenizer training and application, the
Spark-first way (Sennrich et al., "Neural Machine Translation of Rare
Words with Subword Units", ACL 2016).

Scale shape — the reason this works at 100 TB: classic BPE never
iterates over the corpus. It iterates over the WORD-FREQUENCY TABLE,
which is bounded by vocabulary, not corpus size. So the split is:

1. **Distributed** (the only part that touches all the bytes): one
   explode + groupBy count over whitespace words — a single shuffle
   keyed by word, partial-aggregated map-side. The table is capped at
   ``max_word_types`` by count (deterministic tie-break on the word)
   before it reaches the driver: a few hundred thousand (word, count)
   rows regardless of whether the corpus is 1 GB or 100 TB.
2. **Driver-side, bounded**: the merge loop runs over that table —
   ``num_merges`` iterations of pair-count/argmax/merge on <=
   ``max_word_types`` symbol sequences. Pair counts are maintained
   INCREMENTALLY (only words containing the merged pair are
   re-scanned), the standard trick that makes thousands of merges
   cheap. Determinism: ties break on (count desc, pair lexicographic)
   — same merges on any cluster layout, because the input table is
   itself deterministic.
3. **Distributed again** (apply): the learned merge ranking
   broadcasts (a dict of <= num_merges entries) and
   :func:`bpe_token_count` / :func:`bpe_segment_batch` greedily apply
   it per word inside an Arrow-batched ``mapInPandas`` — embarrassing
   parallelism, no shuffle. A per-batch word-level memo exploits Zipf
   (most tokens are the same few words) so the greedy merge runs once
   per distinct word per batch, not once per occurrence.

The reference (`/root/reference`, a CDC replication tool) has no
tokenizer; this belongs to the training-data operator pack the brief
adds on top of reference parity.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: marks the end of a word so merges cannot cross word boundaries and
#: a word-final subword is distinct from the same chars mid-word
EOW = "</w>"


def word_frequency_table(
    docs: DataFrame, text_col: str, max_word_types: int
) -> list[tuple[str, int]]:
    """The one distributed pass: whitespace words → (word, count),
    capped at ``max_word_types`` rows by (count desc, word asc) — a
    deterministic total order, so the trained tokenizer does not
    depend on partitioning. Returns the bounded table driver-side
    (this is the ONLY collect in the trainer, and it is capped by
    construction)."""
    if max_word_types <= 0:
        raise ValueError("max_word_types must be positive")
    wf = (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.col(text_col), r"\s+"),
                    lambda w: w != F.lit(""),
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(max_word_types)
    )
    return [(r["word"], int(r["cnt"])) for r in wf.collect()]


def _pair_stats(
    seqs: dict[str, tuple[tuple[str, ...], int]],
) -> tuple[dict[tuple[str, str], int], dict[tuple[str, str], set]]:
    """Pair frequency table plus the inverted index pair → words
    containing it — the index is what makes each merge step cost
    O(words actually containing the pair), not O(vocabulary)."""
    counts: dict[tuple[str, str], int] = {}
    index: dict[tuple[str, str], set] = {}
    for w, (sym, cnt) in seqs.items():
        for i in range(len(sym) - 1):
            p = (sym[i], sym[i + 1])
            counts[p] = counts.get(p, 0) + cnt
            index.setdefault(p, set()).add(w)
    return counts, index


def _merge_word(
    sym: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    out: list[str] = []
    i, n = 0, len(sym)
    a, b = pair
    while i < n:
        if i + 1 < n and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    max_word_types: int = 100_000,
) -> list[tuple[str, str]]:
    """Train BPE merges: distributed word-frequency pass, then the
    bounded driver merge loop with incremental pair-count updates.
    Returns the ordered merge list (rank = position). Stops early
    when no pair occurs twice — merging singletons would just memorize
    the tail of the word table."""
    table = word_frequency_table(docs, text_col, max_word_types)
    # word → (symbol tuple, count); chars + end-of-word marker
    seqs: dict[str, tuple[tuple[str, ...], int]] = {
        w: (tuple(w) + (EOW,), c) for w, c in table if w
    }
    counts, index = _pair_stats(seqs)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not counts:
            break
        # deterministic argmax: count desc, then pair lexicographic
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < 2:
            break
        merges.append(best)
        # incremental update via the inverted index: only the words
        # that actually contain the pair are touched
        for w in list(index.get(best, ())):
            sym, cnt = seqs[w]
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] -= cnt
                if counts[p] <= 0:
                    counts.pop(p, None)
                ws = index.get(p)
                if ws is not None:
                    ws.discard(w)
                    if not ws:
                        del index[p]
            new = _merge_word(sym, best)
            seqs[w] = (new, cnt)
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                counts[p] = counts.get(p, 0) + cnt
                index.setdefault(p, set()).add(w)
    return merges


def bpe_segment_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Greedy BPE apply for one word: repeatedly merge the
    lowest-rank adjacent pair — the exact inference rule of the
    trained tokenizer (rank order, not left-to-right order)."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


BPE_COUNT_SCHEMA_SUFFIX = T.StructField("n_bpe_tokens", T.LongType(), False)


def bpe_token_count(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distributed apply: (id, n_bpe_tokens) per document. The merge
    ranking rides the closure as a broadcast-sized dict; segmentation
    is greedy per DISTINCT word per Arrow batch (Zipf memo), then a
    vectorized map over the word stream. No shuffle — pure map."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            BPE_COUNT_SCHEMA_SUFFIX,
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}

        def count_one(text: str) -> int:
            if text is None:
                return 0
            total = 0
            for w in text.split():
                c = memo.get(w)
                if c is None:
                    c = len(bpe_segment_word(w, ranks))
                    memo[w] = c
                total += c
            return total

        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "n_bpe_tokens": [
                        count_one(t) for t in pdf[text_col]
                    ],
                }
            )

    return docs.mapInPandas(batches, out_schema)


def bpe_vocab(merges: list[tuple[str, str]]) -> list[str]:
    """The subword vocabulary the merge list induces (merge products
    in rank order) — what a caller ships to an embedding layer."""
    return [a + b for a, b in merges]
