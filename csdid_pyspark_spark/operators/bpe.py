"""Distributed BPE tokenizer training (merge-rule learning) on the
engine.

The textbook algorithm (Sennrich et al. 2016): represent each distinct
word as a symbol sequence, repeatedly count adjacent symbol pairs
(weighted by word frequency) and merge the most frequent pair. The
scale design is the one real tokenizer trainers use: the corpus is
scanned ONCE to build the (word, count) vocabulary table; every merge
iteration then runs on that vocabulary — an explode + map-side-combine
groupBy per merge, data volume O(distinct words), never the corpus.
At 100 TB the vocab table is millions of rows against billions of
documents, so k merges cost k tiny shuffles after one corpus pass.

Everything is JVM expressions (split / transform / element_at /
replace) — no Python row funcs. Merging is greedy left-to-right
non-overlapping via a two-pass delimiter-safe replace (see
``_merge_pair`` for why one Java replace-all pass skips alternating
occurrences and why two passes reach the textbook fixpoint).

Determinism: pair counts are exact integers; the winning pair breaks
ties by (count desc, pair asc) — so the learned merge table is
bit-reproducible and carries a pinned VALUES golden oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# sequence(1, 0) is DESCENDING in Spark, so single-symbol words need
# the explicit empty-array guard
_PAIRS_EXPR = (
    "if(size(_syms) < 2, array(), "
    "transform(sequence(1, size(_syms) - 1), "
    "i -> concat(element_at(_syms, i), ' ', element_at(_syms, i + 1))))"
)


def _merge_pair(col, pair: str, joined: str):
    """Merge every non-overlapping ' left right ' occurrence in a
    space-padded symbol string. Java's replace-all consumes the
    trailing delimiter of each match, so in 'a b a b' the SECOND (a,b)
    loses its leading space and is skipped — one pass merges only
    alternating members of a run of occurrences. A second identical
    pass catches every survivor (each now sits between already-merged
    neighbors with clean delimiters), and merging cannot create a new
    left-right adjacency (the merged symbol separates its neighbors),
    so two passes reach the same no-adjacent-pair fixpoint as the
    published single left-to-right scan. Piece counts match textbook
    BPE everywhere; inside a uniform run of one repeated symbol the
    GROUPING may differ (e.g. 'a a a a a' -> [aa, a, aa] vs textbook
    [aa, aa, a]) — same piece count, documented tradeoff for keeping
    the merge a pure codegen'd expression."""
    one = F.replace(col, F.lit(f" {pair} "), F.lit(f" {joined} "))
    return F.replace(one, F.lit(f" {pair} "), F.lit(f" {joined} "))


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The single corpus-scale pass: whitespace word frequencies."""
    return (
        docs.select(F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )


def train_bpe(
    docs: DataFrame, text_col: str = "text", n_merges: int = 10
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merge rules; returns
    ``[(rank, left, right, pair_count), ...]`` — O(k) driver data."""
    words = word_counts(docs, text_col).withColumn(
        # 'abc' -> 'a b c': one space-joined symbol string per word
        "sym",
        F.trim(F.regexp_replace(F.col("w"), "(.)", "$1 ")),
    )
    words = words.select("sym", "cnt").persist()
    words.count()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pairs = (
            words.select("cnt", F.split("sym", " ").alias("_syms"))
            .select("cnt", F.explode(F.expr(_PAIRS_EXPR)).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("cnt").alias("n"))
        )
        top = pairs.orderBy(F.desc("n"), F.asc("pair")).limit(1).collect()
        if not top:
            break
        pair, n = top[0]["pair"], int(top[0]["n"])
        left, right = pair.split(" ", 1)
        merges.append((rank, left, right, n))
        merged = F.trim(
            _merge_pair(
                F.concat(F.lit(" "), F.col("sym"), F.lit(" ")), pair, f"{left}{right}"
            )
        )
        nxt = words.select(merged.alias("sym"), "cnt").persist()
        nxt.count()
        words.unpersist()
        words = nxt
    words.unpersist()
    return merges


def encode_pieces(words: DataFrame, merges: list[tuple[int, str, str, int]],
                  word_col: str = "w") -> DataFrame:
    """Apply a learned merge table to a DISTINCT-word frame: returns
    ``(word_col, n_pieces)`` — the BPE piece count per word under the
    ``merges`` rules, applied in rank order with the same greedy
    left-to-right replace scan the trainer used (so encode(train data)
    reproduces the trainer's final symbol state exactly).

    Scale shape mirrors training: the k-deep replace chain is ONE
    whole-stage-codegen expression over the vocabulary table — O(distinct
    words) work however large the corpus; the corpus-scale join happens
    in the CALLER (explode corpus words → join this table), where AQE
    picks broadcast for real-world vocab sizes."""
    sym = F.trim(F.regexp_replace(F.col(word_col), "(.)", "$1 "))
    col = F.concat(F.lit(" "), sym, F.lit(" "))
    for _rank, left, right, _n in merges:
        col = _merge_pair(col, f"{left} {right}", f"{left}{right}")
    return words.select(
        word_col, F.size(F.split(F.trim(col), " ")).cast("int").alias("n_pieces")
    )
