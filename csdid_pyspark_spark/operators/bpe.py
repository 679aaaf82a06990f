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
regexp_replace) — no Python row funcs. Merging is the textbook greedy
left-to-right non-overlapping scan, realized with LOOKAROUND
delimiters (see ``_merge_pair`` for why a literal space-delimited
replace consumes the shared delimiter and mis-groups runs).

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


def _rq(s: str) -> str:
    """Regex-literal-quote a symbol (\\Q..\\E), splitting any embedded
    '\\E' so it cannot terminate the quote early."""
    return "\\Q" + s.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def _merge_pair(col, left: str, right: str, joined: str):
    """Merge every ' left right ' occurrence in a space-padded symbol
    string with the textbook greedy left-to-right scan. The delimiters
    are matched by LOOKAROUND — a plain literal replace consumes the
    shared space, so in 'a b a b' the second (a,b) loses its leading
    delimiter and is skipped, and in a uniform run 'a a a a a a' even
    a second pass cannot regroup the leftovers to the textbook
    [aa,aa,aa] (observed: [aa,a,aa,a]). Java's regexp replace-all with
    '(?<= )left right(?= )' consumes only the symbols, resumes the
    scan ON the trailing space, and therefore reproduces the published
    non-overlapping left-to-right merge order exactly — for distinct
    pairs and same-symbol runs alike. Symbols are \\Q-quoted, so any
    corpus token is safe as a regex literal."""
    pat = f"(?<= ){_rq(left)} {_rq(right)}(?= )"
    return F.regexp_replace(col, pat, joined.replace("\\", "\\\\").replace("$", "\\$"))


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
                F.concat(F.lit(" "), F.col("sym"), F.lit(" ")),
                left,
                right,
                f"{left}{right}",
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
        col = _merge_pair(col, left, right, f"{left}{right}")
    return words.select(
        word_col, F.size(F.split(F.trim(col), " ")).cast("int").alias("n_pieces")
    )
