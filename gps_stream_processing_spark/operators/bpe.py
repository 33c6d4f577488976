"""BPE tokenizer TRAINING (Sennrich et al. 2016) as a Spark plan.

The reference has no tokenizer (its only code file is
class.nmea.parser.php:1-399; SURVEY §0) — engine surface (`ext`),
the tokenizer-side companion of q_vocab_coverage/q_token_count: a
training-data pipeline that reports vocabulary coverage also has to
BUILD the vocabulary, and byte-pair encoding is the standard way.

Algorithm (the published word-level form): collapse the corpus to a
word-frequency table once, start from character symbols, then each
round (1) count adjacent symbol pairs weighted by word frequency,
(2) pick the most frequent pair — ties broken lexicographically —
and (3) merge every greedy left-to-right non-overlapping occurrence
into a new symbol.

Spark-first representation: a word's symbol sequence is ONE
delimited string with a DOUBLED separator at every boundary —
``\\x1f\\x1f sym1 \\x1f\\x1f sym2 \\x1f\\x1f`` — so the merge step is a
plain ``replace(ws, sep||l||sep||sep||r||sep, sep||l||r||sep)``.
The pattern consumes only the INNER half of each boundary, so
adjacent occurrences of the winning pair never fight over a shared
delimiter and one left-to-right non-overlapping replace pass is
EXACTLY the greedy BPE merge rule: ``mama`` → [ma, ma], ``aaa`` →
[aa, a], ``aaaaa`` → [aa, aa, a] (with a single shared delimiter,
``mama`` came out [ma, m, a] — the adjacent-pair bug; and
iterating that replace to fixpoint is also wrong, giving
[aa, a, aa] on ``aaaaa`` where greedy gives [aa, aa, a]). The
replacement re-emits one delimiter on each side, so every boundary
keeps exactly two and the invariant is self-maintaining. Identical
in Spark and DuckDB — the whole training loop stays engine-portable
column algebra with no UDF. Pair counting splits the string back to
an array inside one projection (explode + hash-agg with map-side
combine; empty fragments from the doubled separators are filtered).

Scale design: every round runs over the WORD-FREQUENCY table, not
the corpus — |vocab| rows regardless of corpus size (the industrial
posture; the corpus is scanned exactly once to build the table).
Per round: one explode+agg for pair counts (the driver collects ONE
row — the winning pair), one narrow replace projection. The loop is
driver-fed like operators/clustering.py's Lloyd: k bounded
one-row collects, never data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"  # unit separator; the word filter excludes it from symbols


def word_freq_table(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, f, ws): corpus word frequencies with the initial
    character-level delimited symbol string (DOUBLED separator at
    every boundary — see the module doc). Words are normalized to
    lowercase and filtered to ``^[a-z0-9]+$`` (BPE-demo
    normalization; also guarantees the separator char cannot occur
    inside a symbol)."""
    words = df.select(
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word")
    ).filter(F.col("word").rlike("^[a-z0-9]+$"))
    return words.groupBy("word").agg(F.count("*").alias("f")).select(
        "word",
        "f",
        F.concat(
            F.regexp_replace(F.col("word"), "(.)", SEP + SEP + "$1"),
            F.lit(SEP + SEP),
        ).alias("ws"),
    )


def _pair_counts(wf: DataFrame) -> DataFrame:
    syms = F.expr(f"filter(split(ws, '{SEP}'), x -> x <> '')")
    pairs = F.expr(
        "CASE WHEN size(__syms) >= 2 THEN transform("
        "sequence(1, size(__syms) - 1), i -> struct("
        "element_at(__syms, i) AS l, element_at(__syms, i + 1) AS r))"
        " ELSE array() END"
    )
    return (
        wf.select("f", syms.alias("__syms"))
        .select("f", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("f").alias("cnt"))
    )


def _bpe_rounds(
    df: DataFrame, n_merges: int, text_col: str, want_final: bool = False
) -> tuple[list[tuple], DataFrame | None]:
    """Shared training loop: returns (merge rows, final merged word
    table or None). The final table is materialized as an eager
    localCheckpoint ONLY when ``want_final`` — so callers that need
    it (bpe_encode_stats) can consume it after the loop's caches are
    released, and callers that don't (bpe_train) skip the extra
    materialization job entirely."""
    wf = word_freq_table(df, text_col).persist()
    n_sym = F.sum(
        F.col("f")
        * F.expr(f"size(filter(split(ws, '{SEP}'), x -> x <> ''))")
    ).cast("bigint")
    out = []
    try:
        # One tiny vocab-table agg up front buys back a whole job per
        # round below: a word's symbol count is its pair count + 1, so
        # n_symbols(wf) = total_pairs(wf) + Σf — round i+1's pair scan
        # therefore yields round i's n_symbols_after for free, and the
        # separate per-round n_after aggregation job disappears
        # (16 jobs → 10 for the 8-round loop; same integers, the
        # oracle is unchanged).
        total_f = int(
            wf.agg(F.sum("f").alias("tf")).collect()[0]["tf"] or 0
        )
        pending = None  # (rnd, l, r, cnt) awaiting its n_symbols_after
        prev = None  # last round's wf — unpersisted only after the
        # NEXT job has materialized the current wf's cache (an eager
        # unpersist would force the new table's first materialization
        # to replay the whole replace-chain lineage from the source)
        for rnd in range(1, n_merges + 1):
            # ONE fused agg per round: the winning pair (min over
            # struct(-cnt, l, r) ≡ ORDER BY cnt DESC, l, r LIMIT 1 —
            # bigint negation is exact, strings compare binary in both
            # forms) plus the total pair count for the PREVIOUS
            # round's n_symbols_after.
            agg = (
                _pair_counts(wf)
                .agg(
                    F.min(
                        F.struct(
                            (-F.col("cnt")).alias("neg_cnt"),
                            F.col("l"),
                            F.col("r"),
                        )
                    ).alias("best"),
                    F.sum("cnt").alias("total_pairs"),
                )
                .collect()[0]
            )
            if prev is not None:  # wf's cache is materialized now
                prev.unpersist()
                prev = None
            if pending is not None:
                out.append(
                    (*pending, int(agg["total_pairs"] or 0) + total_f)
                )
                pending = None
            if agg["best"] is None:  # fully merged corpus: no pairs left
                break
            l, r = agg["best"]["l"], agg["best"]["r"]
            cnt = -int(agg["best"]["neg_cnt"])
            merged = wf.select(
                "word",
                "f",
                F.replace(
                    F.col("ws"),
                    F.lit(SEP + l + SEP + SEP + r + SEP),
                    F.lit(SEP + l + r + SEP),
                ).alias("ws"),
            ).persist()
            prev = wf
            wf = merged
            pending = (rnd, l, r, cnt)
        if pending is not None:
            # the last merge has no following pair scan — one n_sym agg
            n_after = int(wf.agg(n_sym.alias("n")).collect()[0]["n"])
            out.append((*pending, n_after))
        final = wf.localCheckpoint(eager=True) if want_final else None
    finally:
        wf.unpersist()
        if prev is not None:
            prev.unpersist()
    return out, final


def bpe_train(
    df: DataFrame, n_merges: int = 8, text_col: str = "text"
) -> DataFrame:
    """Run ``n_merges`` BPE merge rounds; returns one row per round:
    (round, merge_left, merge_right, pair_count, n_symbols_after) —
    the merge table plus the post-merge corpus symbol count (exact
    integers; the count shrinks by the number of non-overlapping
    merges applied, which the oracle re-derives independently)."""
    out, _final = _bpe_rounds(df, n_merges, text_col)
    return df.sparkSession.createDataFrame(
        out,
        "round int, merge_left string, merge_right string,"
        " pair_count bigint, n_symbols_after bigint",
    )


def bpe_encode_stats(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """TOKENIZE with the learned merges — the application side of
    :func:`bpe_train`: train the merge table, then re-tokenize every
    document through the final vocabulary and report per-doc
    (n_words, n_bpe_tokens, tokens_per_word). Because BPE merges are
    word-internal, encoding a document reduces to a join of its words
    against the |vocab|-sized (word → symbol count) table — the
    corpus text is scanned once and only (doc_id, word) pairs flow
    into a broadcastable vocab join; no per-doc merge replay. Words
    outside the normalized vocabulary ([a-z0-9]+) are excluded on
    both sides (none exist in this corpus)."""
    _rows, final = _bpe_rounds(df, n_merges, text_col, want_final=True)
    vocab = final.select(
        "word",
        F.expr(
            f"size(filter(split(ws, '{SEP}'), x -> x <> ''))"
        ).cast("bigint").alias("n_syms"),
    )
    words = df.select(
        id_col,
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word"),
    ).filter(F.col("word").rlike("^[a-z0-9]+$"))
    return (
        words.join(F.broadcast(vocab), "word")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_syms").cast("bigint").alias("n_bpe_tokens"),
        )
        .select(
            id_col,
            "n_words",
            "n_bpe_tokens",
            F.round(
                F.col("n_bpe_tokens").cast("double") / F.col("n_words"), 6
            ).alias("tokens_per_word"),
        )
    )
