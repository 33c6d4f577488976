"""Unigram-LM (SentencePiece-style) tokenizer TRAINING as a Spark plan
— the probabilistic sibling of operators/bpe.py (Kudo 2018).

The reference has no tokenizer (its only code file is
class.nmea.parser.php:1-399; SURVEY §0) — engine surface (`ext`).

Algorithm (deterministic hard-EM form):

1. Seed vocabulary: every substring of length 1-4 of the corpus word
   set, count = word-frequency-weighted occurrence count (exact
   integers); keep the top-K multi-char pieces by (count DESC, piece
   ASC) plus ALL single characters (coverage guarantee).
2. Hard-EM rounds: E-step segments every distinct word by VITERBI
   under the current unigram model p(s) = count_s / total (max sum of
   ln p — ties break to the longest last piece, i.e. the smallest
   split point); piece counts are then the exact integer
   frequency-weighted usage counts of the best segmentations. M-step:
   those counts are the next model; unused multi-char pieces drop
   out, single chars floor at count 1 (coverage).
3. Encode: one more Viterbi pass under the final model.

Engine-portable by construction: the Viterbi DP is UNROLLED column
algebra over the word table (words capped at 8 chars, pieces at 4, so
8 DP levels and an 8-step back-pointer walk) — the SAME recurrence
with the SAME ln arguments and the SAME left-to-right addition order
runs in Spark and in the DuckDB oracle, so the float scores are
bit-comparable and every argmax tie-break is a deterministic CASE
over equal doubles. All counts stay exact bigints.

Scale design: every EM round runs over the |distinct words| table,
never the corpus (the corpus is scanned once for word frequencies —
the operators/bpe.py posture); per round ONE piece-lookup join builds
a per-word (piece -> ln p) map column, the DP is per-row expression
work, and the driver collects only the 1-row total. At 100 TB the
word table is ~millions of rows against a trillion-row corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_WORD = 8  # unrolled DP depth; words longer than this are excluded
MAX_PIECE = 4
SEED_TOP_K = 200  # multi-char seed pieces kept (plus all single chars)
NEG = -1.0e18  # "unreachable" sentinel, below any real log-prob sum


def word_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, f): corpus word frequencies, lowercased, filtered to
    ``^[a-z0-9]{1,8}$`` (the operators/bpe.py normalization plus the
    DP-depth cap — identical in the SQL oracle)."""
    return (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word")
        )
        .filter(F.col("word").rlike("^[a-z0-9]{1,%d}$" % MAX_WORD))
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("f"))
    )


def _all_pieces_expr(with_pos: bool = False) -> str:
    """SQL generator for every candidate piece of ``word`` (length
    1-MAX_PIECE at every start offset) — THE tokenizer convention all
    three consumers share (seed counting, Viterbi candidates, greedy
    longest-match); ``with_pos`` lifts each piece into a (p, s) struct
    for position-aware consumers."""
    inner = (
        "struct(i AS p, substring(word, i, l) AS s)"
        if with_pos
        else "substring(word, i, l)"
    )
    return (
        "flatten(transform(sequence(1, length(word)), i -> "
        f"transform(sequence(1, least({MAX_PIECE}, "
        f"length(word) - i + 1)), l -> {inner})))"
    )


def _doc_fertility(df: DataFrame, text_col: str, k: DataFrame, out_col: str):
    """Per-doc fertility tail shared by the Viterbi and greedy
    encoders: corpus words joined against the |distinct words|-sized
    (word, k) piece-count table — broadcast only under the shared
    size gate (Heaps-law type growth at corpus scale)."""
    from gps_stream_processing_spark.operators.graph import _fits_broadcast

    dw = df.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word"),
    ).filter(F.col("word").rlike("^[a-z0-9]{1,%d}$" % MAX_WORD))
    lookup = F.broadcast(k) if _fits_broadcast(k.count()) else k
    return (
        dw.join(lookup, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("k").cast("bigint").alias(out_col),
            F.round(
                F.sum("k").cast("double") / F.count("*"), 6
            ).alias("tokens_per_word"),
        )
    )


def seed_vocab(words: DataFrame) -> DataFrame:
    """(s, c): the seed unigram vocabulary — all substrings of length
    1-MAX_PIECE with exact frequency-weighted occurrence counts; top
    SEED_TOP_K multi-char pieces by (c DESC, s ASC) plus every single
    character."""
    subs = (
        words.select("f", F.explode(F.expr(_all_pieces_expr())).alias("s"))
        .groupBy("s")
        .agg(F.sum("f").cast("bigint").alias("c"))
        .localCheckpoint(eager=True)
    )
    top = (
        subs.filter(F.length("s") > 1)
        .orderBy(F.desc("c"), "s")
        .limit(SEED_TOP_K)
    )
    return subs.filter(F.length("s") == 1).unionByName(top)


def _viterbi_pieces(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """(word, f, piece) rows of each word's Viterbi-best segmentation
    under ``vocab`` — one row per piece USE (multiplicity preserved).

    The DP and the back-pointer walk are unrolled to MAX_WORD levels
    of plain column expressions; candidate scores ride a per-word
    (piece -> ln p) map built by ONE join against the vocab."""
    total = vocab.agg(F.sum("c")).first()[0]  # 1-row total collect
    lnp = F.log(F.col("c").cast("double") / F.lit(int(total)))
    cand = (
        words.select("word", F.explode(F.expr(_all_pieces_expr())).alias("s"))
        .distinct()
        .join(vocab.select("s", lnp.alias("lnp")), "s")
    )
    pmap = cand.groupBy("word").agg(
        F.map_from_entries(
            F.collect_list(F.struct("s", "lnp"))
        ).alias("pm")
    )
    cur = words.join(pmap, "word")
    # DP: b{i} = best score of word[1..i]; j{i} = chosen split point
    # (start of the last piece), smallest j on ties.
    bcols: dict[int, object] = {0: F.lit(0.0)}
    for i in range(1, MAX_WORD + 1):
        cands = []
        for j in range(max(0, i - MAX_PIECE), i):
            piece = F.expr(f"substring(word, {j + 1}, {i - j})")
            prev = bcols[j] if j == 0 else F.col(f"b{j}")
            cands.append(
                (
                    j,
                    F.when(
                        F.length("word") >= i,
                        prev + F.element_at("pm", piece),
                    ),
                )
            )
        coalesced = [F.coalesce(c, F.lit(NEG)) for _, c in cands]
        best = coalesced[0] if len(coalesced) == 1 else F.greatest(*coalesced)
        cur = cur.withColumn(f"b{i}", best)
        jexpr = F.lit(None).cast("int")
        # ascending j: the FIRST candidate equal to the max wins
        for j, c in reversed(cands):
            jexpr = F.when(
                F.coalesce(c, F.lit(NEG)) == F.col(f"b{i}"), F.lit(j)
            ).otherwise(jexpr)
        cur = cur.withColumn(f"j{i}", jexpr)
    jarr = F.array(*[F.col(f"j{i}") for i in range(1, MAX_WORD + 1)])
    cur = cur.withColumn("jarr", jarr).withColumn(
        "p0", F.length("word").cast("int")
    )
    piece_cols = []
    for t in range(MAX_WORD):
        p, nx = f"p{t}", f"p{t + 1}"
        cur = cur.withColumn(
            nx,
            F.when(F.col(p) > 0, F.element_at("jarr", F.col(p))),
        ).withColumn(
            f"piece{t}",
            F.when(
                (F.col(p) > 0) & F.col(nx).isNotNull(),
                F.expr(f"substring(word, {nx} + 1, {p} - {nx})"),
            ),
        )
        piece_cols.append(F.col(f"piece{t}"))
    return (
        cur.select(
            "word",
            "f",
            F.explode(
                F.filter(
                    F.array(*piece_cols), lambda x: x.isNotNull()
                )
            ).alias("piece"),
        )
    )


def _em_round(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """One hard-EM round: Viterbi-count every piece (exact bigint),
    keep used multi-char pieces, floor single chars at 1."""
    counts = (
        _viterbi_pieces(words, vocab)
        .groupBy(F.col("piece").alias("s"))
        .agg(F.sum("f").cast("bigint").alias("nc"))
    )
    return (
        vocab.join(counts, "s", "left")
        .filter(
            (F.length("s") == 1) | (F.coalesce("nc", F.lit(0)) > 0)
        )
        .select(
            "s",
            F.when(
                F.length("s") == 1,
                F.greatest(F.coalesce("nc", F.lit(0)), F.lit(1)),
            )
            .otherwise(F.col("nc"))
            .cast("bigint")
            .alias("c"),
        )
        .localCheckpoint(eager=True)
    )


def train_vocab(
    df: DataFrame, n_rounds: int = 2, text_col: str = "text"
) -> DataFrame:
    """The trained vocabulary (``s``, ``c``) after ``n_rounds`` of
    hard EM — the model artifact callers land once per corpus and
    reuse (train once, encode many: the production tokenizer split).
    Deterministic exact integers, so a landed copy is lossless."""
    words = word_table(df, text_col).localCheckpoint(eager=True)
    vocab = seed_vocab(words).localCheckpoint(eager=True)
    for _ in range(n_rounds):
        vocab = _em_round(words, vocab)
    return vocab


def unigram_train(
    df: DataFrame,
    n_rounds: int = 2,
    text_col: str = "text",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Train the unigram LM; returns the top-30 final vocabulary rows
    (``piece``, ``cnt``, ``vocab_size``) by (cnt DESC, piece ASC) —
    exact integers throughout. ``vocab`` short-circuits training with
    a prebuilt (landed) model table."""
    if vocab is None:
        vocab = train_vocab(df, n_rounds, text_col)
    n = vocab.count()  # vocab-sized count
    return (
        vocab.orderBy(F.desc("c"), "s")
        .limit(30)
        .select(
            F.col("s").alias("piece"),
            F.col("c").alias("cnt"),
            F.lit(n).cast("bigint").alias("vocab_size"),
        )
    )


def unigram_encode_stats(
    df: DataFrame,
    n_rounds: int = 2,
    text_col: str = "text",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Viterbi-encode the corpus under the trained model: per-doc
    (``doc_id``, ``n_words``, ``n_unigram_tokens``,
    ``tokens_per_word``) over the filtered word set — the fertility
    report, mirroring operators/bpe.py bpe_encode_stats."""
    words = word_table(df, text_col).localCheckpoint(eager=True)
    if vocab is None:
        vocab = seed_vocab(words).localCheckpoint(eager=True)
        for _ in range(n_rounds):
            vocab = _em_round(words, vocab)
    k = (
        _viterbi_pieces(words, vocab)
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("k"))
        # |distinct words|-sized lookup side — NOT |vocab|-sized: one
        # row per filtered word TYPE, ~millions at the 100 TB posture.
        .localCheckpoint(eager=True)
    )
    return _doc_fertility(df, text_col, k, "n_unigram_tokens")


def wordpiece_encode_stats(
    df: DataFrame,
    n_rounds: int = 2,
    text_col: str = "text",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """GREEDY longest-match-first segmentation (the WordPiece/
    MaxMatch inference rule, Song et al. 2021 "Fast WordPiece
    Tokenization") under the SAME trained unigram vocabulary the
    Viterbi encoder uses — per-doc (``doc_id``, ``n_words``,
    ``n_wp_tokens``, ``tokens_per_word``), mirroring
    :func:`unigram_encode_stats` so the two inference rules'
    fertility is directly comparable (greedy >= Viterbi token count
    by construction; equality iff greedy happens to be optimal).

    The walk is unrolled column algebra like the Viterbi DP: one
    vocab join builds a per-word (position -> longest matching piece
    length) map — the single-char coverage floor guarantees every
    position matches — then MAX_WORD walk steps advance the cursor
    p += step(p), counting pieces. Engine-portable: the same
    longest-match MAX and the same unrolled walk run in the DuckDB
    oracle; everything is exact integers (no floats at all)."""
    words = word_table(df, text_col).localCheckpoint(eager=True)
    if vocab is None:
        vocab = seed_vocab(words).localCheckpoint(eager=True)
        for _ in range(n_rounds):
            vocab = _em_round(words, vocab)
    cand = (
        words.select(
            "word",
            F.explode(F.expr(_all_pieces_expr(with_pos=True))).alias("c"),
        )
        .select("word", F.col("c.p").alias("p"), F.col("c.s").alias("s"))
        .join(vocab.select("s"), "s")
    )
    gm = cand.groupBy("word", "p").agg(
        F.max(F.length("s")).alias("step")
    )
    smap = gm.groupBy("word").agg(
        F.map_from_entries(F.collect_list(F.struct("p", "step"))).alias(
            "sm"
        )
    )
    cur = (
        words.join(smap, "word")
        .withColumn("len", F.length("word"))
        .withColumn("p0", F.lit(1))
        .withColumn("k0", F.lit(0))
    )
    for t in range(1, MAX_WORD + 1):
        pp, pk = f"p{t - 1}", f"k{t - 1}"
        cur = cur.withColumn(
            f"p{t}",
            F.when(
                F.col(pp) <= F.col("len"),
                F.col(pp) + F.element_at("sm", F.col(pp)),
            ).otherwise(F.col(pp)),
        ).withColumn(
            f"k{t}",
            F.col(pk)
            + F.when(F.col(pp) <= F.col("len"), 1).otherwise(0),
        )
    k = cur.select(
        "word", F.col(f"k{MAX_WORD}").cast("bigint").alias("k")
    ).localCheckpoint(eager=True)  # |distinct words|-sized lookup side
    return _doc_fertility(df, text_col, k, "n_wp_tokens")
