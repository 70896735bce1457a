"""Distributed BPE (byte-pair-encoding) tokenizer training primitives.

A 100 TB training-data pipeline trains its tokenizer from the corpus it
curates; the expensive part is the pair-frequency statistics, which are a
pure aggregation. Spark-first design (Sennrich et al. 2016 semantics):

- the corpus collapses to DISTINCT words × frequency first — pair counting
  then runs over the vocabulary (millions of rows), not the corpus
  (billions), the same trick every serious BPE trainer uses;
- one merge iteration = one JVM-side aggregation for the arg-max pair plus
  one ``aggregate`` left-fold to apply the merge — the fold is exactly
  BPE's greedy leftmost non-overlapping application (``aaa`` under merge
  (a,a) → ``[aa, a]``), with no Python UDF anywhere;
- the evolving symbol table is persisted + localCheckpoint'ed each
  iteration so lineage stays O(1) across merges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace-word vocabulary with corpus frequencies."""
    return (
        docs.select(F.explode(F.split(text_col, " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _adjacent_pairs(syms_col):
    """(a, b) structs for each adjacent symbol pair in the array."""
    n = F.size(syms_col)
    return F.zip_with(
        F.slice(syms_col, 1, n - 1),
        F.slice(syms_col, 2, n - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )


def pair_stats(vocab: DataFrame, syms_col: str = "syms") -> DataFrame:
    """Frequency-weighted adjacent-pair counts over a symbolized vocab —
    the sufficient statistic for one BPE merge decision."""
    return (
        vocab.where(F.size(syms_col) >= 2)
        .select("freq", F.explode(_adjacent_pairs(F.col(syms_col))).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )


def apply_merge(vocab: DataFrame, a: str, b: str, syms_col: str = "syms") -> DataFrame:
    """Replace adjacent (a, b) with the merged symbol, greedy leftmost
    non-overlapping — a single ``aggregate`` left-fold per word."""
    merged = a + b
    fold = F.aggregate(
        F.col(syms_col),
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(s))),
    )
    return vocab.withColumn(syms_col, fold)


def encode_words(
    vocab: DataFrame, merges: list[tuple[str, str]], word_col: str = "word"
) -> DataFrame:
    """Tokenize each word with a learned merge list (adds ``tokens``).

    Applies merges by RANK (lowest learned rank first) — the standard BPE
    encode, equivalent to replaying the merges in learned order. A
    32k-merge vocabulary cannot be a Column-expression chain (32k nested
    folds), so this is the sanctioned Python path: one Arrow-batched
    pandas_udf with the rank dict broadcast in the closure, vectorized
    over whole batches — never a row-at-a-time Python UDF.
    """
    import pandas as pd  # noqa: F401 — pandas_udf contract
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf("array<string>")
    def enc(words):
        def one(w: str) -> list[str]:
            syms = list(w)
            while len(syms) >= 2:
                best_rank, best_i = None, -1
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_i = r, i
                if best_rank is None:
                    break
                syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
            return syms

        return words.map(one)

    return vocab.withColumn("tokens", enc(F.col(word_col)))


def learn_merges(docs: DataFrame, n_merges: int, text_col: str = "text") -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns them in order.

    Ties break deterministically by (count desc, a, b) so the learned
    tokenizer is reproducible across cluster sizes and partitionings.
    """
    vocab = word_frequencies(docs, text_col).withColumn(
        "syms", F.split("word", "")
    ).persist()
    vocab.count()  # materialize before the loop
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            top = (
                pair_stats(vocab)
                .orderBy(F.desc("cnt"), "a", "b")
                .limit(1)
                # driver-ok: bounded single-row arg-max fetch per iteration
                .collect()
            )
            if not top:
                break
            a, b = top[0]["a"], top[0]["b"]
            merges.append((a, b))
            prev = vocab
            # localCheckpoint truncates lineage so iteration N's plan does
            # not re-derive iterations 1..N-1
            vocab = apply_merge(vocab, a, b).localCheckpoint(eager=True)
            prev.unpersist()
    finally:
        vocab.unpersist()
    return merges
