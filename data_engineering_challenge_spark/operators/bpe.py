"""BPE merge-loop training over a distributed corpus (SURVEY.md §2.10 ✚).

The byte-pair-encoding training loop (Sennrich et al. 2016,
arXiv:1508.07909): repeatedly (1) count adjacent symbol pairs, (2) take
the most frequent pair as the next merge rule, (3) re-tokenize with that
rule.  Granularity here is whitespace tokens (the documents table is a
word stream), which makes the identical algorithm phrase induction; on
character sequences it is the subword trainer.

Scale shape, per round:
* pair counting = the ``bpe_merge_ranks`` job — map-side ``zip_with``
  pair explosion, ONE count shuffle, top-1 via TakeOrderedAndProject;
  the only driver traffic is a single (pair, count) row.
* re-tokenization = a pure-expression left-to-right greedy fold
  (``F.aggregate`` with (out, pending) struct state) — JVM-side, map-only,
  no UDFs, no shuffle.  Standard BPE semantics on overlaps: 'a a a' with
  rule (a,a) → ['a a', 'a'], because the greedy scan consumes the left
  occurrence first.

The loop itself is driver-side — N rounds of two narrow jobs — the same
iterate-until pattern as the KMeans quantizer (similarity.ivf_topk) and
connected components (dedup.dup_clusters): iteration count is a small
constant, per-round work is fully distributed.

Determinism: ties in pair frequency break by pair string ascending, so
the learned merge table is a pure function of the corpus — the property
test checks it EXACTLY against a pure-Python reference trainer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: merged tokens join their parts with a space, so a rule over merged
#: tokens reads naturally as the induced phrase ("new york" + "city").
SEP = " "


def adjacent_pair_counts(tokens: DataFrame, col: str = "toks") -> DataFrame:
    """(pair_left, pair_right, n_pairs) over ALL adjacent occurrences."""
    t = F.col(col)
    return (
        tokens.select(
            F.explode(
                F.zip_with(
                    F.slice(t, F.lit(1), F.size(t) - 1),
                    F.slice(t, F.lit(2), F.size(t) - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p")
        )
        .groupBy(F.col("p.l").alias("pair_left"), F.col("p.r").alias("pair_right"))
        .agg(F.count("*").alias("n_pairs"))
    )


def merge_pair(tokens_col: Column, left: str, right: str) -> Column:
    """Greedy left-to-right application of one merge rule to a token
    array, as a pure expression: fold state = (out, pending) where
    ``pending`` holds a just-seen ``left`` awaiting its ``right``."""
    lit_l, lit_r = F.lit(left), F.lit(right)
    merged = F.lit(left + SEP + right)
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pending"),
    )

    def step(acc, x):
        has_pending = acc["pending"].isNotNull()
        completes = has_pending & (x == lit_r)
        # when not completing: flush any dangling pending, then x either
        # opens the next pending window or is emitted as-is
        opens = x == lit_l
        flushed = F.when(
            has_pending, F.concat(acc["out"], F.array(acc["pending"]))
        ).otherwise(acc["out"])
        return F.when(
            completes,
            F.struct(
                F.concat(acc["out"], F.array(merged)).alias("out"),
                F.lit(None).cast("string").alias("pending"),
            ),
        ).otherwise(
            F.struct(
                F.when(opens, flushed)
                .otherwise(F.concat(flushed, F.array(x)))
                .alias("out"),
                F.when(opens, x).otherwise(F.lit(None).cast("string")).alias(
                    "pending"
                ),
            )
        )

    def finish(acc):
        return F.when(
            acc["pending"].isNotNull(), F.concat(acc["out"], F.array(acc["pending"]))
        ).otherwise(acc["out"])

    return F.aggregate(tokens_col, init, step, finish)


def train_bpe_merges(
    documents: DataFrame, n_merges: int = 5, text_col: str = "text"
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` merge rules; returns [(left, right, count), ...]
    in learned order.  Stops early when no adjacent pair repeats."""
    toks = documents.select(F.split(F.col(text_col), " ").alias("toks"))
    rules: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            adjacent_pair_counts(toks)
            .orderBy(
                F.desc("n_pairs"), F.asc("pair_left"), F.asc("pair_right")
            )
            .limit(1)
            .collect()
        )
        if not top or top[0]["n_pairs"] < 2:
            break
        left, right, n = (
            top[0]["pair_left"],
            top[0]["pair_right"],
            top[0]["n_pairs"],
        )
        rules.append((left, right, n))
        toks = toks.select(merge_pair(F.col("toks"), left, right).alias("toks"))
    return rules


def reference_bpe(texts: list[str], n_merges: int = 5) -> list[tuple[str, str, int]]:
    """Pure-Python reference trainer (test oracle) — same semantics,
    single-node."""
    corpora = [t.split(" ") for t in texts]
    rules: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for toks in corpora:
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        (left, right), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < 2:
            break
        rules.append((left, right, n))
        merged = left + SEP + right
        nxt = []
        for toks in corpora:
            out: list[str] = []
            i = 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == left and toks[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            nxt.append(out)
        corpora = nxt
    return rules


def bpe_encode(
    df: DataFrame,
    merges: list,
    text_col: str = "text",
    out_col: str = "toks",
    expression_rule_cap: int = 64,
) -> DataFrame:
    """Apply a TRAINED merge list corpus-wide — the map-only ENCODE pass
    every tokenizer pipeline runs after training (the half
    `train_bpe_merges` alone did not ship): split, then fold each rule
    in learned order with the same greedy left-to-right semantics the
    trainer used, so encode(corpus, train(corpus)) reproduces the
    trainer's final tokenization exactly.

    ``merges`` is ``[(left, right), ...]`` (trailing count from the
    trainer's triples tolerated), ORDER IS THE CONTRACT — BPE applies
    rules by rank, and a later rule may consume tokens an earlier rule
    produced.

    Two physical strategies, both map-only (no shuffle, nothing on the
    driver):

    * ≤ ``expression_rule_cap`` rules: chained `merge_pair` folds —
      pure JVM expressions inside whole-stage codegen (zero Python);
    * larger vocabularies: ONE Arrow-batched pandas UDF running the
      identical greedy loop per row — the expression tree would
      otherwise grow with vocab size past Catalyst's comfort, while the
      UDF stays O(tokens × rules) with a constant-size plan.  Same
      semantics, property-tested equal.
    """
    rules = [(r[0], r[1]) for r in merges]
    base = F.split(F.col(text_col), SEP)
    if len(rules) <= expression_rule_cap:
        col = base
        for left, right in rules:
            col = merge_pair(col, left, right)
        return df.withColumn(out_col, col)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _encode(texts):
        import pandas as pd

        return pd.Series(
            [
                None
                if t is None
                else reference_bpe_encode(t, rules)
                for t in texts
            ]
        )

    return df.withColumn(out_col, _encode(F.col(text_col)))


def reference_bpe_encode(text: str, merges: list) -> list[str]:
    """Pure-Python encode twin (test oracle + the pandas-UDF kernel):
    greedy left-to-right application of each rule in order."""
    toks = text.split(SEP)
    for rule in merges:
        left, right = rule[0], rule[1]
        out: list[str] = []
        i = 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == left and toks[i + 1] == right:
                out.append(left + SEP + right)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks
