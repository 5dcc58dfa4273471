"""Distributed byte-pair-encoding (BPE) tokenizer training (Sennrich,
Haddow, Birch 2016, "Neural Machine Translation of Rare Words with Subword
Units", ACL — public paper; the tokenizer-training shape behind GPT/BERT
vocabularies).

BPE training never needs the corpus per iteration — only the WORD-FREQUENCY
table (distinct word, count), which is corpus-scale-invariant (vocabulary
grows ~sub-linearly in corpus size). The 100 TB shape is therefore:

1. ONE corpus pass builds (word, count) — a tokenize + groupBy shuffle,
   identical to the word-count shape.
2. Each merge iteration runs on the word table only: adjacent-symbol-pair
   counts weighted by word count (explode + hash agg with map-side
   combine), a 1-ROW collect of the argmax pair (deterministic tie-break:
   highest count, then lexicographically smallest pair), and a map-only
   fold applying the merge to every word's symbol array. No corpus
   re-reads, no driver-side data pass beyond the single winning pair.
3. Lineage is flattened with ``localCheckpoint`` every few iterations
   (same discipline as graph.connected_components) so 100+ merges don't
   accumulate a 100-deep plan.

The greedy left-to-right merge-application fold is JVM-side
(``F.aggregate`` with a (array, just-merged) accumulator struct) — no
Python in any per-row path; Python only receives the per-iteration argmax
row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CHECKPOINT_EVERY = 8


def word_frequency_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over whitespace-lowercased words — the only input BPE
    training needs; ONE corpus pass."""
    from .text import tokens

    return (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _chars(col: Column) -> Column:
    """Initial symbol sequence: characters plus a trailing end-of-word
    marker (the paper's ``</w>``, so merges can't cross word boundaries
    when sequences are later concatenated)."""
    return F.concat(F.split(col, ""), F.array(F.lit("</w>")))


def adjacent_pair_counts(words: DataFrame, syms_col: str = "syms") -> DataFrame:
    """Corpus-weighted adjacent symbol-pair counts: explode each word's
    (sym[i], sym[i+1]) pairs, weight by the word's corpus count. The per-
    iteration aggregate — hash agg with map-side combine, pair-key shuffle."""
    s = F.col(syms_col)
    pairs = words.select(
        F.col("count"),
        F.explode(
            F.when(F.size(s) < 2, F.array().cast("array<struct<a:string,b:string>>")).otherwise(
                F.zip_with(
                    F.slice(s, 1, F.size(s) - 1),
                    F.slice(s, 2, F.size(s) - 1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
        F.sum("count").alias("pair_count")
    )


def apply_merge(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right application of merge (a, b): scan the symbol
    array once; whenever the previous kept symbol is ``a``, the current is
    ``b``, and the previous was NOT itself just produced by this scan's
    merge, replace the pair with ``a+b``. Pure JVM fold — the accumulator
    is (output-array, just-merged flag)."""
    merged = a + b
    init = F.struct(
        F.array().cast("array<string>").alias("out"), F.lit(False).alias("jm")
    )
    # try_element_at: ANSI-safe on the empty accumulator (SQL AND does not
    # short-circuit, so the size guard alone wouldn't prevent the lookup)
    step = lambda acc, s: F.when(  # noqa: E731
        (~acc["jm"])
        & (F.try_element_at(acc["out"], F.lit(-1)) == a)
        & (s == b),
        F.struct(
            F.concat(
                F.slice(acc["out"], 1, F.size(acc["out"]) - 1), F.array(F.lit(merged))
            ).alias("out"),
            F.lit(True).alias("jm"),
        ),
    ).otherwise(
        F.struct(F.concat(acc["out"], F.array(s)).alias("out"), F.lit(False).alias("jm"))
    )
    return F.aggregate(syms, init, step, lambda acc: acc["out"])


def learn_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    stats: dict | None = None,
    merge_batch: int = 1,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from a corpus. Returns the
    ordered merge list — the tokenizer artifact a real pipeline persists.
    Deterministic: ties broken by (count DESC, a ASC, b ASC). Stops early
    when no adjacent pair occurs twice (``stats['stopped_early']``).

    ``merge_batch`` trades driver round-trips for strict sequentiality —
    the standard distributed-BPE batching (e.g. SentencePiece's batched
    trainer). Per driver round it collects the top ``4*merge_batch``
    candidate pairs ONCE and greedily keeps up to ``merge_batch`` mutually
    NON-CONFLICTING pairs: a candidate is skipped if either of its symbols
    appears in an earlier pick's {a, b, a+b}, which guarantees every kept
    pair's pre-batch count is still exact at its application point (merges
    touching disjoint symbols can neither create nor consume each other's
    adjacencies). With batching, a merge that spawns a brand-new
    high-count pair (x, a+b) is considered one round later than strict
    1-at-a-time training would, so on chain-heavy corpora the learned
    list can differ from sequential training's — the standard
    quality-vs-round-trips trade of every batched BPE trainer; every
    applied count is still exact. ``merge_batch=1`` (default) IS the
    strict sequential algorithm;
    the registry statistics query (x42) runs the default. A real 30k-merge
    vocabulary with ``merge_batch=256`` needs ~120 driver rounds instead
    of 30k. ``stats['driver_rounds']`` reports the actual round count.
    """
    if merge_batch < 1:
        raise ValueError(f"merge_batch must be >= 1, got {merge_batch}")
    words = (
        word_frequency_table(df, text_col)
        .select("count", _chars(F.col("word")).alias("syms"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str]] = []
    rounds = 0
    since_checkpoint = 0
    stopped_early = False
    while len(merges) < n_merges:
        want = min(merge_batch, n_merges - len(merges))
        top = (
            adjacent_pair_counts(words)
            .filter(F.col("pair_count") >= 2)
            .orderBy(F.desc("pair_count"), "a", "b")
            .limit(want * 4)
            .collect()
        )
        rounds += 1
        if not top:
            stopped_early = True
            break
        picked: list[tuple[str, str]] = []
        used: set[str] = set()
        for row in top:
            if len(picked) == want:
                break
            a, b = row["a"], row["b"]
            if a in used or b in used:
                continue  # conflicts retry next round with fresh counts
            picked.append((a, b))
            used.update((a, b, a + b))
        # apply the round's picks in chunks of _CHECKPOINT_EVERY folds per
        # projection: chaining all merge_batch folds into ONE select would
        # nest merge_batch aggregate-lambda expressions (a 256-deep tree
        # at the docstring's recommended batch) past Catalyst's codegen
        # comfort zone; bounded chunks keep expression depth constant and
        # the checkpoint flattens lineage between them
        applied = 0
        while applied < len(picked):
            chunk = picked[applied : applied + _CHECKPOINT_EVERY]
            col: Column = F.col("syms")
            for a, b in chunk:
                col = apply_merge(col, a, b)
            words = words.select("count", col.alias("syms"))
            applied += len(chunk)
            since_checkpoint += len(chunk)
            if since_checkpoint >= _CHECKPOINT_EVERY:
                words = words.localCheckpoint(eager=True)
                since_checkpoint = 0
        merges.extend(picked)
    if stats is not None:
        stats["stopped_early"] = stopped_early
        stats["n_merges"] = len(merges)
        stats["driver_rounds"] = rounds
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply learned merges in order to every word of every document;
    output (id, bpe_tokens array<string>, n_bpe_tokens). Map-only: the
    merge list is a plan constant, each merge one fold; serving-side twin
    of learn_bpe_merges (what the pipeline runs over the full corpus)."""
    from .text import tokens

    base = df.select(F.col(id_col), tokens(F.lower(F.col(text_col))).alias("__w"))
    per_word = F.transform(F.col("__w"), lambda w: _chars(w))
    def _applier(a: str, b: str):
        return lambda s: apply_merge(s, a, b)

    col = per_word
    for a, b in merges:
        col = F.transform(col, _applier(a, b))
    out = F.flatten(col)
    return base.select(
        F.col(id_col),
        out.alias("bpe_tokens"),
        F.size(out).cast("long").alias("n_bpe_tokens"),
    )
