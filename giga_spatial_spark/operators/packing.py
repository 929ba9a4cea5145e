"""Sequence packing — assembling documents into fixed token-budget bins
(training-batch assembly: LM pipelines concatenate documents into
context-window-sized sequences after filtering/dedup).

Spark-first shape: STREAM-OFFSET packing — documents keep a
deterministic order within a shard, each document's bin is the
context-window index its starting token offset falls in
(bin = cum_tokens_before // budget). Pure window functions + integer
math: one shuffle on the shard key, no Python, no sequential state, and
an exact SQL twin. Semantics note (documented, deliberate): a document
whose tokens straddle a budget boundary stays WHOLE in its starting bin,
so bins can overflow by up to max_doc_tokens − 1 — the streaming-
concatenation view of packing. True greedy first-fit (bins never
overflow; remainder resets per bin) needs sequential per-shard state —
that variant is `pack_greedy` below (per-shard Arrow kernel; shards are
bounded by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_stream_offset(
    docs: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    shard_col: str = "shard",
) -> DataFrame:
    """+ ``bin`` column: cum-tokens-before-this-doc // budget, over docs
    ordered by ``id_col`` within ``shard_col``. One shuffle, all
    codegen."""
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return docs.withColumn(
        "bin", (cum_before / F.lit(budget)).cast("bigint")
    )


def pack_greedy(
    docs: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    shard_col: str = "shard",
) -> DataFrame:
    """True greedy first-fit-sequential packing: a doc joins the current
    bin if it fits, else opens the next (over-budget single docs get a
    bin of their own). Sequential by nature → per-shard Arrow kernel
    (applyInPandas); distributed across shards, bounded within one."""
    import pandas as pd

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields
    ) + ", bin bigint"

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins = []
        cur_bin, cur_fill = 0, 0
        for t in pdf[token_col].to_numpy():
            t = int(t)
            if cur_fill > 0 and cur_fill + t > budget:
                cur_bin += 1
                cur_fill = 0
            bins.append(cur_bin)
            cur_fill += t
        pdf["bin"] = bins
        return pdf

    return docs.groupBy(shard_col).applyInPandas(kernel, schema=schema)
