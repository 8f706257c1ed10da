"""Document materialization: transcript turns -> conversation documents.

Semantics mirror the reference's Media-from-Original derivation
(modules/model/.../Media.scala:5-33): the document is a pure,
deterministic function of its immutable turns, materialized under
stable ``(conv_id, turn_idx)`` order.  Per-turn text equality is
preserved: ``doc_text = concat_ws(" ", texts sorted by turn_idx)``
with null/empty turns contributing nothing (concat_ws skips nulls).

Doc ids are the analog of the reference's MediaAccessKey
(modules/model/.../package.scala:36-100): a deterministic, dense,
time-ordered key.  docID = dense rank over (min(ts), conv_id).

Scale note: a naive ``dense_rank() OVER (ORDER BY ...)`` uses a single
unpartitioned window — a one-reducer bottleneck at 10^9 docs.
``assign_doc_ids`` instead range-partitions on the key ONCE, sorts
within partitions, and enumerates each partition with its exclusive
prefix-sum offset in an Arrow pass (the offsets come from the count
job that also materializes the checkpoint; the per-partition offset
map is a tiny broadcast).  No further exchange — not even the
Window.partitionBy hash shuffle the previous version paid — and the
output partitions ARE the doc_id-range layout downstream writes
need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def materialize_documents(
    turns: DataFrame,
    max_turns: int | None = None,
    turn_chunk: int = 1024,
    extra_fields: tuple = (),
) -> DataFrame:
    """turns -> (conv_id, doc_text, doc_ts, n_turns).

    ``extra_fields``: additional turns columns (e.g. "tool", "role")
    whose per-conversation streams materialize as ``doc_field_<name>``
    columns alongside doc_text — the multi-field search-doc shape
    (SaoMedia.scala:17-47).  They ride the SAME chunked two-stage
    aggregation (the per-chunk struct already carries every column),
    so the bounded-memory argument below is unchanged; with no extra
    fields the plan is byte-identical to the single-field one.

    doc_ts = min(ts) over the conversation (orders the doc-id space by
    time, the reference's range-scannable key trick).

    BOUNDED two-stage aggregation (SURVEY §7 hard-point 4; reference
    analog: grouped(50) micro-batching, MediaServiceLive.scala:1526):
    a single ``collect_list`` of every turn of a conversation holds the
    whole conversation in one task's memory — one pathological
    multi-million-turn conversation OOMs its task at 10^12-turn scale.
    Instead:

      stage A: group by (conv_id, turn_idx // turn_chunk) — each group
               holds <= turn_chunk turns; sort within the chunk and
               concat to ONE partial string (plus the chunk's turn
               count / min ts);
      stage B: group by conv_id over the partials — <= ceil(max_turn_idx
               / turn_chunk) strings per group, ordered by chunk id.

    Byte-identity with the single-stage concat: concat_ws skips null
    turns, so an all-null chunk must contribute NOTHING to stage B (its
    partial is null, filtered out), while a chunk containing an empty
    string keeps it ("" joins like any value).  Chunks are contiguous
    in turn_idx order, so joining the per-chunk joins equals joining
    all turns (separator concatenation is associative once empty
    groups are dropped).

    ``max_turns``: optional cap — conversations with more turns are
    QUARANTINED (dropped here; list them with
    ``quarantined_conversations`` for the parse_quarantine discipline)
    BEFORE stage B, so a runaway conversation never materializes its
    full text anywhere.
    """
    chunked = turns.withColumn(
        "_chunk", F.floor(F.col("turn_idx") / F.lit(turn_chunk)).cast("long")
    )
    extra_fields = tuple(extra_fields)
    a_aggs = [
        F.sort_array(
            F.collect_list(F.struct("turn_idx", "text", *extra_fields))
        ).alias("_ts_sorted"),
        F.count("text").alias("_n_nonnull"),
        F.count("*").alias("_cnt"),
        F.min("ts").alias("_ts_min"),
    ]
    for f in extra_fields:
        a_aggs.append(F.count(f).alias(f"_n_{f}"))
    if "source" in turns.columns:
        # a conversation belongs to one store; min() is a deterministic
        # pick that doubles as a guard if the invariant is violated
        a_aggs.append(F.min("source").alias("_src"))
    partials = (
        chunked.groupBy("conv_id", "_chunk")
        .agg(*a_aggs)
        .select(
            "conv_id",
            "_chunk",
            # null partial when the chunk had no non-null turn — a ""
            # here would inject a phantom separator in stage B
            F.when(
                F.col("_n_nonnull") > 0,
                F.concat_ws(" ", F.col("_ts_sorted.text")),
            ).alias("_part"),
            *[
                F.when(
                    F.col(f"_n_{f}") > 0,
                    F.concat_ws(" ", F.col(f"_ts_sorted.{f}")),
                ).alias(f"_part_{f}")
                for f in extra_fields
            ],
            "_cnt",
            "_ts_min",
            *(["_src"] if "source" in turns.columns else []),
        )
    )
    if max_turns is not None:
        # pre-filter (not post-): the cap exists to bound stage-B task
        # memory, so over-cap conversations must never reach stage B.
        # The extra aggregation runs over the B-times-smaller partials
        # frame; lazy localCheckpoint shares the stage-A work between
        # the filter and stage B.
        partials = partials.localCheckpoint(eager=False)
        over = (
            partials.groupBy("conv_id")
            .agg(F.sum("_cnt").alias("_n"))
            .where(F.col("_n") > max_turns)
            .select("conv_id")
        )
        partials = partials.join(over, "conv_id", "left_anti")

    b_aggs = [
        F.sort_array(
            F.collect_list(
                F.struct(
                    "_chunk", "_part",
                    *[f"_part_{f}" for f in extra_fields],
                )
            )
        ).alias("_parts_sorted"),
        F.min("_ts_min").alias("doc_ts"),
        F.sum("_cnt").alias("n_turns"),
    ]
    cols = [
        "conv_id",
        F.concat_ws(
            " ",
            F.filter(
                F.col("_parts_sorted._part"), lambda x: x.isNotNull()
            ),
        ).alias("doc_text"),
        *[
            F.concat_ws(
                " ",
                F.filter(
                    F.col(f"_parts_sorted._part_{f}"),
                    lambda x: x.isNotNull(),
                ),
            ).alias(f"doc_field_{f}")
            for f in extra_fields
        ],
        "doc_ts",
        "n_turns",
    ]
    if "source" in turns.columns:
        b_aggs.append(F.min("_src").alias("source"))
        cols.append("source")
    return partials.groupBy("conv_id").agg(*b_aggs).select(*cols)


def quarantined_conversations(
    turns: DataFrame, max_turns: int
) -> DataFrame:
    """(conv_id, n_turns) of conversations EXCEEDING the cap — the rows
    ``materialize_documents(..., max_turns=...)`` drops, surfaced for
    the quarantine table (same discipline as parse_quarantine,
    operators/analytics2.py)."""
    return (
        turns.groupBy("conv_id")
        .agg(F.count("*").alias("n_turns"))
        .where(F.col("n_turns") > max_turns)
    )


def assign_doc_ids(docs: DataFrame, num_ranges: int = 32,
                   with_count: bool = False):
    """Add a dense 0-based ``doc_id`` ordered by (doc_ts, conv_id).

    Distributed dense rank: repartitionByRange on the ordering key,
    sort + Arrow enumeration within each range partition, plus an
    exclusive prefix sum of partition sizes.  The per-partition counts
    (<= num_ranges rows) are collected to the driver — the prefix sum
    is built locally and broadcast back, so the count job that
    materializes the checkpoint also yields the EXACT corpus size for
    free (the build uses it to derive the range geometry before any
    write).  No global single-partition window, and (r08) no second
    exchange either: enumeration happens inside the checkpointed range
    partitions, guarded by a per-batch partition-id assertion.

    ``with_count=True`` returns ``(df, n_docs)``.
    """
    from pyspark.sql import types as T

    spark = docs.sparkSession
    ranged = docs.repartitionByRange(num_ranges, "doc_ts", "conv_id").withColumn(
        "_pid", F.spark_partition_id()
    )
    ranged = ranged.localCheckpoint(eager=False)

    counts = sorted(
        ranged.groupBy("_pid").count().collect(), key=lambda r: r["_pid"]
    )
    n_docs, offs = 0, {}
    for r in counts:
        offs[int(r["_pid"])] = n_docs
        n_docs += int(r["count"])
    bc = spark.sparkContext.broadcast(offs)

    # r08: enumerate WITHIN the checkpointed range partitions instead
    # of a Window.partitionBy(_pid) — that window forced a second full
    # exchange (hash on a partition-count-cardinality key, guide §2.4)
    # just to regroup rows the range partitioning already grouped.
    # sortWithinPartitions + an Arrow pass that adds offset+row-index
    # is exchange-free, and the OUTPUT keeps the range layout: each
    # partition holds a contiguous, sorted doc_id interval, so the
    # caller needs no further repartitionByRange("doc_id") either.
    # The partition key is the RECORDED ``_pid`` column, never
    # TaskContext.partitionId(): a consumer plan that fuses this
    # mapInArrow into a wider stage (e.g. a union's second branch)
    # offsets the task index while the data and its recorded _pid are
    # untouched.  The sub-DAG from checkpoint to kernel is a private
    # 1:1 narrow chain, so every batch holds exactly one _pid — the
    # kernel ASSERTS that, failing loudly rather than mis-numbering.
    pid_idx = len(ranged.columns) - 1  # _pid was appended last
    out_schema = T.StructType(
        list(ranged.schema.fields)
        + [T.StructField("doc_id", T.LongType(), False)]
    )

    def _add_ids(batches):
        import pyarrow as pa

        seen: dict = {}
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                yield batch.append_column(
                    "doc_id", pa.array([], type=pa.int64())
                )
                continue
            pids = batch.column(pid_idx)
            pid = pids[0].as_py()
            if pids[n - 1].as_py() != pid:
                raise RuntimeError(
                    "assign_doc_ids: batch spans checkpoint partitions "
                    f"({pid} .. {pids[n - 1].as_py()})"
                )
            off = bc.value.get(pid, 0)
            s = seen.get(pid, 0)
            ids = pa.array(
                range(off + s, off + s + n), type=pa.int64()
            )
            seen[pid] = s + n
            yield batch.append_column("doc_id", ids)

    out = (
        ranged.sortWithinPartitions("doc_ts", "conv_id")
        .mapInArrow(_add_ids, out_schema)
        .drop("_pid")
    )
    return (out, n_docs) if with_count else out


def build_documents(turns: DataFrame, num_ranges: int = 32,
                    max_turns: int | None = None,
                    with_count: bool = False,
                    extra_fields: tuple = ()):
    """Full docs table: doc_id, conv_id, doc_text, doc_ts, n_turns
    (+ source when the turns carry one — used for per-source rules;
    + doc_field_<name> per extra field — multi-field search docs).
    ``max_turns`` quarantines runaway conversations (see
    materialize_documents).  ``with_count=True`` returns
    ``(df, n_docs)`` — the exact doc count the id-assignment pass
    computes anyway (used to derive range geometry before any
    write)."""
    docs, n_docs = assign_doc_ids(
        materialize_documents(turns, max_turns, extra_fields=extra_fields),
        num_ranges,
        with_count=True,
    )
    cols = ["doc_id", "conv_id", "doc_text", "doc_ts", "n_turns"]
    cols += [f"doc_field_{f}" for f in extra_fields]
    if "source" in docs.columns:
        cols.append("source")
    out = docs.select(*cols)
    return (out, n_docs) if with_count else out
