"""Deterministic stratified sampling for training-data curation.

Corpus mixing downsamples strata (language, source, quality bucket) at
different rates.  `df.sample()` is seed-dependent on partitioning and
not reproducible across engines; here membership is a PURE FUNCTION of
(row id, seed): keep a row iff

    md5(id || '|' || seed)'s first 8 hex digits, as an int mod M,
    falls below rate * M.

That makes the sample (a) identical on any cluster size or partition
layout, (b) stable under re-runs and appends (a doc's fate never
changes), and (c) recomputable by the DuckDB oracle — the same
md5-prefix trick the dedup/ANN oracles use for cross-engine
determinism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_M = 1_000_000


def sample_key(id_col, seed: int) -> Column:
    """Uniform-ish integer in [0, M) derived from (id, seed).

    F.concat (NOT concat_ws) so a NULL id null-propagates: the key is
    null, every comparison is false, and null-id rows are always
    dropped — matching the SQL oracle's ``id::VARCHAR || seed`` and
    keeping membership a pure function of a real id."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.col(id_col).cast("string"),
                             F.lit("|" + str(seed)))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _M
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict,
    id_col: str = "doc_id",
    seed: int = 42,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with its stratum's probability (deterministic).

    ``rates``: stratum value -> keep rate in [0, 1]; strata not listed
    use ``default_rate``.  Returns the input rows (all columns) plus
    nothing — membership only, no reweighting column."""
    rate = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(float(r))).otherwise(rate)
    return df.where(sample_key(id_col, seed) < (rate * _M).cast("long"))
