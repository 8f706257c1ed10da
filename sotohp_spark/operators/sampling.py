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


def temperature_mix(
    df: DataFrame,
    source_col: str = "source",
    alpha: float = 0.5,
    budget_frac: float = 0.5,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Temperature-weighted corpus mixing (the multilingual/multi-source
    sampling recipe of Arivazhagan et al. 2019 §4.2 / Brown et al.
    2020 table 2.2): target share of source s ∝ n_s^alpha (alpha < 1
    upweights rare sources), scaled to keep ~budget_frac of the corpus.

        rate_s = min(1, budget_frac * N_total * n_s^alpha / Z / n_s),
        Z = Σ n_s^alpha

    Everything stays ONE lazy plan: per-source counts aggregate
    map-side, the ~|sources|-row rate table is broadcast back onto the
    corpus, and membership is the same pure (id, seed) hash as
    stratified_sample — cluster-size independent, append-stable, and
    recomputable by the DuckDB oracle (rates rounded to 6 dp so both
    engines compare against the identical integer threshold).  No
    driver collect anywhere.

    Rows with a NULL source are dropped (no stratum to mix into —
    the equality join can't match them), mirroring stratified_sample's
    null-id discipline: membership must be a pure function of real
    keys.
    """
    counts = df.where(F.col(source_col).isNotNull()).groupBy(source_col).agg(
        F.count("*").cast("double").alias("_n")
    )
    z = counts.agg(
        F.sum(F.pow("_n", alpha)).alias("_z"),
        F.sum("_n").alias("_tot"),
    )
    rates = counts.crossJoin(F.broadcast(z)).select(
        source_col,
        F.floor(
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(budget_frac)
                    * F.col("_tot")
                    * F.pow("_n", alpha)
                    / F.col("_z")
                    / F.col("_n"),
                ),
                6,
            )
            * _M
        ).cast("long").alias("_thresh"),
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .where(sample_key(id_col, seed) < F.col("_thresh"))
        .drop("_thresh")
    )
