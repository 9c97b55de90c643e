"""Deterministic hash-based sampling (training-data curation step).

Rate-controlled per-stratum downsampling that is reproducible across
runs, engines, and cluster sizes: a row is kept iff

    pmod(portable_hash64(id), 1000) < rate_per_mille[stratum]

— no RNG state, no seed plumbing, no driver coordination; the decision is
a pure projection, so Catalyst pushes it into the scan and the operator
costs zero shuffles at any scale (contrast ``df.sampleBy``, whose
Bernoulli draw depends on partition-split RNG and is not stable across
repartitioning). The md5-based ``portable_hash64`` keeps a cross-engine
oracle (DuckDB ``md5_number_upper`` signed view); swap ``F.xxhash64`` for
throughput once verified.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ingestion3_spark.functions.dedupe import portable_hash64


def hash_mille(col) -> Column:
    """Deterministic per-row draw in [0, 1000)."""
    return F.pmod(portable_hash64(col), F.lit(1000))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates_per_mille: dict[str, int],
    default_per_mille: int = 0,
) -> DataFrame:
    """Keep each row with its stratum's per-mille rate, deterministically."""
    rate = None
    for k, v in sorted(rates_per_mille.items()):
        cond = F.col(stratum_col) == k
        rate = F.when(cond, v) if rate is None else rate.when(cond, v)
    rate = (
        rate.otherwise(default_per_mille) if rate is not None
        else F.lit(default_per_mille)
    )
    return df.filter(hash_mille(F.col(id_col)) < rate)
