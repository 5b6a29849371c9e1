"""Deterministic sampling, splitting, and mixing for training-data pipelines.

At 100 TB, sampling must be (a) a pure column expression — no RNG state, no
shuffle, evaluated inside the scan stage so Catalyst can pipeline it with
pushed-down filters; and (b) deterministic and engine-portable, so a
train/val/test split is reproducible across runs, engines, cluster sizes,
and repartitions. Spark's `df.sample`/`sampleBy` are neither: they seed a
per-partition RNG, so the selected rows change whenever partitioning does.

Everything here keys on an md5 of a stable id column:
``bucket(id) = first-60-bits-of-md5(seed || id) mod buckets``. The same
arithmetic runs in any engine with md5 (DuckDB:
``('0x' || substr(md5(seed || id), 1, 15))::BIGINT % buckets``), which is
what lets the driver's oracle gate check these operators exactly.

No reference analog — this is beyond-reference training-pipeline surface
(dataset curation: reproducible splits, per-stratum downsampling, weighted
source mixing).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Bucket bounds use round(), not int(): 0.6*1e6 is 599999.99…
#: in binary floating point and truncation would silently shift a bound
#: off the value an oracle SQL hardcodes.
#: Resolution of the split/sample lattice. 2^60 md5 bits mod 1e6 is uniform
#: to ~1e-12 relative bias — far below any sampling-noise floor.
BUCKETS = 1_000_000


def hash_bucket(col: Column | str, seed: str = "", buckets: int = BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets) from md5(seed || value).

    Pure column expression: no shuffle, no state, stable under
    repartitioning. Distinct `seed`s give independent lattices, so a
    sample drawn with one seed is unbiased within a split drawn with
    another.
    """
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed), c.cast("string")).cast("binary")), 1, 15),
        16, 10,
    ).cast("long")
    return h % buckets


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: Mapping[str, float],
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a split label ('train'/'val'/...) by hash lattice.

    `weights` are relative (normalized internally); label boundaries are
    cumulative bucket ranges, so a row's split depends only on (seed, id) —
    growing the dataset never reassigns existing rows, and the same id
    lands in the same split on every engine.
    """
    if not weights:
        raise ValueError("hash_split needs at least one split weight")
    total = float(sum(weights.values()))
    b = hash_bucket(id_col, seed)
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, wgt in items[:-1]:
        acc += wgt / total
        bound = round(acc * BUCKETS)
        cond = b < F.lit(bound)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
    seed: str = "strat",
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows.

    The curation workhorse: downsample over-represented languages/sources
    to a target mix without a shuffle — the filter is a column expression
    against the hash lattice, evaluated in the scan stage. Strata not in
    `fractions` keep `default_fraction`.
    """
    b = hash_bucket(id_col, seed)
    thr = F.lit(round(default_fraction * BUCKETS))
    for stratum, frac in fractions.items():
        thr = F.when(F.col(strata_col) == stratum, round(frac * BUCKETS)).otherwise(thr)
    return df.where(b < thr)


def token_budget(
    df: DataFrame,
    id_col: str,
    source_col: str,
    n_tokens_col: str,
    budget: int,
    priority_col: str | None = None,
) -> DataFrame:
    """Per-source token-budget selection — the corpus-assembly step that
    caps each source's contribution: within every source, take documents
    in (priority DESC, id ASC) order until the source's token budget is
    filled. The document that CROSSES the budget is included (fill-then-
    cut at document granularity, the standard rule — a budget is a target
    mass, not a hard ceiling), everything after it is dropped. With no
    priority column, documents fill in id order.

    Returns the selected rows with `cum_tokens` (inclusive running mass,
    the audit column a corpus manifest wants).

    Scale shape: ONE window over the source partitions — an exchange
    keyed by source plus a per-partition sort; no global sort, no
    driver-side state. Sources are the natural partition of a corpus
    manifest, so the window parallelizes across them; a single pathological
    source that dwarfs the rest is the same skew story as any keyed agg
    (AQE skew handling applies).
    """
    order = [F.col(id_col).asc()]
    if priority_col:
        order = [F.col(priority_col).desc(), F.col(id_col).asc()]
    w = (
        Window.partitionBy(source_col).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn(
        "cum_tokens", F.sum(F.col(n_tokens_col)).over(w).cast("long"))
    return out.where(
        F.col("cum_tokens") - F.col(n_tokens_col) < F.lit(budget))


def weighted_mix(
    sources: Mapping[str, tuple[DataFrame, float]],
    id_col: str,
    seed: str = "mix",
    source_col: str = "mix_source",
) -> DataFrame:
    """Union of hash-sampled sources tagged with their origin.

    `sources` maps name -> (df, keep_fraction). Each source is thinned on
    its own (seed || name) lattice, then unioned by name — the standard
    weighted-mixture construction for training corpora, with the same
    reproducibility guarantees as `hash_split`. Column sets must match.
    """
    parts = []
    for name, (sdf, frac) in sources.items():
        keep = sdf.where(hash_bucket(id_col, seed + name) < F.lit(round(frac * BUCKETS)))
        parts.append(keep.withColumn(source_col, F.lit(name)))
    if not parts:
        raise ValueError("weighted_mix needs at least one source")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
