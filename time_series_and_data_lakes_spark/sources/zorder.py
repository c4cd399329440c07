"""Z-order (Morton-curve) data layout for multi-column data skipping.

A time-partitioned store prunes on time, but a box predicate like
``user_id BETWEEN a AND b AND ts BETWEEN t1 AND t2`` still reads every
file of the surviving partitions when files are laid out by one column
only: sorting by time packs every user into every file, sorting by user
packs every time into every file. Interleaving the bits of both columns
(the Morton / Z-order curve — the public design behind Delta OPTIMIZE
ZORDER and Iceberg's sort orders) makes file min/max envelopes tight in
BOTH dimensions, so parquet row-group statistics skip most files for a
box predicate.

Mechanics here: each column is affine-scaled to a ``bits``-wide integer
using its global min/max (one tiny aggregate), the per-column codes are
bit-interleaved into one bigint sort key — a pure column expression (an
``aggregate`` fold over the bit positions, whole-stage codegen) — and the
frame is range-partitioned + sorted by that key before writing. Cost is
one extra exchange at write time; the payoff is persistent, query-side
data skipping with no index structure to maintain.

Scale posture: the min/max aggregate is a 1-row driver read (model
parameters, like the ANN centroid collects); the write's range exchange
is the same shuffle any sorted write pays; skew in the key space degrades
file balance, not correctness (range partitioner samples the keys).
"""

from __future__ import annotations

import functools
import glob
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def zorder_key(coords: list[Column], bits: int = 16) -> Column:
    """Interleave ``bits`` bits of each pre-scaled coordinate (values must
    already be in ``[0, 2^bits)``) into one Morton key: bit i of
    coordinate j lands at position ``i * k + j``. One fold over the bit
    positions with a (key, multiplier, remainders...) accumulator — every
    per-step operation is constant arithmetic (LSB extract, halve,
    multiplier × 2^k), so the whole key stays inside codegen."""

    k = len(coords)
    if bits * k > 63:
        raise ValueError(
            f"zorder key needs bits*len(coords) <= 63 to fit a bigint "
            f"(got {bits}*{k} = {bits * k}) — lower bits or cluster fewer columns"
        )
    init = F.struct(
        F.lit(0).cast("bigint").alias("key"),
        F.lit(1).cast("bigint").alias("mult"),
        *[c.cast("bigint").alias(f"r{j}") for j, c in enumerate(coords)],
    )

    def halve(r: Column) -> Column:
        # shiftright is EXACT integral halving for the non-negative coords
        # the contract requires — `(r - r%2) / 2` routes through double,
        # which silently corrupts remainders past 2^53 (coordinates wider
        # than ~53 bits produced wrong keys)
        return F.shiftright(r, 1)

    def step(acc: Column, i: Column) -> Column:
        key = acc["key"] + functools.reduce(
            lambda a, b: a + b,
            [
                F.pmod(acc[f"r{j}"], F.lit(2)) * acc["mult"] * F.lit(1 << j)
                for j in range(k)
            ],
        )
        # the multiplier after the FINAL step (2^(bits*k)) is never read,
        # and at the advertised limit bits*k == 63 it would overflow bigint
        # (ANSI mode fails the whole write) — CASE evaluates only the taken
        # branch, so park it at 0 instead
        return F.struct(
            key.alias("key"),
            F.when(i < bits, acc["mult"] * F.lit(1 << k))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("mult"),
            *[halve(acc[f"r{j}"]).alias(f"r{j}") for j in range(k)],
        )

    return F.aggregate(F.sequence(F.lit(1), F.lit(bits)), init, step)["key"]


def scale_to_bits(c: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Affine-scale a bigint coordinate into ``[0, 2^bits)`` using global
    min/max — floor arithmetic, exact for spans < 2^53."""
    span = (cmax - cmin).cast("double")
    top = F.lit((1 << bits) - 1)
    return F.when(span == 0, F.lit(0).cast("bigint")).otherwise(
        F.floor(((c - cmin).cast("double") / span) * top.cast("double")).cast("bigint")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    n_files: int = 16,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered along the
    Z-order curve of ``cols`` (numeric or timestamp). Row-group min/max
    envelopes become tight in every clustered dimension, so box
    predicates skip most files (asserted by the layout test against a
    single-column-sorted control)."""
    longs = [
        F.unix_micros(F.col(c)).alias(f"__z{i}")
        if dict(df.dtypes)[c].startswith("timestamp")
        else F.col(c).cast("bigint").alias(f"__z{i}")
        for i, c in enumerate(cols)
    ]
    with_coords = df.select("*", *longs)
    bounds = with_coords.agg(
        *[
            agg
            for i in range(len(cols))
            for agg in (
                F.min(f"__z{i}").alias(f"__min{i}"),
                F.max(f"__z{i}").alias(f"__max{i}"),
            )
        ]
    ).collect()[0]
    scaled = [
        scale_to_bits(
            F.col(f"__z{i}"),
            F.lit(bounds[f"__min{i}"]),
            F.lit(bounds[f"__max{i}"]),
            bits,
        )
        for i in range(len(cols))
    ]
    keyed = with_coords.withColumn("__zkey", zorder_key(scaled, bits))
    (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey", *[f"__z{i}" for i in range(len(cols))])
        .write.mode("overwrite")
        .parquet(path)
    )


def files_intersecting_box(
    path: str, predicates: dict[str, tuple]
) -> tuple[int, int]:
    """Count (intersecting, total) parquet files whose column min/max
    statistics intersect a box predicate ``{col: (lo, hi)}`` — the
    metadata-only measure of how much a layout lets a scan skip."""

    import pyarrow.parquet as pq

    total = 0
    hit = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        total += 1
        intersects = True
        for col, (lo, hi) in predicates.items():
            cmin = cmax = None
            for rg in range(md.num_row_groups):
                rgm = md.row_group(rg)
                for ci in range(rgm.num_columns):
                    c = rgm.column(ci)
                    # has_min_max: a Statistics object may exist without
                    # min/max (stats disabled or unsupported physical
                    # type); None would poison the comparisons below, so
                    # such files conservatively count as intersecting
                    if (
                        c.path_in_schema == col
                        and c.statistics is not None
                        and c.statistics.has_min_max
                    ):
                        s = c.statistics
                        cmin = s.min if cmin is None else min(cmin, s.min)
                        cmax = s.max if cmax is None else max(cmax, s.max)
            if cmin is not None and (cmax < lo or cmin > hi):
                intersects = False
                break
        hit += int(intersects)
    return hit, total
