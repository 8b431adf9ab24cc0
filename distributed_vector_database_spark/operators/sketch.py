"""Mergeable-sketch operators with register-level cross-engine parity.

Spark ships approx_count_distinct (HLL++), but its register layout is
JVM-internal — you cannot hash-verify it against another engine, merge
it with sketches built elsewhere, or persist it as an auditable table.
This module builds the HyperLogLog registers EXPLICITLY from md5 bits,
so the same arithmetic runs in Spark (conv/bin built-ins, all
JVM-side codegen) and in ANSI SQL (the DuckDB oracle), and the
register table itself becomes the exchange format: group-by-bucket MAX
is the sketch union, so per-partition/per-day register tables merge
associatively — the property that makes distinct-count maintainable
over 100 TB and over streams (fold MAX into a persisted register
state, the additive-fold discipline of streaming/expectations.py).

Layout: h = 60 bits of md5 (15 hex chars — fits signed 64-bit in both
engines); bucket = h mod 2^p; w = h >> p (60-p bits); rho(w) =
(60-p) - floor(log2(w)) computed EXACTLY as (60-p) - length(bin(w)) + 1
(bin() is unpadded in both Spark and DuckDB, so string length is the
integer bit-length — no float log anywhere); empty w (all-zero rest)
gets the max rank 60-p+1. Estimate: alpha_m · m² / Σ 2^{-M_j} with
the standard small-range linear-counting correction.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_BITS = 60  # md5-derived hash width (15 hex chars, signed-64 safe)


def _alpha(m: int) -> float:
    """Standard HLL bias constant (Flajolet et al. 2007)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _h60(key: Column) -> Column:
    """60-bit md5-derived hash, identical to the SQL oracle's
    CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def hll_registers(
    df: DataFrame, key_col: str, p: int = 6
) -> DataFrame:
    """The m = 2^p HyperLogLog registers for the distinct set of
    `key_col`: (bucket, register) with register = max over keys of
    rho(hash >> p). Only non-empty buckets appear (an absent bucket is
    register 0). One hash-free map pass plus ONE m-bounded groupBy —
    the shuffle moves at most m rows per upstream partition thanks to
    partial (map-side) MAX."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    h = _h60(F.col(key_col))
    bucket = F.pmod(h, F.lit(1 << p)).cast("int")
    # h >> p via shiftright: INTEGER arithmetic — float division would
    # lose bits above 2^53 (h is 60 bits). Oracle side uses h // 2^p.
    w = F.shiftright(h, p)
    rest_bits = HLL_BITS - p
    rho = F.when(w == 0, F.lit(rest_bits + 1)).otherwise(
        F.lit(rest_bits) - F.length(F.bin(w)) + 1
    )
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(bucket.alias("bucket"), rho.cast("int").alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("register"))
        .orderBy("bucket")
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Sketch union: the register-wise MAX across sketches. Because
    max is associative/commutative/idempotent, register tables built
    per partition, per day, or per source merge in any order — the
    mergeability that makes the sketch a maintainable state."""
    if not register_tables:
        raise ValueError("need at least one register table")
    u = register_tables[0]
    for t in register_tables[1:]:
        u = u.unionByName(t)
    return (
        u.groupBy("bucket").agg(F.max("register").alias("register")).orderBy("bucket")
    )


def hll_estimate(
    df: DataFrame, key_col: str, p: int = 6
) -> DataFrame:
    """One-row distinct-count estimate from the explicit registers,
    with the exact count alongside (computable at test scale; at
    100 TB you drop the exact branch — that is the sketch's point).
    Output: (est, exact, rel_err) — est/rel_err rounded to 4.

    Small-range correction: when est <= 2.5m and some buckets are
    empty, use linear counting m·ln(m/V) (V = empty buckets), per the
    original paper."""
    m = 1 << p
    regs = hll_registers(df, key_col, p)
    agg = regs.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("register"))).alias("s"),
        F.count(F.lit(1)).alias("nonempty"),
    )
    exact = df.filter(F.col(key_col).isNotNull()).agg(
        F.countDistinct(key_col).alias("exact")
    )
    alpha = _alpha(m)
    raw = F.lit(alpha * m * m) / (
        F.col("s") + (F.lit(m) - F.col("nonempty"))  # empty buckets add 2^0
    )
    empty = F.lit(m) - F.col("nonempty")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / empty),
    ).otherwise(raw)
    return (
        agg.crossJoin(exact)
        .select(
            F.round(est, 4).alias("est"),
            F.col("exact").cast("long").alias("exact"),
            F.round(F.abs(est - F.col("exact")) / F.col("exact"), 4).alias(
                "rel_err"
            ),
        )
    )
