"""Bloom-filtered semi join: broadcast a compact bitset built from the
dim-side key set, pre-filter the fact scan with k hash probes, then
confirm survivors with a real semi join so the result stays EXACT.

The reference has no joins at all; this implements the classic
100 TB-scale pattern Spark's own runtime row-level filtering uses
(spark.sql.optimizer.runtimeFilter.bloomFilter) — made explicit so the
pruning is visible, testable, and available to any operator here.

Why this shape survives a 100x scale-up:
- the bitset is m/64 longs (8 KiB at the default m=65536) regardless
  of fact size — broadcast once, evaluated JVM-side per row (bitwise
  shift/and on a literal array; no Python, no UDF);
- the only driver-side collect is the DISTINCT BIT POSITIONS of the
  dim keys, bounded by m (never by |dim| or |fact|);
- false positives (~(1-e^{-kn/m})^k) only cost a little extra input to
  the confirming semi join — correctness never depends on m/k;
- the confirming shuffle moves only the surviving fraction of the
  fact: for a selective dim set that is the difference between
  shuffling 100 TB and shuffling 100 GB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_M_BITS = 1 << 16
DEFAULT_K = 4


def _bit_positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bloom probe positions for a key: xxhash64 with distinct seeds,
    non-negative mod m. All JVM-side built-ins."""
    return [
        F.pmod(F.xxhash64(key.cast("string"), F.lit(seed)), F.lit(m_bits))
        for seed in range(1, k + 1)
    ]


def bloom_bitset(
    dim: DataFrame, key_col: str, m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K
) -> list[int]:
    """Build the bitset (list of m_bits/64 longs) from the dim keys.

    Collects only the distinct bit positions (<= m_bits rows), never
    the keys themselves.
    """
    # NULL dim keys never match a semi join, so they contribute no bits
    # (xxhash64 of a NULL cast-to-string would otherwise hash just the
    # seed, giving every NULL the same k positions)
    pos_col = F.explode(F.array(*_bit_positions(F.col(key_col), m_bits, k)))
    positions = [
        r[0]
        for r in dim.filter(F.col(key_col).isNotNull())
        .select(pos_col.alias("pos"))
        .distinct()
        .collect()
    ]
    words = [0] * ((m_bits + 63) // 64)
    for p in positions:
        words[p // 64] |= 1 << (p % 64)
    # to signed 64-bit so the literal array round-trips as long
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def _bitset_bytes(words: list[int]) -> bytes:
    """Bitset longs -> little-endian bytes: bit p of the long layout
    (words[p//64] >> (p%64)) is bit p%8 of byte p//8."""
    return b"".join((w & ((1 << 64) - 1)).to_bytes(8, "little") for w in words)


def bloom_might_contain(
    key: Column, words: list[int], m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K
) -> Column:
    """JVM-side membership probe: all k bits set in the bitset, bound
    ONCE as a single BinaryType literal (m_bits/8 bytes).

    The previous form inlined the bitset as an m/64-element
    CreateArray of long literals per probe — ~k*m/64 (=4096 at the
    defaults) expressions RE-EVALUATED PER ROW, and a codegen method
    large enough to fall off JIT (measured 44x the pin at 8 cores).
    A binary literal is a true constant; each probe is one
    substr+conv+getbit chain (~6 expressions), so the filter stays a
    small, JIT-friendly codegen method at any m_bits.
    """
    lit_bin = F.lit(_bitset_bytes(words))
    cond = F.lit(True)
    for pos in _bit_positions(key, m_bits, k):
        byte = F.substr(lit_bin, (pos / 8).cast("int") + 1, F.lit(1))
        val = F.conv(F.hex(byte), 16, 10).cast("int")
        bit = F.getbit(val, F.pmod(pos, F.lit(8)).cast("int"))
        cond = cond & (bit == 1)
    return cond


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    confirm: bool = True,
    broadcast_confirm: bool = True,
) -> DataFrame:
    """EXACT semi join accelerated by a broadcast bloom pre-filter.

    confirm=True (default) keeps the result exactly equal to
    fact SEMI JOIN dim — the bloom only prunes the fact before the
    real join. confirm=False returns the bloom-approximate superset
    (useful when a downstream exact join re-checks anyway).
    broadcast_confirm=False shuffles the confirming join instead —
    use when the dim key set is too large to broadcast (the bloom
    still prunes the fact side of that shuffle, which is the point).
    """
    words = bloom_bitset(dim, dim_key, m_bits, k)
    # NULL fact keys can never semi-join-match: drop them in the probe
    # so the confirm=False superset honors semi-join NULL semantics
    pruned = fact.filter(
        F.col(fact_key).isNotNull()
        & bloom_might_contain(F.col(fact_key), words, m_bits, k)
    )
    if not confirm:
        return pruned
    keys = dim.select(F.col(dim_key).alias(fact_key)).distinct()
    if broadcast_confirm:
        keys = F.broadcast(keys)
    return pruned.join(keys, fact_key, "left_semi")
