"""Hash / sharding / sketch primitives, all as native Catalyst exprs.

- shard_id: the reference routes every point op by
  int(md5(key),16) % SHARD_COUNT (src/utils/shared_utils.py:4-7, used at
  src/coordinator/handler.py:119,140,157). Implemented as a Horner fold
  over the md5 hex digits so it is exact for ANY shard count, not just
  powers of two, and stays JVM-side (no UDF).
- hash32/hash60: stable 32/60-bit integer hashes derived from md5 hex —
  deterministic across engines (unlike F.hash/xxhash64, which a SQL
  oracle can't reproduce), used as the base hash for MinHash/SimHash.
- minhash_signature / simhash: sketches for near-dup detection
  (SURVEY §2.3), built from hash32 with fixed affine permutations
  (seeded once, module-level) so results are reproducible and
  oracle-checkable.

Scale: every function here is a pure column expression — codegen'd,
shuffle-free, and embarrassingly parallel.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

from distributed_vector_database_spark.config import SHARD_COUNT

# Mersenne-ish prime > 2^32 for MinHash permutations (universal hashing).
MINHASH_PRIME = 4294967311
NUM_PERM_DEFAULT = 16
# 60, not 64: the base hash is conv(15 md5 hex chars) — 16 chars can
# exceed signed int64 (Spark conv returns long), and 60 bits keeps the
# sketch, its blocks, and all shifts non-negative in Spark AND DuckDB
# (arithmetic >> on a negative long would corrupt block extraction).
SIMHASH_BITS = 60

_rng = random.Random(42)
# a in [1, 2^31), b in [0, 2^31): a*h + b < 2^63 for 32-bit h -> no overflow
MINHASH_PERMS: list[tuple[int, int]] = [
    (_rng.randrange(1, 2**31), _rng.randrange(0, 2**31)) for _ in range(64)
]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def shard_id(key: Column | str, shard_count: int = SHARD_COUNT) -> Column:
    """int(md5(key), 16) % shard_count, exactly — Horner fold over the 32
    hex chars: acc = (acc*16 + digit) % N. (src/utils/shared_utils.py:4-7)
    """
    digits = F.split(F.md5(_col(key).cast("string")), "(?!$)")
    return F.aggregate(
        digits,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 16 + F.conv(c, 16, 10).cast("long")) % shard_count,
    ).cast("int")


def hash32(s: Column | str) -> Column:
    """Stable unsigned-32-bit hash: first 8 hex chars of md5 → long."""
    return F.conv(F.substring(F.md5(_col(s).cast("string")), 1, 8), 16, 10).cast(
        "long"
    )


def hash60(s: Column | str) -> Column:
    """Stable 60-bit hash: first 15 hex chars of md5 → long (fits signed
    64-bit with headroom for arithmetic)."""
    return F.conv(F.substring(F.md5(_col(s).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def minhash_signature(
    shingles: Column | str, num_perm: int = NUM_PERM_DEFAULT
) -> Column:
    """MinHash signature (array<long>, length num_perm) of an array of
    shingle strings: sig[j] = min over shingles of (a_j*h32(s)+b_j) % P.

    Pure expressions: one transform per permutation over the shingle
    array, no shuffle, no UDF."""
    hashes = F.transform(
        _col(shingles),
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long"),
    )

    def perm(a: int, b: int):
        # closure factory: a bare 1-arg lambda, as PySpark infers the
        # higher-order-function arity from the Python signature
        return lambda h: (a * h + b) % MINHASH_PRIME

    mins = [
        F.array_min(F.transform(hashes, perm(a, b)))
        for a, b in MINHASH_PERMS[:num_perm]
    ]
    return F.array(*mins)


def minhash_bands(sig: Column | str, bands: int, rows_per_band: int) -> Column:
    """LSH banding: array of (band_id, band_hash-string) structs; docs
    sharing any band are near-dup candidates. band_hash = the band's
    signature slice joined — exact-match joinable."""
    sig = _col(sig)
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.concat_ws(
                    "_",
                    *[
                        F.element_at(sig, i * rows_per_band + r + 1).cast("string")
                        for r in range(rows_per_band)
                    ],
                ).alias("band_key"),
            )
            for i in range(bands)
        ]
    )


def simhash(tokens: Column | str, bits: int = SIMHASH_BITS) -> Column:
    """SimHash over an array of token strings: bit b of the result is 1
    iff sum over tokens of (bit b of h60(token) ? +1 : -1) > 0."""
    hashes = F.transform(
        _col(tokens),
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
    )
    def bit_vote(b: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    out = F.lit(0).cast("long")
    for b in range(bits):
        vote = F.aggregate(hashes, F.lit(0).cast("long"), bit_vote(b))
        out = out + F.when(vote > 0, F.lit(2**b).cast("long")).otherwise(0)
    return out


def hamming64(a: Column | str, b: Column | str) -> Column:
    """Hamming distance between two long columns (bit_count of xor)."""
    return F.bit_count(_col(a).bitwiseXOR(_col(b)))
