"""Deterministic, cross-run-stable ids.

The engine never uses ``monotonically_increasing_id`` for persisted ids
(SURVEY.md §4.3(2)): every id is a content hash so re-runs, retries and
different partitionings produce identical output. On the Spark side ids are
computed with the builtin ``xxhash64`` expression (seed 42); this module
provides a pure-Python XXH64 so the single-process oracle produces
bit-identical ids. The XXH64 algorithm is public (Yann Collet,
github.com/Cyan4973/xxHash); this is an independent from-scratch
implementation of the published spec.
"""

from __future__ import annotations

MASK64 = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

SPARK_XXHASH_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * P2) & MASK64
    acc = _rotl(acc, 31)
    return (acc * P1) & MASK64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * P1 + P4) & MASK64


def xxh64(data: bytes, seed: int = SPARK_XXHASH_SEED) -> int:
    """XXH64 of ``data`` (unsigned 64-bit result)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK64
        v2 = (seed + P2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - P1) & MASK64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        acc = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        acc = _merge_round(acc, v1)
        acc = _merge_round(acc, v2)
        acc = _merge_round(acc, v3)
        acc = _merge_round(acc, v4)
    else:
        acc = (seed + P5) & MASK64
    acc = (acc + n) & MASK64
    while i + 8 <= n:
        acc ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        acc = (_rotl(acc, 27) * P1 + P4) & MASK64
        i += 8
    if i + 4 <= n:
        acc ^= (int.from_bytes(data[i : i + 4], "little") * P1) & MASK64
        acc = (_rotl(acc, 23) * P2 + P3) & MASK64
        i += 4
    while i < n:
        acc ^= (data[i] * P5) & MASK64
        acc = (_rotl(acc, 11) * P1) & MASK64
        i += 1
    acc ^= acc >> 33
    acc = (acc * P2) & MASK64
    acc ^= acc >> 29
    acc = (acc * P3) & MASK64
    acc ^= acc >> 32
    return acc


def _signed64(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def stable_id(*parts) -> int:
    """Signed-64 content hash matching Spark's ``xxhash64(concat_ws('|', ...))``.

    All parts are rendered as their string form and joined with '|', then
    XXH64(seed=42) is applied to the UTF-8 bytes — the exact value Spark's
    builtin produces for the same concatenated string column.
    """
    key = "|".join(str(p) for p in parts)
    return _signed64(xxh64(key.encode("utf-8")))


def spark_stable_id_expr(*cols):
    """Spark Column computing the same id as :func:`stable_id`.

    ``cols`` are Column objects or column-name strings; they are cast to
    string and concat_ws('|')-joined before hashing, so the bytes hashed are
    identical to the oracle side.
    """
    from pyspark.sql import functions as F

    parts = [F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in cols]
    return F.xxhash64(F.concat_ws("|", *parts))
