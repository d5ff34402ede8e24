"""Pure-Python murmur3_32 (F1).

The reference uses Guava's ``Hashing.murmur3_32`` for Redis field keys
(``RedisHashDecoder.java:89-96``), SSTable table-name suffixes
(``SSTableOnlineRetriever.trimAndHash:152-162``) and spec hashes
(``FeatureTable.java:390``). We keep natural columns instead of hashed KV
fields, so this is only used for name canonicalization (long table-name
trimming) — implemented from the public MurmurHash3 algorithm
(Austin Appleby, public domain).
"""

from __future__ import annotations


def murmur3_32(data: bytes | str, seed: int = 0) -> int:
    if isinstance(data, str):
        data = data.encode("utf-8")
    c1, c2 = 0xCC9E2D51, 0x1B873593
    length = len(data)
    h = seed & 0xFFFFFFFF
    rounded = length & ~0x3
    for i in range(0, rounded, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[rounded:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= length
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


def trim_and_hash(name: str, max_len: int = 50) -> str:
    """Long-name canonicalization: trim to ``max_len`` with a murmur3 suffix.

    Parity: ``SSTableOnlineRetriever.trimAndHash``
    (``storage/connectors/sstable/.../SSTableOnlineRetriever.java:152-162``),
    byte-for-byte: names longer than the limit keep the first
    ``max_len - 8`` chars and append Guava's ``HashCode.toString()`` of
    ``murmur3_32`` over the **tail** ``name[max_len-8:]`` — Guava renders
    the hash's 4 bytes in little-endian order as 8 lowercase hex chars —
    so generated table names match reference-generated ones exactly.
    """
    if len(name) <= max_len:
        return name
    prefix_len = max_len - 8
    h = murmur3_32(name[prefix_len:])
    suffix = h.to_bytes(4, "little").hex()
    return name[:prefix_len] + suffix
