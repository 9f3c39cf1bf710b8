"""Pure-Python reference for the winnowing pipeline, independent of Spark.

Implements XXH64 from the public spec (Yann Collet, xxhash; same
algorithm Spark's ``xxhash64`` expression uses with seed 42) plus Spark's
multi-argument chaining rule (each child re-seeds the next; null children
are skipped), then re-derives ``text.winnow_fingerprints`` semantics —
char hashes, zip_with k-gram folds over shifted slices (max-length
zip_with padding with nulls), window minima, distinct — entirely in
Python. Tests compare full fingerprint sets value-for-value against the
Spark pipeline, including over the real sf0.01 documents table.
"""

import re

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def xxh64_long(value: int, seed: int) -> int:
    """XXH64 of one 64-bit integer (Spark's hashLong specialization)."""
    h = (seed + _P5 + 8) & _M
    h ^= _round(0, value & _M)
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def xxh64_bytes(data: bytes, seed: int) -> int:
    """XXH64 of a byte string per the public spec."""
    n = len(data)
    i = 0
    if n >= 32:
        a1 = (seed + _P1 + _P2) & _M
        a2 = (seed + _P2) & _M
        a3 = seed & _M
        a4 = (seed - _P1) & _M
        while i + 32 <= n:
            a1 = _round(a1, int.from_bytes(data[i : i + 8], "little"))
            a2 = _round(a2, int.from_bytes(data[i + 8 : i + 16], "little"))
            a3 = _round(a3, int.from_bytes(data[i + 16 : i + 24], "little"))
            a4 = _round(a4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(a1, 1) + _rotl(a2, 7) + _rotl(a3, 12) + _rotl(a4, 18)) & _M
        for a in (a1, a2, a3, a4):
            h = ((h ^ _round(0, a)) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= 1 << 63 else u


def _to_unsigned(s: int) -> int:
    return s & _M


def spark_xxhash64_str(s: str) -> int:
    """Spark ``xxhash64(string_col)``: utf-8 bytes, seed 42, signed."""
    return _to_signed(xxh64_bytes(s.encode("utf-8"), 42))


def spark_xxhash64_longs(*vals: "int | None") -> int:
    """Spark ``xxhash64(c1, c2, ...)`` over bigint columns: children
    re-seed left to right, nulls skipped (hash passes through)."""
    h = 42
    for v in vals:
        if v is not None:
            h = xxh64_long(_to_unsigned(v), h)
    return _to_signed(h)


def winnow_fingerprints_ref(text: str, k: int = 5, w: int = 4) -> set:
    """Fingerprint set for one document, mirroring
    ``operators.text.winnow_fingerprints`` expression-for-expression."""
    norm = re.sub(r"\s+", " ", text.strip().lower())
    ch = [spark_xxhash64_str(c) for c in norm]

    def shifted(arr, j, length):
        return arr[j : j + length]

    def zip_fold(arrs, combine):
        out = arrs[-1]
        for a in reversed(arrs[:-1]):
            n = max(len(a), len(out))
            out = [
                combine(
                    a[i] if i < len(a) else None,
                    out[i] if i < len(out) else None,
                )
                for i in range(n)
            ]
        return out

    glen = max(len(ch) - k + 1, 1)
    grams = zip_fold(
        [shifted(ch, j, glen) for j in range(k)],
        lambda x, y: spark_xxhash64_longs(x, y),
    )
    wlen = max(len(grams) - w + 1, 1)
    mins = zip_fold(
        [shifted(grams, j, wlen) for j in range(w)],
        lambda x, y: min(v for v in (x, y) if v is not None),
    )
    return set(mins)
