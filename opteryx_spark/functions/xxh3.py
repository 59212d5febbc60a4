"""Pure-Python XXH3-64 (seed 0, default secret) for short inputs.

The reference's text-mode COSINE_SIMILARITY hashes each token with
XXH3_64bits (``opteryx/compiled/functions/vectors.pyx:143`` via the
public xxHash library) to place it in a 1024-bin count vector.  Spark's
built-in ``xxhash64`` is the *older* XXH64 algorithm — a different
function — so bit-parity needs XXH3 itself.  This module implements the
published XXH3 algorithm (Yann Collet's xxHash, BSD-2; constants are the
spec's public values) for inputs up to 240 bytes — tokens are words, far
below that; longer inputs raise.

Validated bit-for-bit against the C library's XXH3_64bits output
(tests/test_functions_sources.py::test_xxh3_matches_reference_vectors).
"""

from __future__ import annotations

_M = (1 << 64) - 1

_PRIME64_1 = 0x9E3779B185EBCA87
_PRIME64_2 = 0xC2B2AE3D27D4EB4F
_PRIME64_3 = 0x165667B19E3779F9
_PRIME_MX1 = 0x165667919E3779F9
_PRIME_MX2 = 0x9FB21C651E98DF25

# the spec's 192-byte default secret (public constant)
_SECRET = bytes.fromhex(
    "b8fe6c3923a44bbe7c01812cf721ad1c"
    "ded46de9839097db7240a4a4b7b3671f"
    "cb79e64eccc0e578825ad07dccff7221"
    "b8084674f743248ee03590e6813a264c"
    "3c2852bb91c300cb88d0658b1b532ea3"
    "71644897a20df94e3819ef46a9deacd8"
    "a8fa763fe39c343ff9dcbbc7c70b4f1d"
    "8a51e04bcdb45931c89f7ec9d9787364"
    "eac5ac8334d3ebc3c581a0fffa1363eb"
    "170ddd51b7f0da49d316552629d4689e"
    "2b16be587d47a1fc8ff8b8d17ad031ce"
    "45cb3a8f95160428afd7fbcabb4b407e"
)


def _r32(b: bytes, i: int) -> int:
    return int.from_bytes(b[i : i + 4], "little")


def _r64(b: bytes, i: int) -> int:
    return int.from_bytes(b[i : i + 8], "little")


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _mul128_fold64(a: int, b: int) -> int:
    p = a * b
    return ((p & _M) ^ (p >> 64)) & _M


def _xxh64_avalanche(h: int) -> int:
    h &= _M
    h ^= h >> 33
    h = (h * _PRIME64_2) & _M
    h ^= h >> 29
    h = (h * _PRIME64_3) & _M
    h ^= h >> 32
    return h


def _xxh3_avalanche(h: int) -> int:
    h &= _M
    h ^= h >> 37
    h = (h * _PRIME_MX1) & _M
    h ^= h >> 32
    return h


def _rrmxmx(h: int, length: int) -> int:
    h ^= _rotl(h, 49) ^ _rotl(h, 24)
    h = (h * _PRIME_MX2) & _M
    h ^= (h >> 35) + length
    h &= _M
    h = (h * _PRIME_MX2) & _M
    return h ^ (h >> 28)


def _mix16(data: bytes, i: int, sec: int) -> int:
    return _mul128_fold64(
        _r64(data, i) ^ _r64(_SECRET, sec),
        _r64(data, i + 8) ^ _r64(_SECRET, sec + 8),
    )


def xxh3_64(data: bytes) -> int:
    """XXH3_64bits(data) with seed 0, for len(data) <= 240."""
    n = len(data)
    if n == 0:
        return _xxh64_avalanche(_r64(_SECRET, 56) ^ _r64(_SECRET, 64))
    if n <= 3:
        combined = (data[0] << 16) | (data[n >> 1] << 24) | data[-1] | (n << 8)
        return _xxh64_avalanche(combined ^ (_r32(_SECRET, 0) ^ _r32(_SECRET, 4)))
    if n <= 8:
        lo, hi = _r32(data, 0), _r32(data, n - 4)
        keyed = (hi + ((lo << 32) & _M)) ^ (_r64(_SECRET, 8) ^ _r64(_SECRET, 16))
        return _rrmxmx(keyed & _M, n)
    if n <= 16:
        in_lo = _r64(data, 0) ^ (_r64(_SECRET, 24) ^ _r64(_SECRET, 32))
        in_hi = _r64(data, n - 8) ^ (_r64(_SECRET, 40) ^ _r64(_SECRET, 48))
        swapped = int.from_bytes(in_lo.to_bytes(8, "little"), "big")
        acc = n + swapped + in_hi + _mul128_fold64(in_lo, in_hi)
        return _xxh3_avalanche(acc)
    if n <= 128:
        acc = (n * _PRIME64_1) & _M
        if n > 32:
            if n > 64:
                if n > 96:
                    acc += _mix16(data, 48, 96)
                    acc += _mix16(data, n - 64, 112)
                acc += _mix16(data, 32, 64)
                acc += _mix16(data, n - 48, 80)
            acc += _mix16(data, 16, 32)
            acc += _mix16(data, n - 32, 48)
        acc += _mix16(data, 0, 0)
        acc += _mix16(data, n - 16, 16)
        return _xxh3_avalanche(acc)
    if n <= 240:
        acc = (n * _PRIME64_1) & _M
        for i in range(8):
            acc += _mix16(data, 16 * i, 16 * i)
        acc = _xxh3_avalanche(acc)
        acc_end = _mix16(data, n - 16, 136 - 17)
        for i in range(8, n // 16):
            acc_end += _mix16(data, 16 * i, 16 * (i - 8) + 3)
        return _xxh3_avalanche(acc + acc_end)
    raise ValueError(f"xxh3_64: inputs over 240 bytes unsupported (got {n})")
