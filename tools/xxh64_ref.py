"""Pure-python XXH64 reference matching Spark's
org.apache.spark.sql.catalyst.expressions.XXH64 (hashLong / hashInt /
hashUnsafeBytes with seed 42) — the ground truth the dd2 DuckDB oracle's
SQL formulation is tested against (tools/gen_dd2_oracle.py).

Spark's XXH64 is the reference xxHash64 algorithm over the value's
little-endian bytes; parity is asserted empirically against pyspark in
gen_dd2_oracle.py's self-test, not assumed.
"""
M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M


def fmix(h):
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def round64(acc, inp):
    acc = (acc + inp * P2) & M
    acc = rotl(acc, 31)
    return (acc * P1) & M


def merge_round(h, v):
    v = round64(0, v)
    h ^= v
    return (h * P1 + P4) & M


def hash_bytes(bs, seed=42):
    n = len(bs)
    off = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while off + 32 <= n:
            v1 = round64(v1, int.from_bytes(bs[off:off + 8], "little"))
            v2 = round64(v2, int.from_bytes(bs[off + 8:off + 16], "little"))
            v3 = round64(v3, int.from_bytes(bs[off + 16:off + 24], "little"))
            v4 = round64(v4, int.from_bytes(bs[off + 24:off + 32], "little"))
            off += 32
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h = merge_round(h, v)
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while off + 8 <= n:
        h ^= round64(0, int.from_bytes(bs[off:off + 8], "little"))
        h = (rotl(h, 27) * P1 + P4) & M
        off += 8
    if off + 4 <= n:
        h ^= (int.from_bytes(bs[off:off + 4], "little") * P1) & M
        h = (rotl(h, 23) * P2 + P3) & M
        off += 4
    while off < n:
        h ^= (bs[off] * P5) & M
        h = (rotl(h, 11) * P1) & M
        off += 1
    return fmix(h)


def hash_long(l, seed):
    h = (seed + P5 + 8) & M
    h ^= round64(0, l & M)
    h = (rotl(h, 27) * P1 + P4) & M
    return fmix(h)


def hash_int(i, seed):
    h = (seed + P5 + 4) & M
    h ^= (i & 0xFFFFFFFF) * P1 & M
    h = (rotl(h, 23) * P2 + P3) & M
    return fmix(h)


def to_signed(x):
    return x - (1 << 64) if x >= (1 << 63) else x


def to_unsigned(x):
    return x + (1 << 64) if x < 0 else x


def hash_string(s, seed=42):
    return hash_bytes(s.encode("utf-8"), seed)
