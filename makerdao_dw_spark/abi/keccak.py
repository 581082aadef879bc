"""Pure-python Keccak-256 (the pre-NIST SHA-3 variant Ethereum uses:
0x01 domain padding, not SHA3's 0x06).

Public algorithm (FIPS-202 / Keccak reference). Used only at plan-compile
time (function selectors, event topic0) and in test fixtures — never in a
per-row hot path — so pure python is fine.

Replaces the reference's `w3.sha3` / `eth_event.get_log_topic` usage
(/root/reference/functions.py:91, :105) without the web3 dependency.
"""

from __future__ import annotations

_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

# Rotation offsets r[x][y]
_R = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]

_MASK = (1 << 64) - 1


def _rol(x: int, n: int) -> int:
    n %= 64
    return ((x << n) | (x >> (64 - n))) & _MASK


def _keccak_f(a: list[list[int]]) -> None:
    for rnd in range(24):
        # theta
        c = [a[x][0] ^ a[x][1] ^ a[x][2] ^ a[x][3] ^ a[x][4] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rol(c[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                a[x][y] ^= d[x]
        # rho + pi
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = _rol(a[x][y], _R[x][y])
        # chi
        for x in range(5):
            for y in range(5):
                a[x][y] = b[x][y] ^ ((~b[(x + 1) % 5][y]) & b[(x + 2) % 5][y])
        # iota
        a[0][0] ^= _RC[rnd]


def keccak256(data: bytes) -> bytes:
    rate = 136  # 1088-bit rate for 256-bit output
    a = [[0] * 5 for _ in range(5)]

    padlen = rate - (len(data) % rate)
    if padlen == 1:
        padded = bytes(data) + b"\x81"
    else:
        padded = bytes(data) + b"\x01" + b"\x00" * (padlen - 2) + b"\x80"

    for off in range(0, len(padded), rate):
        block = padded[off : off + rate]
        for i in range(rate // 8):
            x, y = i % 5, i // 5
            a[x][y] ^= int.from_bytes(block[8 * i : 8 * i + 8], "little")
        _keccak_f(a)

    out = bytearray()
    for i in range(4):
        x, y = i % 5, i // 5
        out += a[x][y].to_bytes(8, "little")
    return bytes(out)


def selector(signature: str) -> str:
    """4-byte function selector as 8 lowercase hex chars (no 0x)."""
    return keccak256(signature.encode()).hex()[:8]


def event_topic(signature: str) -> str:
    """Full 32-byte event topic0 as 64 lowercase hex chars (no 0x)."""
    return keccak256(signature.encode()).hex()
