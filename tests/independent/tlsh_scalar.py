"""Independent scalar TLSH — SECOND implementation for de-circularized
verification (round-2 verdict item 2).

Written directly from the published algorithm (J. Oliver, C. Cheng,
Y. Chen, "TLSH - A Locality Sensitive Hash", CTC 2013, and the
Apache-2.0 TrendMicro reference code's documented processing order):
a per-byte scalar loop with no numpy and no imports from
ungoliant_spark, deliberately structured unlike the engine's batched
kernel (ungoliant_spark/operators/tlsh_op.py vectorizes histograms
over concatenated docs and the checksum recurrence across a batch).
Agreement between the two is therefore evidence about the MATH, not
about shared code.

Parameters match the reference pipeline's configuration
(/root/reference/src/transformers/lsh.rs:10-51): 256 buckets, 3-byte
checksum, version 4 → "T1" prefix.
"""

from __future__ import annotations

import math

# Pearson's original 1990 permutation table (public domain constants,
# as used by TLSH's b_mapping)
V = [
    1, 87, 49, 12, 176, 178, 102, 166, 121, 193, 6, 84, 249, 230, 44, 163,
    14, 197, 213, 181, 161, 85, 218, 80, 64, 239, 24, 226, 236, 142, 38, 200,
    110, 177, 104, 103, 141, 253, 255, 50, 77, 101, 81, 18, 45, 96, 31, 222,
    25, 107, 190, 70, 86, 237, 240, 34, 72, 242, 20, 214, 244, 227, 149, 235,
    97, 234, 57, 22, 60, 250, 82, 175, 208, 5, 127, 199, 111, 62, 135, 248,
    174, 169, 211, 58, 66, 154, 106, 195, 245, 171, 17, 187, 182, 179, 0, 243,
    132, 56, 148, 75, 128, 133, 158, 100, 130, 126, 91, 13, 153, 246, 216, 219,
    119, 68, 223, 78, 83, 88, 201, 99, 122, 11, 92, 32, 136, 114, 52, 10,
    138, 30, 48, 183, 156, 35, 61, 26, 143, 74, 251, 94, 129, 162, 63, 152,
    170, 7, 115, 167, 241, 206, 3, 150, 55, 59, 151, 220, 90, 53, 23, 131,
    125, 173, 15, 238, 79, 95, 89, 16, 105, 137, 225, 224, 217, 160, 37, 123,
    118, 73, 2, 157, 46, 116, 9, 145, 134, 228, 207, 212, 202, 215, 69, 229,
    27, 188, 67, 124, 168, 252, 42, 4, 29, 108, 21, 247, 19, 205, 39, 203,
    233, 40, 186, 147, 198, 192, 155, 33, 164, 191, 98, 204, 165, 180, 117, 76,
    140, 36, 210, 172, 41, 54, 159, 8, 185, 232, 113, 196, 231, 47, 146, 120,
    51, 65, 28, 144, 254, 221, 93, 189, 194, 139, 112, 43, 71, 109, 184, 209,
]

BUCKETS = 256
CODE_SIZE = BUCKETS // 4
CHECKSUM_LEN = 3
MIN_DATA_LEN = 50


def b_mapping(salt: int, i: int, j: int, k: int) -> int:
    return V[V[V[salt ^ i] ^ j] ^ k]


def l_capturing(n: int) -> int:
    if n <= 656:
        i = math.floor(math.log(n) / math.log(1.5))
    elif n <= 3199:
        i = math.floor(math.log(n) / math.log(1.3) - 8.72777)
    else:
        i = math.floor(math.log(n) / math.log(1.1) - 62.5472)
    return int(i) & 0xFF


def swap_nibble(b: int) -> int:
    return ((b & 0x0F) << 4) | ((b & 0xF0) >> 4)


def tlsh_scalar(data: bytes) -> str | None:
    """T1-prefixed TLSH digest (None for short/low-variance input)."""
    if data is None or len(data) < MIN_DATA_LEN:
        return None
    buckets = [0] * BUCKETS
    checksum = [0] * CHECKSUM_LEN
    # slide a 5-byte window; j is the index of the window's last byte
    for j in range(4, len(data)):
        a0, a1, a2, a3, a4 = (
            data[j], data[j - 1], data[j - 2], data[j - 3], data[j - 4]
        )
        checksum[0] = b_mapping(0, a0, a1, checksum[0])
        for k in range(1, CHECKSUM_LEN):
            checksum[k] = b_mapping(checksum[k - 1], a0, a1, checksum[k])
        buckets[b_mapping(2, a0, a1, a2)] += 1
        buckets[b_mapping(3, a0, a1, a3)] += 1
        buckets[b_mapping(5, a0, a2, a3)] += 1
        buckets[b_mapping(7, a0, a2, a4)] += 1
        buckets[b_mapping(11, a0, a1, a4)] += 1
        buckets[b_mapping(13, a0, a3, a4)] += 1
    nonzero = sum(1 for b in buckets if b > 0)
    if nonzero <= 4 * CODE_SIZE // 2:
        return None
    s = sorted(buckets)
    q1 = s[BUCKETS // 4 - 1]
    q2 = s[BUCKETS // 2 - 1]
    q3 = s[3 * BUCKETS // 4 - 1]
    if q3 == 0:
        return None
    code = []
    for i in range(CODE_SIZE):
        byte = 0
        for sub in range(4):
            b = buckets[4 * i + sub]
            bits = (1 if b > q1 else 0) + (1 if b > q2 else 0) + (
                1 if b > q3 else 0
            )
            byte |= bits << (2 * sub)
        code.append(byte)
    header = [swap_nibble(c) for c in checksum]
    header.append(swap_nibble(l_capturing(len(data))))
    q1r = (q1 * 100 // q3) % 16
    q2r = (q2 * 100 // q3) % 16
    header.append(swap_nibble((q1r << 4) | q2r))
    return "T1" + bytes(header + code[::-1]).hex().upper()
