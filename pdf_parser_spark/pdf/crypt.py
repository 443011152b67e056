"""Standard security handler decryption (PDF 32000-1:2008 §7.6.3).

Crawled corpora are full of PDFs "encrypted" with an empty user
password (owner-restricted printing etc.) — readable by every viewer,
so an extraction engine must open them.  Implements /Filter /Standard
with V 1/2 (RC4 40..128-bit, R 2/3/4), V 4 crypt filters (AESV2 =
AES-128-CBC, V2 = RC4), and V 5 (AES-256, R 5/6 per ISO 32000-2
§7.6.4) — all for the empty user password; a genuinely
password-protected document returns None and surfaces as an explicit
per-document error.

RC4, AES (FIPS-197 / SP 800-38A) and the MD5/SHA-2 key-derivation
algorithms are public spec material (Algorithms 1-2, 2.A, 2.B, 3.1);
implementation is original.
"""

from __future__ import annotations

import functools
import hashlib
import struct
from typing import Optional

#: Algorithm 2 padding string (PDF spec Table 8.2 — a public constant)
PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


def rc4(key: bytes, data: bytes) -> bytes:
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, ch in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = ch ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def _pad_password(pwd: bytes) -> bytes:
    return (pwd + PAD)[:32]


def standard_key(o_entry: bytes, p: int, id0: bytes, r: int,
                 length_bits: int = 40, password: bytes = b"",
                 encrypt_metadata: bool = True) -> bytes:
    """Algorithm 2: the file encryption key."""
    h = hashlib.md5()
    h.update(_pad_password(password))
    h.update(o_entry[:32])
    h.update(struct.pack("<i", p))
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    n = max(5, min(16, length_bits // 8)) if r >= 3 else 5
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def object_key(file_key: bytes, num: int, gen: int) -> bytes:
    """Per-object RC4 key (Algorithm 1)."""
    h = hashlib.md5(
        file_key
        + struct.pack("<i", num)[:3]
        + struct.pack("<i", gen)[:2]
    ).digest()
    return h[:min(len(file_key) + 5, 16)]


# -------------------------------------------------------- AES-128-CBC
# Pure-Python AES decryption (FIPS-197 / SP 800-38A public algorithms;
# no AES primitive exists in the stdlib). Slow-path code: it only runs
# for /AESV2 documents, ~1 MB/s is ample for crawl content streams.

_SBOX = [
    0x63, 0x7c, 0x77, 0x7b, 0xf2, 0x6b, 0x6f, 0xc5, 0x30, 0x01, 0x67,
    0x2b, 0xfe, 0xd7, 0xab, 0x76, 0xca, 0x82, 0xc9, 0x7d, 0xfa, 0x59,
    0x47, 0xf0, 0xad, 0xd4, 0xa2, 0xaf, 0x9c, 0xa4, 0x72, 0xc0, 0xb7,
    0xfd, 0x93, 0x26, 0x36, 0x3f, 0xf7, 0xcc, 0x34, 0xa5, 0xe5, 0xf1,
    0x71, 0xd8, 0x31, 0x15, 0x04, 0xc7, 0x23, 0xc3, 0x18, 0x96, 0x05,
    0x9a, 0x07, 0x12, 0x80, 0xe2, 0xeb, 0x27, 0xb2, 0x75, 0x09, 0x83,
    0x2c, 0x1a, 0x1b, 0x6e, 0x5a, 0xa0, 0x52, 0x3b, 0xd6, 0xb3, 0x29,
    0xe3, 0x2f, 0x84, 0x53, 0xd1, 0x00, 0xed, 0x20, 0xfc, 0xb1, 0x5b,
    0x6a, 0xcb, 0xbe, 0x39, 0x4a, 0x4c, 0x58, 0xcf, 0xd0, 0xef, 0xaa,
    0xfb, 0x43, 0x4d, 0x33, 0x85, 0x45, 0xf9, 0x02, 0x7f, 0x50, 0x3c,
    0x9f, 0xa8, 0x51, 0xa3, 0x40, 0x8f, 0x92, 0x9d, 0x38, 0xf5, 0xbc,
    0xb6, 0xda, 0x21, 0x10, 0xff, 0xf3, 0xd2, 0xcd, 0x0c, 0x13, 0xec,
    0x5f, 0x97, 0x44, 0x17, 0xc4, 0xa7, 0x7e, 0x3d, 0x64, 0x5d, 0x19,
    0x73, 0x60, 0x81, 0x4f, 0xdc, 0x22, 0x2a, 0x90, 0x88, 0x46, 0xee,
    0xb8, 0x14, 0xde, 0x5e, 0x0b, 0xdb, 0xe0, 0x32, 0x3a, 0x0a, 0x49,
    0x06, 0x24, 0x5c, 0xc2, 0xd3, 0xac, 0x62, 0x91, 0x95, 0xe4, 0x79,
    0xe7, 0xc8, 0x37, 0x6d, 0x8d, 0xd5, 0x4e, 0xa9, 0x6c, 0x56, 0xf4,
    0xea, 0x65, 0x7a, 0xae, 0x08, 0xba, 0x78, 0x25, 0x2e, 0x1c, 0xa6,
    0xb4, 0xc6, 0xe8, 0xdd, 0x74, 0x1f, 0x4b, 0xbd, 0x8b, 0x8a, 0x70,
    0x3e, 0xb5, 0x66, 0x48, 0x03, 0xf6, 0x0e, 0x61, 0x35, 0x57, 0xb9,
    0x86, 0xc1, 0x1d, 0x9e, 0xe1, 0xf8, 0x98, 0x11, 0x69, 0xd9, 0x8e,
    0x94, 0x9b, 0x1e, 0x87, 0xe9, 0xce, 0x55, 0x28, 0xdf, 0x8c, 0xa1,
    0x89, 0x0d, 0xbf, 0xe6, 0x42, 0x68, 0x41, 0x99, 0x2d, 0x0f, 0xb0,
    0x54, 0xbb, 0x16,
]
_INV_SBOX = [0] * 256
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1b, 0x36]


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _gmul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        a = _xtime(a)
        b >>= 1
    return p


def _expand_key(key: bytes):
    nk = len(key) // 4
    nr = nk + 6
    w = [list(key[4 * i: 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        w.append([w[i - nk][j] ^ t[j] for j in range(4)])
    return w, nr


def _aes_decrypt_block(block: bytes, w, nr: int) -> bytes:
    s = [[block[r + 4 * c] for c in range(4)] for r in range(4)]

    def add_round_key(rnd):
        for c in range(4):
            for r in range(4):
                s[r][c] ^= w[4 * rnd + c][r]

    add_round_key(nr)
    for rnd in range(nr - 1, -1, -1):
        # InvShiftRows
        for r in range(1, 4):
            s[r] = s[r][-r:] + s[r][:-r]
        # InvSubBytes
        for r in range(4):
            for c in range(4):
                s[r][c] = _INV_SBOX[s[r][c]]
        add_round_key(rnd)
        if rnd:
            # InvMixColumns
            for c in range(4):
                a = [s[r][c] for r in range(4)]
                s[0][c] = _gmul(a[0], 14) ^ _gmul(a[1], 11) ^ _gmul(a[2], 13) ^ _gmul(a[3], 9)
                s[1][c] = _gmul(a[0], 9) ^ _gmul(a[1], 14) ^ _gmul(a[2], 11) ^ _gmul(a[3], 13)
                s[2][c] = _gmul(a[0], 13) ^ _gmul(a[1], 9) ^ _gmul(a[2], 14) ^ _gmul(a[3], 11)
                s[3][c] = _gmul(a[0], 11) ^ _gmul(a[1], 13) ^ _gmul(a[2], 9) ^ _gmul(a[3], 14)
    return bytes(s[r][c] for c in range(4) for r in range(4))


def _aes_encrypt_block(block: bytes, w, nr: int) -> bytes:
    """Forward AES cipher — needed at DECRYPT time too: the R6 key
    derivation (Algorithm 2.B) encrypts its hash input each round."""
    s = [[block[r + 4 * c] for c in range(4)] for r in range(4)]

    def ark(rnd):
        for c in range(4):
            for r in range(4):
                s[r][c] ^= w[4 * rnd + c][r]

    ark(0)
    for rnd in range(1, nr + 1):
        # SubBytes
        for r in range(4):
            for c in range(4):
                s[r][c] = _SBOX[s[r][c]]
        # ShiftRows
        for r in range(1, 4):
            s[r] = s[r][r:] + s[r][:r]
        if rnd != nr:
            # MixColumns
            for c in range(4):
                a = [s[r][c] for r in range(4)]
                s[0][c] = _gmul(a[0], 2) ^ _gmul(a[1], 3) ^ a[2] ^ a[3]
                s[1][c] = a[0] ^ _gmul(a[1], 2) ^ _gmul(a[2], 3) ^ a[3]
                s[2][c] = a[0] ^ a[1] ^ _gmul(a[2], 2) ^ _gmul(a[3], 3)
                s[3][c] = _gmul(a[0], 3) ^ a[1] ^ a[2] ^ _gmul(a[3], 2)
        ark(rnd)
    return bytes(s[r][c] for c in range(4) for r in range(4))


# ---- T-table fast paths (standard public AES optimization: the four
# round tables fold SubBytes+ShiftRows+MixColumns into 32-bit lookups;
# ~100x the schoolbook speed in pure Python). The schoolbook blocks
# above remain as the reference implementation; equivalence is
# asserted in tests against FIPS-197 vectors.

_TE = [[0] * 256 for _ in range(4)]
_TD = [[0] * 256 for _ in range(4)]  # InvMixColumns of a raw byte
for _x in range(256):
    _s = _SBOX[_x]
    _s2 = _xtime(_s)
    _s3 = _s2 ^ _s
    _TE[0][_x] = (_s2 << 24) | (_s << 16) | (_s << 8) | _s3
    _TE[1][_x] = (_s3 << 24) | (_s2 << 16) | (_s << 8) | _s
    _TE[2][_x] = (_s << 24) | (_s3 << 16) | (_s2 << 8) | _s
    _TE[3][_x] = (_s << 24) | (_s << 16) | (_s3 << 8) | _s2
    _TD[0][_x] = (_gmul(_x, 14) << 24) | (_gmul(_x, 9) << 16) | \
        (_gmul(_x, 13) << 8) | _gmul(_x, 11)
    _TD[1][_x] = (_gmul(_x, 11) << 24) | (_gmul(_x, 14) << 16) | \
        (_gmul(_x, 9) << 8) | _gmul(_x, 13)
    _TD[2][_x] = (_gmul(_x, 13) << 24) | (_gmul(_x, 11) << 16) | \
        (_gmul(_x, 14) << 8) | _gmul(_x, 9)
    _TD[3][_x] = (_gmul(_x, 9) << 24) | (_gmul(_x, 13) << 16) | \
        (_gmul(_x, 11) << 8) | _gmul(_x, 14)


def _rk_words(key: bytes):
    w, nr = _expand_key(key)
    return [int.from_bytes(bytes(word), "big") for word in w], nr


def _aes_encrypt_block_fast(block: bytes, rk, nr: int) -> bytes:
    T0, T1, T2, T3 = _TE
    s0 = int.from_bytes(block[0:4], "big") ^ rk[0]
    s1 = int.from_bytes(block[4:8], "big") ^ rk[1]
    s2 = int.from_bytes(block[8:12], "big") ^ rk[2]
    s3 = int.from_bytes(block[12:16], "big") ^ rk[3]
    for rnd in range(1, nr):
        k = 4 * rnd
        t0 = (T0[s0 >> 24] ^ T1[(s1 >> 16) & 255] ^ T2[(s2 >> 8) & 255]
              ^ T3[s3 & 255] ^ rk[k])
        t1 = (T0[s1 >> 24] ^ T1[(s2 >> 16) & 255] ^ T2[(s3 >> 8) & 255]
              ^ T3[s0 & 255] ^ rk[k + 1])
        t2 = (T0[s2 >> 24] ^ T1[(s3 >> 16) & 255] ^ T2[(s0 >> 8) & 255]
              ^ T3[s1 & 255] ^ rk[k + 2])
        t3 = (T0[s3 >> 24] ^ T1[(s0 >> 16) & 255] ^ T2[(s1 >> 8) & 255]
              ^ T3[s2 & 255] ^ rk[k + 3])
        s0, s1, s2, s3 = t0, t1, t2, t3
    S = _SBOX
    k = 4 * nr
    o0 = ((S[s0 >> 24] << 24) | (S[(s1 >> 16) & 255] << 16)
          | (S[(s2 >> 8) & 255] << 8) | S[s3 & 255]) ^ rk[k]
    o1 = ((S[s1 >> 24] << 24) | (S[(s2 >> 16) & 255] << 16)
          | (S[(s3 >> 8) & 255] << 8) | S[s0 & 255]) ^ rk[k + 1]
    o2 = ((S[s2 >> 24] << 24) | (S[(s3 >> 16) & 255] << 16)
          | (S[(s0 >> 8) & 255] << 8) | S[s1 & 255]) ^ rk[k + 2]
    o3 = ((S[s3 >> 24] << 24) | (S[(s0 >> 16) & 255] << 16)
          | (S[(s1 >> 8) & 255] << 8) | S[s2 & 255]) ^ rk[k + 3]
    return (o0.to_bytes(4, "big") + o1.to_bytes(4, "big")
            + o2.to_bytes(4, "big") + o3.to_bytes(4, "big"))


def _aes_decrypt_block_fast(block: bytes, rk, nr: int) -> bytes:
    """Straight inverse cipher: InvShiftRows+InvSubBytes byte-wise,
    AddRoundKey, then InvMixColumns via the _TD word tables."""
    IS = _INV_SBOX
    D0, D1, D2, D3 = _TD
    s0 = int.from_bytes(block[0:4], "big") ^ rk[4 * nr]
    s1 = int.from_bytes(block[4:8], "big") ^ rk[4 * nr + 1]
    s2 = int.from_bytes(block[8:12], "big") ^ rk[4 * nr + 2]
    s3 = int.from_bytes(block[12:16], "big") ^ rk[4 * nr + 3]
    for rnd in range(nr - 1, -1, -1):
        # InvShiftRows + InvSubBytes
        t0 = ((IS[s0 >> 24] << 24) | (IS[(s3 >> 16) & 255] << 16)
              | (IS[(s2 >> 8) & 255] << 8) | IS[s1 & 255])
        t1 = ((IS[s1 >> 24] << 24) | (IS[(s0 >> 16) & 255] << 16)
              | (IS[(s3 >> 8) & 255] << 8) | IS[s2 & 255])
        t2 = ((IS[s2 >> 24] << 24) | (IS[(s1 >> 16) & 255] << 16)
              | (IS[(s0 >> 8) & 255] << 8) | IS[s3 & 255])
        t3 = ((IS[s3 >> 24] << 24) | (IS[(s2 >> 16) & 255] << 16)
              | (IS[(s1 >> 8) & 255] << 8) | IS[s0 & 255])
        k = 4 * rnd
        t0 ^= rk[k]
        t1 ^= rk[k + 1]
        t2 ^= rk[k + 2]
        t3 ^= rk[k + 3]
        if rnd:
            t0 = (D0[t0 >> 24] ^ D1[(t0 >> 16) & 255]
                  ^ D2[(t0 >> 8) & 255] ^ D3[t0 & 255])
            t1 = (D0[t1 >> 24] ^ D1[(t1 >> 16) & 255]
                  ^ D2[(t1 >> 8) & 255] ^ D3[t1 & 255])
            t2 = (D0[t2 >> 24] ^ D1[(t2 >> 16) & 255]
                  ^ D2[(t2 >> 8) & 255] ^ D3[t2 & 255])
            t3 = (D0[t3 >> 24] ^ D1[(t3 >> 16) & 255]
                  ^ D2[(t3 >> 8) & 255] ^ D3[t3 & 255])
        s0, s1, s2, s3 = t0, t1, t2, t3
    return (s0.to_bytes(4, "big") + s1.to_bytes(4, "big")
            + s2.to_bytes(4, "big") + s3.to_bytes(4, "big"))


def aes_cbc_encrypt_raw(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-CBC encrypt, NO padding, NO IV prefix (data must be a
    multiple of 16) — the Algorithm 2.B / UE-entry layout."""
    rk, nr = _rk_words(key)
    out = bytearray()
    prev = iv
    for off in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[off:off + 16], prev))
        enc = _aes_encrypt_block_fast(blk, rk, nr)
        out.extend(enc)
        prev = enc
    return bytes(out)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-CBC encrypt, PDF content layout: PKCS#5 padding, IV
    prefixed to the ciphertext (fixture building + symmetry)."""
    pad = 16 - len(data) % 16
    return iv + aes_cbc_encrypt_raw(key, iv, data + bytes([pad]) * pad)


def aes_cbc_decrypt_raw(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-CBC decrypt, NO padding, NO IV prefix (UE/OE entries)."""
    if len(data) % 16:
        return b""
    rk, nr = _rk_words(key)
    out = bytearray()
    prev = iv
    for off in range(0, len(data), 16):
        blk = data[off:off + 16]
        dec = _aes_decrypt_block_fast(blk, rk, nr)
        out.extend(bytes(a ^ b for a, b in zip(dec, prev)))
        prev = blk
    return bytes(out)


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """AES-CBC decrypt, PDF layout: 16-byte IV prefix, PKCS#5 padding."""
    if len(data) < 32 or len(data) % 16:
        return b""
    out = bytearray(aes_cbc_decrypt_raw(key, data[:16], data[16:]))
    pad = out[-1] if out else 0
    if 1 <= pad <= 16:
        out = out[:-pad]
    return bytes(out)


# --------------------------------------------------- AES-256 (/V 5)
# ISO 32000-2 §7.6.4: revision 6 hardened hash (Algorithm 2.B) and the
# U/UE file-key unwrap (Algorithm 2.A, empty-user-password case) —
# public spec material; implementation original.


@functools.lru_cache(maxsize=64)
def hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """Algorithm 2.B (R6): iterated SHA-256/384/512 + AES-CBC mix.

    Cached: a crawl partition meets the same (password, salt) pair
    once per document open but derives it twice (validate + unwrap),
    and re-opens (text, then metadata pass) recur — the cache keys are
    tiny and bounded."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt_raw(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        if mod == 0:
            k = hashlib.sha256(e).digest()
        elif mod == 1:
            k = hashlib.sha384(e).digest()
        else:
            k = hashlib.sha512(e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def v5_file_key(u_entry: bytes, ue_entry: bytes, r: int,
                password: bytes = b"") -> Optional[bytes]:
    """Algorithm 2.A (user-password branch): validate against /U and
    unwrap the 32-byte file key from /UE. Returns None when the
    password does not validate (a real password-protected document —
    surfaced as an explicit per-document error upstream)."""
    if len(u_entry) < 48 or len(ue_entry) < 32:
        return None
    vsalt, ksalt = u_entry[32:40], u_entry[40:48]
    if r == 6:
        if hash_2b(password, vsalt) != u_entry[:32]:
            return None
        ikey = hash_2b(password, ksalt)
    else:  # r == 5 (Adobe extension level 3: single SHA-256)
        if hashlib.sha256(password + vsalt).digest() != u_entry[:32]:
            return None
        ikey = hashlib.sha256(password + ksalt).digest()
    return aes_cbc_decrypt_raw(ikey, b"\x00" * 16, ue_entry[:32])


class Decryptor:
    """Holds the file key; decrypts strings/streams per object.

    v5=True is the AES-256 (/V 5) mode: the FILE key encrypts every
    object directly (ISO 32000-2 §7.6.3.3 — no per-object key
    derivation, unlike the /V ≤ 4 'sAlT' scheme)."""

    def __init__(self, file_key: bytes, aes: bool = False,
                 v5: bool = False) -> None:
        self.file_key = file_key
        self.aes = aes or v5
        self.v5 = v5

    def decrypt(self, data: bytes, num: int, gen: int) -> bytes:
        if self.v5:
            return aes_cbc_decrypt(self.file_key, data)
        if self.aes:
            h = hashlib.md5(
                self.file_key
                + struct.pack("<i", num)[:3]
                + struct.pack("<i", gen)[:2]
                + b"sAlT"
            ).digest()
            return aes_cbc_decrypt(h[:min(len(self.file_key) + 5, 16)], data)
        return rc4(object_key(self.file_key, num, gen), data)

    def decrypt_object(self, obj, num: int, gen: int):
        """Recursively decrypt every string in a parsed object."""
        if isinstance(obj, bytes):
            return self.decrypt(obj, num, gen)
        if isinstance(obj, list):
            return [self.decrypt_object(v, num, gen) for v in obj]
        if isinstance(obj, dict):
            return {k: self.decrypt_object(v, num, gen)
                    for k, v in obj.items()}
        return obj


def build_decryptor(enc: dict, id0: bytes,
                    resolve) -> Optional[Decryptor]:
    """Decryptor for a trailer /Encrypt dict, or None (unsupported
    scheme → caller surfaces a contained error)."""
    if not isinstance(enc, dict):
        return None
    if str(resolve(enc.get("Filter"))) != "Standard":
        return None
    v = int(resolve(enc.get("V", 0)) or 0)
    r = int(resolve(enc.get("R", 2)) or 2)
    if v == 5:
        # AES-256: /R 6 (ISO 32000-2, today's Acrobat default) or the
        # pre-standard /R 5; empty user password (the crawled-corpus
        # case — password-protected docs return None → contained error)
        cf = resolve(enc.get("CF")) or {}
        stdcf = resolve(cf.get("StdCF")) if isinstance(cf, dict) else None
        cfm = str(resolve(stdcf.get("CFM"))) if isinstance(stdcf, dict) else ""
        if cfm and cfm != "AESV3":
            return None
        u = resolve(enc.get("U")) or b""
        ue = resolve(enc.get("UE")) or b""
        fkey = v5_file_key(u, ue, r)
        return Decryptor(fkey, v5=True) if fkey else None
    aes = False
    if v == 4:
        # crypt-filter dispatch: /StdCF /CFM is V2 (RC4) or AESV2
        cf = resolve(enc.get("CF")) or {}
        stdcf = resolve(cf.get("StdCF")) if isinstance(cf, dict) else None
        cfm = str(resolve(stdcf.get("CFM"))) if isinstance(stdcf, dict) else ""
        if cfm == "AESV2":
            aes = True
        elif cfm != "V2":
            return None
    elif v not in (1, 2):
        return None  # unknown scheme
    o_entry = resolve(enc.get("O")) or b""
    p = int(resolve(enc.get("P", -1)) or -1)
    length = int(resolve(enc.get("Length", 40)) or 40)
    em = resolve(enc.get("EncryptMetadata", True))
    key = standard_key(o_entry, p, id0, r, length,
                       encrypt_metadata=bool(em) if em is not None else True)
    return Decryptor(key, aes=aes)
