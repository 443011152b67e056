"""Standard security handler decryption (PDF 32000-1:2008 §7.6.3).

Crawled corpora are full of PDFs "encrypted" with an empty user
password (owner-restricted printing etc.) — readable by every viewer,
so an extraction engine must open them.  Implements the RC4 paths:
/Filter /Standard with V 1/2, R 2/3/4 (RC4 40..128-bit), empty user
password.  AES (/V 4 with AESV2, /V 5) is detected and surfaced as an
explicit per-document error (no AES primitive in the stdlib; the
cluster deployment can plug one in here).

RC4 and the MD5 key-derivation algorithms are public spec material
(Algorithms 2, 3.1); implementation is original.
"""

from __future__ import annotations

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


class Decryptor:
    """Holds the file key; decrypts strings/streams per object."""

    def __init__(self, file_key: bytes) -> None:
        self.file_key = file_key

    def decrypt(self, data: bytes, num: int, gen: int) -> bytes:
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
    if v not in (1, 2):
        return None  # V4/V5 (AES) unsupported here
    o_entry = resolve(enc.get("O")) or b""
    p = int(resolve(enc.get("P", -1)) or -1)
    length = int(resolve(enc.get("Length", 40)) or 40)
    key = standard_key(o_entry, p, id0, r, length)
    return Decryptor(key)
