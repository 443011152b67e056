"""RC4-encrypted PDFs (standard security handler, empty user
password) — the common crawled case of owner-restricted documents."""

import hashlib

from pdf_parser_spark.pdf.crypt import (
    PAD, _pad_password, object_key, rc4, standard_key,
)


def _mk_encrypted_pdf(r: int = 2, length_bits: int = 40) -> bytes:
    content = b"BT /F1 12 Tf 72 700 Td (secret but readable) Tj ET"
    id0 = b"0123456789abcdef"
    p = -44
    # Algorithm 3: /O from (empty) owner+user passwords
    okey = hashlib.md5(_pad_password(b"")).digest()
    if r >= 3:
        for _ in range(50):
            okey = hashlib.md5(okey).digest()
    n = 5 if r == 2 else length_bits // 8
    o_entry = rc4(okey[:n], _pad_password(b""))
    if r >= 3:
        for i in range(1, 20):
            o_entry = rc4(bytes(b ^ i for b in okey[:n]), o_entry)
    fkey = standard_key(o_entry, p, id0, r, length_bits)
    if r == 2:  # Algorithm 4: /U
        u_entry = rc4(fkey, PAD)
    else:       # Algorithm 5
        u = hashlib.md5(PAD + id0).digest()
        u = rc4(fkey, u)
        for i in range(1, 20):
            u = rc4(bytes(b ^ i for b in fkey), u)
        u_entry = u + b"\x00" * 16

    def enc_stream(num: int, data: bytes) -> bytes:
        return rc4(object_key(fkey, num, 0), data)

    def hexs(b: bytes) -> bytes:
        return b"<" + b.hex().encode() + b">"

    out = bytearray(b"%PDF-1.4\n")
    offsets = {}

    def put(num, raw):
        offsets[num] = len(out)
        out.extend(f"{num} 0 obj\n".encode() + raw + b"\nendobj\n")

    put(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    put(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    put(3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
           b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>")
    cs = enc_stream(4, content)
    put(4, b"<< /Length " + str(len(cs)).encode() + b" >>\nstream\n"
           + cs + b"\nendstream")
    put(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    title = enc_stream(6, b"classified title")
    put(6, b"<< /Title " + hexs(title) + b" >>")
    put(7, b"<< /Filter /Standard /V " +
           (b"1" if r == 2 else b"2") + b" /R " + str(r).encode() +
           b" /Length " + str(length_bits).encode() +
           b" /O " + hexs(o_entry) + b" /U " + hexs(u_entry) +
           b" /P " + str(p).encode() + b" >>")
    xref_off = len(out)
    out.extend(b"xref\n0 8\n0000000000 65535 f \n")
    for i in range(1, 8):
        out.extend(f"{offsets[i]:010d} 00000 n \n".encode())
    out.extend(b"trailer\n<< /Size 8 /Root 1 0 R /Info 6 0 R "
               b"/Encrypt 7 0 R /ID [" + hexs(id0) + hexs(id0) +
               b"] >>\nstartxref\n" + str(xref_off).encode() +
               b"\n%%EOF\n")
    return bytes(out)


def test_rc4_40bit_r2():
    from pdf_parser_spark.pdf.metadata import extract_metadata
    from pdf_parser_spark.pdf.text import extract_document_text

    pdf = _mk_encrypted_pdf(r=2)
    assert extract_document_text(pdf) == "secret but readable\n"
    meta = extract_metadata(pdf)
    assert meta["Title"] == "classified title"


def test_rc4_128bit_r3():
    from pdf_parser_spark.pdf.text import extract_document_text

    pdf = _mk_encrypted_pdf(r=3, length_bits=128)
    assert extract_document_text(pdf) == "secret but readable\n"


def test_pipeline_contains_encrypted_error_free():
    from pdf_parser_spark.jobs.extract import extract_one

    r = extract_one(_mk_encrypted_pdf())
    assert r["kind"] == "pdf"
    assert r["raw_text"].strip() == "secret but readable"
    assert r["error"] is None


# ---------------------------------------------------------------- AES


def _aes_encrypt_block(block, w, nr):
    """Forward AES cipher (test fixture encryption only)."""
    from pdf_parser_spark.pdf.crypt import _SBOX, _gmul

    s = [[block[r + 4 * c] for c in range(4)] for r in range(4)]

    def ark(rnd):
        for c in range(4):
            for r in range(4):
                s[r][c] ^= w[4 * rnd + c][r]

    ark(0)
    for rnd in range(1, nr + 1):
        for r in range(4):
            for c in range(4):
                s[r][c] = _SBOX[s[r][c]]
        for r in range(1, 4):
            s[r] = s[r][r:] + s[r][:r]
        if rnd != nr:
            for c in range(4):
                a = [s[r][c] for r in range(4)]
                s[0][c] = _gmul(a[0], 2) ^ _gmul(a[1], 3) ^ a[2] ^ a[3]
                s[1][c] = a[0] ^ _gmul(a[1], 2) ^ _gmul(a[2], 3) ^ a[3]
                s[2][c] = a[0] ^ a[1] ^ _gmul(a[2], 2) ^ _gmul(a[3], 3)
                s[3][c] = _gmul(a[0], 3) ^ a[1] ^ a[2] ^ _gmul(a[3], 2)
        ark(rnd)
    return bytes(s[r][c] for c in range(4) for r in range(4))


def _aes_cbc_encrypt(key, iv, data):
    from pdf_parser_spark.pdf.crypt import _expand_key

    pad = 16 - len(data) % 16
    data = data + bytes([pad]) * pad
    w, nr = _expand_key(key)
    out = bytearray(iv)
    prev = iv
    for off in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[off:off + 16], prev))
        enc = _aes_encrypt_block(blk, w, nr)
        out.extend(enc)
        prev = enc
    return bytes(out)


def test_aes_fips_vector():
    from pdf_parser_spark.pdf.crypt import _aes_decrypt_block, _expand_key

    key = bytes(range(16))
    w, nr = _expand_key(key)
    ct = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    assert _aes_decrypt_block(ct, w, nr) == bytes.fromhex(
        "00112233445566778899aabbccddeeff")
    # round trip through the test encryptor
    assert _aes_encrypt_block(bytes.fromhex(
        "00112233445566778899aabbccddeeff"), w, nr) == ct


def _mk_aes_pdf() -> bytes:
    from pdf_parser_spark.pdf.crypt import (
        _pad_password, object_key, rc4, standard_key,
    )

    content = b"BT /F1 12 Tf 72 700 Td (aes secret readable) Tj ET"
    id0 = b"fedcba9876543210"
    p = -44
    r, bits = 4, 128
    okey = hashlib.md5(_pad_password(b"")).digest()
    for _ in range(50):
        okey = hashlib.md5(okey).digest()
    n = bits // 8
    o_entry = rc4(okey[:n], _pad_password(b""))
    for i in range(1, 20):
        o_entry = rc4(bytes(b ^ i for b in okey[:n]), o_entry)
    fkey = standard_key(o_entry, p, id0, r, bits)
    u = hashlib.md5(PAD + id0).digest()
    u = rc4(fkey, u)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in fkey), u)
    u_entry = u + b"\x00" * 16

    def enc(num, data):
        ok = hashlib.md5(
            fkey + num.to_bytes(3, "little") + (0).to_bytes(2, "little")
            + b"sAlT").digest()[:16]
        return _aes_cbc_encrypt(ok, b"\x00" * 16, data)

    def hexs(b):
        return b"<" + b.hex().encode() + b">"

    out = bytearray(b"%PDF-1.6\n")
    offsets = {}

    def put(num, raw):
        offsets[num] = len(out)
        out.extend(f"{num} 0 obj\n".encode() + raw + b"\nendobj\n")

    put(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    put(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    put(3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
           b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>")
    cs = enc(4, content)
    put(4, b"<< /Length " + str(len(cs)).encode() + b" >>\nstream\n"
           + cs + b"\nendstream")
    put(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    put(6, b"<< /Filter /Standard /V 4 /R 4 /Length 128 "
           b"/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen >> >> "
           b"/StmF /StdCF /StrF /StdCF "
           b"/O " + hexs(o_entry) + b" /U " + hexs(u_entry) +
           b" /P " + str(p).encode() + b" >>")
    xref_off = len(out)
    out.extend(b"xref\n0 7\n0000000000 65535 f \n")
    for i in range(1, 7):
        out.extend(f"{offsets[i]:010d} 00000 n \n".encode())
    out.extend(b"trailer\n<< /Size 7 /Root 1 0 R /Encrypt 6 0 R /ID ["
               + hexs(id0) + hexs(id0) + b"] >>\nstartxref\n"
               + str(xref_off).encode() + b"\n%%EOF\n")
    return bytes(out)


def test_aesv2_pdf():
    from pdf_parser_spark.pdf.text import extract_document_text

    assert extract_document_text(_mk_aes_pdf()) == "aes secret readable\n"


# -------------------------------------------------- AES-256 (/V 5 R 6)


def test_aes256_fips_vector():
    # FIPS-197 appendix C.3 (AES-256) through the generic key expander
    from pdf_parser_spark.pdf.crypt import (
        _aes_decrypt_block, _aes_encrypt_block, _expand_key,
    )

    key = bytes(range(32))
    w, nr = _expand_key(key)
    assert nr == 14
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = bytes.fromhex("8ea2b7ca516745bfeafc49904b496089")
    assert _aes_encrypt_block(pt, w, nr) == ct
    assert _aes_decrypt_block(ct, w, nr) == pt


def test_aes_fast_paths_match_reference():
    # T-table fast blocks == schoolbook reference blocks, both key sizes
    from pdf_parser_spark.pdf.crypt import (
        _aes_decrypt_block, _aes_decrypt_block_fast, _aes_encrypt_block,
        _aes_encrypt_block_fast, _expand_key, _rk_words,
    )

    for key in (bytes(range(16)), bytes(range(32))):
        w, nr = _expand_key(key)
        rk, nr2 = _rk_words(key)
        assert nr == nr2
        for seed in (0, 7, 200):
            blk = bytes((seed + i * 13) % 256 for i in range(16))
            ct_ref = _aes_encrypt_block(blk, w, nr)
            assert _aes_encrypt_block_fast(blk, rk, nr) == ct_ref
            assert _aes_decrypt_block_fast(ct_ref, rk, nr) == blk
            assert _aes_decrypt_block(ct_ref, w, nr) == blk


import functools  # noqa: E402


@functools.lru_cache(maxsize=4)
def _mk_aes256_pdf(r: int = 6) -> bytes:
    """Deterministic /V 5 fixture, empty user+owner password —
    built with the same public-spec algorithms (2.A/2.B forward
    direction) the decryptor inverts."""
    from pdf_parser_spark.pdf.crypt import (
        _aes_encrypt_block, _expand_key, aes_cbc_encrypt,
        aes_cbc_encrypt_raw, hash_2b,
    )

    content = b"BT /F1 12 Tf 72 700 Td (aes256 secret readable) Tj ET"
    file_key = bytes(range(32))
    p = -4
    vsalt, ksalt = b"valsalt1", b"keysalt1"
    if r == 6:
        u_entry = hash_2b(b"", vsalt) + vsalt + ksalt
        ue_entry = aes_cbc_encrypt_raw(hash_2b(b"", ksalt), b"\x00" * 16,
                                       file_key)
    else:  # r == 5
        u_entry = hashlib.sha256(b"" + vsalt).digest() + vsalt + ksalt
        ue_entry = aes_cbc_encrypt_raw(
            hashlib.sha256(b"" + ksalt).digest(), b"\x00" * 16, file_key)
    o_vsalt, o_ksalt = b"ovalslt1", b"okeyslt1"
    if r == 6:
        o_entry = hash_2b(b"", o_vsalt, u_entry) + o_vsalt + o_ksalt
        oe_entry = aes_cbc_encrypt_raw(
            hash_2b(b"", o_ksalt, u_entry), b"\x00" * 16, file_key)
    else:
        o_entry = (hashlib.sha256(b"" + o_vsalt + u_entry).digest()
                   + o_vsalt + o_ksalt)
        oe_entry = aes_cbc_encrypt_raw(
            hashlib.sha256(b"" + o_ksalt + u_entry).digest(),
            b"\x00" * 16, file_key)
    perms_plain = (p.to_bytes(4, "little", signed=True)
                   + b"\xff\xff\xff\xff" + b"Tadbbeef")
    w, nr_rounds = _expand_key(file_key)
    perms = _aes_encrypt_block(perms_plain, w, nr_rounds)

    def enc(data: bytes) -> bytes:
        return aes_cbc_encrypt(file_key, b"iviviviviviviviv", data)

    def hexs(b: bytes) -> bytes:
        return b"<" + b.hex().encode() + b">"

    out = bytearray(b"%PDF-2.0\n")
    offsets = {}

    def put(num, raw):
        offsets[num] = len(out)
        out.extend(f"{num} 0 obj\n".encode() + raw + b"\nendobj\n")

    put(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    put(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    put(3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
           b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>")
    cs = enc(content)
    put(4, b"<< /Length " + str(len(cs)).encode() + b" >>\nstream\n"
           + cs + b"\nendstream")
    put(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    title = enc(b"v5 classified title")
    put(6, b"<< /Title " + hexs(title) + b" >>")
    put(7, b"<< /Filter /Standard /V 5 /R " + str(r).encode() +
           b" /Length 256 "
           b"/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen "
           b"/Length 32 >> >> /StmF /StdCF /StrF /StdCF "
           b"/O " + hexs(o_entry) + b" /U " + hexs(u_entry) +
           b" /OE " + hexs(oe_entry) + b" /UE " + hexs(ue_entry) +
           b" /Perms " + hexs(perms) +
           b" /P " + str(p).encode() + b" >>")
    xref_off = len(out)
    out.extend(b"xref\n0 8\n0000000000 65535 f \n")
    for i in range(1, 8):
        out.extend(f"{offsets[i]:010d} 00000 n \n".encode())
    id0 = b"0123456789abcdef"
    out.extend(b"trailer\n<< /Size 8 /Root 1 0 R /Info 6 0 R "
               b"/Encrypt 7 0 R /ID [" + hexs(id0) + hexs(id0) +
               b"] >>\nstartxref\n" + str(xref_off).encode() +
               b"\n%%EOF\n")
    return bytes(out)


def test_aes256_r6_pdf():
    from pdf_parser_spark.pdf.metadata import extract_metadata
    from pdf_parser_spark.pdf.text import extract_document_text

    pdf = _mk_aes256_pdf(r=6)
    assert extract_document_text(pdf) == "aes256 secret readable\n"
    assert extract_metadata(pdf)["Title"] == "v5 classified title"


def test_aes256_r5_pdf():
    from pdf_parser_spark.pdf.text import extract_document_text

    assert (extract_document_text(_mk_aes256_pdf(r=5))
            == "aes256 secret readable\n")


def test_aes256_wrong_password_contained():
    # flip a /U validation byte: a truly password-protected document
    # must NOT crash the pipeline — extract_one contains the error
    from pdf_parser_spark.jobs.extract import extract_one

    pdf = bytearray(_mk_aes256_pdf(r=6))
    u_hex = _mk_aes256_pdf(r=6).hex()  # locate /U via rebuild
    r = extract_one(bytes(pdf))
    assert r["error"] is None  # sanity: unmodified decrypts fine

    from pdf_parser_spark.pdf.crypt import hash_2b

    good_u = (hash_2b(b"", b"valsalt1") + b"valsalt1" + b"keysalt1").hex()
    broken = _mk_aes256_pdf(r=6).replace(
        good_u.encode(), (b"00" * 32 + good_u[64:].encode()))
    r2 = extract_one(bytes(broken))
    assert r2["kind"] == "pdf"
    assert r2["error"] is not None or r2["raw_text"] == ""


# ----------------------- independent cross-validation (ADVICE r2 #2)
# The round-2 advice flagged that hash_2b/v5_file_key were validated
# only against fixtures built with the SAME forward primitives. These
# tests break the circle with the `cryptography` package (an
# externally FIPS/Wycheproof-validated AES) plus a KDF loop
# re-written in the test directly from ISO 32000-2 Algorithm 2.B —
# sharing NO code with pdf/crypt.py. The one residual assumption both
# share is the de-facto loop-termination reading (64 mandatory rounds,
# then stop when E[-1] <= rounds-32) used identically by the open
# PDF stacks; everything else (AES core, CBC chaining, K1 layout,
# hash selection, truncation) is independently checked.


def _spec_hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    from cryptography.hazmat.primitives.ciphers import (
        Cipher, algorithms, modes,
    )

    digests = (hashlib.sha256, hashlib.sha384, hashlib.sha512)
    K = hashlib.sha256(password + salt + udata).digest()
    rounds, E = 0, b"\x00"
    while rounds < 64 or E[-1] > rounds - 32:
        K1 = (password + K + udata) * 64
        c = Cipher(algorithms.AES(K[:16]), modes.CBC(K[16:32])).encryptor()
        E = c.update(K1) + c.finalize()
        K = digests[sum(E[:16]) % 3](E).digest()
        rounds += 1
    return K[:32]


def test_hash_2b_matches_independent_spec_implementation():
    from pdf_parser_spark.pdf.crypt import hash_2b

    cases = [
        (b"", b"\x00" * 8, b""),
        (b"", b"valsalt1", b""),
        (b"user pw", b"saltsalt", b""),
        # owner-branch shape: 48-byte /U as the udata suffix
        (b"owner", b"osalt_01", bytes(range(48))),
        # long password (spec truncates at 127 bytes upstream; the
        # KDF itself must take what it is given)
        (b"x" * 127, b"abcdefgh", b""),
        # adversarial: bytes that exercise each digest branch early
        (b"\xff" * 16, b"\xff" * 8, b""),
    ]
    for pwd, salt, udata in cases:
        assert hash_2b(pwd, salt, udata) == _spec_hash_2b(pwd, salt, udata), (
            pwd, salt, udata,
        )


def test_aes_cbc_matches_cryptography_package():
    import os as _os

    from cryptography.hazmat.primitives.ciphers import (
        Cipher, algorithms, modes,
    )

    from pdf_parser_spark.pdf.crypt import (
        aes_cbc_decrypt_raw, aes_cbc_encrypt_raw,
    )

    rng = _os.urandom
    for key_len in (16, 24, 32):
        for n_blocks in (1, 3):
            key, iv = rng(key_len), rng(16)
            pt = rng(16 * n_blocks)
            ref = Cipher(algorithms.AES(key), modes.CBC(iv)).encryptor()
            want = ref.update(pt) + ref.finalize()
            assert aes_cbc_encrypt_raw(key, iv, pt) == want
            assert aes_cbc_decrypt_raw(key, iv, want) == pt


def test_v5_file_key_unwraps_foreign_fixture():
    """/U //UE built ONLY from the independent primitives (spec KDF +
    cryptography AES) must validate and unwrap through our
    v5_file_key — the direction a real Acrobat file exercises."""
    from cryptography.hazmat.primitives.ciphers import (
        Cipher, algorithms, modes,
    )

    from pdf_parser_spark.pdf.crypt import v5_file_key

    file_key = bytes(range(32))
    vsalt, ksalt = b"VSALT_01", b"KSALT_01"
    u_entry = _spec_hash_2b(b"", vsalt) + vsalt + ksalt
    enc = Cipher(
        algorithms.AES(_spec_hash_2b(b"", ksalt)), modes.CBC(b"\x00" * 16)
    ).encryptor()
    ue_entry = enc.update(file_key) + enc.finalize()
    assert v5_file_key(u_entry, ue_entry, r=6) == file_key
    assert v5_file_key(u_entry, ue_entry, r=6, password=b"wrong") is None
