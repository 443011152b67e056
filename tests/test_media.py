"""Media tier: real pure-Python codecs (PNG/BMP/WAV/y4m), native
header metadata, perceptual hashing, and the distributed feature pass
with row-level error containment."""

import struct
import zlib

import numpy as np
import pytest

from pdf_parser_spark.media import codecs as C
from pdf_parser_spark.media.native import media_metadata, sniff_format
from pdf_parser_spark.operators.multimodal import (
    audio_features, decode_audio, decode_image, decode_video, image_ahash,
    real_media_features,
)

rng = np.random.RandomState(7)


# ------------------------------------------------------------ PNG codec


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
@pytest.mark.parametrize("ftype", [0, 2])
def test_png_round_trip(ch, ftype):
    img = rng.randint(0, 256, (13, 17, ch)).astype(np.uint8)
    out = C.png_decode(C.png_encode(img, filter_type=ftype))
    assert out.shape == img.shape and (out == img).all()


def _manual_png(img, ftypes):
    """Encode with an explicit per-row filter-type cycle (exercises
    Sub/Average/Paeth, which png_encode itself never emits)."""
    h, w, ch = img.shape
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        line = img[y].reshape(-1).astype(np.int64)
        ft = ftypes[y % len(ftypes)]
        raw.append(ft)
        filt = np.zeros(w * ch, dtype=np.int64)
        for x in range(w * ch):
            a = line[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if ft == 0:
                filt[x] = line[x]
            elif ft == 1:
                filt[x] = line[x] - a
            elif ft == 2:
                filt[x] = line[x] - b
            elif ft == 3:
                filt[x] = line[x] - (a + b) // 2
            else:
                filt[x] = line[x] - C._paeth(int(a), int(b), int(c))
        raw.extend((filt & 0xFF).astype(np.uint8).tobytes())
        prev = line

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 2: 4, 3: 2, 4: 6}[ch], 0, 0, 0)
    return (
        C.PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    )


def test_png_all_filter_types_decode():
    img = rng.randint(0, 256, (9, 11, 3)).astype(np.uint8)
    out = C.png_decode(_manual_png(img, [1, 3, 4, 0, 2]))
    assert (out == img).all()


def test_png_crc_mismatch_raises():
    good = C.png_encode(rng.randint(0, 256, (5, 5, 3)).astype(np.uint8))
    bad = bytearray(good)
    bad[60] ^= 0xFF
    with pytest.raises(C.MediaFormatError, match="CRC"):
        C.png_decode(bytes(bad))


def test_png_truncation_and_bad_sig_raise():
    good = C.png_encode(rng.randint(0, 256, (5, 5, 3)).astype(np.uint8))
    with pytest.raises(C.MediaFormatError):
        C.png_decode(good[:30])
    with pytest.raises(C.MediaFormatError, match="signature"):
        C.png_decode(b"not a png at all")


# ------------------------------------------------------------ BMP codec


@pytest.mark.parametrize("w", [5, 8, 24])  # 5 exercises row padding
def test_bmp_round_trip(w):
    img = rng.randint(0, 256, (6, w, 3)).astype(np.uint8)
    assert (C.bmp_decode(C.bmp_encode(img)) == img).all()


def test_bmp_top_down_decode():
    img = rng.randint(0, 256, (4, 4, 3)).astype(np.uint8)
    b = bytearray(C.bmp_encode(img))
    # negate height -> top-down; reorder rows + BGR to match
    b[22:26] = struct.pack("<i", -4)
    pix = bytearray()
    for y in range(4):
        pix.extend(img[y][:, ::-1].astype(np.uint8).tobytes())
    out = C.bmp_decode(bytes(b[:54]) + bytes(pix))
    assert (out == img).all()


def test_bmp_truncated_raises():
    img = rng.randint(0, 256, (6, 8, 3)).astype(np.uint8)
    with pytest.raises(C.MediaFormatError):
        C.bmp_decode(C.bmp_encode(img)[:-20])


# ------------------------------------------------------------ WAV codec


@pytest.mark.parametrize("bits", [8, 16])
def test_wav_round_trip(bits):
    s = rng.randint(-120, 120, (500, 2)).astype(np.int32)
    out, rate, b2 = C.wav_decode(C.wav_encode(s, 44100, bits=bits))
    assert rate == 44100 and b2 == bits and (out == s).all()


def test_wav_chunk_walk_skips_foreign_chunks():
    s = rng.randint(-100, 100, (64, 1)).astype(np.int32)
    wav = C.wav_encode(s, 8000, bits=8)
    junk = b"LIST" + struct.pack("<I", 5) + b"junk!" + b"\x00"  # word-aligned
    out, rate, _ = C.wav_decode(wav[:12] + junk + wav[12:])
    assert rate == 8000 and (out == s).all()


def test_wav_non_pcm_raises():
    wav = bytearray(C.wav_encode(np.zeros((4, 1), np.int32), 8000, bits=16))
    wav[20:22] = struct.pack("<H", 3)  # IEEE float fmt code
    with pytest.raises(C.MediaFormatError, match="non-PCM"):
        C.wav_decode(bytes(wav))


# ------------------------------------------------------------ y4m codec


def test_y4m_round_trip_and_truncation():
    frames = [rng.randint(0, 256, (16, 24)).astype(np.uint8) for _ in range(5)]
    for chroma in ("420", "mono"):
        fr, w, h, c = C.y4m_decode(C.y4m_encode(frames, chroma=chroma))
        assert (w, h, len(fr)) == (24, 16, 5) and c == chroma
        assert all((a == b).all() for a, b in zip(fr, frames))
    with pytest.raises(C.MediaFormatError):
        C.y4m_decode(C.y4m_encode(frames)[:-10])


@pytest.mark.parametrize("interlace", [False, True])
def test_gif_round_trip(interlace):
    img = np.random.RandomState(11).randint(0, 4, (16, 24, 3)).astype(np.uint8) * 64
    fr, w, h = C.gif_decode(C.gif_encode(img, interlace=interlace))
    assert (w, h, len(fr)) == (24, 16, 1)
    assert (fr[0] == img).all()


def test_gif_multi_frame_and_table_growth():
    # >256 table entries forces the LZW code width past its initial
    # size on both sides; three frames share one global color table.
    local = np.random.RandomState(13)
    frames = [
        (local.randint(0, 4, (32, 48, 3)) * 64).astype(np.uint8)
        for _ in range(3)
    ]
    fr, w, h = C.gif_decode(C.gif_encode(frames))
    assert (w, h, len(fr)) == (48, 32, 3)
    assert all((a == b).all() for a, b in zip(fr, frames))


def test_gif_rejects_bad_payloads():
    img = np.zeros((4, 4, 3), np.uint8)
    good = C.gif_encode(img)
    with pytest.raises(C.MediaFormatError, match="not a GIF"):
        C.gif_decode(b"PNG" + good)
    with pytest.raises(C.MediaFormatError):
        C.gif_decode(good[:20])  # truncated mid image descriptor
    xs = np.arange(300, dtype=np.int64)
    many = np.stack(
        [xs % 256, xs // 256, np.zeros_like(xs)], axis=1
    ).astype(np.uint8).reshape(1, 300, 3)
    with pytest.raises(C.MediaFormatError, match="256 distinct"):
        C.gif_encode(many)


# ------------------------------------------------- perceptual hashing


def test_ahash_separates_near_dup_from_distinct():
    img = rng.randint(0, 256, (16, 24, 3)).astype(np.uint8)
    a1 = C.ahash_bits(C.gray_sum(img))
    assert len(a1) == 64 and set(a1) <= {"0", "1"}
    noisy = np.clip(img.astype(np.int32) + rng.randint(-3, 4, img.shape), 0, 255)
    a2 = C.ahash_bits(C.gray_sum(noisy.astype(np.uint8)))
    other = C.ahash_bits(
        C.gray_sum(rng.randint(0, 256, (16, 24, 3)).astype(np.uint8))
    )
    ham = sum(x != y for x, y in zip(a1, a2))
    ham_other = sum(x != y for x, y in zip(a1, other))
    assert ham <= 6 < ham_other


def test_phash_stable_under_upscale():
    g = C.gray_sum(rng.randint(0, 256, (16, 24, 3)).astype(np.uint8))
    p1 = C.phash_bits(g)
    p2 = C.phash_bits(np.kron(g, np.ones((2, 2), dtype=np.int64)))
    other = C.phash_bits(
        C.gray_sum(rng.randint(0, 256, (16, 24, 3)).astype(np.uint8))
    )
    ham = sum(x != y for x, y in zip(p1, p2))
    ham_other = sum(x != y for x, y in zip(p1, other))
    assert len(p1) == 63 and ham <= 14 < ham_other


def _minimal_jpeg(w, h, progressive=False):
    """SOI + APP0 + (DHT noise) + SOF + EOI — headers only, no scan."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" + b"\x00" * 6
    dht = b"\xff\xc4" + struct.pack(">H", 5) + b"\x00\x01\x02"
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    sof = sof_marker + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x03" + b"\x11"
    return b"\xff\xd8" + app0 + dht + sof + b"\xff\xd9"


@pytest.mark.parametrize("progressive", [False, True])
def test_jpeg_dimensions_marker_walk(progressive):
    w, h, ch = C.jpeg_dimensions(_minimal_jpeg(640, 480, progressive))
    assert (w, h, ch) == (640, 480, 3)


def test_jpeg_no_sof_raises():
    with pytest.raises(C.MediaFormatError):
        C.jpeg_dimensions(b"\xff\xd8\xff\xe0fakejpeg")
    with pytest.raises(C.MediaFormatError, match="not a JPEG"):
        C.jpeg_dimensions(b"GIF89a")


# ------------------------------------------------------- decode seams


def test_decode_seams_dispatch_and_stub():
    img = rng.randint(0, 256, (4, 4, 3)).astype(np.uint8)
    assert (decode_image(C.png_encode(img)) == img).all()
    assert (decode_image(C.bmp_encode(img)) == img).all()
    s = rng.randint(-50, 50, (32, 1)).astype(np.int32)
    out, rate, _ = decode_audio(C.wav_encode(s, 16000))
    assert rate == 16000 and (out == s).all()
    fr, w, h, _ = decode_video(C.y4m_encode([img[:, :, 0]]))
    assert (w, h, len(fr)) == (4, 4, 1)
    # JPEG is REAL since round 5 (media/jpeg.py): valid streams decode,
    # malformed ones raise the codec error — not NotImplementedError
    from pdf_parser_spark.media.codecs import MediaFormatError
    from pdf_parser_spark.media.jpeg import jpeg_encode

    tiles = np.repeat(np.repeat(
        rng.randint(0, 256, (2, 2)).astype(np.uint8), 8, 0), 8, 1)
    assert (decode_image(
        jpeg_encode(tiles, luma_qt=np.ones(64, dtype=np.int64))
    ) == tiles).all()
    with pytest.raises(MediaFormatError):
        decode_image(b"\xff\xd8\xff\xe0fakejpeg")
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04mp3data")
    with pytest.raises(NotImplementedError):
        decode_video(b"\x00\x00\x00\x18ftypmp42")


# ----------------------------------------------- distributed operators


@pytest.fixture(scope="module")
def media_df(spark):
    img = rng.randint(0, 256, (8, 12, 3)).astype(np.uint8)
    frames = [rng.randint(0, 256, (8, 8)).astype(np.uint8) for _ in range(3)]
    samples = rng.randint(-100, 100, (64, 2)).astype(np.int32)
    rows = [
        (1, bytearray(C.png_encode(img))),
        (2, bytearray(C.bmp_encode(img))),
        (3, bytearray(C.wav_encode(samples, 22050, bits=16))),
        (4, bytearray(C.y4m_encode(frames))),
        (5, bytearray(b"\xff\xd8\xff\xe0jpegish")),
        (6, bytearray(b"garbage payload")),
        (7, bytearray(C.png_encode(img)[:40])),  # truncated png
        (8, bytearray(C.gif_encode(img))),
    ]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_real_media_features_contains_errors(spark, media_df):
    rows = {r.media_id: r for r in real_media_features(media_df).collect()}
    assert len(rows) == 8
    assert rows[1].format == "png" and (rows[1].width, rows[1].height) == (12, 8)
    assert rows[2].format == "bmp" and (rows[2].width, rows[2].height) == (12, 8)
    assert rows[3].format == "wav" and rows[3].sample_rate == 22050
    assert rows[3].n_samples == 64 and rows[3].channels == 2
    assert rows[4].format == "y4m" and rows[4].n_frames == 3
    assert rows[5].format == "jpeg" and rows[5].error  # no SOF -> contained
    assert rows[6].format == "unknown" and rows[6].error == "unknown format"
    assert rows[7].format == "png" and rows[7].error  # contained, not raised
    assert rows[8].format == "gif" and (rows[8].width, rows[8].height) == (12, 8)
    assert rows[8].n_frames == 1
    assert all(
        r.error is None for r in [rows[1], rows[2], rows[3], rows[4], rows[8]]
    )


def test_image_ahash_drops_undecodable(spark, media_df):
    rows = {r.media_id: r.ahash for r in image_ahash(media_df).collect()}
    assert set(rows) == {1, 2, 8}
    assert rows[1] == rows[2] == rows[8]  # same pixels, three codecs
    assert len(rows[1]) == 64


def test_audio_features_exact_ints(spark, media_df):
    rows = audio_features(media_df).collect()
    assert len(rows) == 1 and rows[0].media_id == 3
    r = rows[0]
    assert r.n_samples == 64 and r.sample_rate == 22050
    assert r.duration_us == 64 * 1_000_000 // 22050
    assert r.rms_sq_sum > 0 and r.peak <= 100


def test_ahash_neardup_pairs_planted(spark):
    from pdf_parser_spark.operators.multimodal import ahash_neardup_pairs

    # flat base -> hash is all zeros; noisy lifts exactly one 3x2
    # block above the mean -> hamming exactly 1; checkerboard blocks
    # differ everywhere that matters (hamming >> 6).
    base = np.full((16, 24, 3), 100, np.uint8)
    noisy = base.copy()
    noisy[0:2, 0:3] = 255
    other = np.zeros((16, 24, 3), np.uint8)
    other[:8] = 255  # bright top half -> 32 one-bits, hamming 32
    rows = [
        (1, bytearray(C.bmp_encode(base))),
        (2, bytearray(C.bmp_encode(base))),        # exact duplicate
        (3, bytearray(C.bmp_encode(noisy))),       # near duplicate
        (4, bytearray(C.bmp_encode(other))),       # unrelated
        (5, bytearray(b"not an image")),           # dropped by decode
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    hashes = image_ahash(media)
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in ahash_neardup_pairs(hashes, max_hamming=6).collect()
    }
    assert pairs[(1, 2)] == 0
    assert pairs[(1, 3)] == 1 and pairs[(2, 3)] == 1
    assert not any(4 in p or 5 in p for p in pairs)


def test_ahash_neardup_guards(spark):
    from pdf_parser_spark.operators.multimodal import ahash_neardup_pairs

    df = spark.createDataFrame([(1, "0" * 64)], "media_id long, ahash string")
    with pytest.raises(ValueError, match="max_hamming"):
        ahash_neardup_pairs(df, max_hamming=8, n_bands=8)
    with pytest.raises(ValueError, match="divide"):
        ahash_neardup_pairs(df, max_hamming=2, n_bands=7)


def test_native_metadata_matches_real_decode(spark, media_df):
    """Header-only native parse agrees with the full decoders on every
    well-formed payload (and sniffs the rest)."""
    md = {r.media_id: r for r in
          media_metadata(media_df).collect()}
    assert (md[1].width, md[1].height, md[1].format) == (12, 8, "png")
    assert (md[2].width, md[2].height, md[2].format) == (12, 8, "bmp")
    assert (md[3].sample_rate, md[3].channels, md[3].format) == (22050, 2, "wav")
    assert md[4].format == "y4m" and md[5].format == "jpeg"
    assert md[6].format == "unknown"
    assert (md[8].width, md[8].height, md[8].format) == (12, 8, "gif")


def test_sniff_format_native(spark, media_df):
    import pyspark.sql.functions as F

    got = {
        r.media_id: r.fmt
        for r in media_df.select(
            "media_id", sniff_format(F.col("payload")).alias("fmt")
        ).collect()
    }
    assert got == {1: "png", 2: "bmp", 3: "wav", 4: "y4m", 5: "jpeg",
                   6: "unknown", 7: "png", 8: "gif"}
