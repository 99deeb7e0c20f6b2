"""GIF (LZW) and baseline-TIFF codecs (kernels/gif_kernel.py,
kernels/tiff_kernel.py) + their extraction-tier dispatch.

Reference parity: gif/tiff are image-capable upload types
(models/enums.py:25-31) OCR'd via the scanned tier
(tesseract_extractor.py:22-53).
"""
from __future__ import annotations

import struct
import zlib  # noqa: F401  (parity with the png test's imports)

import numpy as np
import pytest

from pdf_extractor_spark.kernels import gif_kernel as G
from pdf_extractor_spark.kernels import ocr_kernel as K
from pdf_extractor_spark.kernels import tiff_kernel as T


def _noise(h: int, w: int, seed: int = 3) -> list[bytes]:
    rng = np.random.default_rng(seed)
    m = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    return [m[y].tobytes() for y in range(h)]


# ---------------------------------------------------------------- GIF --

def test_gif_render_decode_ocr_roundtrip():
    text = "GIF LZW ROUNDTRIP 42, OK."
    rows = G.decode_gif_gray(G.render_text_gif(text, width=16))
    assert K.lines_to_stream_text(K.ocr_gray_rows(rows)) == text
    # container-independent raster: equals the BMP render of the same text
    bmp = K.decode_bmp_gray(K.render_text_bmp(text, width=16))
    assert [bytes(r) for r in rows] == [bytes(r) for r in bmp]


def test_gif_lzw_dictionary_growth_and_reset():
    # 100x173 random bytes force width growth 9→12 and the 4096-entry
    # table reset — the encoder/decoder must stay in lockstep throughout
    px = _noise(100, 173)
    dec = G.decode_gif_gray(G.pack_gif_gray(px))
    assert [bytes(r) for r in dec] == px


def test_gif_interlace_and_89a_extensions():
    px = _noise(24, 31, seed=7)
    h, w = len(px), len(px[0])
    order = ([*range(0, h, 8)] + [*range(4, h, 8)]
             + [*range(2, h, 4)] + [*range(1, h, 2)])
    lzw = G._lzw_encode(b"".join(px[y] for y in order), 8)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        c = lzw[i:i + 255]
        blocks.append(len(c))
        blocks += c
    blocks.append(0)
    palette = bytes(v for g in range(256) for v in (g, g, g))
    gif = (b"GIF89a" + struct.pack("<HHBBB", w, h, 0xF7, 0, 0) + palette
           # a graphic-control extension before the frame must be skipped
           + b"\x21\xf9\x04\x00\x00\x00\x00\x00"
           + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)
           + b"\x08" + bytes(blocks) + b"\x3b")
    assert [bytes(r) for r in G.decode_gif_gray(gif)] == px


@pytest.mark.parametrize("bad", [
    b"notagif",
    b"GIF87a" + b"\x00" * 4,                                   # truncated
    b"GIF87a" + struct.pack("<HHBBB", 4, 4, 0, 0, 0) + b"\x3b",  # no frame
])
def test_gif_quarantines(bad):
    with pytest.raises(K.OcrUnsupported):
        G.decode_gif_gray(bad)


# --------------------------------------------------------------- TIFF --

def test_tiff_render_decode_ocr_roundtrip():
    text = "TIFF BASELINE 7, OK."
    rows = T.decode_tiff_gray(T.render_text_tiff(text, width=16))
    assert K.lines_to_stream_text(K.ocr_gray_rows(rows)) == text
    bmp = K.decode_bmp_gray(K.render_text_bmp(text, width=16))
    assert [bytes(r) for r in rows] == [bytes(r) for r in bmp]


def _pack_tiff(px, endian="<", photometric=1, strips=1, spp=1, cmap=False):
    """Test encoder covering the profile variants the production twin
    doesn't emit: big-endian, WhiteIsZero, RGB, palette, multi-strip."""
    h, w = len(px), len(px[0])
    if spp == 3:
        data = b"".join(bytes(b for v in row for b in (v, v, v))
                        for row in px)
    else:
        data = b"".join(bytes(r) for r in px)
    if photometric == 0:
        data = bytes(255 - b for b in data)
    rows_per = (h + strips - 1) // strips
    rb = w * spp
    chunks = [data[i * rows_per * rb:(i + 1) * rows_per * rb]
              for i in range(strips)]
    chunks = [c for c in chunks if c]
    entries = [(256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8),
               (259, 3, 1, 1), (262, 3, 1, photometric),
               (273, 4, len(chunks), None), (277, 3, 1, spp),
               (278, 3, 1, rows_per), (279, 4, len(chunks), None)]
    if cmap:
        entries.append((320, 3, 768, None))
    ifd_size = 2 + 12 * len(entries) + 4
    pos = 8 + ifd_size
    arrays = {}
    if len(chunks) > 1:
        arrays[273] = pos
        pos += 4 * len(chunks)
        arrays[279] = pos
        pos += 4 * len(chunks)
    if cmap:
        arrays[320] = pos
        pos += 2 * 768
    offs = []
    p = pos
    for c in chunks:
        offs.append(p)
        p += len(c)
    magic = b"II*\x00" if endian == "<" else b"MM\x00*"
    out = bytearray(magic + struct.pack(endian + "I", 8))
    out += struct.pack(endian + "H", len(entries))
    for tag, ft, cnt, val in entries:
        out += struct.pack(endian + "HHI", tag, ft, cnt)
        if tag == 273:
            out += struct.pack(
                endian + "I", offs[0] if len(chunks) == 1 else arrays[273])
        elif tag == 279:
            out += struct.pack(
                endian + "I",
                len(chunks[0]) if len(chunks) == 1 else arrays[279])
        elif tag == 320:
            out += struct.pack(endian + "I", arrays[320])
        elif ft == 4:
            out += struct.pack(endian + "I", val)
        else:
            out += struct.pack(endian + "HH", val, 0)
    out += struct.pack(endian + "I", 0)
    if len(chunks) > 1:
        for o in offs:
            out += struct.pack(endian + "I", o)
        for c in chunks:
            out += struct.pack(endian + "I", len(c))
    if cmap:
        for _plane in range(3):
            for i in range(256):
                out += struct.pack(endian + "H", i << 8)
    for c in chunks:
        out += c
    return bytes(out)


@pytest.mark.parametrize("kwargs", [
    {"endian": ">"},
    {"photometric": 0},
    {"strips": 4},
    {"photometric": 2, "spp": 3},
    {"photometric": 3, "cmap": True},
])
def test_tiff_profile_variants(kwargs):
    px = _noise(40, 61, seed=9)
    assert [bytes(r) for r in T.decode_tiff_gray(_pack_tiff(px, **kwargs))] \
        == px


def test_tiff_compressed_quarantines():
    tif = bytearray(T.render_text_tiff("X", width=8))
    for i in range(9):  # set Compression (tag 259) to CCITT G4 (4)
        at = 8 + 2 + 12 * i
        if struct.unpack_from("<H", tif, at)[0] == 259:
            struct.pack_into("<HH", tif, at + 8, 4, 0)
    with pytest.raises(K.OcrUnsupported, match="compression"):
        T.decode_tiff_gray(bytes(tif))
    with pytest.raises(K.OcrUnsupported):
        T.decode_tiff_gray(b"II*\x00\x00\x00\x00")


# --------------------------------------------- TIFF codecs (round 4) --

@pytest.mark.parametrize("comp", [5, 8, 32773])
@pytest.mark.parametrize("pred", [1, 2])
def test_tiff_codec_roundtrip_and_ocr(comp, pred):
    """LZW / Deflate / PackBits strips (± the horizontal-differencing
    predictor) must reconstruct the exact raster and OCR identically to
    the uncompressed container."""
    text = "TIFF CODEC 5 8 32773."
    rows = T.decode_tiff_gray(
        T.render_text_tiff(text, width=16, compression=comp, predictor=pred))
    assert K.lines_to_stream_text(K.ocr_gray_rows(rows)) == text
    rng = np.random.default_rng(comp + pred)
    m = rng.integers(0, 256, size=(23, 37), dtype=np.uint8)
    px = [m[y].tobytes() for y in range(23)]
    got = T.decode_tiff_gray(
        T.pack_tiff_gray(px, compression=comp, predictor=pred))
    assert got == px


def test_tiff_lzw_early_change_boundaries():
    """A low-entropy stream long enough to push the LZW table through the
    9→10→11→12-bit transitions and the 4094-entry in-stream reset — the
    encoder's width must flip exactly one entry ahead of the decoder's
    (the decoder's table lags by one), or pixels shear at 511/1023/2047."""
    rng = np.random.default_rng(3)
    m = rng.choice(np.frombuffer(b"AB \x00", dtype=np.uint8),
                   size=(180, 400)).astype(np.uint8)
    px = [m[y].tobytes() for y in range(180)]
    got = T.decode_tiff_gray(T.pack_tiff_gray(px, compression=5))
    assert got == px
    # hand vector: 9-bit MSB-first codes [Clear, 'A', 'B', EOI] -> b"AB"
    bits = "".join(format(c, "09b") for c in (256, 65, 66, 257))
    bits += "0" * ((8 - len(bits) % 8) % 8)
    raw = bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))
    assert T._lzw_decode(raw, 10) == b"AB"


def test_tiff_packbits_hand_vectors():
    # the spec's worked example shapes: literal run, repeat run, noop
    assert T._unpackbits(bytes([0x02, 1, 2, 3, 0xFE, 9, 0x80, 0x00, 7]),
                         64) == bytes([1, 2, 3, 9, 9, 9, 7])
    with pytest.raises(K.OcrUnsupported):
        T._unpackbits(bytes([0x05, 1, 2]), 64)  # truncated literals


def test_tiff_codec_fuzz_quarantines_never_crashes():
    import random

    rnd = random.Random(77)
    streams = [T.render_text_tiff("FUZZ", width=8, compression=c, predictor=p)
               for c, p in ((5, 2), (8, 1), (32773, 2))]
    for base in streams:
        for _ in range(400):
            b = bytearray(base)
            for _ in range(rnd.randrange(1, 4)):
                b[rnd.randrange(len(b))] = rnd.randrange(256)
            try:
                T.decode_tiff_gray(bytes(b))
            except K.OcrUnsupported:
                pass


# ----------------------------------------------------- dispatch tier --

def test_extract_document_gif_tiff_dispatch():
    from pdf_extractor_spark.operators.extract import extract_document

    for render, ftype in ((G.render_text_gif, "gif"),
                          (T.render_text_tiff, "tiff")):
        rows = extract_document(render("SCANNED PAGE VIA " + ftype.upper(),
                                       width=32))
        assert rows[0]["text"] == "SCANNED PAGE VIA " + ftype.upper()
        assert rows[0]["meta"]["file_type"] == ftype
        assert rows[0]["meta"]["ocr"] == "true"
    # malformed containers still quarantine loudly
    for bad in (b"GIF87a" + b"\x00" * 8, b"II*\x00" + b"\x00" * 8):
        got = extract_document(bad)
        assert got[0]["meta"]["needs_ocr"] == "true"


def test_multimodal_decode_gif_tiff():
    from pdf_extractor_spark.operators import multimodal as mm

    for render in (G.render_text_gif, T.render_text_tiff):
        arr = mm._decode_image(render("DOC 8", width=32))
        assert arr.ndim == 3 and arr.shape[2] == 1
