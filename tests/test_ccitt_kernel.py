"""CCITT (ITU-T T.4/T.6) fax codec: table structure, round-trips across
every framing scheme, container integration (TIFF compressions 2/3/4,
PDF /CCITTFaxDecode), polarity knobs, and corruption quarantine.

The code tables are published spec constants (T.4 Tables 2/3/4); these
tests pin their structural invariants — exact entry counts, per-color
prefix-freeness, spec-known spot values — so a mistranscribed entry
cannot hide behind the encoder/decoder twins' self-consistency.
"""
import random

import pytest

from pdf_extractor_spark.kernels import ccitt_kernel as C
from pdf_extractor_spark.kernels import tiff_kernel as T
from pdf_extractor_spark.kernels.ocr_kernel import (
    OcrUnsupported,
    render_page_gray,
    render_scanned_pdf,
    wrap_fixed,
)


# --------------------------------------------------------------------------
# table structure
# --------------------------------------------------------------------------

def test_table_counts_match_spec():
    # T.4 Table 2/3: 64 terminating codes (runs 0..63) and 27 makeups
    # (64..1728 by 64) per color; Table 4: 13 shared extended makeups
    # (1792..2560 by 64)
    assert sorted(C._WHITE_TERM) == list(range(64))
    assert sorted(C._BLACK_TERM) == list(range(64))
    assert sorted(C._WHITE_MAKEUP) == [64 * i for i in range(1, 28)]
    assert sorted(C._BLACK_MAKEUP) == [64 * i for i in range(1, 28)]
    assert sorted(C._EXT_MAKEUP) == [1792 + 64 * i for i in range(13)]


@pytest.mark.parametrize("tables", [
    ("white", (C._WHITE_TERM, C._WHITE_MAKEUP, C._EXT_MAKEUP)),
    ("black", (C._BLACK_TERM, C._BLACK_MAKEUP, C._EXT_MAKEUP)),
])
def test_code_trees_are_prefix_free(tables):
    name, tabs = tables
    codes = [b for t in tabs for b in t.values()]
    assert len(codes) == len(set(codes)), name
    ordered = sorted(codes, key=len)
    for i, a in enumerate(ordered):
        for b in ordered[i + 1:]:
            assert not b.startswith(a) or a == b, (name, a, b)


def test_spec_spot_values():
    # the handful of entries every fax text quotes
    assert C._WHITE_TERM[0] == "00110101"
    assert C._WHITE_TERM[1] == "000111"
    assert C._WHITE_TERM[63] == "00110100"
    assert C._WHITE_MAKEUP[64] == "11011"
    assert C._WHITE_MAKEUP[1728] == "010011011"
    assert C._BLACK_TERM[0] == "0000110111"
    assert C._BLACK_TERM[1] == "010"
    assert C._BLACK_TERM[2] == "11"
    assert C._BLACK_MAKEUP[64] == "0000001111"
    assert C._EXT_MAKEUP[2560] == "000000011111"
    assert C.EOL == "000000000001"


def test_mode_codes_vs_spec():
    assert C._MODE_V[0] == "1"
    assert C._MODE_V[1] == "011" and C._MODE_V[-1] == "010"
    assert C._MODE_PASS == "0001" and C._MODE_HORIZ == "001"


def test_known_1d_bitstream():
    """Hand-assembled MH line: white 4, black 2, white 26 over 32 columns
    -> '1011' + '11' + '0010011', zero-padded to a byte boundary."""
    data = C.ccitt_encode([[4, 6]], 32, k=0, eol=False, eofb=False)
    bits = "1011" + "11" + "0010011"
    expected = int(bits + "0" * (8 * len(data) - len(bits)), 2)
    assert data == expected.to_bytes(len(data), "big")
    assert C.ccitt_decode(data, 32, 1, k=0) == [[4, 6]]


def test_long_run_uses_repeated_makeups():
    """A 6000-pixel white run must chain 2560+2560+832(makeup)+48(term)."""
    data = C.ccitt_encode([[]], 6000, k=0, eol=False, eofb=False)
    bits = (C._EXT_MAKEUP[2560] * 2 + C._WHITE_MAKEUP[832]
            + C._WHITE_TERM[48])
    expected = int(bits + "0" * (8 * len(data) - len(bits)), 2)
    assert data == expected.to_bytes(len(data), "big")
    assert C.ccitt_decode(data, 6000, 1, k=0) == [[]]


# --------------------------------------------------------------------------
# round-trips over every scheme
# --------------------------------------------------------------------------

def _rand_rows(rng, h, w, p):
    return [bytes(0 if rng.random() < p else 255 for _ in range(w))
            for _ in range(h)]


_SCHEMES = [
    dict(k=-1),                              # G4 / MMR
    dict(k=-1, byte_align=True),             # PDF /EncodedByteAlign
    dict(k=0, eol=False, byte_align=True),   # TIFF compression 2 (MH)
    dict(k=0, eol=True),                     # G3 1D with EOLs
    dict(k=0, eol=False),                    # PDF K=0 default framing
    dict(k=1, eol=True),                     # G3 "2D" all-1D degenerate
    dict(k=2, eol=True),                     # G3 2D, K=2
    dict(k=4, eol=True),                     # G3 2D, K=4 (fax default)
]


@pytest.mark.parametrize("scheme", range(len(_SCHEMES)))
def test_roundtrip_random_rasters(scheme):
    kw = _SCHEMES[scheme]
    rng = random.Random(1000 + scheme)
    cases = [
        _rand_rows(rng, 10, 17, 0.3),
        _rand_rows(rng, 5, 64, 0.5),
        _rand_rows(rng, 3, 1, 0.5),          # single-pixel lines
        [b"\xff" * 33] * 4,                   # all white
        [b"\x00" * 33] * 4,                   # all black
        _rand_rows(rng, 7, 100, 0.03),        # sparse ink
        _rand_rows(rng, 7, 100, 0.97),        # dense ink
        [bytes(255 if x % 2 else 0 for x in range(31))] * 3,  # 1px runs
        _rand_rows(rng, 4, 3000, 0.001),      # runs past one 2560 makeup
    ]
    for rows in cases:
        w = len(rows[0])
        data = C.encode_gray_rows(rows, **kw)
        k = kw.get("k", -1)
        eol = kw.get("eol")
        back = C.decode_to_gray_rows(
            data, w, len(rows), k=k,
            eol=(k > 0 if eol is None else eol),
            byte_align=kw.get("byte_align", False))
        assert back == rows


def test_2d_decoder_tolerates_eol_fill_bits():
    """T4Options fill (zeros before each EOL) must be transparent."""
    rng = random.Random(7)
    rows = _rand_rows(rng, 6, 40, 0.3)
    lines = [C.gray_row_to_transitions(r) for r in rows]
    w = C._BitWriter()
    ref = []
    for i, cur in enumerate(lines):
        w.align()  # fill to byte boundary BEFORE the EOL
        w.put_str(C.EOL)
        one_d = i % 4 == 0
        w.put(1, 1 if one_d else 0)
        if one_d:
            C._encode_1d_line(w, cur, 40)
        else:
            C._encode_2d_line(w, cur, ref, 40)
        ref = cur
    back = C.decode_to_gray_rows(w.bytes(), 40, 6, k=4, eol=True)
    assert back == rows


def test_corrupt_streams_raise_ccitt_error():
    rng = random.Random(99)
    rows = _rand_rows(rng, 8, 64, 0.3)
    data = bytearray(C.encode_gray_rows(rows, k=-1))
    for trial in range(200):
        mut = bytearray(data)
        op = trial % 3
        if op == 0:
            mut = mut[:rng.randrange(1, len(mut))]
        elif op == 1:
            mut[rng.randrange(len(mut))] ^= 1 << rng.randrange(8)
        else:
            mut[rng.randrange(len(mut))] = rng.randrange(256)
        try:
            C.decode_to_gray_rows(bytes(mut), 64, 8, k=-1)
        except C.CcittError:
            pass  # loud, typed failure is the contract


def test_uncompressed_extension_mode_quarantines():
    w = C._BitWriter()
    w.put_str(C._MODE_EXT)
    with pytest.raises(C.CcittError):
        C.ccitt_decode(w.bytes(), 16, 1, k=-1)


# --------------------------------------------------------------------------
# TIFF container (compressions 2/3/4)
# --------------------------------------------------------------------------

@pytest.mark.parametrize("compression", [2, 3, 4])
def test_tiff_fax_roundtrip(compression):
    text = "CCITT FAX PAGE 123, OK."
    payload = T.render_text_tiff(text, width=16, compression=compression)
    rows = T.decode_tiff_gray(payload)
    assert rows == [bytes(r) for r in render_page_gray(wrap_fixed(text, 16))]


def test_tiff_fax_multi_strip_resets_reference_line():
    """Strips are independent fax streams (TIFF 6.0 rule): hand-build a
    two-strip G4 file and check the second strip decodes against a fresh
    all-white reference, not the first strip's last line."""
    import struct

    rng = random.Random(3)
    rows = _rand_rows(rng, 6, 40, 0.4)
    s1 = C.encode_gray_rows(rows[:3], k=-1)
    s2 = C.encode_gray_rows(rows[3:], k=-1)
    entries = [
        (256, 3, 1, 40), (257, 3, 1, 6), (258, 3, 1, 1), (259, 3, 1, 4),
        (262, 3, 1, 0), (273, 4, 2, None), (277, 3, 1, 1), (278, 3, 1, 3),
        (279, 4, 2, None),
    ]
    ifd_off = 8
    arrays_off = ifd_off + 2 + 12 * len(entries) + 4
    data_off = arrays_off + 16  # two 2-entry LONG arrays
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", len(entries))
    for tag, ftype, count, value in entries:
        out += struct.pack("<HHI", tag, ftype, count)
        if tag == 273:
            out += struct.pack("<I", arrays_off)
        elif tag == 279:
            out += struct.pack("<I", arrays_off + 8)
        elif ftype == 4:
            out += struct.pack("<I", value)
        else:
            out += struct.pack("<HH", value, 0)
    out += struct.pack("<I", 0)
    out += struct.pack("<II", data_off, data_off + len(s1))
    out += struct.pack("<II", len(s1), len(s2))
    out += s1 + s2
    assert T.decode_tiff_gray(bytes(out)) == rows


def test_tiff_fax_out_of_profile_shapes_quarantine():
    payload = bytearray(T.render_text_tiff("X", width=8, compression=4))
    # flip BitsPerSample to 8: fax data must be 1-bit
    at = payload.find(b"\x02\x01\x03\x00\x01\x00\x00\x00\x01\x00")
    assert at > 0
    payload[at + 8] = 8
    with pytest.raises(OcrUnsupported):
        T.decode_tiff_gray(bytes(payload))


def test_tiff_fax_truncated_strip_quarantines():
    payload = T.render_text_tiff("TRUNCATED", width=16, compression=4)
    with pytest.raises(OcrUnsupported):
        T.decode_tiff_gray(payload[:-12])


# --------------------------------------------------------------------------
# PDF container (/CCITTFaxDecode)
# --------------------------------------------------------------------------

def test_scanned_pdf_ccitt_profiles_roundtrip():
    from pdf_extractor_spark.kernels.pdf_kernel import extract_pdf

    t1, t2 = "SCANNED PAGE ONE 42.", "PAGE TWO, MIXED 7."
    for profile in ("ccitt-g4", "ccitt-g3"):
        pdf = render_scanned_pdf([t1, t2], width=16, profile=profile)
        res = extract_pdf(pdf)
        assert res["pages"] == [(1, t1), (2, t2)], profile
        assert res["meta"]["ok"] == "true", profile
        assert res["meta"]["ocr_pages"] == "2", profile


def _ccitt_image_body(parms: bytes, extra: bytes, data: bytes,
                      w: int, h: int) -> bytes:
    return (b"<< /Type /XObject /Subtype /Image /Width %d /Height %d"
            b" /ColorSpace /DeviceGray /BitsPerComponent 1%s"
            b" /Filter /CCITTFaxDecode /DecodeParms << %s >>"
            b" /Length %d >>\nstream\n%s\nendstream"
            % (w, h, extra, parms, len(data), data))


def test_pdf_polarity_pair_controls_sample_mapping():
    """/BlackIs1 and /Decode [1 0] each invert the rendered raster; the
    codec's black runs come out dark only when the two agree. (The OCR
    tier reads inverse-video pages anyway — its documented tolerance —
    so the mapping is pinned here at the raster level.)"""
    from pdf_extractor_spark.kernels.pdf_kernel import (
        _ccitt_image_rows,
        _dict_of,
        _filter_names,
    )

    data = C.ccitt_encode([[2, 5]], 8, k=-1)  # one row: black pixels 2..4
    dark = bytes([255, 255, 0, 0, 0, 255, 255, 255])
    cases = [
        (b"/K -1 /Columns 8 /Rows 1", b"", dark),
        (b"/K -1 /Columns 8 /Rows 1 /BlackIs1 true", b" /Decode [1 0]",
         dark),
        (b"/K -1 /Columns 8 /Rows 1 /BlackIs1 true", b"",
         bytes(255 - v for v in dark)),
        (b"/K -1 /Columns 8 /Rows 1", b" /Decode [1 0]",
         bytes(255 - v for v in dark)),
    ]
    for parms, extra, expected in cases:
        body = _ccitt_image_body(parms, extra, data, 8, 1)
        d = _dict_of(body)
        rows = _ccitt_image_rows(body, d, _filter_names(d))
        assert rows == [expected], (parms, extra)


def test_pdf_ccitt_corrupt_stream_degrades():
    pdf = bytearray(render_scanned_pdf(["CORRUPT FAX"], width=16,
                                       profile="ccitt-g4"))
    at = pdf.find(b"stream\n") + len(b"stream\n")
    for i in range(at + 2, at + 12):
        pdf[i] ^= 0xFF
    from pdf_extractor_spark.kernels.pdf_kernel import extract_pdf

    res = extract_pdf(bytes(pdf))  # must degrade, never raise
    assert res["meta"]["ok"] in ("true", "false")
    assert res["pages"] in ([], res["pages"])  # no exception is the contract


def test_pdf_ccitt_geometry_mismatch_degrades():
    pdf = render_scanned_pdf(["GEOMETRY"], width=16, profile="ccitt-g4")
    # /Columns disagrees with /Width -> out of profile -> textless page
    bad = pdf.replace(b"/Columns 52", b"/Columns 51")
    assert bad != pdf
    from pdf_extractor_spark.kernels.pdf_kernel import extract_pdf

    res = extract_pdf(bad)  # textless page through the no-content path
    assert all(t == "" for _, t in res["pages"])
    assert res["meta"]["ok"] == "false"
