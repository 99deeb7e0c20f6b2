"""From-scratch TIFF decoder + encoder twin.

Closes the reference's ``.tiff`` upload slice (models/enums.py:25-31;
tesseract_extractor.py:22-53 OCRs image uploads): built from the public
TIFF 6.0 specification — II/MM byte orders, IFD walk, strip assembly:

- Compression 1 (none), 5 (LZW — TIFF's MSB-first variable-width code
  stream with the spec's "early change": the code width grows when the
  next free code reaches 2^bits − 1, one code earlier than GIF's LZW;
  Clear=256/EOI=257, 12-bit cap with in-stream table resets), 8/32946
  (Deflate — zlib streams per strip), 32773 (PackBits run-length), and
  the CCITT fax family — 2 (Modified Huffman, byte-aligned rows), 3
  (Group 3, T4Options-driven 1D/2D with EOL framing) and 4 (Group 4
  MMR) — decoded by the from-scratch T.4/T.6 codec in
  ``ccitt_kernel.py`` (TIFF 6.0 §10/§11 + Section 2 of each Rec.), the
  shape real fax/scanner pipelines deliver. JPEG-in-TIFF raises
  ``OcrUnsupported`` for the loud needs-OCR quarantine
- Predictor tag 317: 1 (none) and 2 (horizontal differencing, undone
  per row after decompression); predictor 3 (floating point) raises
- 8-bit samples; PhotometricInterpretation 0 (WhiteIsZero → inverted),
  1 (BlackIsZero), 2 (RGB → ``(r+g+b)//3`` luminance), 3 (palette via
  the 16-bit ColorMap, scaled ``>> 8`` then the same luminance rule)
- multi-strip images assembled in order (RowsPerStrip honored); each
  strip decompresses independently (spec rule — LZW/Deflate state does
  not cross strip boundaries)

Output is the shared top-down luminance-row raster, so TIFF pages OCR
through the identical ``ocr_gray_rows`` machinery as BMP/PNG/GIF pages.
The encoder twin (``pack_tiff_gray``) emits the plainest conforming file
(II, one 8-bit gray strip) for synthesized scanned pages.

Scale shape: pure CPU over one payload's bytes inside the extraction
``mapInArrow`` pass — no joins, no shuffles, no driver work.
"""
from __future__ import annotations

import struct

from pdf_extractor_spark.kernels.ocr_kernel import OcrUnsupported

_MAX_PIXELS = 64 * 1024 * 1024
# field type -> byte size (TIFF 6.0 §2); only the sizes matter here
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
              11: 4, 12: 8}


def _read_values(payload: bytes, endian: str, ftype: int, count: int,
                 raw: bytes) -> list[int]:
    """IFD entry values: inline when they fit in the 4-byte slot, else at
    the offset the slot holds. SHORT/LONG/BYTE only (what this profile
    reads)."""
    size = _TYPE_SIZE.get(ftype)
    if size is None:
        raise OcrUnsupported(f"tiff: unknown field type {ftype}")
    total = size * count
    if total > 4:
        (off,) = struct.unpack(endian + "I", raw)
        data = payload[off:off + total]
        if len(data) < total:
            raise OcrUnsupported("tiff: truncated out-of-line values")
    else:
        data = raw[:total]
    if ftype == 3:
        return list(struct.unpack(endian + "H" * count, data))
    if ftype == 4:
        return list(struct.unpack(endian + "I" * count, data))
    if ftype in (1, 6, 7):
        return list(data)
    raise OcrUnsupported(f"tiff: unsupported field type {ftype}")


def _unpackbits(data: bytes, cap: int) -> bytes:
    """PackBits run-length decode (TIFF 6.0 §9 / the classic Mac ROM
    routine): n in [0,127] → copy n+1 literals, n in [-127,-1] → repeat
    the next byte 1−n times, −128 → no-op. ``cap`` bounds the output (a
    hostile run table must not balloon past the declared raster)."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        c = data[pos]
        pos += 1
        if c == 0x80:
            continue
        if c < 0x80:
            if n - pos < c + 1:
                raise OcrUnsupported("tiff: truncated PackBits literals")
            out += data[pos:pos + c + 1]
            pos += c + 1
        else:
            if pos >= n:
                raise OcrUnsupported("tiff: truncated PackBits run")
            out += bytes([data[pos]]) * (257 - c)
            pos += 1
        if len(out) > cap:
            raise OcrUnsupported("tiff: PackBits output exceeds raster")
    return bytes(out)


def _lzw_decode(data: bytes, cap: int) -> bytes:
    """TIFF-variant LZW decode (TIFF 6.0 §13): MSB-first codes starting
    at 9 bits, Clear=256, EOI=257, first free code 258, and the spec's
    EARLY CHANGE — the read width grows when the next free code equals
    2^bits − 1 (511/1023/2047), one code earlier than GIF's LZW (the
    gif_kernel decoder switches at 2^bits). 12-bit cap; a Clear anywhere
    resets the table and the width."""
    out = bytearray()
    acc = nbits_in = 0
    pos = 0
    n = len(data)
    width = 9
    table: list[bytes] = []
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while True:
        while nbits_in < width:
            if pos >= n:
                return bytes(out)  # missing EOI: tolerate (common in wild)
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits_in += 8
        nbits_in -= width
        code = (acc >> nbits_in) & ((1 << width) - 1)
        if code == 256:
            reset()
            continue
        if code == 257:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise OcrUnsupported("tiff: LZW code before any literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise OcrUnsupported("tiff: LZW code past table end")
        out += entry
        if len(out) > cap:
            raise OcrUnsupported("tiff: LZW output exceeds raster")
        prev = entry
        # early change: grow the READ width when the next code to be
        # assigned is 2^width − 1 (the table can still grow to 4095)
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1


def _undo_predictor2(data: bytearray, width: int, height: int,
                     spp: int) -> None:
    """Reverse horizontal differencing (Predictor tag 317 = 2) in place:
    each sample was stored as the delta to the same sample one pixel
    left; re-accumulate per row."""
    stride = width * spp
    for y in range(height):
        base = y * stride
        for i in range(base + spp, base + stride):
            data[i] = (data[i] + data[i - spp]) & 0xFF


def decode_tiff_gray(payload: bytes) -> list[bytes]:
    """Parse a TIFF's first IFD into top-down
    luminance rows. Raises ``OcrUnsupported`` outside the profile;
    nothing else — including on arbitrarily corrupted IFDs (e.g. a
    zero-count entry for a required tag; the JPEG/WebP error-boundary
    discipline — a corrupt crawl payload must quarantine, not kill the
    task)."""
    try:
        return _decode_tiff_gray(payload)
    except OcrUnsupported:
        raise
    except (IndexError, KeyError, ValueError, ZeroDivisionError,
            MemoryError, OverflowError, struct.error) as exc:
        raise OcrUnsupported(
            f"tiff: corrupt stream ({type(exc).__name__})") from exc


def _decode_tiff_gray(payload: bytes) -> list[bytes]:
    if len(payload) < 8:
        raise OcrUnsupported("not a TIFF container")
    if payload[:4] == b"II*\x00":
        endian = "<"
    elif payload[:4] == b"MM\x00*":
        endian = ">"
    else:
        raise OcrUnsupported("not a TIFF container")
    (ifd_off,) = struct.unpack_from(endian + "I", payload, 4)
    if ifd_off + 2 > len(payload):
        raise OcrUnsupported("tiff: truncated IFD offset")
    (n_entries,) = struct.unpack_from(endian + "H", payload, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        at = ifd_off + 2 + 12 * i
        if at + 12 > len(payload):
            raise OcrUnsupported("tiff: truncated IFD")
        tag, ftype, count = struct.unpack_from(endian + "HHI", payload, at)
        if tag in (256, 257, 258, 259, 262, 273, 277, 278, 279, 292, 293,
                   317, 320):
            tags[tag] = _read_values(
                payload, endian, ftype, count, payload[at + 8:at + 12])
    try:
        width = tags[256][0]
        height = tags[257][0]
        strip_offsets = tags[273]
        strip_counts = tags[279]
    except KeyError as exc:
        raise OcrUnsupported(f"tiff: missing required tag {exc}") from None
    compression = tags.get(259, [1])[0]
    if compression not in (1, 2, 3, 4, 5, 8, 32773, 32946):
        raise OcrUnsupported(
            f"tiff: compression {compression} needs a codec outside this "
            "profile (none/CCITT/LZW/Deflate/PackBits decode here)")
    predictor = tags.get(317, [1])[0]
    if predictor not in (1, 2):
        raise OcrUnsupported(f"tiff: unsupported predictor {predictor}")
    photometric = tags.get(262, [1])[0]
    spp = tags.get(277, [1])[0]
    if width <= 0 or height <= 0 or width * height > _MAX_PIXELS:
        raise OcrUnsupported(f"tiff: implausible dimensions {width}x{height}")
    if len(strip_offsets) != len(strip_counts):
        raise OcrUnsupported("tiff: strip offset/count mismatch")
    if compression in (2, 3, 4):
        return _decode_fax_strips(payload, tags, width, height,
                                  strip_offsets, strip_counts)
    bits = tags.get(258, [8] * spp)
    if any(b != 8 for b in bits):
        raise OcrUnsupported(f"tiff: unsupported bits-per-sample {bits}")
    need = width * height * spp
    rows_per_strip = tags.get(278, [height])[0]
    stride = width * spp
    data = bytearray()
    for si, (off, cnt) in enumerate(zip(strip_offsets, strip_counts)):
        chunk = payload[off:off + cnt]
        if len(chunk) < cnt:
            raise OcrUnsupported("tiff: truncated strip data")
        if compression == 1:
            strip = bytes(chunk)
        elif compression == 5:
            strip = _lzw_decode(chunk, need)
        elif compression == 32773:
            strip = _unpackbits(chunk, need)
        else:  # 8 / 32946: zlib per strip
            import zlib

            try:
                strip = zlib.decompressobj().decompress(chunk, need + 1)
            except zlib.error as exc:
                raise OcrUnsupported(
                    f"tiff: inflate failed ({exc})") from None
            if len(strip) > need:
                raise OcrUnsupported("tiff: inflate output exceeds raster")
        if predictor == 2:
            n_rows = min(rows_per_strip, max(0, height - si * rows_per_strip))
            if len(strip) < n_rows * stride:
                raise OcrUnsupported("tiff: short strip for predictor")
            buf = bytearray(strip)
            _undo_predictor2(buf, width, n_rows, spp)
            strip = bytes(buf)
        data += strip
    if len(data) < need:
        raise OcrUnsupported("tiff: short pixel data")
    if photometric in (0, 1):
        if spp != 1:
            raise OcrUnsupported(
                f"tiff: {spp} samples/pixel for grayscale photometric")
        rows = [bytes(data[y * width:(y + 1) * width]) for y in range(height)]
        if photometric == 0:  # WhiteIsZero: invert to the shared convention
            inv = bytes(255 - v for v in range(256))
            rows = [r.translate(inv) for r in rows]
        return rows
    if photometric == 2:
        if spp < 3:
            raise OcrUnsupported("tiff: RGB photometric needs >= 3 samples")
        rows = []
        for y in range(height):
            base = y * width * spp
            rows.append(bytes(
                (data[base + x * spp] + data[base + x * spp + 1]
                 + data[base + x * spp + 2]) // 3
                for x in range(width)))
        return rows
    if photometric == 3:
        cmap = tags.get(320)
        if spp != 1 or not cmap or len(cmap) < 3 * 256:
            raise OcrUnsupported("tiff: palette image without a full ColorMap")
        # ColorMap holds 16-bit values, R plane then G then B
        lut = bytes(
            ((cmap[i] >> 8) + (cmap[256 + i] >> 8)
             + (cmap[512 + i] >> 8)) // 3
            for i in range(256))
        return [bytes(data[y * width:(y + 1) * width]).translate(lut)
                for y in range(height)]
    raise OcrUnsupported(f"tiff: unsupported photometric {photometric}")


def _decode_fax_strips(payload: bytes, tags: dict[int, list[int]],
                       width: int, height: int, strip_offsets: list[int],
                       strip_counts: list[int]) -> list[bytes]:
    """CCITT compressions 2/3/4 (TIFF 6.0 §10, Section 11): each strip
    is an independent fax stream (reference line resets — spec rule, the
    same independence LZW/Deflate strips have). BitsPerSample defaults
    to 1 for bilevel data and is required to BE 1 here; photometric 0
    (WhiteIsZero, the fax convention) maps CCITT black runs to ink,
    photometric 1 inverts."""
    from pdf_extractor_spark.kernels.ccitt_kernel import (
        CcittError,
        decode_to_gray_rows,
    )

    compression = tags[259][0]
    spp = tags.get(277, [1])[0]
    bits = tags.get(258, [1] * spp)
    if spp != 1 or any(b != 1 for b in bits):
        raise OcrUnsupported(
            f"tiff: fax compression needs 1-bit samples, got {bits}")
    photometric = tags.get(262, [0])[0]
    if photometric not in (0, 1):
        raise OcrUnsupported(
            f"tiff: photometric {photometric} invalid for fax data")
    if tags.get(317, [1])[0] != 1:
        raise OcrUnsupported("tiff: predictor invalid for fax data")
    if compression == 2:
        k, eol, byte_align = 0, False, True  # MH: aligned rows, no EOLs
    elif compression == 3:
        t4 = tags.get(292, [0])[0]
        if t4 & 2:
            raise OcrUnsupported("tiff: T4 uncompressed mode out of profile")
        # bit 0: 2D lines present (tag bit after each EOL); fill bits
        # (bit 2) are transparent to the EOL scanner
        k, eol, byte_align = (4 if t4 & 1 else 0), True, False
    else:
        t6 = tags.get(293, [0])[0]
        if t6 & 2:
            raise OcrUnsupported("tiff: T6 uncompressed mode out of profile")
        k, eol, byte_align = -1, False, False
    rows_per_strip = tags.get(278, [height])[0]
    rows: list[bytes] = []
    for si, (off, cnt) in enumerate(zip(strip_offsets, strip_counts)):
        chunk = payload[off:off + cnt]
        if len(chunk) < cnt:
            raise OcrUnsupported("tiff: truncated strip data")
        n_rows = min(rows_per_strip, height - si * rows_per_strip)
        if n_rows <= 0:
            raise OcrUnsupported("tiff: excess fax strips")
        try:
            rows += decode_to_gray_rows(chunk, width, n_rows, k=k,
                                        eol=eol, byte_align=byte_align)
        except CcittError as exc:
            raise OcrUnsupported(f"tiff: {exc}") from None
    if photometric == 1:  # BlackIsZero: the codec's white runs are ink
        inv = bytes(255 - v for v in range(256))
        rows = [r.translate(inv) for r in rows]
    return rows


def _packbits_encode(data: bytes) -> bytes:
    """PackBits encode (literal/run alternation, runs ≥ 3 bytes pay)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit = i
        while i < n and i - lit < 128:
            run = 1
            while i + run < n and run < 3 and data[i + run] == data[i]:
                run += 1
            if run >= 3:
                break
            i += 1
        out += bytes([i - lit - 1]) + data[lit:i]
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encode — the exact mirror of ``_lzw_decode``:
    MSB-first, leading Clear, EOI terminator, EARLY CHANGE (the write
    width grows when the next free code equals 2^bits − 1), table reset
    via Clear when code 4094 would be assigned."""
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    emit(256, width)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = nxt
        nxt += 1
        # the decoder's table lags this one by exactly one entry (it adds
        # per code READ, after the first), so its early-change threshold
        # of 2^w − 1 pairs with 2^w here — both flip before the same code
        if nxt == (1 << width) and width < 12:
            width += 1
        elif nxt >= 4094:  # 12-bit table nearly full: in-stream reset
            emit(256, width)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(257, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _apply_predictor2(data: bytes, width: int, height: int,
                      spp: int) -> bytes:
    """Forward horizontal differencing — encoder side of tag 317 = 2."""
    buf = bytearray(data)
    stride = width * spp
    for y in range(height):
        base = y * stride
        for i in range(base + stride - 1, base + spp - 1, -1):
            buf[i] = (buf[i] - buf[i - spp]) & 0xFF
    return bytes(buf)


def pack_tiff_gray(px: list, compression: int = 1,
                   predictor: int = 1) -> bytes:
    """Pack top-down luminance rows into a conforming little-endian
    8-bit grayscale (BlackIsZero) one-strip TIFF. ``compression`` picks
    the strip codec (1 none, 5 LZW, 8 Deflate, 32773 PackBits);
    ``predictor=2`` stores horizontal deltas (tag 317, only meaningful
    with a codec). Encoder twin of ``decode_tiff_gray``."""
    if compression not in (1, 5, 8, 32773):
        raise ValueError(f"unsupported compression {compression}")
    if predictor not in (1, 2):
        raise ValueError(f"unsupported predictor {predictor}")
    height, width = len(px), len(px[0])
    data = b"".join(bytes(px[y]) for y in range(height))
    if predictor == 2:
        data = _apply_predictor2(data, width, height, 1)
    if compression == 5:
        data = _lzw_encode(data)
    elif compression == 8:
        import zlib

        data = zlib.compress(data, 6)
    elif compression == 32773:
        data = _packbits_encode(data)
    # layout: header (8) | IFD | pixel data
    entries = [
        (256, 3, 1, width),         # ImageWidth
        (257, 3, 1, height),        # ImageLength
        (258, 3, 1, 8),             # BitsPerSample
        (259, 3, 1, compression),   # Compression
        (262, 3, 1, 1),             # Photometric: BlackIsZero
        (273, 4, 1, None),          # StripOffsets (patched)
        (277, 3, 1, 1),             # SamplesPerPixel
        (278, 3, 1, height),        # RowsPerStrip
        (279, 4, 1, len(data)),     # StripByteCounts
    ]
    if predictor == 2:
        entries.append((317, 3, 1, 2))  # Predictor: horizontal deltas
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * len(entries) + 4
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", len(entries))
    for tag, ftype, count, value in entries:
        if value is None:
            value = data_off
        out += struct.pack("<HHI", tag, ftype, count)
        out += struct.pack("<I", value) if ftype == 4 else \
            struct.pack("<HH", value, 0)
    out += struct.pack("<I", 0)  # next-IFD terminator
    out += data
    return bytes(out)


def pack_tiff_bilevel(px: list, compression: int = 4) -> bytes:
    """Pack top-down luminance rows into a conforming little-endian
    1-bit WhiteIsZero (fax-convention) one-strip TIFF — the encoder twin
    of the CCITT arm of ``decode_tiff_gray``. ``compression`` 2 emits
    byte-aligned Modified Huffman rows, 3 a Group 3 2D stream
    (T4Options bit 0 set, EOL+tag framing), 4 a Group 4 MMR stream with
    EOFB. Ink is luminance < 128, matching the OCR threshold."""
    if compression not in (2, 3, 4):
        raise ValueError(f"unsupported fax compression {compression}")
    from pdf_extractor_spark.kernels.ccitt_kernel import encode_gray_rows

    height, width = len(px), len(px[0])
    if compression == 2:
        data = encode_gray_rows([bytes(r) for r in px], k=0, eol=False,
                                byte_align=True, eofb=False)
    elif compression == 3:
        data = encode_gray_rows([bytes(r) for r in px], k=4, eol=True)
    else:
        data = encode_gray_rows([bytes(r) for r in px], k=-1)
    entries = [
        (256, 3, 1, width),         # ImageWidth
        (257, 3, 1, height),        # ImageLength
        (258, 3, 1, 1),             # BitsPerSample
        (259, 3, 1, compression),   # Compression
        (262, 3, 1, 0),             # Photometric: WhiteIsZero (fax)
        (273, 4, 1, None),          # StripOffsets (patched)
        (277, 3, 1, 1),             # SamplesPerPixel
        (278, 3, 1, height),        # RowsPerStrip
        (279, 4, 1, len(data)),     # StripByteCounts
    ]
    if compression == 3:
        entries.append((292, 4, 1, 1))  # T4Options: 2D coding
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * len(entries) + 4
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", len(entries))
    for tag, ftype, count, value in entries:
        if value is None:
            value = data_off
        out += struct.pack("<HHI", tag, ftype, count)
        out += struct.pack("<I", value) if ftype == 4 else \
            struct.pack("<HH", value, 0)
    out += struct.pack("<I", 0)  # next-IFD terminator
    out += data
    return bytes(out)


def render_text_tiff(text: str, width: int = 32, compression: int = 1,
                     predictor: int = 1) -> bytes:
    """Print ``text`` in the fixed-pitch OCR font onto a TIFF page — the
    TIFF twin of ``render_text_bmp``/``render_text_png``. ``compression``
    and ``predictor`` pass through to :func:`pack_tiff_gray`; fax
    compressions 2/3/4 route to :func:`pack_tiff_bilevel` (the page
    raster is bilevel ink/paper, so the 1-bit container is lossless)."""
    from pdf_extractor_spark.kernels.ocr_kernel import (
        render_page_gray, wrap_fixed,
    )

    px = render_page_gray(wrap_fixed(text, width))
    if compression in (2, 3, 4):
        return pack_tiff_bilevel(px, compression=compression)
    return pack_tiff_gray(px, compression=compression, predictor=predictor)
