"""From-scratch GIF decoder (LZW) + encoder twin.

Closes the reference's ``.gif`` upload slice (models/enums.py:25-31 lists
gif among the image-capable file types; tesseract_extractor.py:22-53 OCRs
image uploads): built from the public GIF87a/GIF89a specification —
logical-screen/image descriptors, global/local color tables, extension
blocks, 4-pass interlace, and the variable-width LZW code stream decoded
from first principles (clear/EOI codes, dictionary growth to 12 bits).

Profile: the FIRST image frame of any GIF87a/GIF89a file decodes to the
shared top-down luminance-row raster (palette mapped through the
``(r+g+b)//3`` rule every raster decoder here uses); malformed containers
raise ``OcrUnsupported`` for the loud needs-OCR quarantine. Animation
frames past the first are ignored (a scanned page is one frame).

The encoder twin (``pack_gif_gray``) emits a real LZW-compressed GIF87a
with a 256-entry grayscale palette, so tests and query tiers can
synthesize scanned-GIF pages closed-form and the decoder's dictionary
growth is exercised by genuine compressed streams.

Scale shape: pure CPU over one payload's bytes inside the extraction
``mapInArrow`` pass — no joins, no shuffles, no driver work.
"""
from __future__ import annotations

import struct

from pdf_extractor_spark.kernels.ocr_kernel import OcrUnsupported

_MAX_PIXELS = 64 * 1024 * 1024  # same decode-bomb cap as the PNG/BMP arms


def _skip_subblocks(data: bytes, pos: int) -> int:
    """Advance past a sub-block chain (size-prefixed blocks, 0 ends)."""
    n = len(data)
    while pos < n:
        size = data[pos]
        pos += 1
        if size == 0:
            return pos
        pos += size
    raise OcrUnsupported("gif: unterminated sub-block chain")


def _collect_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = []
    n = len(data)
    while pos < n:
        size = data[pos]
        pos += 1
        if size == 0:
            return b"".join(out), pos
        out.append(data[pos:pos + size])
        pos += size
    raise OcrUnsupported("gif: unterminated image data")


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    """Variable-width LZW per the GIF spec: codes start at
    min_code_size+1 bits, CLEAR resets the table, width grows when the
    next code would not fit, capped at 12 bits until the next CLEAR."""
    # spec bound is 8 (palette indices are bytes); anything above is a
    # corrupt stream and would overflow the bytes-per-entry root table
    if not 2 <= min_code_size <= 8:
        raise OcrUnsupported(f"gif: bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader state (LSB-first per spec)
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    n = len(data)
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= n:
                # truncated stream: the spec says EOI may be omitted by
                # sloppy writers; accept what decoded if anything did
                if out:
                    break
                raise OcrUnsupported("gif: truncated LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        if nbits < width:
            break
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and (code < clear or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise OcrUnsupported("gif: corrupt LZW code stream")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        prev = entry
        if len(table) >= (1 << width) and width < 12:
            width += 1
    return out


def decode_gif_gray(payload: bytes) -> list[bytes]:
    """Parse a GIF's first image frame into top-down luminance rows (the
    ``decode_bmp_gray``/``decode_png_gray`` output shape). Raises
    ``OcrUnsupported`` on anything outside the profile; nothing else —
    corrupted block contents convert at this boundary (the JPEG/WebP
    discipline) instead of escaping as raw parse errors."""
    try:
        return _decode_gif_gray(payload)
    except OcrUnsupported:
        raise
    except (IndexError, KeyError, ValueError, ZeroDivisionError,
            MemoryError, OverflowError, struct.error) as exc:
        raise OcrUnsupported(
            f"gif: corrupt stream ({type(exc).__name__})") from exc


def _decode_gif_gray(payload: bytes) -> list[bytes]:
    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        raise OcrUnsupported("not a GIF container")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct: bytes | None = None
    if packed & 0x80:
        size = 3 * (2 << (packed & 0x07))
        gct = payload[pos:pos + size]
        if len(gct) < size:
            raise OcrUnsupported("gif: truncated global color table")
        pos += size
    n = len(payload)
    while pos < n:
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            raise OcrUnsupported("gif: no image frame")
        if block == 0x21:  # extension: label + sub-blocks
            if pos >= n:
                raise OcrUnsupported("gif: truncated extension")
            pos = _skip_subblocks(payload, pos + 1)
            continue
        if block != 0x2C:
            raise OcrUnsupported(f"gif: unknown block 0x{block:02x}")
        if pos + 9 > n:
            raise OcrUnsupported("gif: truncated image descriptor")
        _left, _top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
            raise OcrUnsupported(f"gif: implausible dimensions {w}x{h}")
        ct = gct
        if ipacked & 0x80:
            size = 3 * (2 << (ipacked & 0x07))
            ct = payload[pos:pos + size]
            if len(ct) < size:
                raise OcrUnsupported("gif: truncated local color table")
            pos += size
        if ct is None:
            raise OcrUnsupported("gif: image frame without a color table")
        if pos >= n:
            raise OcrUnsupported("gif: missing LZW data")
        min_code = payload[pos]
        data, pos = _collect_subblocks(payload, pos + 1)
        idx = _lzw_decode(data, min_code, w * h)
        if len(idx) < w * h:
            raise OcrUnsupported("gif: short pixel data")
        # palette index -> luminance, one C-speed translate per row
        lut = bytearray(range(256))
        for i in range(len(ct) // 3):
            r, g, b = ct[3 * i:3 * i + 3]
            lut[i] = (r + g + b) // 3
        lut_b = bytes(lut)
        rows = [bytes(idx[y * w:(y + 1) * w]).translate(lut_b)
                for y in range(h)]
        if ipacked & 0x40:  # 4-pass interlace: reorder rows
            order = ([*range(0, h, 8)] + [*range(4, h, 8)]
                     + [*range(2, h, 4)] + [*range(1, h, 2)])
            deinterlaced: list[bytes] = [b""] * h
            for src_i, dst_y in enumerate(order):
                deinterlaced[dst_y] = rows[src_i]
            rows = deinterlaced
        return rows
    raise OcrUnsupported("gif: no image frame")


def _lzw_encode(idx: bytes, min_code_size: int) -> bytes:
    """Real variable-width LZW encoder (string-table) — the decoder's
    dictionary-growth twin, so round-trip tests exercise compressed
    streams, not degenerate clear-code-only output."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    prefix = b""
    for byte in idx:
        trial = prefix + bytes([byte])
        if trial in table:
            prefix = trial
            continue
        emit(table[prefix])
        table[trial] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code >= 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([byte])
    if prefix:
        emit(table[prefix])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def pack_gif_gray(px: list) -> bytes:
    """Pack top-down luminance rows into a GIF87a with an identity
    256-entry grayscale palette and a real LZW-compressed image —
    encoder twin of ``decode_gif_gray`` (round-trip pinned by tests)."""
    height, width = len(px), len(px[0])
    head = b"GIF87a" + struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    palette = bytes(v for g in range(256) for v in (g, g, g))
    idx = b"".join(bytes(px[y]) for y in range(height))
    lzw = _lzw_encode(idx, 8)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    img = (b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
           + b"\x08" + bytes(blocks))
    return head + palette + img + b"\x3b"


def render_text_gif(text: str, width: int = 32) -> bytes:
    """Print ``text`` in the fixed-pitch OCR font onto a GIF page — the
    GIF twin of ``render_text_bmp``/``render_text_png``."""
    from pdf_extractor_spark.kernels.ocr_kernel import (
        render_page_gray, wrap_fixed,
    )

    return pack_gif_gray(render_page_gray(wrap_fixed(text, width)))
