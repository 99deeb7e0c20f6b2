"""From-scratch TIFF decoder (uncompressed baseline) + encoder twin.

Closes the reference's ``.tiff`` upload slice (models/enums.py:25-31;
tesseract_extractor.py:22-53 OCRs image uploads): built from the public
TIFF 6.0 baseline specification — II/MM byte orders, IFD walk, strip
assembly — for the profile a scanner actually emits uncompressed:

- Compression 1 (none); anything else (LZW/PackBits/JPEG-in-TIFF) raises
  ``OcrUnsupported`` for the loud needs-OCR quarantine
- 8-bit samples; PhotometricInterpretation 0 (WhiteIsZero → inverted),
  1 (BlackIsZero), 2 (RGB → ``(r+g+b)//3`` luminance), 3 (palette via
  the 16-bit ColorMap, scaled ``>> 8`` then the same luminance rule)
- multi-strip images assembled in order (RowsPerStrip honored)

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


def decode_tiff_gray(payload: bytes) -> list[bytes]:
    """Parse an uncompressed baseline TIFF's first IFD into top-down
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
        if tag in (256, 257, 258, 259, 262, 273, 277, 278, 279, 320):
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
    if compression != 1:
        raise OcrUnsupported(
            f"tiff: compression {compression} needs a codec outside this "
            "profile (only uncompressed baseline decodes here)")
    photometric = tags.get(262, [1])[0]
    spp = tags.get(277, [1])[0]
    bits = tags.get(258, [8] * spp)
    if any(b != 8 for b in bits):
        raise OcrUnsupported(f"tiff: unsupported bits-per-sample {bits}")
    if width <= 0 or height <= 0 or width * height > _MAX_PIXELS:
        raise OcrUnsupported(f"tiff: implausible dimensions {width}x{height}")
    if len(strip_offsets) != len(strip_counts):
        raise OcrUnsupported("tiff: strip offset/count mismatch")
    data = bytearray()
    for off, cnt in zip(strip_offsets, strip_counts):
        chunk = payload[off:off + cnt]
        if len(chunk) < cnt:
            raise OcrUnsupported("tiff: truncated strip data")
        data += chunk
    need = width * height * spp
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


def pack_tiff_gray(px: list) -> bytes:
    """Pack top-down luminance rows into the plainest baseline TIFF:
    little-endian, 8-bit grayscale (BlackIsZero), uncompressed, one
    strip. Encoder twin of ``decode_tiff_gray``."""
    height, width = len(px), len(px[0])
    data = b"".join(bytes(px[y]) for y in range(height))
    # layout: header (8) | IFD | pixel data
    entries = [
        (256, 3, 1, width),         # ImageWidth
        (257, 3, 1, height),        # ImageLength
        (258, 3, 1, 8),             # BitsPerSample
        (259, 3, 1, 1),             # Compression: none
        (262, 3, 1, 1),             # Photometric: BlackIsZero
        (273, 4, 1, None),          # StripOffsets (patched)
        (277, 3, 1, 1),             # SamplesPerPixel
        (278, 3, 1, height),        # RowsPerStrip
        (279, 4, 1, len(data)),     # StripByteCounts
    ]
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


def render_text_tiff(text: str, width: int = 32) -> bytes:
    """Print ``text`` in the fixed-pitch OCR font onto a TIFF page — the
    TIFF twin of ``render_text_bmp``/``render_text_png``."""
    from pdf_extractor_spark.kernels.ocr_kernel import (
        render_page_gray, wrap_fixed,
    )

    return pack_tiff_gray(render_page_gray(wrap_fixed(text, width)))
