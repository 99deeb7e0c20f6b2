"""From-scratch minimal PDF text-extraction kernel.

Parses PDF object structure (obj/endobj scan — tolerant of broken xref;
PDF 1.5 /ObjStm object streams expanded), the spec's lossless stream
filters (FlateDecode via stdlib zlib, LZWDecode, RunLengthDecode,
ASCIIHex/ASCII85 armor, with /DecodeParms EarlyChange and the TIFF/PNG
/Predictor family), and the text-showing subset of the content stream
operator language:
BT/ET, Tf, Td/TD/TL/Tm/T*, Tj/TJ/'/". Show strings decode through the
current font's /ToUnicode CMap (bfchar/bfrange, 1- and 2-byte codes) or
/Encoding /Differences array (AGL glyph names) when present — the two
mechanisms real subset-font PDFs need for text parity — and keep the
lossless latin-1 identity otherwise.

Reading order is reconstructed by coordinate-sorted line merging: text runs
grouped into lines by y (descending — PDF origin is bottom-left), runs within
a line sorted by x, lines joined "\n". This is the same primitive as the
reference's Textract LINE reconstruction (_blocks_to_pages,
textract_extractor.py:88-97) and Mathpix line sort
(mathpix_extractor.py:121-131).

Per-page result shape mirrors the reference plugin contract
(interface.py:15-21, pypdf2_extractor.py:25-40): 1-based integer page keys,
each with a TEXT channel; failures degrade to an error row instead of raising
(pypdf2_extractor.py:41-48).
"""
from __future__ import annotations

import functools
import re
import zlib

_OBJ_HDR_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_NUM_RE = re.compile(rb"[-+]?\d*\.?\d+")

# y-coordinates within this distance belong to the same line
_LINE_TOL = 2.0

# nested-array recursion cap in _tokenize (TJ arrays are flat in practice)
_MAX_ARR_DEPTH = 16

# FlateDecode output cap per stream: a crafted 190 KB deflate stream expands
# to 200 MB (1050:1) — unbounded zlib.decompress would OOM an executor on
# one bomb payload. Real page content streams are KBs; 64 MB is far above
# any sane stream and bombs degrade to the error-row path instead.
_MAX_STREAM_BYTES = 64 * 1024 * 1024


def _parse_objects(data: bytes) -> dict[int, bytes]:
    """obj/endobj pairing, linear-time.

    Semantics match the old lazy regex r'(\\d+)\\s+(\\d+)\\s+obj\\b(.*?)endobj':
    each header's body runs to the FIRST 'endobj' after it, scanning resumes
    past that 'endobj', and duplicate ids keep the last occurrence. The lazy
    regex was O(headers x bytes) on a malformed payload with 'obj' tokens
    but no 'endobj' (quadratic: 0.25 s at 22 KB, days at the 20 MB cap —
    one truncated PDF would stall an executor core); this scan is O(bytes).
    """
    objs: dict[int, bytes] = {}
    pos = 0
    search = _OBJ_HDR_RE.search
    find = data.find
    while True:
        m = search(data, pos)
        if m is None:
            break
        end = find(b"endobj", m.end())
        if end < 0:
            break
        objs[int(m.group(1))] = data[m.end():end]
        pos = end + 6
    return objs


def _dict_of(body: bytes) -> bytes:
    """The first << ... >> dictionary in an object body (balanced).

    Jumps between delimiter occurrences with bytes.find instead of stepping
    bytes (C-speed scan between delimiters; same balanced semantics)."""
    start = body.find(b"<<")
    if start < 0:
        return b""
    depth = 1
    i = start + 2
    while True:
        op = body.find(b"<<", i)
        cl = body.find(b">>", i)
        if cl < 0:
            return body[start:]
        if 0 <= op < cl:
            depth += 1
            i = op + 2
        else:
            depth -= 1
            i = cl + 2
            if depth == 0:
                return body[start:i]


def _content_refs(page_body: bytes) -> list[int]:
    d = _dict_of(page_body)
    m = re.search(rb"/Contents\s*(\[[^\]]*\]|\d+\s+\d+\s+R)", d)
    if not m:
        return []
    return [int(r.group(1)) for r in _REF_RE.finditer(m.group(1))]


def _xobject_image_refs(page_body: bytes, objs: dict[int, bytes]) -> list[int]:
    """Image XObject refs reachable from a page's /Resources (inline dict or
    indirect ref), in declaration order."""
    res = _resources_of(page_body, objs)
    mx = re.search(rb"/XObject\s*<<", res)
    if not mx:
        return []
    xdict = _dict_of(res[mx.end() - 2:])
    return [int(r.group(1)) for r in _REF_RE.finditer(xdict)]


def _ocr_image_xobject(body: bytes) -> str | None:
    """OCR one /Subtype /Image XObject if it is in the scanned-page profile
    — round 4 widened from 8-bit /DeviceGray raw/Flate to every shape a
    scanner/print-to-PDF path actually embeds:

    - /DeviceGray 8-bit, raw or FlateDecode/LZWDecode/RunLengthDecode
      data (PNG and TIFF /Predictor variants included — the shape
      scanner drivers and print-to-PDF paths write);
    - /DeviceRGB 8-bit, same filters (luminance = (r+g+b)//3, the
      same folding as the BMP/TIFF decoders);
    - /DCTDecode (a complete JFIF stream per the PDF spec) in either
      color space, routed through the from-scratch JPEG kernel;
    - /CCITTFaxDecode 1-bit /DeviceGray (Group 3 and Group 4), routed
      through the from-scratch T.4/T.6 fax codec — the fax/scanner
      embedding (see ``_ccitt_image_rows``).

    Returns the printed character stream, or None when the image is
    outside the profile or corrupt (JBIG2/JPX, CMYK, other bit depths —
    those pages stay textless and surface through the no-content path)."""
    d = _dict_of(body)
    if not re.search(rb"/Subtype\s*/Image\b", d):
        return None
    gray = re.search(rb"/ColorSpace\s*/DeviceGray\b", d) is not None
    rgb = re.search(rb"/ColorSpace\s*/DeviceRGB\b", d) is not None
    if not (gray or rgb):
        return None
    mb = re.search(rb"/BitsPerComponent\s+(\d+)", d)
    if not mb:
        return None
    bpc = int(mb.group(1))
    # the effective filter AFTER the text filters _stream_bytes applies
    # (ASCIIHex/ASCII85/Flate/LZW/RunLength pipelines, predictors
    # included): None = raw raster remains
    filters = _filter_names(d)
    filt = next((n for n in filters
                 if n not in (b"FlateDecode", b"ASCIIHexDecode",
                              b"ASCII85Decode", b"LZWDecode",
                              b"RunLengthDecode")), None)
    if filt not in (None, b"DCTDecode", b"CCITTFaxDecode"):
        return None  # JBIG2/JPX etc. — not decodable here
    if bpc != (1 if filt == b"CCITTFaxDecode" else 8):
        return None
    from pdf_extractor_spark.kernels.ocr_kernel import (
        OcrUnsupported,
        lines_to_stream_text,
        ocr_gray_rows,
        ocr_page_plausible,
    )

    if filt == b"CCITTFaxDecode":
        rows = _ccitt_image_rows(body, d, filters)
        if rows is None:
            return None
    elif filt == b"DCTDecode":
        # the embedded stream IS a JPEG file; its own SOF header carries
        # the geometry and component count, so decode it directly
        from pdf_extractor_spark.kernels.jpeg_kernel import decode_jpeg_gray

        try:
            rows = decode_jpeg_gray(_stream_bytes(body))
        except OcrUnsupported:
            return None  # corrupt/exotic JPEG: degrade, never raise
    else:
        mw = re.search(rb"/Width\s+(\d+)", d)
        mh = re.search(rb"/Height\s+(\d+)", d)
        if not mw or not mh:
            return None
        w, h = int(mw.group(1)), int(mh.group(1))
        if w <= 0 or h <= 0 or w > 1 << 16 or h > 1 << 16:
            return None
        data = _stream_bytes(body)
        ncomp = 3 if rgb else 1
        if len(data) < w * h * ncomp:
            return None  # truncated raster
        if rgb:
            import numpy as np

            tri = np.frombuffer(data, np.uint8, count=w * h * 3)
            lum = (tri.reshape(h, w, 3).sum(axis=2, dtype=np.uint16)
                   // 3).astype(np.uint8)
            rows = [lum[y].tobytes() for y in range(h)]
        else:
            rows = [data[y * w:(y + 1) * w] for y in range(h)]
    lines = ocr_gray_rows(rows)
    if not ocr_page_plausible(lines):
        return None  # a real-world raster (photo), not machine print
    return lines_to_stream_text(lines)


def _ccitt_image_rows(body: bytes, d: bytes,
                      filters: list[bytes]) -> list[bytes] | None:
    """Decode a /CCITTFaxDecode image XObject to ink/paper luminance rows
    via the from-scratch T.4/T.6 codec (PDF 2.0 §7.4.6) — the fax/
    scanner embedding the reference's Tesseract tier receives. Honors
    /K (scheme select), /Columns, /Rows, /EndOfLine, /EncodedByteAlign,
    and the sample-polarity pair /BlackIs1 + /Decode [1 0]: the codec's
    black runs render dark only when the two agree (both default or
    both inverted); a half-inverted image renders white-on-black and is
    handed to the plausibility gate like any other photo-like raster.
    Returns None outside the profile (degrade, never raise)."""
    from pdf_extractor_spark.kernels.ccitt_kernel import (
        CcittError,
        decode_to_gray_rows,
    )

    mw = re.search(rb"/Width\s+(\d+)", d)
    mh = re.search(rb"/Height\s+(\d+)", d)
    if not mw or not mh:
        return None
    w, h = int(mw.group(1)), int(mh.group(1))
    if w <= 0 or h <= 0 or w > 1 << 16 or h > 1 << 16:
        return None
    parms = _decode_parms(d)
    idx = filters.index(b"CCITTFaxDecode")
    parm = parms[idx] if idx < len(parms) else b""
    k = _parm_int(parm, b"K", 0)
    if _parm_int(parm, b"Columns", 1728) != w:
        return None  # raster/stream geometry disagree: out of profile
    rows_declared = _parm_int(parm, b"Rows", h)
    if rows_declared != h:
        return None
    eol = bool(re.search(rb"/EndOfLine\s+true", parm)) or k > 0
    byte_align = bool(re.search(rb"/EncodedByteAlign\s+true", parm))
    black_is_1 = bool(re.search(rb"/BlackIs1\s+true", parm))
    try:
        rows = decode_to_gray_rows(_stream_bytes(body), w, h,
                                   k=(-1 if k < 0 else k), eol=eol,
                                   byte_align=byte_align)
    except CcittError:
        return None  # corrupt/truncated fax data: quarantine path
    decode_inverted = bool(re.search(
        rb"/Decode\s*\[\s*1(?:\.0+)?\s+0(?:\.0+)?\s*\]", d))
    if black_is_1 != decode_inverted:
        inv = bytes(255 - v for v in range(256))
        rows = [r.translate(inv) for r in rows]
    return rows


def _expand_object_streams(objs: dict[int, bytes]) -> dict[int, bytes]:
    """PDF 1.5 object streams: a /Type /ObjStm object is a Flate container
    of NON-stream objects (the layout pdf writers default to since 1.5 —
    catalog/pages/font dicts move inside, content streams stay top-level).
    Expand every member into the object map so the page walk sees them.

    The stream begins with /N pairs of integers 'objnum offset' (offsets
    relative to /First); member bodies are dict/array/scalar text, so the
    existing _dict_of/_kids/regex machinery applies unchanged. Top-level
    objects WIN over ObjStm members with the same number: an incremental
    update appends a replacement object at top level, and honoring it
    matches the duplicate-id policy of _parse_objects (last wins)."""
    extra: dict[int, bytes] = {}
    for body in list(objs.values()):
        d = _dict_of(body)
        if not re.search(rb"/Type\s*/ObjStm\b", d):
            continue
        mn = re.search(rb"/N\s+(\d+)", d)
        mf = re.search(rb"/First\s+(\d+)", d)
        if not mn or not mf:
            continue
        n, first = int(mn.group(1)), int(mf.group(1))
        if n <= 0 or n > 1 << 16 or first <= 0:
            continue  # implausible header — skip the container, keep the doc
        data = _stream_bytes(body)
        if first > len(data):
            continue
        header = [int(t) for t in re.findall(rb"\d+", data[:first])]
        pairs = list(zip(header[0::2], header[1::2]))[:n]
        for k, (num, off) in enumerate(pairs):
            end = pairs[k + 1][1] if k + 1 < len(pairs) else len(data) - first
            if not 0 <= off <= end:
                continue  # malformed offsets: skip the member, keep the rest
            extra[num] = data[first + off:first + end]
    for num, member in extra.items():
        objs.setdefault(num, member)
    return objs


def _kids(pages_body: bytes) -> list[int]:
    d = _dict_of(pages_body)
    m = re.search(rb"/Kids\s*\[([^\]]*)\]", d)
    if not m:
        return []
    return [int(r.group(1)) for r in _REF_RE.finditer(m.group(1))]


def _walk_page_tree(root: int, objs: dict[int, bytes]) -> list[int]:
    """Depth-first /Pages-tree walk from ``root``, returning /Type /Page
    leaves in document order. Real writers BALANCE the page tree into
    nested intermediate /Pages nodes (a flat 1000-kid node is the
    exception, not the rule), so a flat read of the first node's /Kids
    drops every page under an intermediate node. Cycle-safe (a visited
    set) and bounded (visits each object at most once)."""
    order: list[int] = []
    seen: set[int] = set()
    stack = [root]
    while stack:
        num = stack.pop()
        if num in seen or num not in objs:
            continue
        seen.add(num)
        d = _dict_of(objs[num])
        if re.search(rb"/Type\s*/Pages\b", d):
            stack.extend(reversed(_kids(objs[num])))
        elif re.search(rb"/Type\s*/Page\b", d):
            order.append(num)
    return order


def _stream_bytes(body: bytes) -> bytes:
    """stream...endstream extraction, linear-time.

    When the stream dict carries a DIRECT ``/Length`` entry that lands on
    a well-formed ``endstream``, the data is sliced to exactly that count
    — required for binary filters (DCTDecode JPEG data may contain the
    literal bytes ``\\nendstream``, which the marker scan would truncate
    on). Indirect ``/Length n 0 R`` entries and lengths that do not line
    up fall back to the marker scan, whose semantics match the old lazy
    regex rb'stream\\r?\\n(.*?)\\r?\\nendstream': the first 'stream' token
    followed by \\r\\n or \\n opens the stream, the first '\\r?\\nendstream'
    after it closes it. The lazy regex backtracked across every 'stream'
    candidate when no close exists (quadratic on a truncated object);
    here a failed close search ends the scan outright — a close missing
    after candidate k is missing after k+1 too.
    """
    span = _raw_stream_span(body)
    if span is None:
        return b""
    raw = body[span[0]:span[1]]
    sdict = _dict_of(body)
    parms = _decode_parms(sdict)
    for k, name in enumerate(_filter_names(sdict)):
        parm = parms[k] if k < len(parms) else b""
        if name == b"FlateDecode":
            try:
                d = zlib.decompressobj()
                raw = d.decompress(raw, _MAX_STREAM_BYTES + 1)
                if len(raw) > _MAX_STREAM_BYTES:
                    return b""  # decompression bomb — degrade, don't OOM
                if not d.eof:
                    return b""  # truncated stream: zlib.decompress raised
            except zlib.error:
                return b""
            raw = _undo_predictor(raw, parm)
            if raw is None:
                return b""
        elif name == b"LZWDecode":
            raw = _lzw_decode(
                raw, _MAX_STREAM_BYTES,
                early_change=_parm_int(parm, b"EarlyChange", 1))
            if raw is None:
                return b""
            raw = _undo_predictor(raw, parm)
            if raw is None:
                return b""
        elif name == b"RunLengthDecode":
            raw = _runlength_decode(raw, _MAX_STREAM_BYTES)
            if raw is None:
                return b""
        elif name == b"ASCIIHexDecode":
            raw = _asciihex_decode(raw)
            if raw is None:
                return b""
        elif name == b"ASCII85Decode":
            raw = _ascii85_decode(raw)
            if raw is None:
                return b""
        else:
            # an opaque filter (DCTDecode, CCITT, ...): hand the caller the
            # bytes with every preceding text filter already applied — the
            # image path dispatches on this remaining filter
            break
    return raw


def _filter_names(d: bytes) -> list[bytes]:
    """The /Filter entry as an ordered name list — a bare name or an
    array pipeline ('/Filter [/ASCII85Decode /FlateDecode]', the shape
    mail-gatewayed and ascii-armored PDFs carry)."""
    m = re.search(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)", d)
    if not m:
        return []
    return re.findall(rb"/([A-Za-z0-9]+)", m.group(1))


# ---------------------------------------------------------------------------
# Standard security handler with the EMPTY user password — the "protected
# but readable" shape (owner-password-only files) that PyPDF2's decrypt('')
# path opens and a real web corpus carries in volume. Three families:
#   * V1/V2 R2/R3 — legacy RC4 (ISO 32000-1 §7.6.3)
#   * V4 R4       — crypt filters: /CFM /V2 (RC4) or /AESV2 (AES-128-CBC,
#                   IV prefix + PKCS#7; ISO 32000-1 §7.6.5)
#   * V5 R5/R6    — /AESV3 (AES-256; SHA-2 validation + /UE key unwrap;
#                   ISO 32000-2 §7.6.4, R5 = Adobe's pre-ISO extension)
# AES itself is the from-scratch FIPS-197 kernel in kernels/aes.py,
# verified against the published FIPS/NIST vectors. Non-Standard handlers
# and unknown crypt filters quarantine loudly; a real (non-empty) user
# password cannot be guessed and quarantines as password-required.
# ---------------------------------------------------------------------------

# The spec's 32-byte password pad (ISO 32000-1 §7.6.3.3, Algorithm 2 step a
# — the constant every implementation embeds verbatim).
_PW_PAD = bytes((
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
))


class PdfEncryptionUnsupported(Exception):
    """Raised (and caught in extract_pdf) when a payload's encryption is
    outside the supported profile — the loud-quarantine contract the other
    kernels use for out-of-profile containers."""


def _rc4(key: bytes, data: bytes) -> bytes:
    """RC4 (symmetric — the same routine encrypts and decrypts)."""
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _std_file_key(password: bytes, o_entry: bytes, p: int, id0: bytes,
                  r: int, keylen: int,
                  encrypt_metadata: bool = True) -> bytes:
    # canonicalize the keyword default into the positional cache key so
    # f(..., True) and f(...) share one memo entry (the _hash_2b shape)
    return _std_file_key_memo(password, o_entry, p, id0, r, keylen,
                              encrypt_metadata)


@functools.lru_cache(maxsize=4096)
def _std_file_key_memo(password: bytes, o_entry: bytes, p: int, id0: bytes,
                       r: int, keylen: int,
                       encrypt_metadata: bool) -> bytes:
    """Algorithm 2: the file encryption key from a (user) password. For
    R4 files with /EncryptMetadata false the spec appends 0xFFFFFFFF to
    the first MD5 input (ISO 32000-1 §7.6.3.3 step f).

    Memoized (with `_std_owner_entry` / `_std_user_entry`): the three
    derivation chains are pure functions of their inputs, and a dedup-heavy
    corpus repeats (O, P, ID) tuples constantly — the q26 profile showed
    the 20-round RC4 validation chains at 41% of warm kernel CPU, nearly
    all of it on repeated keys. Cache misses cost exactly what the uncached
    path did; the lru bound keeps worker memory O(4096 × 32 B)."""
    import hashlib
    import struct

    padded = (password + _PW_PAD)[:32]
    tail = b"" if (encrypt_metadata or r < 4) else b"\xff\xff\xff\xff"
    h = hashlib.md5(
        padded + o_entry[:32] + struct.pack("<i", p) + id0 + tail).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:keylen]).digest()
    return h[:keylen]


@functools.lru_cache(maxsize=4096)
def _std_owner_entry(owner_pw: bytes, user_pw: bytes, r: int,
                     keylen: int) -> bytes:
    """Algorithm 3: the /O entry (used by the writer twin; the reader
    consumes /O as opaque input to Algorithm 2). Memoized — see
    `_std_file_key_memo`."""
    import hashlib

    h = hashlib.md5((owner_pw + _PW_PAD)[:32]).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    rc4_key = h[:keylen]
    o = _rc4(rc4_key, (user_pw + _PW_PAD)[:32])
    if r >= 3:
        for i in range(1, 20):
            o = _rc4(bytes(b ^ i for b in rc4_key), o)
    return o


@functools.lru_cache(maxsize=4096)
def _std_user_entry(file_key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithms 4 (R2) / 5 (R3): the /U entry from the file key — the
    value the reader recomputes to VALIDATE the empty-password key.
    Memoized — see `_std_file_key_memo`."""
    import hashlib

    if r == 2:
        return _rc4(file_key, _PW_PAD)
    u = _rc4(file_key, hashlib.md5(_PW_PAD + id0).digest())
    for i in range(1, 20):
        u = _rc4(bytes(b ^ i for b in file_key), u)
    return u + b"\x00" * 16  # R3: 16 arbitrary pad bytes


def _obj_key(file_key: bytes, num: int, gen: int,
             aes: bool = False) -> bytes:
    """Algorithm 1: the per-object key — MD5(file key + 3 low bytes of
    the object number + 2 low bytes of the generation), truncated to
    min(len(key)+5, 16). For AESV2 the spec additionally salts the MD5
    input with the 4 bytes ``sAlT`` (ISO 32000-1 §7.6.2 step b)."""
    import hashlib

    h = hashlib.md5(
        file_key
        + bytes((num & 0xFF, (num >> 8) & 0xFF, (num >> 16) & 0xFF))
        + bytes((gen & 0xFF, (gen >> 8) & 0xFF))
        + (b"sAlT" if aes else b"")).digest()
    return h[:min(len(file_key) + 5, 16)]


def _pdf_string_bytes(d: bytes, name: bytes) -> bytes | None:
    """A dict entry's string value as raw bytes — hex ``<…>`` or literal
    ``(…)`` with PDF escapes (the two shapes /O and /U arrive in)."""
    m = re.search(rb"/" + name + rb"\s*(<[0-9A-Fa-f\s]*>|\()", d)
    if not m:
        return None
    if m.group(1).startswith(b"<"):
        h = re.sub(rb"\s+", b"", m.group(1)[1:-1])
        if len(h) % 2:
            h += b"0"
        try:
            return bytes.fromhex(h.decode("ascii"))
        except (ValueError, UnicodeDecodeError):
            return None
    # literal string: scan to the balanced unescaped ')'
    i = m.end(1)
    depth = 1
    start = i
    while i < len(d):
        c = d[i:i + 1]
        if c == b"\\":
            i += 2
            continue
        if c == b"(":
            depth += 1
        elif c == b")":
            depth -= 1
            if depth == 0:
                return _unescape_literal(d[start:i]).encode("latin-1")
        i += 1
    return None


def _apply_encryption(payload: bytes, objs: dict[int, bytes]) -> bool:
    """If the trailer names an /Encrypt dictionary, derive the file key
    with the EMPTY user password, validate it against /U, and decrypt
    every object's raw stream span IN PLACE (RC4 is length-preserving, so
    /Length entries and all downstream filter/OCR machinery stay valid).
    Returns True when decryption ran. Raises PdfEncryptionUnsupported for
    out-of-profile encryption (AES, non-Standard handler, real user
    password) — extract_pdf turns that into the error-row degrade path.

    Scope notes: generation numbers are taken from the object headers;
    /Type /XRef streams are never encrypted (spec) and ObjStm MEMBERS are
    not separately encrypted — only the container stream is, which this
    pass decrypts before _expand_object_streams runs. Top-level literal
    strings are left as-is: text extraction reads show-strings from
    inside (decrypted) content streams, and no dict string feeds the
    extraction output."""
    menc = None
    for menc_it in re.finditer(rb"/Encrypt\s+(\d+)\s+(\d+)\s+R", payload):
        menc = menc_it  # last occurrence wins (incremental updates)
    if menc is None:
        return False
    enc_num = int(menc.group(1))
    if enc_num not in objs:
        raise PdfEncryptionUnsupported("encrypted: /Encrypt object missing")
    d = _dict_of(objs[enc_num])
    if not re.search(rb"/Filter\s*/Standard\b", d):
        raise PdfEncryptionUnsupported("encrypted: non-Standard handler")
    v = _parm_int(d, b"V", 0)
    r = _parm_int(d, b"R", 0)
    if not ((v in (1, 2) and r in (2, 3)) or (v == 4 and r == 4)
            or (v == 5 and r in (5, 6))):
        raise PdfEncryptionUnsupported(
            f"encrypted: unsupported V={v} R={r}")
    o_entry = _pdf_string_bytes(d, b"O")
    u_entry = _pdf_string_bytes(d, b"U")
    mp = re.search(rb"/P\s+(-?\d+)", d)
    if o_entry is None or u_entry is None or mp is None:
        raise PdfEncryptionUnsupported("encrypted: malformed /Encrypt dict")
    mid = None
    for mid_it in re.finditer(
            rb"/ID\s*\[\s*<([0-9A-Fa-f\s]*)>", payload):
        mid = mid_it
    id0 = b""
    if mid:
        h = re.sub(rb"\s+", b"", mid.group(1))
        try:
            id0 = bytes.fromhex(h.decode("ascii"))
        except (ValueError, UnicodeDecodeError):
            id0 = b""

    from pdf_extractor_spark.kernels import aes as _aes

    # dec(num, gen, data) -> plaintext; AES paths are NOT length-
    # preserving, so the rewrite loop below patches /Length when needed
    if v == 5:
        # AESV3 (ISO 32000-2 §7.6.4): SHA-2 password validation against
        # /U, file key unwrapped from /UE with AES-256-CBC (zero IV)
        import hashlib

        ue_entry = _pdf_string_bytes(d, b"UE")
        if len(u_entry) < 48 or ue_entry is None or len(ue_entry) < 32:
            raise PdfEncryptionUnsupported(
                "encrypted: malformed V5 /U or /UE")
        vsalt, ksalt = u_entry[32:40], u_entry[40:48]
        if r == 5:
            want = hashlib.sha256(b"" + vsalt).digest()
            inter = hashlib.sha256(b"" + ksalt).digest()
        else:
            want = _aes.hash_2b(b"", vsalt)
            inter = _aes.hash_2b(b"", ksalt)
        if want != u_entry[:32]:
            raise PdfEncryptionUnsupported(
                "encrypted: password required (empty user password "
                "rejected)")
        file_key = _aes.cbc_decrypt(inter, b"\x00" * 16, ue_entry[:32])
        cfm = _cf_stream_method(d, default=b"AESV3")
        if cfm == b"Identity":
            return True
        if cfm != b"AESV3":
            raise PdfEncryptionUnsupported(
                f"encrypted: unsupported V5 crypt filter {cfm!r}")

        def dec(num: int, gen: int, data: bytes) -> bytes:
            return _aes_stream_decrypt(_aes, file_key, data)

        length_preserving = False
    elif v == 4:
        length = _parm_int(d, b"Length", 128)
        if not 40 <= length <= 128 or length % 8:
            raise PdfEncryptionUnsupported(
                f"encrypted: bad key length {length}")
        enc_meta = not re.search(rb"/EncryptMetadata\s+false\b", d)
        cfm = _cf_stream_method(d, default=None)
        if cfm is None:
            raise PdfEncryptionUnsupported(
                "encrypted: unsupported/missing V4 crypt filter")
        key = _std_file_key(b"", o_entry, int(mp.group(1)), id0, r,
                            length // 8, encrypt_metadata=enc_meta)
        want_u = _std_user_entry(key, id0, r)
        if u_entry[:16] != want_u[:16]:
            raise PdfEncryptionUnsupported(
                "encrypted: password required (empty user password "
                "rejected)")
        if cfm == b"Identity":
            return True
        if cfm == b"V2":
            def dec(num: int, gen: int, data: bytes) -> bytes:
                return _rc4(_obj_key(key, num, gen), data)

            length_preserving = True
        elif cfm == b"AESV2":
            def dec(num: int, gen: int, data: bytes) -> bytes:
                return _aes_stream_decrypt(
                    _aes, _obj_key(key, num, gen, aes=True), data)

            length_preserving = False
        else:
            raise PdfEncryptionUnsupported(
                f"encrypted: unsupported V4 crypt filter {cfm!r}")
    else:
        length = _parm_int(d, b"Length", 40)
        if r == 2:
            length = 40
        if not 40 <= length <= 128 or length % 8:
            raise PdfEncryptionUnsupported(
                f"encrypted: bad key length {length}")
        key = _std_file_key(b"", o_entry, int(mp.group(1)), id0, r,
                            length // 8)
        want_u = _std_user_entry(key, id0, r)
        got = u_entry[:16] if r >= 3 else u_entry[:32]
        if got != (want_u[:16] if r >= 3 else want_u[:32]):
            raise PdfEncryptionUnsupported(
                "encrypted: password required (empty user password "
                "rejected)")

        def dec(num: int, gen: int, data: bytes) -> bytes:
            return _rc4(_obj_key(key, num, gen), data)

        length_preserving = True
    # stream decryption, generation numbers from the headers; RC4 is
    # length-preserving (decrypt in place), AES-CBC shrinks the stream
    # (IV prefix + PKCS#7 pad) so the direct /Length is patched to match
    gens: dict[int, int] = {}
    pos = 0
    while True:
        m = _OBJ_HDR_RE.search(payload, pos)
        if m is None:
            break
        end = payload.find(b"endobj", m.end())
        if end < 0:
            break
        gens[int(m.group(1))] = int(m.group(2))
        pos = end + 6
    for num, body in list(objs.items()):
        if num == enc_num or b"stream" not in body:
            continue
        if re.search(rb"/Type\s*/XRef\b", _dict_of(body)):
            continue  # xref streams are never encrypted
        span = _raw_stream_span(body)
        if span is None:
            continue
        plain = dec(num, gens.get(num, 0), body[span[0]:span[1]])
        head = body[:span[0]]
        if not length_preserving:
            head = re.sub(rb"(/Length\s+)\d+(?!\s+\d+\s+R)",
                          lambda mm: mm.group(1) + str(len(plain)).encode(),
                          head, count=1)
        objs[num] = head + plain + body[span[1]:]
    return True


def _cf_stream_method(d: bytes, default: bytes | None) -> bytes | None:
    """The stream crypt-filter method for a V4/V5 /Encrypt dict: resolve
    /StmF (absent → /Identity, the spec default — streams unencrypted),
    then look up that named filter's /CFM inside /CF. A named filter
    MISSING from /CF returns None so the caller quarantines loudly
    instead of silently mis-reading ciphertext as plaintext."""
    mf = re.search(rb"/StmF\s*/([A-Za-z0-9]+)", d)
    name = mf.group(1) if mf else b"Identity"
    if name == b"Identity":
        return b"Identity"
    mcf = re.search(rb"/" + re.escape(name) + rb"\s*<<", d)
    if mcf is None:
        return None
    # balanced << >> scan for the named filter's sub-dict
    i = mcf.end()
    depth = 1
    start = i
    while i < len(d) - 1 and depth:
        if d[i:i + 2] == b"<<":
            depth += 1
            i += 2
        elif d[i:i + 2] == b">>":
            depth -= 1
            i += 2
        else:
            i += 1
    sub = d[start:i]
    mm = re.search(rb"/CFM\s*/([A-Za-z0-9]+)", sub)
    return mm.group(1) if mm else default


def _aes_stream_decrypt(_aes, key: bytes, data: bytes) -> bytes:
    """ISO 32000 §7.6.5 AES stream shape: 16-byte IV prefix, CBC body,
    PKCS#7 padding. Malformed shapes quarantine loudly."""
    if len(data) < 32 or (len(data) - 16) % 16:
        raise PdfEncryptionUnsupported(
            "encrypted: malformed AES stream length")
    try:
        return _aes.pkcs7_unpad(_aes.cbc_decrypt(key, data[:16], data[16:]))
    except ValueError as exc:
        raise PdfEncryptionUnsupported(
            f"encrypted: bad AES stream ({exc})")


def _raw_stream_span(body: bytes) -> tuple[int, int] | None:
    """Locate the raw ``stream``…``endstream`` data span inside an object
    body — the slice-by-direct-/Length-then-marker-scan logic shared by
    the filter pipeline (``_stream_bytes``) and the in-place stream
    decryptor (``_apply_encryption``), which must agree byte-for-byte on
    what the stream data IS."""
    mlen = re.search(rb"/Length\s+(\d+)(?!\s+\d+\s+R)", _dict_of(body))
    i = body.find(b"stream")
    while i >= 0:
        j = i + 6
        if body[j:j + 2] == b"\r\n":
            start = j + 2
        elif body[j:j + 1] == b"\n":
            start = j + 1
        else:
            i = body.find(b"stream", i + 1)
            continue
        if mlen:
            end = start + int(mlen.group(1))
            tail = body[end:end + 12]
            if (tail.startswith(b"endstream")
                    or tail.startswith(b"\nendstream")
                    or tail.startswith(b"\r\nendstream")):
                return (start, end)
        close = body.find(b"\nendstream", start)
        if close < 0:
            return None
        return (start, close - 1 if body[close - 1:close] == b"\r" else close)
    return None


def _decode_parms(d: bytes) -> list[bytes]:
    """The /DecodeParms (or abbreviated /DP) entry as a list of parameter
    dicts aligned with ``_filter_names``: a bare ``<< .. >>`` applies to
    the single filter; an array pairs parms[i] with filter[i], with
    ``null`` holes for filters that take none (PDF 2.0 §7.4.1)."""
    m = re.search(rb"/(?:DecodeParms|DP)\s*(<<|\[)", d)
    if not m:
        return []
    if m.group(1) == b"<<":
        return [_dict_of(d[m.start(1):])]
    out: list[bytes] = []
    i = m.end(1)
    while i < len(d):
        while i < len(d) and d[i:i + 1] in b" \t\r\n\x00":
            i += 1
        if d[i:i + 1] == b"]" or i >= len(d):
            break
        if d[i:i + 2] == b"<<":
            parm = _dict_of(d[i:])
            out.append(parm)
            i += len(parm)
        elif d[i:i + 4] == b"null":
            out.append(b"")
            i += 4
        else:
            break  # malformed entry: stop aligning, keep what parsed
    return out


def _parm_int(parm: bytes, name: bytes, default: int) -> int:
    m = re.search(rb"/" + name + rb"\s+(-?\d+)", parm)
    return int(m.group(1)) if m else default


def _runlength_decode(raw: bytes, cap: int) -> bytes | None:
    """RunLengthDecode (PDF 2.0 §7.4.5): length byte L — 0..127 copies the
    next L+1 bytes literally, 129..255 repeats the next byte 257−L times,
    128 is EOD. A missing EOD is tolerated (wild-file policy, the same
    tolerance as LZW's missing EOI); a TRUNCATED literal or repeat is
    malformed and degrades to None."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        length = raw[i]
        if length == 128:
            break  # EOD
        if length < 128:
            chunk = raw[i + 1:i + 2 + length]
            if len(chunk) < length + 1:
                return None
            out += chunk
            i += 2 + length
        else:
            if i + 1 >= n:
                return None
            out += raw[i + 1:i + 2] * (257 - length)
            i += 2
        if len(out) > cap:
            return None  # expansion bomb (max 128:2 per token, but capped)
    return bytes(out)


def _lzw_decode(data: bytes, cap: int, early_change: int = 1) -> bytes | None:
    """LZWDecode (PDF 2.0 §7.4.4, the TIFF 6.0 §13 bit layout): MSB-first
    codes starting at 9 bits, Clear=256, EOD=257, first table entry 258.
    /EarlyChange 1 (the default) grows the read width when the NEXT code
    to be assigned is 2^width − 1; /EarlyChange 0 grows at 2^width.
    Malformed codes degrade to None (the kernel's never-raise contract);
    a missing EOD is tolerated like the TIFF twin."""
    out = bytearray()
    acc = nbits_in = 0
    pos, n = 0, len(data)
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
                return bytes(out)  # missing EOD: tolerate
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
                return None  # code before any literal
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            return None  # code past table end
        out += entry
        if len(out) > cap:
            return None  # decompression bomb
        prev = entry
        if len(table) == (1 << width) - early_change and width < 12:
            width += 1


def _undo_predictor(raw: bytes, parm: bytes) -> bytes | None:
    """Reverse the /Predictor a Flate/LZW stream declares (PDF 2.0
    §7.4.4.4): 1 = none, 2 = TIFF horizontal differencing (8-bit
    components only — sub-byte differencing is out of profile), 10–15 =
    the five PNG row filters with a per-row filter byte (the writer may
    vary the filter per row regardless of which 1x value was declared).
    Geometry from /Columns /Colors /BitsPerComponent; misaligned data or
    an unknown row filter degrades to None."""
    pred = _parm_int(parm, b"Predictor", 1)
    if pred <= 1:
        return raw
    colors = _parm_int(parm, b"Colors", 1)
    bpc = _parm_int(parm, b"BitsPerComponent", 8)
    columns = _parm_int(parm, b"Columns", 1)
    if not (1 <= colors <= 4) or bpc not in (1, 2, 4, 8) or columns <= 0:
        return None
    row_bytes = (colors * bpc * columns + 7) // 8
    if pred == 2:
        if bpc != 8:
            return None
        if row_bytes == 0 or len(raw) % row_bytes:
            return None
        buf = bytearray(raw)
        for base in range(0, len(buf), row_bytes):
            for i in range(base + colors, base + row_bytes):
                buf[i] = (buf[i] + buf[i - colors]) & 0xFF
        return bytes(buf)
    if not 10 <= pred <= 15:
        return None
    span = row_bytes + 1
    if span == 1 or len(raw) % span:
        return None
    bpp = max(1, (colors * bpc) // 8)
    out = bytearray()
    prior = bytes(row_bytes)
    for base in range(0, len(raw), span):
        ftype = raw[base]
        line = bytearray(raw[base + 1:base + span])
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(bpp, row_bytes):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(row_bytes):
                line[i] = (line[i] + prior[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(row_bytes):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prior[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(row_bytes):
                left = line[i - bpp] if i >= bpp else 0
                ul = prior[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prior[i], ul)) & 0xFF
        else:
            return None
        out += line
        prior = bytes(line)
    return bytes(out)


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6) — same routine as the PNG
    kernel's; duplicated 6-liner to keep the PDF kernel import-free."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _asciihex_decode(raw: bytes) -> bytes | None:
    """ASCIIHexDecode: hex pairs, whitespace ignored, '>' EOD, odd final
    digit padded with 0. None on non-hex garbage (degrade, don't raise)."""
    body = raw.split(b">", 1)[0]
    h = re.sub(rb"\s+", b"", body)
    if len(h) % 2:
        h += b"0"
    try:
        return bytes.fromhex(h.decode("ascii"))
    except (ValueError, UnicodeDecodeError):
        return None


def _ascii85_decode(raw: bytes) -> bytes | None:
    """ASCII85Decode per the PDF flavor: 'z' shorthand for four zero
    bytes, '~>' EOD, whitespace ignored; stdlib a85decode implements
    exactly this. None on malformed input (degrade, don't raise)."""
    import base64

    body = raw.split(b"~>", 1)[0]
    if body.startswith(b"<~"):  # optional Adobe opener
        body = body[2:]
    try:
        out = base64.a85decode(re.sub(rb"\s+", b"", body))
    except ValueError:
        return None
    return out if len(out) <= _MAX_STREAM_BYTES else None


def _unescape_literal(s: bytes) -> str:
    """PDF literal string escapes: \\n \\r \\t \\b \\f \\( \\) \\\\ \\ddd."""
    if 0x5C not in s:  # escape-free literal (the common case): no byte loop
        return s.decode("latin-1")
    out = bytearray()
    i = 0
    esc = {
        ord("n"): 10, ord("r"): 13, ord("t"): 9, ord("b"): 8, ord("f"): 12,
        ord("("): 40, ord(")"): 41, ord("\\"): 92,
    }
    while i < len(s):
        c = s[i]
        if c == 0x5C and i + 1 < len(s):  # backslash
            n = s[i + 1]
            if n in esc:
                out.append(esc[n])
                i += 2
                continue
            if 0x30 <= n <= 0x37:  # octal
                j = i + 1
                oct_digits = b""
                while j < len(s) and len(oct_digits) < 3 and 0x30 <= s[j] <= 0x37:
                    oct_digits += bytes([s[j]])
                    j += 1
                out.append(int(oct_digits, 8) & 0xFF)
                i = j
                continue
            i += 1  # line continuation / unknown escape: drop backslash
            continue
        out.append(c)
        i += 1
    return out.decode("latin-1")


# scalar tokens (everything except strings/arrays/dicts, which need balanced
# scanning): one positional regex match per token instead of a byte loop —
# ~2× tokenizer throughput, identical token stream (delimiter classes copied
# verbatim from the byte-loop version).
_SIMPLE_TOK_RE = re.compile(
    rb"(?P<ws>[ \t\r\n\x00]+)"
    rb"|(?P<name>/[^ \t\r\n()<>\[\]/%]*)"
    rb"|(?P<comment>%[^\n]*\n?)"
    rb"|(?P<num>[-+]?\d*\.?\d+)"
    rb"|(?P<op>[^ \t\r\n()<>\[\]/%]+)"
)


# delimiter jump tables for the array scanner (C-speed skips between
# structurally relevant bytes)
_ARR_DELIM_RE = re.compile(rb"[\[\]\\(]")
_STR_DELIM_RE = re.compile(rb"[()\\]")

# inline-image terminator: EI bounded by whitespace on both sides (or
# end-of-stream) — binary data is skipped, not tokenized
_INLINE_EI_RE = re.compile(rb"[ \t\r\n\x00]EI(?=[ \t\r\n\x00]|\Z)")


def _tokenize(stream: bytes, _depth: int = 0):
    """Yield ('str', text) | ('num', float) | ('op', name) | ('arr', list).

    Array nesting beyond _MAX_ARR_DEPTH yields an empty array instead of
    recursing: real TJ arrays are flat, and unbounded recursion on a
    crafted '[[[[...' payload costs a slice + delimiter scan per level
    until RecursionError (~30 s at the 20 MB cap) — the cap keeps the
    adversarial case linear while leaving every sane PDF untouched."""
    i = 0
    n = len(stream)
    simple = _SIMPLE_TOK_RE.match
    while i < n:
        c = stream[i : i + 1]
        if c not in b"(<[":
            m = simple(stream, i)
            if m is None:
                i += 1
                continue
            g = m.lastgroup
            if g == "num":
                yield ("num", float(m.group()))
            elif g == "op":
                if m.group() == b"BI":
                    # inline image: its binary data is NOT operator syntax
                    # and would flood the stream with junk tokens — skip
                    # the whole BI .. ID <data> EI span (EI located at the
                    # first delimiter-bounded occurrence, the standard
                    # heuristic for /L-less inline images)
                    idp = stream.find(b"ID", m.end())
                    if idp < 0:
                        break  # truncated inline image ends the stream
                    mei = _INLINE_EI_RE.search(stream, idp + 2)
                    if mei is None:
                        break
                    i = mei.end()
                    continue
                yield ("op", m.group().decode("latin-1", "replace"))
            elif g == "name":
                yield ("name", m.group()[1:].decode("latin-1", "replace"))
            i = m.end()
        elif c == b"(":
            # fast path: escape-free, non-nested literal (the common case) —
            # one find + slice instead of the byte loop
            j_close = stream.find(b")", i + 1)
            if j_close != -1:
                seg = stream[i + 1 : j_close]
                if b"\\" not in seg and b"(" not in seg:
                    yield ("str", seg.decode("latin-1"))
                    i = j_close + 1
                    continue
            depth = 1
            j = i + 1
            buf = bytearray()
            while j < n and depth:
                ch = stream[j]
                if ch == 0x5C and j + 1 < n:
                    buf += stream[j : j + 2]
                    j += 2
                    continue
                if ch == 0x28:
                    depth += 1
                elif ch == 0x29:
                    depth -= 1
                    if depth == 0:
                        j += 1
                        break
                buf.append(ch)
                j += 1
            yield ("str", _unescape_literal(bytes(buf)))
            i = j
        elif c == b"<" and stream[i : i + 2] != b"<<":
            j = stream.find(b">", i)
            if j < 0:
                break
            hexs = re.sub(rb"\s", b"", stream[i + 1 : j])
            if len(hexs) % 2:
                hexs += b"0"
            try:
                yield ("str", bytes.fromhex(hexs.decode("ascii")).decode("latin-1"))
            except ValueError:
                pass
            i = j + 1
        elif c == b"[":
            # array: find the matching ']' (skipping literal strings), then
            # tokenize the inner region recursively. Jumps between delimiter
            # occurrences with regex search instead of stepping bytes —
            # string contents cross at C speed (they were the bulk of the
            # walked bytes; they get byte-scanned again by the recursive
            # tokenize, so this halves the Python-loop work per array).
            depth = 1
            j = i + 1
            while j < n and depth:
                m2 = _ARR_DELIM_RE.search(stream, j)
                if m2 is None:
                    j = n
                    break
                j = m2.start()
                ch = stream[j]
                if ch == 0x5B:
                    depth += 1
                    j += 1
                elif ch == 0x5D:
                    depth -= 1
                    j += 1
                elif ch == 0x5C:
                    j += 2
                else:  # '(' — skip the literal string (balanced, escapes)
                    d2 = 1
                    j += 1
                    while j < n and d2:
                        m3 = _STR_DELIM_RE.search(stream, j)
                        if m3 is None:
                            j = n
                            break
                        j = m3.start()
                        c2 = stream[j]
                        if c2 == 0x5C:
                            j += 2
                        elif c2 == 0x28:
                            d2 += 1
                            j += 1
                        else:
                            d2 -= 1
                            j += 1
            yield ("arr",
                   list(_tokenize(stream[i + 1 : j - 1], _depth + 1))
                   if _depth < _MAX_ARR_DEPTH else [])
            i = j
        elif c == b"<":  # '<<' dict — skip to matching '>>'
            depth = 0
            j = i
            while j < n - 1:
                if stream[j : j + 2] == b"<<":
                    depth += 1
                    j += 2
                elif stream[j : j + 2] == b">>":
                    depth -= 1
                    j += 2
                    if depth == 0:
                        break
                else:
                    j += 1
            i = j


# ---------------------------------------------------------------------------
# Font decoding: /ToUnicode CMaps and /Encoding /Differences (round 4).
# Real-world born-digital PDFs embed SUBSET fonts whose show-string bytes
# are arbitrary glyph codes, not latin-1 — the reference's PyPDF2/PyMuPDF
# tiers resolve them through exactly these two mechanisms, so text parity
# on such documents requires them here (pypdf2_extractor.py:21-50).
# ---------------------------------------------------------------------------

# Adobe Glyph List subset: every name the Differences path resolves. A
# single-char name maps to itself and uniXXXX/uXXXXXX forms are computed,
# so this table only needs the multi-char conventional names.
_AGL = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "endash": "–", "emdash": "—", "bullet": "•",
    "ellipsis": "…", "fi": "ﬁ", "fl": "ﬂ",
    "germandbls": "ß", "eacute": "é", "egrave": "è",
    "agrave": "à", "ccedilla": "ç", "adieresis": "ä",
    "odieresis": "ö", "udieresis": "ü", "ntilde": "ñ",
    "Adieresis": "Ä", "Odieresis": "Ö", "Udieresis": "Ü",
    "degree": "°", "copyright": "©", "registered": "®",
    "trademark": "™", "euro": "€", "sterling": "£",
    "yen": "¥", "cent": "¢", "section": "§",
    "paragraph": "¶", "dagger": "†", "daggerdbl": "‡",
    "minus": "−", "multiply": "×", "divide": "÷",
    "alpha": "α", "beta": "β", "gamma": "γ",
    "delta": "δ", "epsilon": "ε", "lambda": "λ",
    "mu": "μ", "pi": "π", "sigma": "σ", "omega": "ω",
}

_UNI_NAME_RE = re.compile(r"uni([0-9A-Fa-f]{4})\Z|u([0-9A-Fa-f]{4,6})\Z")


def _glyph_char(name: str) -> str | None:
    """Glyph name -> character (AGL convention), or None if unknown."""
    if len(name) == 1:
        return name
    hit = _AGL.get(name)
    if hit is not None:
        return hit
    m = _UNI_NAME_RE.match(name)
    if m:
        cp = int(m.group(1) or m.group(2), 16)
        if cp <= 0x10FFFF:
            return chr(cp)
    return None


_HEX_PAIR_RE = re.compile(
    rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")
_BFRANGE_RE = re.compile(
    rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(<[0-9A-Fa-f]+>|\[[^\]]*\])")
_HEX_TOK_RE = re.compile(rb"<([0-9A-Fa-f]+)>")

# mapping-size backstop: a crafted CMap full of maximal bfranges must not
# materialize millions of dict entries per document
_MAX_CMAP_ENTRIES = 1 << 17


def _utf16_hex(h: bytes) -> str:
    if len(h) % 2:
        h += b"0"
    return bytes.fromhex(h.decode("ascii")).decode("utf-16-be", "replace")


def _parse_tounicode(data: bytes) -> tuple[int, dict[int, str]]:
    """A /ToUnicode CMap stream -> (code byte-width, {code -> unicode}).

    Handles begincodespacerange (width from the first range's hex digit
    count), beginbfchar pairs, and beginbfrange in both destination forms
    (<dstStart> increment and [ <dst> ... ] array). Anything else in the
    CMap (usecmap, cid ops) is ignored — ToUnicode CMaps in the wild are
    exactly these three sections."""
    width = 2  # the overwhelming default (Identity-H subset fonts)
    m = re.search(rb"begincodespacerange(.*?)endcodespacerange", data, re.S)
    if m:
        h = _HEX_TOK_RE.search(m.group(1))
        if h:
            width = max(1, min(2, len(h.group(1)) // 2))
    mapping: dict[int, str] = {}
    for seg in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.S):
        for pair in _HEX_PAIR_RE.finditer(seg.group(1)):
            if len(mapping) >= _MAX_CMAP_ENTRIES:
                return width, mapping
            mapping[int(pair.group(1), 16)] = _utf16_hex(pair.group(2))
    for seg in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.S):
        for ent in _BFRANGE_RE.finditer(seg.group(1)):
            lo, hi = int(ent.group(1), 16), int(ent.group(2), 16)
            if hi < lo:
                continue
            hi = min(hi, lo + _MAX_CMAP_ENTRIES)  # span backstop
            dst = ent.group(3)
            if dst.startswith(b"["):
                dsts = _HEX_TOK_RE.findall(dst)
                for k, h in enumerate(dsts[:hi - lo + 1]):
                    if len(mapping) >= _MAX_CMAP_ENTRIES:
                        return width, mapping
                    mapping[lo + k] = _utf16_hex(h)
            else:
                base = int(dst[1:-1], 16)
                nyb = len(dst) - 2
                for k in range(hi - lo + 1):
                    if len(mapping) >= _MAX_CMAP_ENTRIES:
                        return width, mapping
                    mapping[lo + k] = _utf16_hex(
                        b"%0*X" % (nyb, base + k))
    return width, mapping


def _encoding_differences(enc_body: bytes) -> dict[int, str]:
    """An /Encoding dict's /Differences array -> {byte code -> char}.

    The array alternates integers (set the current code) and glyph names
    (assign, then increment); names outside the AGL subset are skipped so
    those codes keep their base-encoding (latin-1 here) meaning."""
    m = re.search(rb"/Differences\s*\[([^\]]*)\]", enc_body)
    if not m:
        return {}
    table: dict[int, str] = {}
    code = 0
    for tok in re.finditer(rb"/([^ \t\r\n()<>\[\]/%]+)|(\d+)", m.group(1)):
        if tok.group(2) is not None:
            code = int(tok.group(2))
        else:
            ch = _glyph_char(tok.group(1).decode("latin-1", "replace"))
            if ch is not None and code < 256:
                table[code] = ch
            code += 1
    return table


def _make_cmap_decoder(width: int, mapping: dict[int, str]):
    if width == 2:
        def dec(s: str) -> str:
            bs = s.encode("latin-1")
            out = [mapping.get((bs[i] << 8) | bs[i + 1],
                               chr((bs[i] << 8) | bs[i + 1]))
                   for i in range(0, len(bs) - 1, 2)]
            if len(bs) % 2:  # malformed odd tail: keep the byte
                out.append(chr(bs[-1]))
            return "".join(out)
    else:
        def dec(s: str) -> str:
            return "".join(mapping.get(b, chr(b))
                           for b in s.encode("latin-1"))
    return dec


def _make_diff_decoder(table: dict[int, str]):
    def dec(s: str) -> str:
        return "".join(table.get(b, chr(b)) for b in s.encode("latin-1"))
    return dec


def _resources_of(page_body: bytes, objs: dict[int, bytes]) -> bytes:
    """A page's /Resources dict bytes (inline or via indirect ref)."""
    d = _dict_of(page_body)
    m = re.search(rb"/Resources\s*(<<|(\d+)\s+\d+\s+R)", d)
    if not m:
        return b""
    if m.group(2) is not None:
        ref = int(m.group(2))
        return _dict_of(objs[ref]) if ref in objs else b""
    return _dict_of(d[m.start(1):])


def _page_fonts(page_body: bytes, objs: dict[int, bytes]) -> dict:
    """Resource name -> show-string decoder for one page's /Font entries.

    Only fonts that carry a /ToUnicode CMap or an /Encoding /Differences
    array get a decoder; everything else (standard-encoded simple fonts)
    keeps the latin-1 identity, which is exact for them."""
    res = _resources_of(page_body, objs)
    mf = re.search(rb"/Font\s*(<<|(\d+)\s+\d+\s+R)", res)
    if not mf:
        return {}
    if mf.group(2) is not None:
        ref = int(mf.group(2))
        fdict = _dict_of(objs[ref]) if ref in objs else b""
    else:
        fdict = _dict_of(res[mf.start(1):])
    fonts: dict = {}
    for ent in re.finditer(rb"/([^ \t\r\n()<>\[\]/%]+)\s+(\d+)\s+\d+\s+R",
                           fdict):
        name = ent.group(1).decode("latin-1", "replace")
        fnum = int(ent.group(2))
        if fnum not in objs:
            continue
        fb = _dict_of(objs[fnum])
        m2u = re.search(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", fb)
        if m2u and int(m2u.group(1)) in objs:
            data = _stream_bytes(objs[int(m2u.group(1))])
            if data:
                fonts[name] = _make_cmap_decoder(*_parse_tounicode(data))
                continue
        menc = re.search(rb"/Encoding\s*(<<|(\d+)\s+\d+\s+R)", fb)
        if menc:
            if menc.group(2) is not None:
                ref = int(menc.group(2))
                enc = _dict_of(objs[ref]) if ref in objs else b""
            else:
                enc = _dict_of(fb[menc.start(1):])
            table = _encoding_differences(enc)
            if table:
                fonts[name] = _make_diff_decoder(table)
    return fonts


def _runs_from_stream(
    stream: bytes, fonts: dict | None = None,
) -> list[tuple[float, float, str]]:
    """Execute the text-positioning subset; return (x, y, text) runs.

    ``fonts`` maps resource names (e.g. 'F1') to decoder callables that
    turn a show-string's raw bytes (carried losslessly as latin-1 text)
    into Unicode — built by ``_page_fonts`` from /ToUnicode CMaps and
    /Encoding /Differences. Strings shown under fonts without a decoder
    keep the latin-1 identity (the pre-round-4 behavior)."""
    runs: list[tuple[float, float, str]] = []
    x = y = 0.0
    lx = ly = 0.0  # line start (Td/TD/Tm set; T* and '/" return here)
    leading = 0.0
    stack: list = []
    decode = None  # current font's decoder (Tf selects; None = identity)

    def _dec(s: str) -> str:
        return decode(s) if decode is not None else s

    for kind, val in _tokenize(stream):
        if kind in ("str", "num", "arr", "name"):
            stack.append((kind, val))
            continue
        op = val
        if op == "BT":
            x = y = lx = ly = 0.0
            stack.clear()
        elif op == "ET":
            stack.clear()
        elif op == "Tf" and fonts and len(stack) >= 2 \
                and stack[-2][0] == "name":
            decode = fonts.get(stack[-2][1])
            stack.clear()
        elif op == "Td" and len(stack) >= 2:
            ty = stack[-1][1]
            tx = stack[-2][1]
            lx += tx
            ly += ty
            x, y = lx, ly
            stack.clear()
        elif op == "TD" and len(stack) >= 2:
            ty = stack[-1][1]
            tx = stack[-2][1]
            leading = -ty
            lx += tx
            ly += ty
            x, y = lx, ly
            stack.clear()
        elif op == "TL" and stack:
            leading = stack[-1][1]
            stack.clear()
        elif op == "Tm" and len(stack) >= 6:
            lx, ly = stack[-2][1], stack[-1][1]
            x, y = lx, ly
            stack.clear()
        elif op == "T*":
            ly -= leading
            x, y = lx, ly
            stack.clear()
        elif op == "Tj" and stack and stack[-1][0] == "str":
            runs.append((x, y, _dec(stack[-1][1])))
            stack.clear()
        elif op in ("'", '"'):
            ly -= leading
            x, y = lx, ly
            s = next((v for k, v in reversed(stack) if k == "str"), None)
            if s is not None:
                runs.append((x, y, _dec(s)))
            stack.clear()
        elif op == "TJ" and stack and stack[-1][0] == "arr":
            text = "".join(_dec(v) for k, v in stack[-1][1] if k == "str")
            if text:
                runs.append((x, y, text))
            stack.clear()
        else:
            stack.clear()
    return runs


def merge_lines(runs: list[tuple[float, float, str]]) -> str:
    """Coordinate-sorted line merge (reference textract_extractor.py:88-97).

    Runs are grouped into lines by y within _LINE_TOL, lines ordered top-down
    (descending y), runs within a line ordered by x and concatenated, lines
    joined by "\n".
    """
    if not runs:
        return ""
    by_y = sorted(runs, key=lambda r: (-r[1], r[0]))
    lines: list[list[tuple[float, float, str]]] = []
    cur_y: float | None = None
    for r in by_y:
        if cur_y is None or abs(r[1] - cur_y) > _LINE_TOL:
            lines.append([r])
            cur_y = r[1]
        else:
            lines[-1].append(r)
    out = []
    for line in lines:
        line.sort(key=lambda r: r[0])
        out.append("".join(r[2] for r in line))
    return "\n".join(out)


def extract_pdf(payload: bytes) -> dict:
    """Extract per-page text from one PDF payload.

    Returns {'pages': [(page_no_1based, text), ...], 'meta': {...}};
    never raises. Page order follows /Kids when present, else ascending
    object number of /Type /Page objects.
    """
    meta: dict[str, str] = {}
    if not payload or not payload.startswith(b"%PDF"):
        meta["error"] = "not a PDF payload"
        meta["ok"] = "false"
        return {"pages": [], "meta": meta}
    try:
        objs = _parse_objects(payload)
        try:
            if _apply_encryption(payload, objs):
                meta["decrypted"] = "true"
        except PdfEncryptionUnsupported as exc:
            meta["error"] = str(exc)
            meta["encrypted"] = "true"
            meta["ok"] = "false"
            return {"pages": [], "meta": meta}
        objs = _expand_object_streams(objs)
        page_ids = [num for num, body in sorted(objs.items())
                    if re.search(rb"/Type\s*/Page\b", _dict_of(body))]
        # honor the page TREE when a /Type /Pages node exists: root at the
        # catalog's /Pages if present, else the first /Pages object, and
        # walk nested intermediate nodes depth-first (document order)
        root = None
        for num, body in sorted(objs.items()):
            d = _dict_of(body)
            if root is None and re.search(rb"/Type\s*/Catalog\b", d):
                m = re.search(rb"/Pages\s+(\d+)\s+\d+\s+R", d)
                if m and int(m.group(1)) in objs:
                    root = int(m.group(1))
                    break
        if root is None:
            for num, body in sorted(objs.items()):
                if re.search(rb"/Type\s*/Pages\b", _dict_of(body)):
                    root = num
                    break
        if root is not None:
            walked = _walk_page_tree(root, objs)
            if walked:
                page_ids = walked
        pages: list[tuple[int, str]] = []
        ocr_pages = 0
        for i, pid in enumerate(page_ids, start=1):
            text_parts = []
            fonts = _page_fonts(objs[pid], objs)
            for cref in _content_refs(objs[pid]):
                if cref in objs:
                    text_parts.append(merge_lines(
                        _runs_from_stream(_stream_bytes(objs[cref]), fonts)))
            text = "\n".join(p for p in text_parts if p)
            if not text:
                # scanned page: no text operators — OCR any in-profile image
                # XObjects (the reference's tesseract tier rasterizes pages
                # back to images before OCR; a scanned page IS that raster)
                img_texts = [
                    t for xref in _xobject_image_refs(objs[pid], objs)
                    if xref in objs
                    for t in (_ocr_image_xobject(objs[xref]),) if t
                ]
                if img_texts:
                    text = "\n".join(img_texts)
                    ocr_pages += 1
            pages.append((i, text))
        ok = any(t for _, t in pages)
        meta["ok"] = "true" if ok else "false"
        if not ok:
            meta["error"] = "no meaningful content"
        if ocr_pages:
            meta["ocr"] = "true"
            meta["ocr_pages"] = str(ocr_pages)
        meta["page_count"] = str(len(pages))
        return {"pages": pages, "meta": meta}
    except Exception as exc:
        meta["error"] = f"{type(exc).__name__}: {exc}"
        meta["ok"] = "false"
        return {"pages": [], "meta": meta}
