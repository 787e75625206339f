"""Native JBIG2 decoding for PDF-embedded streams (ITU-T T.88).

Covers the subset scanner pipelines actually emit for bilevel pages:
generic regions — MQ-arithmetic coded with templates 0-3 + TPGDON, or
MMR (T.6, reusing ingest/ccitt.py) — composited onto the page bitmap
with the segment's external combination operator, plus the embedded
segment-header format (T.88 §7.2) and JBIG2Globals. Symbol/text
regions, halftones, and refinement raise :class:`JBIG2Error`, so the
pipeline falls back to the ``pdf_rasterizer`` hook exactly as before.

The per-pixel MQ loop lives in C (native/jbig2.c, ctypes) — a 300-dpi
page is ~8M pixels x 16 context loads. The encoder here (MQ encoder +
generic-region coder, pure Python) exists for roundtrip tests: no
real-world JBIG2 fixture ships with the reference, so tests validate
decoder/encoder agreement on the exact bit protocol plus the segment
plumbing.

Parity anchor: the reference rasterizes scanned PDFs via
pdf2image/unoserver (IndexerAPI/src/core/processors/utils.py:16-22);
this module recovers the embedded bitmap itself with no renderer.
"""

from __future__ import annotations

import ctypes
import os
import struct
from typing import Iterator, List, Optional, Tuple

import numpy as np

__all__ = ["JBIG2Error", "decode_embedded", "decode_generic",
           "decode_jbig2_params", "encode_embedded", "encode_generic"]


class JBIG2Error(ValueError):
    """Malformed stream or a JBIG2 feature outside the generic subset."""


# Region/page dimensions come from untrusted segment payloads; bound the
# allocation so a crafted header raises JBIG2Error (-> pdf_rasterizer
# fallback) instead of a multi-GB MemoryError. 60 MP covers A0 @ 300dpi.
MAX_PIXELS = 60_000_000


# ------------------------------------------------------- native decoder

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "..", "native", "jbig2.c")
_SO = os.path.join(_DIR, "..", "native", "libjbig2.so")
_lib_handle: Optional[ctypes.CDLL] = None

_NOMINAL_AT = {
    0: [(3, -1), (-3, -1), (2, -2), (-2, -2)],
    1: [(3, -1)],
    2: [(2, -1)],
    3: [(2, -1)],
}

# coding templates (T.88 figures 4, 8-10); the context is these plus
# the AT pixels, in raster (y, x) order, MSB first — must match
# native/jbig2.c::build_template and the encoder below
_CODING_TEMPLATE = {
    0: [(-1, -2), (0, -2), (1, -2), (-2, -1), (-1, -1), (0, -1), (1, -1),
        (2, -1), (-4, 0), (-3, 0), (-2, 0), (-1, 0)],
    1: [(-1, -2), (0, -2), (1, -2), (2, -2), (-2, -1), (-1, -1), (0, -1),
        (1, -1), (2, -1), (-3, 0), (-2, 0), (-1, 0)],
    2: [(-1, -2), (0, -2), (1, -2), (-2, -1), (-1, -1), (0, -1), (1, -1),
        (-2, 0), (-1, 0)],
    3: [(-3, -1), (-2, -1), (-1, -1), (0, -1), (1, -1), (-4, 0), (-3, 0),
        (-2, 0), (-1, 0)],
}

_SLTP_CTX = {0: 0x9B25, 1: 0x0795, 2: 0x00E5, 3: 0x0195}


def _lib() -> ctypes.CDLL:
    global _lib_handle
    if _lib_handle is None:
        from ..native import build_lib
        so = build_lib(os.path.abspath(_SRC), os.path.abspath(_SO))
        lib = ctypes.CDLL(so)
        lib.jbig2_generic_decode.restype = ctypes.c_int
        lib.jbig2_generic_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_byte),
            ctypes.c_char_p]
        _lib_handle = lib
    return _lib_handle


def decode_generic(data: bytes, w: int, h: int, *, template: int = 0,
                   tpgdon: bool = False,
                   at: Optional[List[Tuple[int, int]]] = None,
                   mmr: bool = False) -> np.ndarray:
    """Decode one generic region to an (h, w) uint8 bitmap (1 = black)."""
    if w <= 0 or h <= 0:
        raise JBIG2Error(f"bad region size {w}x{h}")
    if w * h > MAX_PIXELS:
        raise JBIG2Error(f"region too large ({w}x{h} > {MAX_PIXELS} px)")
    if mmr:
        from .ccitt import CCITTError, decode_ccitt
        try:
            packed, n = decode_ccitt(data, w, rows=h, k=-1)
        except CCITTError as e:
            raise JBIG2Error(f"MMR region: {e}") from e
        row_bytes = (w + 7) // 8
        if n < h:
            packed = packed + b"\x00" * ((h - n) * row_bytes)
        rows = np.frombuffer(packed[:h * row_bytes], np.uint8)
        return np.unpackbits(rows.reshape(h, row_bytes), axis=1)[:, :w]
    if template not in (0, 1, 2, 3):
        raise JBIG2Error(f"bad GB template {template}")
    pairs = at or _NOMINAL_AT[template]
    at_c = (ctypes.c_byte * 8)()
    for i, (ax, ay) in enumerate(pairs):
        at_c[2 * i], at_c[2 * i + 1] = ax, ay
    out = ctypes.create_string_buffer(w * h)
    rc = _lib().jbig2_generic_decode(
        bytes(data), len(data), w, h, template, 1 if tpgdon else 0,
        at_c, out)
    if rc != 0:
        raise JBIG2Error(f"generic region decode failed (rc={rc})")
    return np.frombuffer(out.raw, np.uint8).reshape(h, w).copy()


# ----------------------------------------------------- segment parsing

def _parse_segments(data: bytes) -> Iterator[Tuple[int, int, int, bytes]]:
    """Embedded-format segment stream -> (number, type, page, payload)."""
    pos, n = 0, len(data)
    while pos < n:
        if pos + 11 > n:
            raise JBIG2Error("truncated segment header")
        num = struct.unpack(">I", data[pos:pos + 4])[0]
        flags = data[pos + 4]
        stype = flags & 0x3F
        pos += 5
        rts = data[pos]
        count = rts >> 5
        if count == 7:
            count = struct.unpack(">I", data[pos:pos + 4])[0] & 0x1FFFFFFF
            pos += 4 + (count + 8) // 8       # long form + retain bits
        else:
            pos += 1
        ref_size = 1 if num <= 256 else (2 if num <= 65536 else 4)
        pos += count * ref_size
        if flags & 0x40:
            page = struct.unpack(">I", data[pos:pos + 4])[0]
            pos += 4
        else:
            page = data[pos]
            pos += 1
        if pos + 4 > n:
            raise JBIG2Error("truncated segment length")
        length = struct.unpack(">I", data[pos:pos + 4])[0]
        pos += 4
        if length == 0xFFFFFFFF:
            raise JBIG2Error("unknown-length segment (unsupported)")
        if pos + length > n:
            raise JBIG2Error("segment data past end of stream")
        yield num, stype, page, data[pos:pos + length]
        pos += length


def _region_info(payload: bytes) -> Tuple[int, int, int, int, int]:
    if len(payload) < 17:
        raise JBIG2Error("short region segment info")
    w, h, x, y = struct.unpack(">IIII", payload[:16])
    return w, h, x, y, payload[16] & 0x7


_UNSUPPORTED_TYPES = {
    0: "symbol dictionary", 4: "text region", 5: "text region",
    6: "text region", 7: "text region", 16: "pattern dictionary",
    20: "halftone region", 22: "halftone region", 23: "halftone region",
    40: "refinement region", 42: "refinement region",
    43: "refinement region",
}


def decode_embedded(data: bytes, globals_data: bytes = b"") -> np.ndarray:
    """PDF-embedded JBIG2 (+ optional JBIG2Globals) -> page bitmap
    (height, width) uint8, 1 = black ink."""
    segments = list(_parse_segments(globals_data)) if globals_data else []
    segments += list(_parse_segments(data))

    page_w = page_h = 0
    page_default = 0
    regions: List[Tuple[int, int, int, np.ndarray]] = []
    for _num, stype, _page, payload in segments:
        if stype == 48:                              # page info
            if len(payload) < 17:
                raise JBIG2Error("short page info segment")
            page_w, page_h = struct.unpack(">II", payload[:8])
            page_default = (payload[16] >> 2) & 1
        elif stype in (36, 38, 39):                  # generic region
            w, h, x, y, op = _region_info(payload)
            gflags = payload[17]
            mmr = bool(gflags & 1)
            template = (gflags >> 1) & 3
            tpgdon = bool(gflags & 8)
            if gflags & 0x10:
                raise JBIG2Error("EXTTEMPLATE generic region (unsupported)")
            pos = 18
            at = None
            if not mmr:
                nat = 4 if template == 0 else 1
                at = []
                for i in range(nat):
                    ax, ay = struct.unpack(
                        ">bb", payload[pos + 2 * i:pos + 2 * i + 2])
                    at.append((ax, ay))
                pos += 2 * nat
            bmp = decode_generic(payload[pos:], w, h, template=template,
                                 tpgdon=tpgdon, at=at, mmr=mmr)
            regions.append((x, y, op, bmp))
        elif stype in _UNSUPPORTED_TYPES:
            raise JBIG2Error(
                f"unsupported JBIG2 feature: {_UNSUPPORTED_TYPES[stype]}")
        # 49-53 (end-of-*, profiles, tables), 62 (extension): no-ops here

    if not regions:
        raise JBIG2Error("no decodable regions")
    if page_w == 0 or page_h in (0, 0xFFFFFFFF):     # striped/absent page
        page_w = max([page_w] + [x + b.shape[1] for x, _y, _o, b in regions])
        page_h = max(y + b.shape[0] for _x, y, _o, b in regions)
    if page_w * page_h > MAX_PIXELS:
        raise JBIG2Error(
            f"page too large ({page_w}x{page_h} > {MAX_PIXELS} px)")
    page = np.full((page_h, page_w), page_default, np.uint8)
    for x, y, op, bmp in regions:
        h, w = bmp.shape
        if y + h > page_h or x + w > page_w:
            bmp = bmp[:max(0, page_h - y), :max(0, page_w - x)]
            h, w = bmp.shape
            if h == 0 or w == 0:
                continue
        view = page[y:y + h, x:x + w]
        if op == 0:
            view |= bmp
        elif op == 1:
            view &= bmp
        elif op == 2:
            view ^= bmp
        elif op == 3:
            view[...] = 1 - (view ^ bmp)
        else:                                        # REPLACE
            view[...] = bmp
    return page


def decode_jbig2_params(data: bytes, globals_data: bytes,
                        width: int, height: int) -> Optional[bytes]:
    """PDF filter adapter: 1-bpc gray samples (0 = black, the PNG
    wrap's convention, like ccitt.decode_ccitt_params) or None."""
    try:
        page = decode_embedded(data, globals_data)
    except JBIG2Error:
        return None
    h, w = page.shape
    if width and w > width:
        page = page[:, :width]
    if height and h > height:
        page = page[:height]
    h, w = page.shape
    if width and w < width:
        page = np.pad(page, ((0, 0), (0, width - w)))
    if height and h < height:
        page = np.pad(page, ((0, height - h), (0, 0)))
    packed = np.packbits(page, axis=1)
    return bytes((~packed).astype(np.uint8).tobytes())


# --------------------------------------------------- encoder (fixtures)

_QE = [0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221, 0x5601, 0x5401,
       0x4801, 0x3801, 0x3001, 0x2401, 0x1C01, 0x1601, 0x5601, 0x5401,
       0x5101, 0x4801, 0x3801, 0x3401, 0x3001, 0x2801, 0x2401, 0x2201,
       0x1C01, 0x1801, 0x1601, 0x1401, 0x1201, 0x1101, 0x0AC1, 0x09C1,
       0x08A1, 0x0521, 0x0441, 0x02A1, 0x0221, 0x0141, 0x0111, 0x0085,
       0x0049, 0x0025, 0x0015, 0x0009, 0x0005, 0x0001, 0x5601]
_NMPS = [1, 2, 3, 4, 5, 38, 7, 8, 9, 10, 11, 12, 13, 29, 15, 16, 17, 18,
         19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34,
         35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 45, 46]
_NLPS = [1, 6, 9, 12, 29, 33, 6, 14, 14, 14, 17, 18, 20, 21, 14, 14, 15,
         16, 17, 18, 19, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30,
         31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 46]
_SWITCH = [1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0,
           0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
           0, 0, 0, 0, 0]


class _MQEncoder:
    """T.88 Annex E encoder (software conventions), fixture-grade."""

    def __init__(self):
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.out = bytearray(b"\x00")                # dummy B, stripped

    def encode(self, cx: List[int], bit: int) -> None:
        i, mps = cx
        q = _QE[i]
        self.a -= q
        if bit == mps:
            if self.a & 0x8000:
                self.c += q
                return
            if self.a < q:
                self.a = q
            else:
                self.c += q
            cx[0] = _NMPS[i]
        else:
            if self.a < q:
                self.c += q
            else:
                self.a = q
            if _SWITCH[i]:
                cx[1] ^= 1
            cx[0] = _NLPS[i]
        while True:                                  # RENORME
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def _byteout(self) -> None:
        if self.out[-1] == 0xFF:
            self.out.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            self.out.append((self.c >> 19) & 0xFF)
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            self.out[-1] += 1
            if self.out[-1] == 0xFF:
                self.c &= 0x7FFFFFF
                self.out.append((self.c >> 20) & 0xFF)
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                self.out.append((self.c >> 19) & 0xFF)
                self.c &= 0x7FFFF
                self.ct = 8

    def flush(self) -> bytes:
        tempc = self.c + self.a                      # SETBITS (E.9)
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        if self.out[-1] != 0xFF:
            self.out.append(0xFF)
        self.out.append(0xAC)
        return bytes(self.out[1:])


def encode_generic(bitmap: np.ndarray, *, template: int = 0,
                   tpgdon: bool = False) -> bytes:
    """MQ-encode a (h, w) 0/1 bitmap as generic-region data (nominal
    AT pixels) — the exact inverse of decode_generic."""
    bitmap = np.asarray(bitmap, np.uint8)
    h, w = bitmap.shape
    tmpl = sorted(_CODING_TEMPLATE[template] + _NOMINAL_AT[template],
                  key=lambda p: (p[1], p[0]))
    enc = _MQEncoder()
    cx = {}

    def bit_at(px: int, py: int) -> int:
        if 0 <= px < w and 0 <= py < h:
            return int(bitmap[py, px])
        return 0

    ltp = 0
    prev = np.zeros(w, np.uint8)
    for y in range(h):
        if tpgdon:
            typical = int(np.array_equal(bitmap[y], prev))
            sltp = ltp ^ typical
            enc.encode(cx.setdefault(_SLTP_CTX[template], [0, 0]), sltp)
            ltp = typical
            prev = bitmap[y]
            if ltp:
                continue
        for x in range(w):
            ctx = 0
            for dx, dy in tmpl:
                ctx = (ctx << 1) | bit_at(x + dx, y + dy)
            enc.encode(cx.setdefault(ctx, [0, 0]), int(bitmap[y, x]))
        prev = bitmap[y]
    return enc.flush()


def _segment(num: int, stype: int, page: int, payload: bytes) -> bytes:
    return (struct.pack(">IB", num, stype) + b"\x00"  # no referred segs
            + bytes([page]) + struct.pack(">I", len(payload)) + payload)


def encode_embedded(bitmap: np.ndarray, *, template: int = 0,
                    tpgdon: bool = False,
                    mmr_data: Optional[bytes] = None,
                    op: int = 0) -> bytes:
    """Wrap a bitmap as a PDF-embeddable JBIG2 stream: page info +
    one immediate lossless generic region + end-of-page. Pass
    ``mmr_data`` (externally G4/T.6-coded, e.g. via Pillow in tests)
    to emit an MMR region instead of MQ coding ``bitmap``."""
    bitmap = np.asarray(bitmap, np.uint8)
    h, w = bitmap.shape
    page_info = struct.pack(">IIII", w, h, 0, 0) + b"\x01" + b"\x00\x00"
    region_info = struct.pack(">IIII", w, h, 0, 0) + bytes([op & 7])
    if mmr_data is not None:
        body = bytes([1]) + mmr_data
    else:
        gflags = (template << 1) | (8 if tpgdon else 0)
        at = b"".join(struct.pack(">bb", ax, ay)
                      for ax, ay in _NOMINAL_AT[template])
        body = bytes([gflags]) + at + encode_generic(
            bitmap, template=template, tpgdon=tpgdon)
    return (_segment(0, 48, 1, page_info)
            + _segment(1, 39, 1, region_info + body)
            + _segment(2, 49, 1, b""))
