"""Native JBIG2 decoding for PDF-embedded streams (ITU-T T.88).

Covers the subset scanner pipelines actually emit for bilevel pages:
generic regions — MQ-arithmetic coded with templates 0-3 + TPGDON, or
MMR (T.6, reusing ingest/ccitt.py) — plus symbol dictionaries (T.88
§6.5) and text regions (§6.4) in their arithmetic-coded form (the
jbig2enc default; Annex-A integer decoding + shared-stream generic
bitmaps run in C). Regions composite onto the page bitmap with the
segment's external combination operator; the embedded segment-header
format (§7.2) and JBIG2Globals are handled. Huffman-coded variants,
halftone regions + pattern dictionaries (§6.6/§6.7, gray-code
bitplanes on the shared MQ stream), page refinement regions (§6.3,
types 40/42/43), refinement/aggregate symbols (§6.5.8.2,
REFAGGNINST=1) and SBREFINE text instances (§6.4.11). Only
Huffman-coded variants, TPGRON, and multi-instance aggregates raise
:class:`JBIG2Error`, so the pipeline falls back to the
``pdf_rasterizer`` hook exactly as before for those.

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
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

__all__ = ["JBIG2Error", "decode_embedded", "decode_generic",
           "decode_jbig2_params", "encode_embedded", "encode_generic",
           "encode_halftone", "encode_refined_page", "encode_symbol_text"]


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
        lib.jbig2_mq_new.restype = ctypes.c_void_p
        lib.jbig2_mq_new.argtypes = [ctypes.c_char_p, ctypes.c_long]
        lib.jbig2_mq_free.argtypes = [ctypes.c_void_p]
        lib.jbig2_int_decode.restype = ctypes.c_int
        lib.jbig2_int_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32)]
        lib.jbig2_iaid_decode.restype = ctypes.c_int
        lib.jbig2_iaid_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
        lib.jbig2_generic_into.restype = ctypes.c_int
        lib.jbig2_generic_into.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_byte)]
        lib.jbig2_refine_into.restype = ctypes.c_int
        lib.jbig2_refine_into.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_byte), ctypes.c_char_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
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


# ------------------------------------- arithmetic decoder (shared MQ)

class _ArithDecoder:
    """One MQ stream + the Annex-A integer/ID decoders over it, used by
    symbol dictionaries (T.88 6.5) and text regions (6.4). Per-bit and
    per-pixel loops run in C; this class owns the context banks."""

    def __init__(self, data: bytes):
        self._data = data                 # keep alive for the C pointer
        self._h = _lib().jbig2_mq_new(data, len(data))
        if not self._h:
            raise JBIG2Error("MQ decoder allocation failed")
        self._int_cx: dict = {}
        self._gb_cx = ctypes.create_string_buffer(1 << 16)
        self._gr_cx: Optional[ctypes.Array] = None
        self._iaid_cx: Optional[ctypes.Array] = None

    def close(self) -> None:
        if self._h:
            _lib().jbig2_mq_free(self._h)
            self._h = None

    def __enter__(self) -> "_ArithDecoder":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def decode_int(self, name: str) -> Optional[int]:
        """One Annex A.2 integer from the ``name`` class; None = OOB."""
        cx = self._int_cx.get(name)
        if cx is None:
            cx = self._int_cx[name] = ctypes.create_string_buffer(512)
        out = ctypes.c_int32()
        rc = _lib().jbig2_int_decode(self._h, cx, ctypes.byref(out))
        return int(out.value) if rc == 1 else None

    def decode_iaid(self, symcodelen: int) -> int:
        if self._iaid_cx is None:
            self._iaid_cx = ctypes.create_string_buffer(
                1 << (symcodelen + 1))
        return int(_lib().jbig2_iaid_decode(self._h, self._iaid_cx,
                                            symcodelen))

    def decode_generic(self, w: int, h: int, *, template: int,
                       at: List[Tuple[int, int]]) -> np.ndarray:
        """One bitmap on the shared stream with the shared GB bank."""
        if w <= 0 or h <= 0 or w * h > MAX_PIXELS:
            raise JBIG2Error(f"bad shared-region size {w}x{h}")
        at_c = (ctypes.c_byte * 8)()
        for i, (ax, ay) in enumerate(at):
            at_c[2 * i], at_c[2 * i + 1] = ax, ay
        out = ctypes.create_string_buffer(w * h)
        rc = _lib().jbig2_generic_into(self._h, self._gb_cx, out, w, h,
                                       template, 0, at_c)
        if rc != 0:
            raise JBIG2Error(f"shared generic decode failed (rc={rc})")
        return np.frombuffer(out.raw, np.uint8).reshape(h, w).copy()

    def decode_refine(self, w: int, h: int, ref: np.ndarray, *,
                      template: int,
                      at: List[Tuple[int, int]],
                      dx: int = 0, dy: int = 0) -> np.ndarray:
        """One refinement bitmap (6.3.5) against ``ref`` on the shared
        stream with the shared GR stats bank (13-bit contexts)."""
        if w <= 0 or h <= 0 or w * h > MAX_PIXELS:
            raise JBIG2Error(f"bad refinement size {w}x{h}")
        if self._gr_cx is None:
            self._gr_cx = ctypes.create_string_buffer(1 << 13)
        ref = np.ascontiguousarray(np.asarray(ref, np.uint8))
        at_c = (ctypes.c_byte * 4)()
        for i, (ax, ay) in enumerate(at[:2]):
            at_c[2 * i], at_c[2 * i + 1] = ax, ay
        out = ctypes.create_string_buffer(w * h)
        rc = _lib().jbig2_refine_into(
            self._h, self._gr_cx, out, w, h, template, at_c,
            ref.tobytes(), ref.shape[1], ref.shape[0], dx, dy)
        if rc != 0:
            raise JBIG2Error(f"refinement decode failed (rc={rc})")
        return np.frombuffer(out.raw, np.uint8).reshape(h, w).copy()


# --------------------------------------------------- symbol dictionary

_MAX_SYMBOLS = 100_000


def _decode_symbol_dict(payload: bytes,
                        input_syms: List[np.ndarray]) -> List[np.ndarray]:
    """Symbol dictionary segment (type 0) -> exported symbol bitmaps
    (T.88 6.5, arithmetic). REFAGG=0 (the jbig2enc default) and
    single-instance refinement/aggregate symbols (6.5.8.2) both decode;
    Huffman and multi-instance aggregates raise (-> rasterizer hook)."""
    if len(payload) < 2:
        raise JBIG2Error("short symbol dictionary")
    flags = struct.unpack(">H", payload[:2])[0]
    sdhuff = flags & 1
    refagg = (flags >> 1) & 1
    ctx_used = (flags >> 8) & 1
    ctx_retained = (flags >> 9) & 1
    template = (flags >> 10) & 3
    rtemplate = (flags >> 12) & 1
    if sdhuff:
        raise JBIG2Error("Huffman symbol dictionary (unsupported)")
    if ctx_used or ctx_retained:
        raise JBIG2Error("cross-segment context retention (unsupported)")
    pos = 2
    nat = 4 if template == 0 else 1
    at = []
    for i in range(nat):
        ax, ay = struct.unpack(">bb", payload[pos:pos + 2])
        at.append((ax, ay))
        pos += 2
    rat = [(-1, -1), (-1, -1)]
    if refagg and rtemplate == 0:                     # SDRAT (7.4.3.1.3)
        rat = [struct.unpack(">bb", payload[pos:pos + 2]),
               struct.unpack(">bb", payload[pos + 2:pos + 4])]
        pos += 4
    num_ex, num_new = struct.unpack(">II", payload[pos:pos + 8])
    pos += 8
    if num_new > _MAX_SYMBOLS or num_ex > _MAX_SYMBOLS + len(input_syms):
        raise JBIG2Error(f"symbol counts out of range ({num_new}/{num_ex})")
    # SBSYMCODELEN for refinement-aggregate symbol references (6.5.8.2.3)
    n_total = len(input_syms) + num_new
    symcodelen = max(1, (max(n_total - 1, 0)).bit_length())

    pool: List[np.ndarray] = list(input_syms)   # inputs + decoded news
    new_syms: List[np.ndarray] = []
    budget = MAX_PIXELS
    with _ArithDecoder(payload[pos:]) as dec:
        hc_height = 0
        while len(new_syms) < num_new:
            dh = dec.decode_int("IADH")
            if dh is None:
                raise JBIG2Error("OOB height-class delta")
            hc_height += dh
            if not 0 < hc_height <= 1 << 20:
                raise JBIG2Error(f"bad height class {hc_height}")
            sym_width = 0
            while True:
                dw = dec.decode_int("IADW")
                if dw is None:
                    break                    # end of height class
                sym_width += dw
                if not 0 < sym_width <= 1 << 20:
                    raise JBIG2Error(f"bad symbol width {sym_width}")
                if len(new_syms) >= num_new:
                    raise JBIG2Error("too many symbols in dictionary")
                budget -= sym_width * hc_height
                if budget < 0:
                    raise JBIG2Error("symbol dictionary exceeds pixel budget")
                if not refagg:
                    sym = dec.decode_generic(
                        sym_width, hc_height, template=template, at=at)
                else:
                    # refinement/aggregate symbol (6.5.8.2)
                    ninst = dec.decode_int("IAAI")
                    if ninst is None or ninst < 1:
                        raise JBIG2Error("bad aggregate instance count")
                    if ninst != 1:
                        raise JBIG2Error(
                            "multi-instance aggregate symbols (unsupported)")
                    sid = dec.decode_iaid(symcodelen)
                    rdx = dec.decode_int("IARDX")
                    rdy = dec.decode_int("IARDY")
                    if rdx is None or rdy is None:
                        raise JBIG2Error("OOB refinement offset")
                    if not 0 <= sid < len(pool):
                        raise JBIG2Error(
                            f"refagg symbol id {sid} out of range")
                    sym = dec.decode_refine(
                        sym_width, hc_height, pool[sid],
                        template=rtemplate, at=rat, dx=rdx, dy=rdy)
                new_syms.append(sym)
                pool.append(sym)
        # export flags: alternating skip/export run lengths, skip first
        # (6.5.10: CUREXFLAG starts 0)
        all_syms = list(input_syms) + new_syms
        exported: List[np.ndarray] = []
        i, exflag = 0, 0
        while i < len(all_syms):
            run = dec.decode_int("IAEX")
            if run is None or run < 0:
                raise JBIG2Error("bad export run length")
            if exflag:
                exported.extend(all_syms[i:i + run])
            i += run
            exflag ^= 1
    if len(exported) != num_ex:
        raise JBIG2Error(
            f"exported {len(exported)} symbols, header said {num_ex}")
    return exported


# ------------------------------------------- pattern dict + halftones

def _decode_pattern_dict(payload: bytes) -> List[np.ndarray]:
    """Pattern dictionary segment (type 16) -> list of (HDPH, HDPW)
    pattern bitmaps (T.88 6.7). The patterns arrive as ONE collective
    bitmap of width (GRAYMAX+1)*HDPW decoded with AT1 = (-HDPW, 0) —
    the left-neighbour-pattern prediction — then split."""
    if len(payload) < 7:
        raise JBIG2Error("short pattern dictionary")
    flags = payload[0]
    if flags & 1:
        raise JBIG2Error("MMR pattern dictionary (unsupported)")
    template = (flags >> 1) & 3
    hdpw, hdph = payload[1], payload[2]
    graymax = struct.unpack(">I", payload[3:7])[0]
    if hdpw == 0 or hdph == 0:
        raise JBIG2Error(f"bad pattern size {hdpw}x{hdph}")
    if hdpw > 127:
        raise JBIG2Error("pattern wider than the AT1 reach (127)")
    if (graymax + 1) * hdpw * hdph > MAX_PIXELS:
        raise JBIG2Error(f"pattern dictionary too large (graymax "
                         f"{graymax}, {hdpw}x{hdph})")
    at = [(-hdpw, 0), (-3, -1), (2, -2), (-2, -2)]
    if template != 0:
        at = at[:1]
    with _ArithDecoder(payload[7:]) as dec:
        coll = dec.decode_generic((graymax + 1) * hdpw, hdph,
                                  template=template, at=at)
    return [coll[:, i * hdpw:(i + 1) * hdpw].copy()
            for i in range(graymax + 1)]


def _decode_halftone_region(payload: bytes, patterns: List[np.ndarray]
                            ) -> Tuple[int, int, int, np.ndarray]:
    """Halftone region segment (types 20/22/23) -> (x, y, ext_op,
    bitmap) (T.88 6.6; arithmetic, HENABLESKIP=0). The grayscale image
    is Annex C.5 gray-coded bitplanes, MSB first, all on one MQ stream
    with shared GB stats; each grid cell (m, n) stamps
    ``patterns[gray[m, n]]`` at the 8.8 fixed-point grid position."""
    w, h, x, y, ext_op = _region_info(payload)
    if w <= 0 or h <= 0 or w * h > MAX_PIXELS:
        raise JBIG2Error(f"bad halftone region size {w}x{h}")
    if not patterns:
        raise JBIG2Error("halftone region with no pattern dictionary")
    if len({p.shape for p in patterns}) != 1:
        # decode_embedded merges patterns across referred dicts (and all
        # dicts when refs miss); mixed sizes would broadcast-error at the
        # stamp below — keep the raise-to-rasterizer contract instead
        raise JBIG2Error("halftone patterns differ in shape across dicts")
    if len(payload) < 38:
        raise JBIG2Error("short halftone region")
    flags = payload[17]
    if flags & 1:
        raise JBIG2Error("MMR halftone region (unsupported)")
    template = (flags >> 1) & 3
    if (flags >> 3) & 1:
        raise JBIG2Error("HENABLESKIP halftone region (unsupported)")
    comb_op = (flags >> 4) & 7
    def_pixel = (flags >> 7) & 1
    hgw, hgh = struct.unpack(">II", payload[18:26])
    hgx, hgy = struct.unpack(">ii", payload[26:34])
    hrx, hry = struct.unpack(">HH", payload[34:38])
    if hgw == 0 or hgh == 0 or hgw * hgh > MAX_PIXELS:
        raise JBIG2Error(f"bad halftone grid {hgw}x{hgh}")
    bits = max(1, (len(patterns) - 1).bit_length())   # HBPP (6.6.5.1)

    at = [(3 if template <= 1 else 2, -1), (-3, -1), (2, -2), (-2, -2)]
    if template != 0:
        at = at[:1]
    gray = np.zeros((hgh, hgw), np.int32)
    with _ArithDecoder(payload[38:]) as dec:
        prev: Optional[np.ndarray] = None
        for j in range(bits - 1, -1, -1):             # MSB plane first
            plane = dec.decode_generic(hgw, hgh, template=template,
                                       at=at)
            if prev is not None:
                plane = plane ^ prev                  # gray -> binary
            gray |= plane.astype(np.int32) << j
            prev = plane
    gray = np.minimum(gray, len(patterns) - 1)

    region = np.full((h, w), def_pixel, np.uint8)
    ph, pw = patterns[0].shape
    for m in range(hgh):
        row = gray[m]
        for n in range(hgw):
            px = (hgx + m * hry + n * hrx) >> 8       # 6.6.5.2 grid walk
            py = (hgy + m * hrx - n * hry) >> 8
            pat = patterns[int(row[n])]
            x0, y0 = max(px, 0), max(py, 0)
            x1, y1 = min(px + pw, w), min(py + ph, h)
            if x0 >= x1 or y0 >= y1:
                continue
            view = region[y0:y1, x0:x1]
            part = pat[y0 - py:y1 - py, x0 - px:x1 - px]
            if comb_op == 0:
                view |= part
            elif comb_op == 1:
                view &= part
            elif comb_op == 2:
                view ^= part
            elif comb_op == 3:
                view[...] = 1 - (view ^ part)
            else:
                view[...] = part
    return x, y, ext_op, region


# --------------------------------------------------------- text region

def _decode_text_region(payload: bytes, syms: List[np.ndarray]
                        ) -> Tuple[int, int, int, np.ndarray]:
    """Text region segment (types 4-6) -> (x, y, ext_op, bitmap)
    (T.88 6.4, arithmetic; SBREFINE instances refine per 6.4.11)."""
    w, h, x, y, ext_op = _region_info(payload)
    if w <= 0 or h <= 0 or w * h > MAX_PIXELS:
        raise JBIG2Error(f"bad text region size {w}x{h}")
    pos = 17
    if len(payload) < pos + 6:
        raise JBIG2Error("short text region")
    flags = struct.unpack(">H", payload[pos:pos + 2])[0]
    pos += 2
    sbhuff = flags & 1
    sbrefine = (flags >> 1) & 1
    log_strips = (flags >> 2) & 3
    ref_corner = (flags >> 4) & 3           # 0 BL, 1 TL, 2 BR, 3 TR
    transposed = (flags >> 6) & 1
    comb_op = (flags >> 7) & 3
    def_pixel = (flags >> 9) & 1
    ds_offset = (flags >> 10) & 0x1F
    if ds_offset > 15:
        ds_offset -= 32                     # signed 5-bit
    sbrtemplate = (flags >> 15) & 1
    if sbhuff:
        raise JBIG2Error("Huffman text region (unsupported)")
    rat = [(-1, -1), (-1, -1)]
    if sbrefine and sbrtemplate == 0:       # SBRAT (7.4.4.1.2)
        rat = [struct.unpack(">bb", payload[pos:pos + 2]),
               struct.unpack(">bb", payload[pos + 2:pos + 4])]
        pos += 4
    num_instances = struct.unpack(">I", payload[pos:pos + 4])[0]
    pos += 4
    if num_instances > 10 * _MAX_SYMBOLS:
        raise JBIG2Error(f"instance count out of range ({num_instances})")
    if not syms:
        raise JBIG2Error("text region with no symbols")
    strips = 1 << log_strips
    symcodelen = max(1, (len(syms) - 1).bit_length())

    region = np.full((h, w), def_pixel, np.uint8)

    def draw(sym: np.ndarray, s: int, t: int) -> None:
        """Blit with the strip coordinate mapped per REFCORNER /
        TRANSPOSED (6.4.5 step 3c viii)."""
        sh, sw = sym.shape
        # corner encoding: 0 BL, 1 TL, 2 BR, 3 TR -> LEFT={0,1}, TOP={1,3}
        if transposed:
            # S runs vertically, T horizontally
            ry = s if ref_corner in (1, 3) else s - sh + 1
            rx = t if ref_corner in (0, 1) else t - sw + 1
        else:
            rx = s if ref_corner in (0, 1) else s - sw + 1
            ry = t if ref_corner in (1, 3) else t - sh + 1
        x0, y0 = max(rx, 0), max(ry, 0)
        x1, y1 = min(rx + sw, w), min(ry + sh, h)
        if x0 >= x1 or y0 >= y1:
            return
        view = region[y0:y1, x0:x1]
        part = sym[y0 - ry:y1 - ry, x0 - rx:x1 - rx]
        if comb_op == 0:
            view |= part
        elif comb_op == 1:
            view &= part
        elif comb_op == 2:
            view ^= part
        else:
            view[...] = 1 - (view ^ part)

    with _ArithDecoder(payload[pos:]) as dec:
        dt0 = dec.decode_int("IADT")
        if dt0 is None:
            raise JBIG2Error("OOB strip T")
        strip_t = -dt0 * strips
        first_s = 0
        n_inst = 0
        while n_inst < num_instances:
            dt = dec.decode_int("IADT")
            if dt is None:
                raise JBIG2Error("OOB strip delta")
            strip_t += dt * strips
            dfs = dec.decode_int("IAFS")
            if dfs is None:
                raise JBIG2Error("OOB first S")
            first_s += dfs
            cur_s = first_s
            first = True
            while True:
                if not first:
                    ids = dec.decode_int("IADS")
                    if ids is None:
                        break               # end of strip
                    cur_s += ids + ds_offset
                first = False
                if n_inst >= num_instances:
                    break
                cur_t = 0 if strips == 1 else dec.decode_int("IAIT")
                if cur_t is None:
                    raise JBIG2Error("OOB T offset")
                t_i = strip_t + cur_t
                sid = dec.decode_iaid(symcodelen)
                if not 0 <= sid < len(syms):
                    raise JBIG2Error(f"symbol id {sid} out of range")
                sym = syms[sid]
                if sbrefine:
                    # per-instance refinement (6.4.11): RI flag, then
                    # size deltas + offsets; the instance bitmap
                    # refines the symbol with the 6.4.11 center shift
                    ri = dec.decode_int("IARI")
                    if ri is None:
                        raise JBIG2Error("OOB refinement flag")
                    if ri:
                        rdw = dec.decode_int("IARDW")
                        rdh = dec.decode_int("IARDH")
                        rdx = dec.decode_int("IARDX")
                        rdy = dec.decode_int("IARDY")
                        if None in (rdw, rdh, rdx, rdy):
                            raise JBIG2Error("OOB refinement deltas")
                        nw, nh = sym.shape[1] + rdw, sym.shape[0] + rdh
                        if not (0 < nw <= 1 << 20 and 0 < nh <= 1 << 20):
                            raise JBIG2Error("bad refined instance size")
                        sym = dec.decode_refine(
                            nw, nh, sym, template=sbrtemplate, at=rat,
                            dx=(rdw >> 1) + rdx, dy=(rdh >> 1) + rdy)
                sh, sw = sym.shape
                if (not transposed) and ref_corner in (2, 3):
                    cur_s += sw - 1         # pre-advance (3c vi)
                elif transposed and ref_corner in (0, 2):
                    cur_s += sh - 1
                draw(sym, cur_s, t_i)
                if (not transposed) and ref_corner in (0, 1):
                    cur_s += sw - 1         # post-advance (3c x)
                elif transposed and ref_corner in (1, 3):
                    cur_s += sh - 1
                n_inst += 1
    return x, y, ext_op, region


# ----------------------------------------------------- segment parsing

def _parse_segments(data: bytes
                    ) -> Iterator[Tuple[int, int, int, bytes, List[int]]]:
    """Embedded-format segment stream ->
    (number, type, page, payload, referred-segment numbers)."""
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
        refs = []
        for _ in range(count):
            chunk = data[pos:pos + ref_size]
            refs.append(int.from_bytes(chunk, "big"))
            pos += ref_size
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
        yield num, stype, page, data[pos:pos + length], refs
        pos += length


def _region_info(payload: bytes) -> Tuple[int, int, int, int, int]:
    if len(payload) < 17:
        raise JBIG2Error("short region segment info")
    w, h, x, y = struct.unpack(">IIII", payload[:16])
    return w, h, x, y, payload[16] & 0x7


_UNSUPPORTED_TYPES = {
    7: "text region (unknown subtype)",
}


def _composite(page: np.ndarray, x: int, y: int, op: int,
               bmp: np.ndarray) -> None:
    """One region onto the page with its external combination operator
    (T.88 7.4.8.5; 4 = REPLACE)."""
    page_h, page_w = page.shape
    h, w = bmp.shape
    if y + h > page_h or x + w > page_w:
        bmp = bmp[:max(0, page_h - y), :max(0, page_w - x)]
        h, w = bmp.shape
        if h == 0 or w == 0:
            return
    view = page[y:y + h, x:x + w]
    if op == 0:
        view |= bmp
    elif op == 1:
        view &= bmp
    elif op == 2:
        view ^= bmp
    elif op == 3:
        view[...] = 1 - (view ^ bmp)
    else:                                            # REPLACE
        view[...] = bmp


def decode_embedded(data: bytes, globals_data: bytes = b"") -> np.ndarray:
    """PDF-embedded JBIG2 (+ optional JBIG2Globals) -> page bitmap
    (height, width) uint8, 1 = black ink.

    Covers generic regions (36/38/39), symbol dictionaries (0), text
    regions (4/5/6), pattern dictionaries (16), halftone regions
    (20/22/23) and page-refinement regions (40/42/43) — the segments
    scanner pipelines emit. Huffman-coded variants raise, keeping the
    pdf_rasterizer-hook fallback."""
    segments = list(_parse_segments(globals_data)) if globals_data else []
    segments += list(_parse_segments(data))

    page_w = page_h = 0
    page_default = 0
    regions: List[Tuple[int, int, int, np.ndarray]] = []
    page_arr: Optional[np.ndarray] = None
    # segment number -> exported symbols of that symbol dictionary
    sym_dicts: Dict[int, List[np.ndarray]] = {}
    # segment number -> patterns of that pattern dictionary
    pat_dicts: Dict[int, List[np.ndarray]] = {}

    def materialize_page() -> np.ndarray:
        """Flush collected regions onto an eager page bitmap — needed
        as soon as a segment (refinement) must READ page content; the
        deferred path stays for striped/absent page headers whose size
        is only known after all regions decode."""
        nonlocal page_arr
        if page_arr is None:
            if page_w == 0 or page_h in (0, 0xFFFFFFFF):
                raise JBIG2Error(
                    "refinement region before a sized page info segment")
            if page_w * page_h > MAX_PIXELS:
                raise JBIG2Error(
                    f"page too large ({page_w}x{page_h} > {MAX_PIXELS} px)")
            page_arr = np.full((page_h, page_w), page_default, np.uint8)
        for rx, ry, rop, rbmp in regions:
            _composite(page_arr, rx, ry, rop, rbmp)
        regions.clear()
        return page_arr

    for num, stype, _page, payload, refs in segments:
        if stype == 48:                              # page info
            if len(payload) < 17:
                raise JBIG2Error("short page info segment")
            page_w, page_h = struct.unpack(">II", payload[:8])
            page_default = (payload[16] >> 2) & 1
        elif stype == 0:                             # symbol dictionary
            inputs: List[np.ndarray] = []
            for r in refs:
                inputs.extend(sym_dicts.get(r, []))
            sym_dicts[num] = _decode_symbol_dict(payload, inputs)
        elif stype == 16:                            # pattern dictionary
            pat_dicts[num] = _decode_pattern_dict(payload)
        elif stype in (20, 22, 23):                  # halftone region
            pats: List[np.ndarray] = []
            for r in refs:
                pats.extend(pat_dicts.get(r, []))
            if not pats:                             # unreferenced dicts
                for plist in pat_dicts.values():
                    pats.extend(plist)
            x, y, op, bmp = _decode_halftone_region(payload, pats)
            regions.append((x, y, op, bmp))
        elif stype in (4, 5, 6):                     # text region
            syms: List[np.ndarray] = []
            for r in refs:
                syms.extend(sym_dicts.get(r, []))
            if not syms:                             # unreferenced dicts
                for exported in sym_dicts.values():
                    syms.extend(exported)
            x, y, op, bmp = _decode_text_region(payload, syms)
            regions.append((x, y, op, bmp))
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
        elif stype in (40, 42, 43):                  # refinement region
            w, h, x, y, op = _region_info(payload)
            if w <= 0 or h <= 0 or w * h > MAX_PIXELS:
                raise JBIG2Error(f"bad refinement region size {w}x{h}")
            if len(payload) < 18:
                raise JBIG2Error("short refinement region")
            rflags = payload[17]
            template = rflags & 1
            if (rflags >> 1) & 1:
                raise JBIG2Error("TPGRON refinement (unsupported)")
            pos = 18
            rat = [(-1, -1), (-1, -1)]
            if template == 0:
                rat = [struct.unpack(">bb", payload[pos:pos + 2]),
                       struct.unpack(">bb", payload[pos + 2:pos + 4])]
                pos += 4
            # reference = the page contents under the region (7.4.7.2:
            # no intermediate-region refs -> refine against the page)
            cur = materialize_page()
            ref = np.zeros((h, w), np.uint8)
            x1 = min(x + w, cur.shape[1])
            y1 = min(y + h, cur.shape[0])
            if x < x1 and y < y1:
                ref[:y1 - y, :x1 - x] = cur[y:y1, x:x1]
            with _ArithDecoder(payload[pos:]) as dec:
                bmp = dec.decode_refine(w, h, ref, template=template,
                                        at=rat)
            regions.append((x, y, op, bmp))
        elif stype in _UNSUPPORTED_TYPES:
            raise JBIG2Error(
                f"unsupported JBIG2 feature: {_UNSUPPORTED_TYPES[stype]}")
        # 49-53 (end-of-*, profiles, tables), 62 (extension): no-ops here

    if page_arr is not None:                         # eager path engaged
        for x, y, op, bmp in regions:
            _composite(page_arr, x, y, op, bmp)
        return page_arr
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
        _composite(page, x, y, op, bmp)
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


def _generic_encode_into(enc: "_MQEncoder", cx: dict, bitmap: np.ndarray,
                         *, template: int = 0, tpgdon: bool = False,
                         at: Optional[List[Tuple[int, int]]] = None) -> None:
    """MQ-encode one bitmap on a caller's stream + GB context bank."""
    bitmap = np.asarray(bitmap, np.uint8)
    h, w = bitmap.shape
    tmpl = sorted(_CODING_TEMPLATE[template] + list(at or
                                                    _NOMINAL_AT[template]),
                  key=lambda p: (p[1], p[0]))

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


def encode_generic(bitmap: np.ndarray, *, template: int = 0,
                   tpgdon: bool = False) -> bytes:
    """MQ-encode a (h, w) 0/1 bitmap as generic-region data (nominal
    AT pixels) — the exact inverse of decode_generic."""
    enc = _MQEncoder()
    _generic_encode_into(enc, {}, bitmap, template=template, tpgdon=tpgdon)
    return enc.flush()


class _ArithEncoder:
    """One MQ stream + Annex-A integer/ID encoders over it — the exact
    inverse of `_ArithDecoder`, for symbol/text fixtures."""

    def __init__(self):
        self.enc = _MQEncoder()
        self._int_cx: Dict[str, dict] = {}
        self._iaid_cx: dict = {}
        self.gb_cx: dict = {}
        self.gr_cx: dict = {}

    def encode_int(self, name: str, v: Optional[int]) -> None:
        """A.2 inverse; v=None encodes OOB (sign=1, magnitude 0)."""
        cxs = self._int_cx.setdefault(name, {})
        prev = 1

        def bit(b: int) -> None:
            nonlocal prev
            self.enc.encode(cxs.setdefault(prev, [0, 0]), b)
            prev = ((prev << 1) | b if prev < 256
                    else (((prev << 1) | b) & 511) | 256)

        if v is None:
            s, av = 1, 0
        else:
            s, av = (1, -v) if v < 0 else (0, v)
        bit(s)
        for bound, prefix, nbits, off in (
                (4, (0,), 2, 0), (20, (1, 0), 4, 4),
                (84, (1, 1, 0), 6, 20), (340, (1, 1, 1, 0), 8, 84),
                (4436, (1, 1, 1, 1, 0), 12, 340),
                (None, (1, 1, 1, 1, 1), 32, 4436)):
            if bound is None or av < bound:
                for p in prefix:
                    bit(p)
                rem = av - off
                for i in range(nbits - 1, -1, -1):
                    bit((rem >> i) & 1)
                return

    def encode_iaid(self, sid: int, symcodelen: int) -> None:
        prev = 1
        for i in range(symcodelen - 1, -1, -1):
            b = (sid >> i) & 1
            self.enc.encode(self._iaid_cx.setdefault(prev, [0, 0]), b)
            prev = (prev << 1) | b

    def encode_generic(self, bitmap: np.ndarray, *, template: int = 0,
                       at: Optional[List[Tuple[int, int]]] = None) -> None:
        _generic_encode_into(self.enc, self.gb_cx, bitmap,
                             template=template, at=at)

    def encode_refine(self, bitmap: np.ndarray, ref: np.ndarray, *,
                      template: int = 0,
                      at: Optional[List[Tuple[int, int]]] = None,
                      dx: int = 0, dy: int = 0) -> None:
        """Inverse of `_ArithDecoder.decode_refine` — context bits are
        coding-template pixels (already-coded target) then
        reference-template pixels, in the C decoder's list order."""
        bitmap = np.asarray(bitmap, np.uint8)
        ref = np.asarray(ref, np.uint8)
        at = at or [(-1, -1), (-1, -1)]
        if template == 0:
            ct = [(0, -1), (1, -1), (-1, 0), tuple(at[0])]
            rt = [(0, -1), (1, -1), (-1, 0), (0, 0), (1, 0),
                  (-1, 1), (0, 1), (1, 1), tuple(at[1])]
        else:
            ct = [(-1, -1), (0, -1), (1, -1), (-1, 0)]
            rt = [(0, -1), (-1, 0), (0, 0), (1, 0), (0, 1), (1, 1)]
        h, w = bitmap.shape
        rh, rw = ref.shape
        cx = self.gr_cx
        for y in range(h):
            for x in range(w):
                ctx = 0
                for ddx, ddy in ct:
                    px, py = x + ddx, y + ddy
                    bit = (int(bitmap[py, px])
                           if 0 <= px < w and 0 <= py < h else 0)
                    ctx = (ctx << 1) | bit
                for ddx, ddy in rt:
                    px, py = x + ddx - dx, y + ddy - dy
                    bit = (int(ref[py, px])
                           if 0 <= px < rw and 0 <= py < rh else 0)
                    ctx = (ctx << 1) | bit
                self.enc.encode(cx.setdefault(ctx, [0, 0]),
                                int(bitmap[y, x]))

    def flush(self) -> bytes:
        return self.enc.flush()


def encode_symbol_text(symbols: List[np.ndarray],
                       placements: List[Tuple[int, int, int]],
                       page_w: int, page_h: int) -> bytes:
    """Fixture encoder for the symbol-coded path: wrap glyph bitmaps +
    (sym_id, x, y) top-left placements as page info + symbol dictionary
    (type 0) + immediate lossless text region (type 6, referring to the
    dictionary) + end-of-page — the exact structure jbig2enc-style
    scanners emit, inverse of `_decode_symbol_dict`/`_decode_text_region`.

    A placement may also be ``(sym_id, x, y, target_bitmap)``: that
    instance is SBREFINE-coded (6.4.11) — the target refines the
    dictionary symbol in-stream, sizes may differ.
    """
    n = len(symbols)
    if n == 0:
        raise JBIG2Error("no symbols")
    symbols = [np.asarray(s, np.uint8) for s in symbols]

    # ---- symbol dictionary: group by height (ascending), widths within
    order = sorted(range(n), key=lambda i: (symbols[i].shape[0],
                                            symbols[i].shape[1], i))
    export_id = {orig: pos for pos, orig in enumerate(order)}
    senc = _ArithEncoder()
    hc_height = 0
    i = 0
    while i < n:
        h = symbols[order[i]].shape[0]
        senc.encode_int("IADH", h - hc_height)
        hc_height = h
        sym_width = 0
        while i < n and symbols[order[i]].shape[0] == h:
            w = symbols[order[i]].shape[1]
            senc.encode_int("IADW", w - sym_width)
            sym_width = w
            senc.encode_generic(symbols[order[i]])
            i += 1
        senc.encode_int("IADW", None)                # end height class
    senc.encode_int("IAEX", 0)                       # skip none
    senc.encode_int("IAEX", n)                       # export all
    sd_flags = 0                                     # arith, template 0
    at = b"".join(struct.pack(">bb", ax, ay) for ax, ay in _NOMINAL_AT[0])
    sd_payload = (struct.pack(">H", sd_flags) + at
                  + struct.pack(">II", n, n) + senc.flush())

    # ---- text region: strips of height 1, TOPLEFT corners
    symcodelen = max(1, (n - 1).bit_length())
    any_refined = any(len(p) > 3 for p in placements)
    tenc = _ArithEncoder()
    by_pos = sorted(placements, key=lambda p: (p[2], p[1]))
    tenc.encode_int("IADT", 0)                       # STRIPT = 0
    prev_t = 0
    first_s = 0
    j = 0
    rat = [(-1, -1), (-1, -1)]
    while j < len(by_pos):
        t = by_pos[j][2]
        tenc.encode_int("IADT", t - prev_t)
        prev_t = t
        cur_s = None
        while j < len(by_pos) and by_pos[j][2] == t:
            sid, x, _y = by_pos[j][:3]
            target = by_pos[j][3] if len(by_pos[j]) > 3 else None
            inst = (np.asarray(target, np.uint8) if target is not None
                    else symbols[sid])
            wj = inst.shape[1]
            if cur_s is None:
                tenc.encode_int("IAFS", x - first_s)
                first_s = x
            else:
                tenc.encode_int("IADS", x - cur_s)
            tenc.encode_iaid(export_id[sid], symcodelen)
            if any_refined:
                tenc.encode_int("IARI", 1 if target is not None else 0)
                if target is not None:
                    sym = symbols[sid]
                    rdw = inst.shape[1] - sym.shape[1]
                    rdh = inst.shape[0] - sym.shape[0]
                    tenc.encode_int("IARDW", rdw)
                    tenc.encode_int("IARDH", rdh)
                    tenc.encode_int("IARDX", 0)
                    tenc.encode_int("IARDY", 0)
                    tenc.encode_refine(inst, sym, template=0, at=rat,
                                       dx=rdw >> 1, dy=rdh >> 1)
            cur_s = x + wj - 1                       # TL post-advance
            j += 1
        tenc.encode_int("IADS", None)                # end of strip
    tr_flags = (1 << 4) | (2 if any_refined else 0)  # TOPLEFT, SBREFINE
    region_info = struct.pack(">IIII", page_w, page_h, 0, 0) + b"\x00"
    tr_payload = region_info + struct.pack(">H", tr_flags)
    if any_refined:                                   # SBRAT, template 0
        tr_payload += b"".join(struct.pack(">bb", ax, ay) for ax, ay in rat)
    tr_payload += struct.pack(">I", len(by_pos)) + tenc.flush()

    page_info = (struct.pack(">IIII", page_w, page_h, 0, 0)
                 + b"\x01" + b"\x00\x00")
    return (_segment(0, 48, 1, page_info)
            + _segment(1, 0, 1, sd_payload)
            + _segment(2, 6, 1, tr_payload, refs=(1,))
            + _segment(3, 49, 1, b""))


def encode_refined_page(base: np.ndarray, final: np.ndarray, *,
                        template: int = 0) -> bytes:
    """Fixture encoder for the refinement path: page info + a generic
    region carrying ``base`` (the lossy pass) + an immediate lossless
    refinement region (type 43, REPLACE) that corrects the page to
    ``final`` — the exact structure a lossy-then-refine encoder emits,
    inverse of the type-40/42/43 branch in `decode_embedded`."""
    base = np.asarray(base, np.uint8)
    final = np.asarray(final, np.uint8)
    if base.shape != final.shape:
        raise JBIG2Error("base/final size mismatch")
    h, w = base.shape
    page_info = struct.pack(">IIII", w, h, 0, 0) + b"\x01" + b"\x00\x00"
    g_at = b"".join(struct.pack(">bb", ax, ay) for ax, ay in _NOMINAL_AT[0])
    g_payload = (struct.pack(">IIII", w, h, 0, 0) + b"\x00"
                 + bytes([0]) + g_at + encode_generic(base))
    renc = _ArithEncoder()
    r_at = [(-1, -1), (-1, -1)]
    renc.encode_refine(final, base, template=template, at=r_at)
    r_flags = bytes([template & 1])
    r_head = struct.pack(">IIII", w, h, 0, 0) + bytes([4])  # REPLACE
    r_payload = r_head + r_flags
    if template == 0:
        r_payload += b"".join(struct.pack(">bb", ax, ay) for ax, ay in r_at)
    r_payload += renc.flush()
    return (_segment(0, 48, 1, page_info)
            + _segment(1, 39, 1, g_payload)
            + _segment(2, 43, 1, r_payload)
            + _segment(3, 49, 1, b""))


def encode_halftone(gray: np.ndarray, patterns: List[np.ndarray],
                    *, page_w: int, page_h: int,
                    hgx: int = 0, hgy: int = 0,
                    hrx: Optional[int] = None,
                    hry: int = 0) -> bytes:
    """Fixture encoder for the halftone path: wrap a (HGH, HGW) gray
    index image + pattern bitmaps as page info + pattern dictionary
    (type 16) + immediate lossless halftone region (type 23, referring
    to the dictionary) + end-of-page — the exact inverse of
    `_decode_pattern_dict`/`_decode_halftone_region`."""
    patterns = [np.asarray(p, np.uint8) for p in patterns]
    if not patterns:
        raise JBIG2Error("no patterns")
    ph, pw = patterns[0].shape
    if any(p.shape != (ph, pw) for p in patterns):
        raise JBIG2Error("patterns must share one size")
    if pw > 127:
        raise JBIG2Error("pattern wider than the AT1 reach (127)")
    gray = np.asarray(gray, np.int32)
    hgh, hgw = gray.shape
    n = len(patterns)
    if gray.min() < 0 or gray.max() >= n:
        raise JBIG2Error("gray indices out of pattern range")

    # ---- pattern dictionary: one collective bitmap, AT1 = (-HDPW, 0)
    pd_at = [(-pw, 0), (-3, -1), (2, -2), (-2, -2)]
    penc = _ArithEncoder()
    penc.encode_generic(np.hstack(patterns), at=pd_at)
    pd_payload = (bytes([0, pw, ph]) + struct.pack(">I", n - 1)
                  + penc.flush())

    # ---- halftone region: default grid = pattern-sized cells. The
    # 6.6.5.2 walk gives x = HGX+n*HRX, y = HGY+m*HRX when HRY=0, so
    # one vector sets BOTH strides — square patterns tile exactly
    # (the common scanner case); pass hrx/hry for skewed grids.
    if hrx is None:
        if ph != pw:
            raise JBIG2Error("default grid needs square patterns")
        hrx = pw << 8                                # 8.8 fixed point
        hry = 0
    bits = max(1, (n - 1).bit_length())
    planes = []
    for j in range(bits - 1, -1, -1):                # MSB first
        b = (gray >> j) & 1
        b_next = (gray >> (j + 1)) & 1               # 0 for the MSB
        planes.append((b ^ b_next).astype(np.uint8))  # gray code
    ht_at = [(3, -1), (-3, -1), (2, -2), (-2, -2)]
    henc = _ArithEncoder()
    for plane in planes:
        henc.encode_generic(plane, at=ht_at)
    region_info = struct.pack(">IIII", page_w, page_h, 0, 0) + b"\x00"
    ht_payload = (region_info + bytes([0])
                  + struct.pack(">II", hgw, hgh)
                  + struct.pack(">ii", hgx << 8, hgy << 8)
                  + struct.pack(">HH", hrx, hry)
                  + henc.flush())

    page_info = (struct.pack(">IIII", page_w, page_h, 0, 0)
                 + b"\x01" + b"\x00\x00")
    return (_segment(0, 48, 1, page_info)
            + _segment(1, 16, 1, pd_payload)
            + _segment(2, 23, 1, ht_payload, refs=(1,))
            + _segment(3, 49, 1, b""))


def _segment(num: int, stype: int, page: int, payload: bytes,
             refs: Tuple[int, ...] = ()) -> bytes:
    if len(refs) > 4:
        raise JBIG2Error("fixture encoder supports <= 4 referred segments")
    rts = bytes([len(refs) << 5]) + bytes(refs)      # short form, 1B refs
    return (struct.pack(">IB", num, stype) + rts
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
