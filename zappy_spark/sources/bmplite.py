"""Pure-Python BMP (Windows DIB) decode/encode — stdlib + numpy.

The third codec-less image format (after pnglite's DEFLATE and
wavlite's raw PCM): uncompressed BMP is a 14-byte file header, a DIB
info header (BITMAPINFOHEADER = 40 bytes; the V4/V5 variants extend
it), then bottom-up BGR(A) pixel rows padded to 4-byte boundaries.

Scope (loud rejections):
- 24 bpp BI_RGB and 32 bpp BI_RGB / BI_BITFIELDS with byte-aligned
  masks (the masks real writers emit; arbitrary bit-packed masks are
  rejected rather than mis-decoded). BI_RGB decodes as opaque RGB at
  both depths — a 32 bpp BI_RGB pixel's 4th byte is spec-reserved,
  not alpha; only an explicit BI_BITFIELDS alpha mask yields RGBA.
- positive height = bottom-up rows (the common case), negative =
  top-down
- palette (≤8 bpp) and RLE compression rejected

Validated against a real-writer file (CPython's imghdrdata
python.bmp: V5 header, 32 bpp BI_BITFIELDS) in tests.
"""

from __future__ import annotations

import struct

import numpy as np


class BmpFormatError(ValueError):
    """Malformed bytes or out-of-scope BMP features."""


def decode_bmp(data: bytes) -> tuple[np.ndarray, dict]:
    """BMP bytes → (H×W×C uint8 RGB(A) array, metadata dict)."""
    if len(data) < 54 or data[:2] != b"BM":
        raise BmpFormatError("not a BM dib stream")
    (pix_off,) = struct.unpack("<I", data[10:14])
    (dib,) = struct.unpack("<I", data[14:18])
    if dib < 40:
        raise BmpFormatError(f"unsupported DIB header size {dib}")
    w, h = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (comp,) = struct.unpack("<I", data[30:34])
    if planes != 1:
        raise BmpFormatError(f"planes {planes} != 1")
    if bpp not in (24, 32):
        raise BmpFormatError(f"unsupported bpp {bpp} (24/32 only)")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise BmpFormatError("bad dimensions")
    # channel order within each pixel, as byte indices into BGRA
    order = None  # indices of (R, G, B[, A]) within the pixel bytes
    if comp == 0:
        # 32 bpp BI_RGB: the 4th byte is RESERVED (BITMAPINFOHEADER
        # spec), and real writers leave it 0 — mapping it to alpha
        # would decode common files as fully transparent (round-8
        # ADVICE). Both depths return opaque RGB.
        order = (2, 1, 0)
    elif comp == 3 and bpp == 32:
        if dib < 52:
            raise BmpFormatError("BI_BITFIELDS without mask fields")
        if len(data) < 54 + 12:
            raise BmpFormatError(
                f"truncated DIB header ({len(data)} bytes, "
                f"declared size {dib} needs mask fields)"
            )
        masks = struct.unpack("<III", data[54:66])
        if dib >= 56:
            if len(data) < 70:
                raise BmpFormatError(
                    f"truncated DIB header ({len(data)} bytes, "
                    f"declared size {dib} needs an alpha mask)"
                )
            (amask,) = struct.unpack("<I", data[66:70])
        else:
            amask = 0
        byte_of = {0xFF: 0, 0xFF00: 1, 0xFF0000: 2, 0xFF000000: 3}
        try:
            r_i, g_i, b_i = (byte_of[m] for m in masks)
        except KeyError:
            raise BmpFormatError(
                f"non-byte-aligned bitfield masks {[hex(m) for m in masks]}"
            ) from None
        if amask:
            if amask not in byte_of:
                raise BmpFormatError("non-byte-aligned alpha mask")
            order = (r_i, g_i, b_i, byte_of[amask])
        else:
            order = (r_i, g_i, b_i)
    else:
        raise BmpFormatError(f"unsupported compression {comp}")
    bytes_per = bpp // 8
    stride = (w * bytes_per + 3) & ~3
    need = pix_off + stride * h
    if len(data) < need:
        raise BmpFormatError(f"truncated pixel data ({len(data)} < {need})")
    raw = np.frombuffer(
        data[pix_off : pix_off + stride * h], dtype=np.uint8
    ).reshape(h, stride)
    px = raw[:, : w * bytes_per].reshape(h, w, bytes_per)
    if not top_down:
        px = px[::-1]
    img = px[:, :, list(order)]
    return np.ascontiguousarray(img), {
        "width": int(w),
        "height": int(h),
        "channels": int(len(order)),
        "bpp": int(bpp),
        "compression": int(comp),
    }


def encode_bmp(img: np.ndarray) -> bytes:
    """H×W×3 uint8 RGB array → 24 bpp BI_RGB bottom-up BMP bytes."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise BmpFormatError("expected HxWx3 RGB array")
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    rows = bytearray()
    bgr = arr[::-1, :, ::-1]  # bottom-up, RGB→BGR
    pad = bytes(stride - w * 3)
    for y in range(h):
        rows += bgr[y].tobytes() + pad
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0
    )
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(rows), 0, 0, 14 + 40
    )
    return header + info + bytes(rows)
