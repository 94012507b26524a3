"""Pure-Python Netpbm (PBM/PGM/PPM) decode/encode — stdlib + numpy.

The simplest real interchange family: a whitespace-delimited ASCII
header (magic, width, height, maxval) followed by either ASCII
sample text (P1/P2/P3) or raw binary samples (P4/P5/P6). No
compression anywhere, which makes these the ground-truth fixture
format for pipelines (ImageMagick/Netpbm write them losslessly).

Scope (loud rejections):
- P1..P6; maxval ≤ 255 (16-bit two-byte samples rejected, not
  mis-read); P4 rows are MSB-first bit-packed and padded to a byte
- comments (``#`` to end-of-line) allowed anywhere whitespace is
- PBM convention: 1 = black. Decode maps to grayscale 0/255
  (black=0) so the three formats share one uint8 pixel contract

Returns (H×W uint8) for PBM/PGM and (H×W×3 uint8) for PPM.
Validated in tests against CPython's imghdrdata python.pgm /
python.ppm / python.pbm (real Netpbm-family writer output),
cross-pinned against the PNG of the same image.
"""

from __future__ import annotations

import numpy as np


class PnmFormatError(ValueError):
    """Malformed bytes or out-of-scope Netpbm features."""


def _tokens(data: bytes, need: int, pos: int) -> tuple[list[int], int]:
    """Read ``need`` whitespace-delimited ASCII integers starting at
    ``pos``, honoring # comments."""
    out: list[int] = []
    n = len(data)
    while len(out) < need:
        while pos < n and data[pos : pos + 1].isspace():
            pos += 1
        if pos < n and data[pos] == 0x23:  # '#'
            while pos < n and data[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        start = pos
        while pos < n and not data[pos : pos + 1].isspace():
            if data[pos] == 0x23:
                break
            pos += 1
        tok = data[start:pos]
        if not tok:
            raise PnmFormatError("truncated header/sample text")
        try:
            out.append(int(tok))
        except ValueError:
            raise PnmFormatError(f"non-numeric token {tok[:12]!r}") from None
    return out, pos


def _bits(data: bytes, need: int, pos: int) -> tuple[list[int], int]:
    """Read ``need`` plain-PBM (P1) samples starting at ``pos``.

    P1 legally allows bit runs WITHOUT separating whitespace
    (``0110``), so this is a per-character parser: whitespace and
    ``#``-to-EOL comments are skipped, every other byte must be an
    ASCII ``0`` or ``1`` (anything else is a loud rejection)."""
    out: list[int] = []
    n = len(data)
    while len(out) < need:
        while pos < n and data[pos : pos + 1].isspace():
            pos += 1
        if pos < n and data[pos] == 0x23:  # '#'
            while pos < n and data[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        if pos >= n:
            raise PnmFormatError("truncated header/sample text")
        c = data[pos]
        if c not in (0x30, 0x31):
            raise PnmFormatError(
                f"P1 sample byte {bytes([c])!r} is not '0'/'1'"
            )
        out.append(c - 0x30)
        pos += 1
    return out, pos


def decode_pnm(data: bytes) -> tuple[np.ndarray, dict]:
    """Netpbm bytes → (uint8 array, metadata dict)."""
    if len(data) < 2 or data[0:1] != b"P" or data[1] not in b"123456":
        raise PnmFormatError("not a P1..P6 Netpbm stream")
    kind = int(chr(data[1]))
    bitmap = kind in (1, 4)
    nch = 3 if kind in (3, 6) else 1
    pos = 2
    if bitmap:
        (w, h), pos = _tokens(data, 2, pos)
        maxval = 1
    else:
        (w, h, maxval), pos = _tokens(data, 3, pos)
    if w <= 0 or h <= 0:
        raise PnmFormatError(f"bad dimensions {w}x{h}")
    if not bitmap and not 1 <= maxval <= 255:
        raise PnmFormatError(
            f"maxval {maxval} out of scope (1..255; 16-bit rejected)"
        )
    if kind == 1:  # plain PBM: bits may run together ('0110')
        vals, pos = _bits(data, w * h, pos)
        arr = np.array(vals, dtype=np.int64)
    elif kind in (2, 3):  # ASCII samples, whitespace-delimited
        vals, pos = _tokens(data, w * h * nch, pos)
        arr = np.array(vals, dtype=np.int64)
    else:  # raw: ONE whitespace byte after the header, then raster.
        # A '#' right after that byte is AMBIGUOUS: it may be a
        # header comment ('255 # foo\n<data>') or the first raster
        # byte (0x23 is a perfectly legal sample). libnetpbm reads
        # raster unconditionally; the spec allows comments before
        # the delimiter. Resolve by raster length: an exact fit is
        # raster; a '#' run to EOL whose skip still leaves a full
        # raster is a comment (its EOL — CRLF counts as ONE
        # delimiter — becomes the new delimiter); anything else is
        # a LOUD rejection, never a silent pixel shift (a
        # '#'-leading raster with writer-appended trailing bytes
        # lands here rather than being eaten as a comment).
        stride = (w + 7) // 8
        need = stride * h if kind == 4 else w * h * nch
        if pos >= len(data) or not data[pos : pos + 1].isspace():
            raise PnmFormatError("missing sample separator")
        pos += 1
        while pos < len(data) and data[pos] == 0x23:  # '#'
            if len(data) - pos == need:
                break  # exact fit ⇒ '#' is the first raster byte
            j = pos  # tentative comment skip
            while j < len(data) and data[j] not in (0x0A, 0x0D):
                j += 1
            if j >= len(data):
                raise PnmFormatError("missing sample separator")
            if data[j] == 0x0D and data[j + 1 : j + 2] == b"\n":
                j += 1  # CRLF-terminated comment: one delimiter
            j += 1  # the comment's EOL is the delimiter
            if len(data) - j < need:
                raise PnmFormatError(
                    "ambiguous '#' at raster start: neither an "
                    "exact-length raster nor a comment followed by "
                    "a full raster (trailing bytes after a "
                    "'#'-leading raster?)"
                )
            pos = j
        if len(data) - pos < need:
            raise PnmFormatError(
                f"truncated raster ({len(data) - pos} < {need})"
            )
        if kind == 4:
            rows = np.frombuffer(
                data[pos : pos + need], dtype=np.uint8
            ).reshape(h, stride)
            bits = np.unpackbits(rows, axis=1)[:, :w]  # MSB-first
            arr = bits.astype(np.int64)
        else:
            arr = np.frombuffer(
                data[pos : pos + need], dtype=np.uint8
            ).astype(np.int64)
    if arr.min(initial=0) < 0 or arr.max(initial=0) > maxval:
        raise PnmFormatError("sample value out of 0..maxval range")
    if bitmap:
        # PBM: 1 = black → grayscale 0; 0 = white → 255
        px = ((1 - arr) * 255).astype(np.uint8)
    elif maxval == 255:
        px = arr.astype(np.uint8)
    else:
        # scale to full range the way Netpbm tools do on export
        px = ((arr * 255 + maxval // 2) // maxval).astype(np.uint8)
    shape = (h, w, 3) if nch == 3 else (h, w)
    img = px.reshape(shape)
    return np.ascontiguousarray(img), {
        "width": int(w),
        "height": int(h),
        "channels": nch,
        "kind": f"P{kind}",
        "maxval": int(maxval),
    }


def encode_pnm(img: np.ndarray, kind: str = "auto") -> bytes:
    """uint8 array → raw-binary Netpbm bytes: H×W → P5, H×W×3 → P6.
    ``kind='P4'`` packs a strictly-0/255 grayscale image as a bitmap
    (255→0 white bit, 0→1 black bit)."""
    arr = np.asarray(img, dtype=np.uint8)
    if kind == "P4":
        if arr.ndim != 2 or not np.isin(arr, (0, 255)).all():
            raise PnmFormatError("P4 needs a 0/255 HxW array")
        h, w = arr.shape
        bits = (arr == 0).astype(np.uint8)
        packed = np.packbits(bits, axis=1)  # MSB-first, row-padded
        return f"P4\n{w} {h}\n".encode() + packed.tobytes()
    if arr.ndim == 2:
        h, w = arr.shape
        return f"P5\n{w} {h}\n255\n".encode() + arr.tobytes()
    if arr.ndim == 3 and arr.shape[2] == 3:
        h, w, _ = arr.shape
        return f"P6\n{w} {h}\n255\n".encode() + arr.tobytes()
    raise PnmFormatError("expected HxW grayscale or HxWx3 RGB array")
