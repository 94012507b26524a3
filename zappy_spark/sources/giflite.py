"""Pure-Python GIF87a/89a decode/encode — stdlib + numpy.

The fourth codec-less image format (after pnglite / bmplite /
wavlite): GIF's only compression is LZW with variable-width codes
(3..12 bits, LSB-first), which is fully specified and decodable with
no third-party library. Structure: 6-byte signature, logical screen
descriptor, optional global color table, a block stream (0x21
extensions with length-prefixed sub-blocks, 0x2C image descriptors,
0x3B trailer).

Scope (loud rejections):
- 8-bit palette images via the global or a local color table;
  interlaced frames are de-interlaced (the four-pass row order)
- a Graphic Control Extension's transparent index yields RGBA
  (alpha 0 at that index, 255 elsewhere); otherwise RGB
- decode returns the FIRST frame; ``meta["n_frames"]`` counts the
  rest (animation frame compositing — disposal, partial frames — is
  out of scope and the count makes that loud)
- LZW streams that reference unassigned codes, overflow the 4096
  table without a clear code, or end mid-pixel raise GifFormatError

The encoder emits a real variable-width LZW stream (not the
clear-code-spam degenerate form); its width schedule is driven by a
simulation of the DECODER's table growth, so the two sides stay
bit-synchronized by construction. Validated in tests against
hand-packed spec vectors, random round-trips, and a real
third-party file (CPython's imghdrdata python.gif) cross-pinned
pixel-for-pixel against the independently decoded PNG of the same
image.
"""

from __future__ import annotations

import struct

import numpy as np


class GifFormatError(ValueError):
    """Malformed bytes or out-of-scope GIF features."""


_MAX_CODE = 4096  # 12-bit ceiling fixed by the spec


def _lzw_decode(data: bytes, mcs: int, n_expected: int) -> bytes:
    """GIF-variant LZW: variable code width mcs+1..12, LSB-first.

    ``n_expected`` bounds the output (frame w*h) so a corrupt stream
    cannot balloon memory; decoding stops at the END code or when the
    expected pixel count is reached (some real writers omit END).
    """
    if not 2 <= mcs <= 11:
        raise GifFormatError(f"LZW min code size {mcs} out of range")
    clear = 1 << mcs
    end = clear + 1
    bitbuf = 0
    nbits = 0
    pos = 0
    width = mcs + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    out = bytearray()

    def read_code() -> int | None:
        nonlocal bitbuf, nbits, pos
        while nbits < width:
            if pos >= len(data):
                return None
            bitbuf |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        return code

    while len(out) < n_expected:
        code = read_code()
        if code is None:
            raise GifFormatError(
                f"LZW stream ended early ({len(out)}/{n_expected} pixels)"
            )
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the kwkwk deferred entry
        else:
            raise GifFormatError(f"LZW code {code} references unassigned slot")
        out += entry
        if prev is not None and len(table) < _MAX_CODE:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_expected:
        raise GifFormatError(
            f"LZW END before frame complete ({len(out)}/{n_expected})"
        )
    return bytes(out[:n_expected])


def _lzw_encode(indices: bytes, mcs: int) -> bytes:
    """Real variable-width GIF LZW. The width schedule mirrors the
    decoder's table-size trigger exactly (``sim_next`` simulates the
    decoder, which assigns one entry per code AFTER the first), so
    encoder and decoder can never disagree on a code's bit width."""
    clear = 1 << mcs
    end = clear + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0

    state = {"width": mcs + 1, "sim_next": clear + 2, "first": True}

    def emit(code: int, data_code: bool) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += state["width"]
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8
        if not data_code:
            return
        # decoder adds a table entry for every data code after the
        # first since the last clear — replay that growth
        if state["first"]:
            state["first"] = False
            return
        if state["sim_next"] < _MAX_CODE:
            state["sim_next"] += 1
            # sim_next IS the decoder's table length after it
            # processes this code; the decoder bumps width when that
            # length reaches 1<<width
            if state["sim_next"] == (1 << state["width"]) and state[
                "width"
            ] < 12:
                state["width"] += 1

    def reset_tables() -> dict[bytes, int]:
        state["width"] = mcs + 1
        state["sim_next"] = clear + 2
        state["first"] = True
        return {bytes([i]): i for i in range(clear)}

    emit(clear, False)
    codes = reset_tables()
    next_code = end + 1
    w = b""
    for b in indices:
        wc = w + bytes([b])
        if wc in codes:
            w = wc
            continue
        emit(codes[w], True)
        if next_code < _MAX_CODE:
            codes[wc] = next_code
            next_code += 1
        else:
            emit(clear, False)
            codes = reset_tables()
            next_code = end + 1
        w = bytes([b])
    if w:
        emit(codes[w], True)
    emit(end, False)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    """Reorder the four GIF interlace passes into natural row order."""
    h = idx.shape[0]
    order = [
        y for start, step in _INTERLACE_PASSES for y in range(start, h, step)
    ]
    out = np.empty_like(idx)
    out[order] = idx
    return out


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if pos >= len(data):
            raise GifFormatError("truncated sub-block stream")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        if pos + n > len(data):
            raise GifFormatError("truncated sub-block")
        chunks.append(data[pos : pos + n])
        pos += n


def decode_gif(data: bytes) -> tuple[np.ndarray, dict]:
    """GIF bytes → (H×W×3 RGB or H×W×4 RGBA uint8 array of the first
    frame, metadata dict with n_frames / interlaced / version)."""
    if len(data) < 13 or data[:4] != b"GIF8" or data[4:6] not in (
        b"7a",
        b"9a",
    ):
        raise GifFormatError("not a GIF87a/89a stream")
    version = data[3:6].decode("ascii")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(data):
            raise GifFormatError("truncated global color table")
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(
            n, 3
        )
        pos += 3 * n

    first: tuple[np.ndarray, dict] | None = None
    transparent: int | None = None
    n_frames = 0
    while True:
        if pos >= len(data):
            raise GifFormatError("missing trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise GifFormatError("truncated extension")
            label = data[pos]
            pos += 1
            body, pos = _read_subblocks(data, pos)
            if label == 0xF9 and first is None and len(body) >= 4:
                # graphic control: transparency applies to the NEXT
                # image descriptor; only the first frame matters here
                if body[0] & 0x01:
                    transparent = body[3]
            continue
        if block != 0x2C:
            raise GifFormatError(f"unknown block introducer 0x{block:02x}")
        # image descriptor
        if pos + 9 > len(data):
            raise GifFormatError("truncated image descriptor")
        _left, _top, w, h, ipacked = struct.unpack(
            "<HHHHB", data[pos : pos + 9]
        )
        pos += 9
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(data):
                raise GifFormatError("truncated local color table")
            pal = np.frombuffer(
                data[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        interlaced = bool(ipacked & 0x40)
        if pos >= len(data):
            raise GifFormatError("missing LZW min code size")
        mcs = data[pos]
        pos += 1
        lzw, pos = _read_subblocks(data, pos)
        n_frames += 1
        if first is not None:
            continue  # later frames: counted, not decoded
        if pal is None:
            raise GifFormatError("image with neither global nor local palette")
        if w == 0 or h == 0:
            raise GifFormatError("zero-dimension frame")
        raw = _lzw_decode(lzw, mcs, w * h)
        idx = np.frombuffer(raw, dtype=np.uint8).reshape(h, w)
        if interlaced:
            idx = _deinterlace(idx)
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise GifFormatError("palette index out of range")
        img = pal[idx]
        if transparent is not None and transparent < pal.shape[0]:
            alpha = np.where(idx == transparent, 0, 255).astype(np.uint8)
            img = np.dstack([img, alpha])
        first = (
            np.ascontiguousarray(img),
            {
                "width": int(w),
                "height": int(h),
                "channels": int(img.shape[2]),
                "interlaced": interlaced,
                "version": version,
                "screen_size": (int(sw), int(sh)),
            },
        )
    if first is None:
        raise GifFormatError("no image descriptor before trailer")
    img, meta = first
    meta["n_frames"] = n_frames
    return img, meta


def encode_gif(img: np.ndarray, interlaced: bool = False) -> bytes:
    """H×W×3 uint8 RGB array (≤256 distinct colors) → single-frame
    GIF89a bytes with a global color table and real LZW."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise GifFormatError("expected HxWx3 RGB array")
    h, w, _ = arr.shape
    flat = arr.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if colors.shape[0] > 256:
        raise GifFormatError(
            f"{colors.shape[0]} distinct colors (palette max 256)"
        )
    # palette size: power of two >= n, >= 4 (spec minimum table 2^2)
    bits = max(2, int(colors.shape[0] - 1).bit_length())
    pal = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal[: colors.shape[0]] = colors
    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlaced:
        order = [
            y
            for start, step in _INTERLACE_PASSES
            for y in range(start, h, step)
        ]
        idx = idx[order]
    mcs = bits
    lzw = _lzw_encode(idx.tobytes(), mcs)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7) << 4 | (bits - 1), 0, 0)
    out += pal.tobytes()
    out += struct.pack(
        "<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlaced else 0
    )
    out.append(mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # sub-block terminator
    out.append(0x3B)  # trailer
    return bytes(out)
