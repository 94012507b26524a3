"""Pure-Python WAV (RIFF/PCM) decode/encode — stdlib + numpy only.

The audio sibling of pnglite: uncompressed PCM WAV has no codec at
all, just the RIFF container (RIFF header → ``fmt `` chunk → ``data``
chunk, all little-endian) — so the multimodal audio path can decode
REAL samples in this container. Spec scope (rejections loud):

- format tag 1 (PCM integer) only — IEEE-float (3), A-law/µ-law,
  ADPCM and the WAVE_FORMAT_EXTENSIBLE wrapper are rejected by tag
- 8-bit (unsigned) and 16-bit (signed LE) sample widths
- any channel count; interleaved frames → (n_frames, n_channels)

Runs inside Arrow-batched ``mapInPandas`` at scale — see
operators/multimodal.py::wav_stats_features.
"""

from __future__ import annotations

import struct

import numpy as np


class WavFormatError(ValueError):
    """Malformed bytes or out-of-scope WAV features."""


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((n_frames, n_channels) int16 array, sample_rate).

    8-bit samples (unsigned, 0–255 per spec) are recentred to signed
    int16 range ((v-128)<<8) so callers see one dtype."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavFormatError("not a RIFF/WAVE stream")
    off = 12
    fmt = None
    pcm = None
    while off + 8 <= len(data):
        cid = data[off : off + 4]
        (size,) = struct.unpack("<I", data[off + 4 : off + 8])
        body = data[off + 8 : off + 8 + size]
        if len(body) != size:
            raise WavFormatError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            pcm = body
        off += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or len(fmt) < 16:
        raise WavFormatError("missing/short fmt chunk")
    if pcm is None:
        raise WavFormatError("missing data chunk")
    tag, nch, rate, _brate, balign, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if tag != 1:
        raise WavFormatError(
            f"unsupported format tag {tag} (PCM integer only)"
        )
    if bits not in (8, 16):
        raise WavFormatError(f"unsupported bit width {bits} (8/16 only)")
    if nch == 0:
        raise WavFormatError("zero channels")
    bytes_per = bits // 8
    if balign != nch * bytes_per:
        raise WavFormatError(
            f"block align {balign} != channels*width {nch * bytes_per}"
        )
    if len(pcm) % balign:
        raise WavFormatError("data chunk is not a whole number of frames")
    if bits == 16:
        arr = np.frombuffer(pcm, dtype="<i2").astype(np.int16)
    else:
        arr = (
            (np.frombuffer(pcm, dtype=np.uint8).astype(np.int16) - 128)
            << 8
        )
    return arr.reshape(-1, nch), int(rate)


def encode_wav(
    samples: np.ndarray, sample_rate: int, bits: int = 16
) -> bytes:
    """(n_frames, n_channels) int16 (or 1-D mono) → PCM WAV bytes."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise WavFormatError("expected 1-D or (frames, channels) array")
    nch = arr.shape[1]
    if bits == 16:
        pcm = arr.astype("<i2").tobytes()
    elif bits == 8:
        pcm = ((arr >> 8) + 128).astype(np.uint8).tobytes()
    else:
        raise WavFormatError(f"unsupported bit width {bits}")
    bytes_per = bits // 8
    fmt = struct.pack(
        "<HHIIHH",
        1,
        nch,
        sample_rate,
        sample_rate * nch * bytes_per,
        nch * bytes_per,
        bits,
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
        + (b"\x00" if len(pcm) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
