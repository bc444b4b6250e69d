"""Pure-NumPy media codecs — the formats decodable without external
libraries.

The multimodal operators' ``decode='real'`` path needs an actual codec;
PIL/ffmpeg are unavailable in this environment, but the netpbm family
(PGM ``P5`` grayscale, PPM ``P6`` RGB) is a plain header + raw raster
and decodes with numpy alone.  Formats that genuinely need external
codecs (JPEG/PNG/video) remain documented integration points.

Format reference (public netpbm spec): ``P5|P6``, then whitespace-
separated width, height, maxval tokens — ``#`` starts a comment running
to end of line anywhere in the header — then ONE whitespace byte,
then the raw raster (width*height samples for P5, *3 for P6; one byte
per sample for maxval <= 255).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def encode_pgm(img: np.ndarray) -> bytes:
    """Encode a (h, w) uint8 array as binary PGM (``P5``)."""
    if img.ndim != 2:
        raise ValueError(f"PGM wants (h, w), got {img.shape}")
    h, w = img.shape
    return b"P5\n%d %d\n255\n" % (w, h) + \
        np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def encode_ppm(img: np.ndarray) -> bytes:
    """Encode a (h, w, 3) uint8 array as binary PPM (``P6``)."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"PPM wants (h, w, 3), got {img.shape}")
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + \
        np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def _header_tokens(payload: bytes, n_tokens: int) -> Tuple[list, int]:
    """Read ``n_tokens`` whitespace-separated header tokens (skipping
    ``#`` comments) starting after the magic; return (tokens, offset of
    the first raster byte)."""
    toks: list = []
    i = 2  # past the 2-byte magic
    n = len(payload)
    while len(toks) < n_tokens:
        while i < n and payload[i:i + 1].isspace():
            i += 1
        if i < n and payload[i] == 0x23:        # '#' comment
            while i < n and payload[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < n and not payload[j:j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PNM header")
        toks.append(payload[i:j])
        i = j
    # exactly ONE whitespace byte separates the header from the raster
    if i >= n or not payload[i:i + 1].isspace():
        raise ValueError("missing raster separator")
    return toks, i + 1


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 8000
                     ) -> bytes:
    """Encode a 1-D int16 array as a mono PCM-16 WAV (RIFF) file."""
    if samples.ndim != 1:
        raise ValueError(f"mono PCM wants 1-D samples, got {samples.shape}")
    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    n = len(data)

    def le32(v: int) -> bytes:
        return v.to_bytes(4, "little")

    def le16(v: int) -> bytes:
        return v.to_bytes(2, "little")

    return (b"RIFF" + le32(36 + n) + b"WAVE"
            + b"fmt " + le32(16) + le16(1) + le16(1)      # PCM, mono
            + le32(sample_rate) + le32(sample_rate * 2)   # byte rate
            + le16(2) + le16(16)                          # align, bits
            + b"data" + le32(n) + data)


def decode_wav(payload: bytes) -> Tuple[np.ndarray, int]:
    """Decode a mono PCM-16 WAV: walk the RIFF chunk list (unknown
    chunks are skipped, as the format allows), validate the fmt chunk,
    and return (int16 samples, sample_rate).  Raises ValueError for
    non-RIFF/WAVE payloads or non-PCM16-mono encodings (compressed
    audio belongs at the external-codec integration point)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE payload: {payload[:4]!r}")
    i, n = 12, len(payload)
    fmt = data = None
    while i + 8 <= n:
        cid = payload[i:i + 4]
        size = int.from_bytes(payload[i + 4:i + 8], "little")
        body = payload[i + 8:i + 8 + size]
        if len(body) != size:
            # the chunk's declared size runs past the payload: a
            # truncated file.  Without this check a clipped data chunk
            # silently decodes to FEWER samples (when the clipped
            # length happens to stay int16-aligned) — found by the
            # round-13 corrupt-payload fuzz
            raise ValueError(
                f"truncated RIFF chunk {cid!r}: declares {size} bytes, "
                f"{n - i - 8} remain")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)          # chunks are 2-byte aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError(f"fmt chunk too short ({len(fmt)} bytes)")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if (audio_format, channels, bits) != (1, 1, 16):
        raise ValueError(
            f"only PCM-16 mono decodes here (got format={audio_format}, "
            f"channels={channels}, bits={bits})")
    return np.frombuffer(data, dtype="<i2"), sample_rate


def encode_y4m_mono(frames: np.ndarray, fps: Tuple[int, int] = (25, 1)
                    ) -> bytes:
    """Encode (n_frames, h, w) uint8 as a YUV4MPEG2 stream (Cmono —
    one luma plane per frame, no chroma)."""
    if frames.ndim != 3:
        raise ValueError(f"want (n, h, w), got {frames.shape}")
    n, h, w = frames.shape
    header = (f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 "
              "Cmono\n").encode()
    body = b"".join(
        b"FRAME\n" + np.ascontiguousarray(f, dtype=np.uint8).tobytes()
        for f in frames)
    return header + body


def decode_y4m(payload: bytes) -> np.ndarray:
    """Decode a YUV4MPEG2 stream into (n_frames, h, w[, 3]) uint8.
    Supports ``Cmono`` (1 plane) and ``C444`` (3 full planes); the
    subsampled chroma modes belong at the external-codec integration
    point.  Per-frame parameter tags (``FRAME`` extensions) are
    accepted and ignored."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError(f"not a YUV4MPEG2 payload: {payload[:9]!r}")
    nl = payload.index(b"\n")
    w = h = None
    colorspace = "C420"  # the spec default; unsupported -> raises below
    for tok in payload[9:nl].split():
        t = tok.decode("ascii", "replace")
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("C"):
            colorspace = t
    if w is None or h is None:
        raise ValueError("missing W/H in YUV4MPEG2 header")
    if w <= 0 or h <= 0:
        # a W0/H0 header would otherwise "decode" an endless run of
        # silent zero-byte frames (fsize = 0 never exhausts the
        # payload) — round-13 corrupt-payload fuzz
        raise ValueError(f"non-positive Y4M dimensions {w}x{h}")
    if colorspace == "Cmono":
        planes = 1
    elif colorspace == "C444":
        planes = 3
    else:
        raise ValueError(
            f"only Cmono/C444 decode here (got {colorspace}); plug "
            "ffmpeg for subsampled chroma")
    fsize = w * h * planes
    frames = []
    i = nl + 1
    n = len(payload)
    while i < n:
        if payload[i:i + 5] != b"FRAME":
            raise ValueError("corrupt frame marker")
        i = payload.index(b"\n", i) + 1      # skip frame params
        raw = np.frombuffer(payload, dtype=np.uint8, count=fsize,
                            offset=i)
        frames.append(raw.reshape((h, w) if planes == 1
                                  else (planes, h, w)))
        i += fsize
    out = np.stack(frames) if frames else \
        np.zeros((0, h, w) if planes == 1 else (0, planes, h, w),
                 dtype=np.uint8)
    if planes == 3:
        out = np.moveaxis(out, 1, -1)        # (n, h, w, 3)
    return out


def decode_pnm(payload: bytes) -> np.ndarray:
    """Decode binary PGM/PPM bytes: (h, w) uint8 for ``P5``,
    (h, w, 3) uint8 for ``P6``.  Raises ValueError on anything else —
    callers route other magics to their external-codec integration
    point."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary PGM/PPM payload: {magic!r}")
    (w_b, h_b, maxval_b), off = _header_tokens(payload, 3)
    w, h, maxval = int(w_b), int(h_b), int(maxval_b)
    if w <= 0 or h <= 0:
        # netpbm requires positive dimensions; without this check a
        # "P5\n0 0\n255\n" payload decodes to a silent (0, 0) raster
        # (need = 0 bytes always "present") — found by the round-13
        # corrupt-payload fuzz (tools/dirty_fuzz.py media arm)
        raise ValueError(f"non-positive PNM dimensions {w}x{h}")
    if not (0 < maxval <= 255):
        raise ValueError(f"unsupported maxval {maxval} (want 1..255)")
    ch = 1 if magic == b"P5" else 3
    need = w * h * ch
    raster = np.frombuffer(payload, dtype=np.uint8,
                           count=need, offset=off)
    if raster.size < need:
        raise ValueError("truncated PNM raster")
    return raster.reshape((h, w) if ch == 1 else (h, w, ch))
