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
    if not (0 < maxval <= 255):
        raise ValueError(f"unsupported maxval {maxval} (want 1..255)")
    ch = 1 if magic == b"P5" else 3
    need = w * h * ch
    raster = np.frombuffer(payload, dtype=np.uint8,
                           count=need, offset=off)
    if raster.size < need:
        raise ValueError("truncated PNM raster")
    return raster.reshape((h, w) if ch == 1 else (h, w, ch))
