"""Animated GIF of the growing 2-D search stencil (offline tool).

Parity with the reference's animation tool
(``/root/reference/tools/stencilgif.py:51-108``): frame ``i`` shows the
first ``i`` stencil points on the dyadic grid, colored by resolution
level (``extra_halvings`` -- doubled steps warm, contractions darkening),
with the origin marked and the axes drawn, so the spiral growth order of
the right-handed simplex stencil is visible.  The reference renders via
gizeh + moviepy; this container has no imaging libraries, so the frames
are rasterized with numpy and written through a dependency-free GIF89a
encoder (standard variable-code-width LZW, Netscape loop extension) --
pure stdlib + numpy.

Usage: python tools/stencilgif.py [n_frames] [out.gif]
(defaults: 120 frames, stencil.gif; ~320x320, 8 fps like the reference)
"""

from __future__ import annotations

import os
import struct
import sys
from itertools import islice

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dask_patternsearch_spark.stencil import SimplexStencil  # noqa: E402

# DB16 palette subset (same family the reference uses), indexed by the
# drawing code below: 0 bg, 1 grid, 2 axes, then halvings buckets
PALETTE = [
    (255, 255, 255),  # 0 background
    (222, 238, 214),  # 1 fine grid
    (133, 149, 161),  # 2 axes
    (68, 36, 52),     # 3 halvings <= -1 (doubled steps)
    (208, 70, 72),    # 4 halvings -1
    (89, 125, 206),   # 5 halvings 0 (base resolution / poll set)
    (109, 170, 44),   # 6 halvings 1
    (52, 101, 36),    # 7 halvings 2
    (20, 12, 28),     # 8 halvings >= 3
]


def _color_index(halvings: int) -> int:
    if halvings <= -2:
        return 3
    if halvings == -1:
        return 4
    if halvings >= 3:
        return 8
    return {0: 5, 1: 6, 2: 7}[halvings]


# --------------------------------------------------------------------------
# GIF89a writer (pure Python LZW, variable code width, spec-standard)
# --------------------------------------------------------------------------

def _lzw(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-flavor LZW: emits CLEAR first, resets the table at 4096."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    buf = b""
    for px in indices.tobytes():
        cand = buf + bytes([px])
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        buf = bytes([px])
    if buf:
        emit(table[buf], width)
    emit(end, width)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def write_gif(path: str, frames: list[np.ndarray],
              palette: list[tuple[int, int, int]], fps: int = 8) -> None:
    """Write uint8 palette-index frames (all same HxW) as a looping GIF."""
    h, w = frames[0].shape
    bits = max(2, (len(palette) - 1).bit_length())
    ncol = 1 << bits
    delay = max(2, round(100 / fps))  # hundredths of a second
    with open(path, "wb") as f:
        f.write(b"GIF89a")
        f.write(struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0))
        for i in range(ncol):
            r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
            f.write(bytes((r, g, b)))
        # Netscape loop-forever extension
        f.write(b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00")
        for fr in frames:
            f.write(b"\x21\xf9\x04\x04" + struct.pack("<H", delay) + b"\x00\x00")
            f.write(b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00")
            mcs = max(2, bits)
            f.write(bytes([mcs]))
            data = _lzw(fr.reshape(-1), mcs)
            for off in range(0, len(data), 255):
                chunk = data[off:off + 255]
                f.write(bytes([len(chunk)]) + chunk)
            f.write(b"\x00")
        f.write(b"\x3b")


# --------------------------------------------------------------------------
# rasterization (numpy only: grid lines + anti-alias-free disks)
# --------------------------------------------------------------------------

def _base_canvas(width: int, scale: int, offset: np.ndarray) -> np.ndarray:
    img = np.zeros((width, width), dtype=np.uint8)  # 0 = background
    cell = width / scale
    # fine grid every cell from the origin outward (matches the reference)
    for ax in (0, 1):
        c = offset[ax]
        ticks = np.concatenate([np.arange(c, width, cell), np.arange(c, -1, -cell)])
        for t in ticks:
            ti = int(round(t))
            if 0 <= ti < width:
                if ax == 0:
                    img[:, ti] = np.maximum(img[:, ti], 1)
                else:
                    img[ti, :] = np.maximum(img[ti, :], 1)
    # axes on top
    img[:, int(offset[0])] = 2
    img[int(offset[1]), :] = 2
    return img


def _draw_disk(img: np.ndarray, xy: np.ndarray, r: float, color: int) -> None:
    w = img.shape[0]
    x, y = float(xy[0]), float(xy[1])
    x0, x1 = max(0, int(x - r - 1)), min(w, int(x + r + 2))
    y0, y1 = max(0, int(y - r - 1)), min(w, int(y + r + 2))
    if x0 >= x1 or y0 >= y1:
        return
    yy, xx = np.ogrid[y0:y1, x0:x1]
    mask = (xx - x) ** 2 + (yy - y) ** 2 <= r * r
    img[y0:y1, x0:x1][mask] = color


def make_frames(n_frames: int, width: int = 320, scale: int = 11) -> list[np.ndarray]:
    stencil = SimplexStencil(2, 30)
    rotate = np.array([1.0, -1.0])
    offset = width / 2 + rotate * width / 10
    pts = []
    for s in islice(stencil.steps(), n_frames):
        pts.append((rotate * s.offset * width / 12 + offset, int(s.extra_halvings)))
    base = _base_canvas(width, scale, offset)
    frames = []
    for i in range(n_frames):
        img = base.copy()
        _draw_disk(img, offset, 3.25, 5)  # origin at base resolution color
        for xy, hv in pts[:i]:
            _draw_disk(img, xy, max(0.5, 3.25 - 0.75 * hv), _color_index(hv))
        frames.append(img)
    return frames


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    out = sys.argv[2] if len(sys.argv) > 2 else "stencil.gif"
    write_gif(out, make_frames(n), PALETTE, fps=8)
    print(f"wrote {out} ({n} frames)")


if __name__ == "__main__":
    main()
