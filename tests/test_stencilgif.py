"""The animated-GIF stencil tool (tools/stencilgif.py): the GIF89a
stream must be spec-valid and the LZW payload must round-trip
pixel-for-pixel through an independent decoder."""

import struct

import numpy as np

from tools.stencilgif import PALETTE, make_frames, write_gif


def _lzw_decode(buf: bytes, mcs: int, npix: int) -> bytes:
    clear, end = 1 << mcs, (1 << mcs) + 1
    table = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = mcs + 1
    out = bytearray()
    bitpos = 0
    prev = None
    total_bits = len(buf) * 8
    while bitpos + width <= total_bits:
        byte_i, bit_i = divmod(bitpos, 8)
        chunk = int.from_bytes(buf[byte_i:byte_i + 3], "little")
        code = (chunk >> bit_i) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
            if prev is not None:
                table.append(prev + entry[:1])
        else:
            entry = prev + prev[:1]
            table.append(entry)
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= npix:
            break
    return bytes(out[:npix])


def _decode_frames(data: bytes) -> list:
    assert data[:6] == b"GIF89a"
    w, h, flags, _, _ = struct.unpack("<HHBBB", data[6:13])
    pos = 13 + (1 << ((flags & 7) + 1)) * 3
    frames = []
    while data[pos] != 0x3B:
        if data[pos] == 0x21:  # extension
            pos += 2
            while data[pos]:
                pos += data[pos] + 1
            pos += 1
            continue
        assert data[pos] == 0x2C
        _, _, fw, fh = struct.unpack("<HHHH", data[pos + 1:pos + 9])
        assert (fw, fh) == (w, h) and data[pos + 9] == 0
        mcs = data[pos + 10]
        pos += 11
        blocks = bytearray()
        while data[pos]:
            n = data[pos]
            blocks += data[pos + 1:pos + 1 + n]
            pos += n + 1
        pos += 1
        frames.append(
            np.frombuffer(_lzw_decode(bytes(blocks), mcs, w * h),
                          dtype=np.uint8).reshape(h, w)
        )
    return frames


def test_gif_round_trips_every_frame(tmp_path):
    n = 12
    frames = make_frames(n, width=96, scale=11)
    path = str(tmp_path / "stencil.gif")
    write_gif(path, frames, PALETTE, fps=8)
    data = open(path, "rb").read()
    decoded = _decode_frames(data)
    assert len(decoded) == n
    for got, want in zip(decoded, frames):
        assert np.array_equal(got, want)
    # the last frame shows actual stencil points: colors beyond the
    # background/grid/axes/origin set must appear (halvings buckets)
    assert len(np.unique(decoded[-1])) > 4
    # loops forever (Netscape application extension present)
    assert b"NETSCAPE2.0" in data
