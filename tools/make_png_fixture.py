"""Generate the committed deterministic PNG fixture
(data/png_fixture/img_NNN.png) consumed by q_image_dims.

Real, spec-valid PNGs built from the stdlib alone (struct + zlib):
8-byte signature, IHDR (13-byte payload: width/height big-endian
uint32, bit depth 8, color type 2 = truecolor RGB, compression 0,
filter 0, interlace 0), one IDAT with zlib-compressed filter-0
scanlines, IEND. Pixel values are a fixed arithmetic function of
(x, y, i) so the files are reproducible from this script; the fixture
is COMMITTED (the data/nmea_fixture precedent) so the q_image_dims
oracle can read the identical bytes via DuckDB read_blob.

Run: python tools/make_png_fixture.py   (idempotent)
"""

from __future__ import annotations

import os
import struct
import zlib

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "data", "png_fixture")
N_IMAGES = 24


def chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def make_png(i: int) -> tuple[str, bytes]:
    w, h = 8 + 7 * i, 5 + 3 * i
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    rows = bytearray()
    for y in range(h):
        rows.append(0)  # filter type 0 (None)
        for x in range(w):
            rows += bytes(
                (
                    (x * 7 + y * 13 + i) % 256,
                    (x * 3 + y * 5) % 256,
                    (i * 11 + x + y) % 256,
                )
            )
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(rows), 6))
        + chunk(b"IEND", b"")
    )
    return f"img_{i:03d}.png", png


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for i in range(N_IMAGES):
        name, png = make_png(i)
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(png)
    print(f"wrote {N_IMAGES} PNGs to {OUT}")


if __name__ == "__main__":
    main()
