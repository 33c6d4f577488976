"""Generate the committed deterministic WAV fixture
(data/wav_fixture/clip_NNN.wav) consumed by q_audio_meta.

Canonical 44-byte-header PCM WAVs from the stdlib alone (struct):
RIFF/WAVE + a 16-byte fmt chunk + one data chunk, no extra chunks —
so every field sits at its textbook fixed offset. Sample values are a
fixed arithmetic function of (frame, channel, i) so the files are
reproducible from this script; the fixture is COMMITTED (the
png_fixture precedent) so the oracle can read identical bytes.

Run: python tools/make_wav_fixture.py   (idempotent)
"""

from __future__ import annotations

import os
import struct

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "data", "wav_fixture")
N_CLIPS = 16


def make_wav(i: int) -> tuple[str, bytes]:
    rate = 8000 + 1000 * i
    channels = 1 + (i % 2)
    bits = 16
    n_frames = 100 + 50 * i
    block_align = channels * bits // 8
    data = bytearray()
    for t in range(n_frames):
        for c in range(channels):
            v = ((t * 2654435761 + c * 7919 + i * 104729) % 65536) - 32768
            data += struct.pack("<h", v)
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                      rate * block_align, block_align, bits)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return f"clip_{i:03d}.wav", hdr + bytes(data)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for i in range(N_CLIPS):
        name, wav = make_wav(i)
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(wav)
    print(f"wrote {N_CLIPS} WAVs to {OUT}")


if __name__ == "__main__":
    main()
