"""Driver-side probe for Spark's serialized Count-Min sketch.

``count_min_sketch(...)`` (the SQL aggregate) returns the V1 binary
format of ``org.apache.spark.util.sketch.CountMinSketchImpl`` — a
big-endian header ``(version:int, totalCount:long, depth:int,
width:int)``, then the ``depth`` per-row ``hashA`` seeds (longs,
used only for long-typed items), then the ``depth × width`` counter
table of longs (layout verified against the JVM empirically: buffer
length == 20 + 8*depth + 8*depth*width). The classic backend can
probe it via the JVM class; under Spark Connect there is no py4j
bridge, so this module re-implements the two pieces needed to query
the sketch for STRING items from Python:

- ``CountMinSketchView.estimate_count(item)`` — the V1 string probe
  (Cassandra-style getHashBuckets): two Murmur3_x86_32 passes over
  the UTF-8 item (seed 0, then seed hash1), row ``i`` probed at
  ``Math.abs((hash1 + i*hash2) % width)`` with Java 32-bit signed
  wraparound and Java ``%`` (sign follows the dividend).
- ``_murmur3_32(data, seed)`` — Spark's ``Murmur3_x86_32
  .hashUnsafeBytes`` variant: 4-byte little-endian blocks, then each
  TAIL byte mixed as a full round as a SIGNED byte (this differs
  from standard/x86 murmur3 tail handling — it is Spark's own
  layout, also used by the SQL ``hash()`` function).

The view is the Connect-clean probe; ``tests/test_plans.py`` pins
bitwise parity against the JVM ``CountMinSketch.readFrom`` probe on
classic sessions, so the Python arithmetic is oracle-checked against
the engine's, not just the format doc.
"""

from __future__ import annotations

import struct

_MASK32 = 0xFFFFFFFF
_C1 = 0xCC9E2D51
_C2 = 0x1B873593


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _C1) & _MASK32
    k1 = _rotl32(k1, 15)
    return (k1 * _C2) & _MASK32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _MASK32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _MASK32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _MASK32
    h1 ^= h1 >> 16
    return h1


def _murmur3_32(data: bytes, seed: int) -> int:
    """Spark Murmur3_x86_32.hashUnsafeBytes: little-endian 4-byte
    blocks, then each remaining byte mixed as a FULL round (as a
    signed byte) — not the standard murmur3 tail. Returns a Java
    int (signed 32-bit)."""
    h1 = seed & _MASK32
    n_aligned = len(data) & ~3
    for i in range(0, n_aligned, 4):
        block = int.from_bytes(data[i : i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(block))
    for i in range(n_aligned, len(data)):
        b = data[i]
        if b >= 0x80:  # Java getByte is signed
            b -= 0x100
        h1 = _mix_h1(h1, _mix_k1(b & _MASK32))
    out = _fmix(h1, len(data))
    return out - (1 << 32) if out >= (1 << 31) else out


class CountMinSketchView:
    """Read-only view over the V1 serialized CountMinSketch."""

    def __init__(self, buf: bytes) -> None:
        version, total, depth, width = struct.unpack_from(">iqii", buf, 0)
        if version != 1:
            raise ValueError(f"unsupported CountMinSketch version {version}")
        expected = 20 + 8 * depth + 8 * depth * width
        if len(buf) != expected:
            raise ValueError(
                f"CountMinSketch buffer length {len(buf)} != {expected} "
                f"for depth={depth} width={width}"
            )
        self.total_count = total
        self.depth = depth
        self.width = width
        off = 20 + 8 * depth  # skip hashA (long-item seeds)
        flat = struct.unpack_from(f">{depth * width}q", buf, off)
        self._rows = [
            flat[i * width : (i + 1) * width] for i in range(depth)
        ]

    def estimate_count(self, item: str) -> int:
        data = item.encode("utf-8")
        h1 = _murmur3_32(data, 0)
        h2 = _murmur3_32(data, h1 & _MASK32)
        est = None
        for i in range(self.depth):
            # Java 32-bit signed wraparound...
            combined = (h1 + i * h2) & _MASK32
            if combined >= 1 << 31:
                combined -= 1 << 32
            # ...then Java % (sign follows dividend) and Math.abs.
            jmod = (
                combined % self.width
                if combined >= 0
                else -((-combined) % self.width)
            )
            v = self._rows[i][abs(jmod)]
            est = v if est is None else min(est, v)
        return int(est)
