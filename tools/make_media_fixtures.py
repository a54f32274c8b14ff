#!/usr/bin/env python3
"""Generate the checked-in media fixtures for MultimodalSpec and print the
expected decode values (computed here, independently of the Scala code).

- fixture_rgb_8x5.png : 8x5 RGB PNG, deterministic pixel pattern
- fixture_ramp.wav    : 16-bit mono PCM, 8kHz, 100-sample ramp

Pixel hash = fold h0=17, h=(h*31+byte) % (2^31-1) over row-major R,G,B
bytes — the same portable chain Multimodal.byteHash uses for payloads.
"""
import os, struct, zlib

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources")
os.makedirs(OUT, exist_ok=True)

W, H = 8, 5
def px(x, y):
    return ((x * 37 + y * 11) % 256, (x * 59 + y * 3) % 256, (x * 17 + y * 29) % 256)

# --- PNG (hand-rolled: IHDR + IDAT(zlib, filter 0) + IEND) ---
def chunk(tag, data):
    c = tag + data
    return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))

raw = b""
for y in range(H):
    raw += b"\x00" + bytes(v for x in range(W) for v in px(x, y))
png = (b"\x89PNG\r\n\x1a\n"
       + chunk(b"IHDR", struct.pack(">IIBBBBB", W, H, 8, 2, 0, 0, 0))
       + chunk(b"IDAT", zlib.compress(raw))
       + chunk(b"IEND", b""))
with open(os.path.join(OUT, "fixture_rgb_8x5.png"), "wb") as f:
    f.write(png)

MOD = 2147483647
h = 17
for y in range(H):
    for x in range(W):
        for v in px(x, y):
            h = (h * 31 + v) % MOD
print(f"PNG: {W}x{H}, expected pixelHash = {h}L")

# --- WAV (44-byte canonical header + PCM16 ramp) ---
N, RATE = 100, 8000
samples = b"".join(struct.pack("<h", (i * 300 - 15000)) for i in range(N))
hdr = (b"RIFF" + struct.pack("<I", 36 + len(samples)) + b"WAVE"
       + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, RATE, RATE * 2, 2, 16)
       + b"data" + struct.pack("<I", len(samples)))
with open(os.path.join(OUT, "fixture_ramp.wav"), "wb") as f:
    f.write(hdr + samples)
print(f"WAV: {N} frames @ {RATE} Hz")
