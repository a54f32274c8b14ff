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

# --- MP4 (minimal ISO-BMFF: ftyp + moov{mvhd, trak{tkhd, mdia{mdhd,
#     hdlr, minf{stbl{stsd(avc1), stsz}}}}}; no mdat) ---
# Independent writer for VideoContainers' READER tests: 640x360, 250
# frames @25fps => duration 10000ms at timescale 1000.
VW, VH, VF = 640, 360, 250
VDUR = VF * 40

def mp4box(tag, *payloads):
    p = b"".join(payloads)
    return struct.pack(">I", len(p) + 8) + tag + p

IDENT = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
mvhd = mp4box(b"mvhd", struct.pack(">IIIII", 0, 0, 0, 1000, VDUR),
              struct.pack(">IHH", 0x10000, 0x100, 0), b"\x00" * 8, IDENT,
              b"\x00" * 24, struct.pack(">I", 2))
tkhd = mp4box(b"tkhd", struct.pack(">IIIIII", 7, 0, 0, 1, 0, VDUR),
              b"\x00" * 8, struct.pack(">HHHH", 0, 0, 0, 0), IDENT,
              struct.pack(">II", VW << 16, VH << 16))
mdhd = mp4box(b"mdhd", struct.pack(">IIIII", 0, 0, 0, 1000, VDUR),
              struct.pack(">HH", 0x55C4, 0))
hdlr = mp4box(b"hdlr", struct.pack(">II", 0, 0), b"vide", b"\x00" * 13)
stsd = mp4box(b"stsd", struct.pack(">II", 0, 1),
              struct.pack(">I", 16) + b"avc1" + b"\x00" * 8)
stsz = mp4box(b"stsz", struct.pack(">III", 0, 100, VF))
stbl = mp4box(b"stbl", stsd, stsz)
minf = mp4box(b"minf", stbl)
mdia = mp4box(b"mdia", mdhd, hdlr, minf)
trak = mp4box(b"trak", tkhd, mdia)
moov = mp4box(b"moov", mvhd, trak)
ftyp = mp4box(b"ftyp", b"isom", struct.pack(">I", 0), b"isommp42")
with open(os.path.join(OUT, "fixture_tiny.mp4"), "wb") as f:
    f.write(ftyp + moov)
print(f"MP4: {VW}x{VH}, {VF} frames, {VDUR} ms, codec avc1")

# --- WebM (minimal EBML header + Segment{Info, Tracks}) ---
def vsize(n):
    if n < 127:
        return bytes([0x80 | n])
    return bytes([0x40 | (n >> 8), n & 0xFF])

def ebml_id(i):
    out = []
    while i:
        out.insert(0, i & 0xFF)
        i >>= 8
    return bytes(out)

def elem(i, *payloads):
    p = b"".join(payloads)
    return ebml_id(i) + vsize(len(p)) + p

def euint(i, v):
    out = []
    while True:
        out.insert(0, v & 0xFF)
        v >>= 8
        if not v:
            break
    return elem(i, bytes(out))

header = elem(0x1A45DFA3, euint(0x4286, 1), euint(0x42F7, 1),
              euint(0x42F2, 4), euint(0x42F3, 8), elem(0x4282, b"webm"),
              euint(0x4287, 2), euint(0x4285, 2))
info = elem(0x1549A966, euint(0x2AD7B1, 1000000),
            elem(0x4489, struct.pack(">d", float(VDUR))))
tracks = elem(0x1654AE6B, elem(0xAE,
              euint(0xD7, 1), euint(0x73C5, 1), euint(0x83, 1),
              euint(0x23E383, 40000000),
              elem(0x86, b"V_VP9"),
              elem(0xE0, euint(0xB0, VW), euint(0xBA, VH))))
with open(os.path.join(OUT, "fixture_tiny.webm"), "wb") as f:
    f.write(header + elem(0x18538067, info, tracks))
print(f"WebM: {VW}x{VH}, {VF} frames, {VDUR} ms, codec V_VP9")

# --- AVI (RIFF 'AVI ': hdrl{avih, strl{strh, strf}} + movi with two
#     fake frame payloads) — independent writer for the AVI READER tests.
#     Frame payloads are known sentinel bytes (NOT JPEGs): the spec pins
#     byte-exact frame extraction; pixel decode is pinned separately
#     against ImageIO-encoded JPEGs in Scala. ---
AW, AH, AUS = 176, 120, 40000
FRAME1 = bytes((7 * i + 3) % 256 for i in range(33))   # odd length → pad
FRAME2 = bytes((11 * i + 5) % 256 for i in range(48))

def ck(cid, payload):
    pad = b"\x00" if len(payload) % 2 else b""
    return cid + struct.pack("<I", len(payload)) + payload + pad

def lst(ltype, *payloads):
    return ck(b"LIST", ltype + b"".join(payloads))

avih = ck(b"avih", struct.pack("<10I", AUS, 0, 0, 0, 2, 0, 1, 48, AW, AH)
          + b"\x00" * 16)
strh = ck(b"strh", b"vids" + b"MJPG"
          + struct.pack("<IHHIIIIIIiI", 0, 0, 0, 0, AUS, 1000000, 0, 2, 48, -1, 0)
          + struct.pack("<4H", 0, 0, AW, AH))
strf = ck(b"strf", struct.pack("<IiiHH", 40, AW, AH, 1, 24) + b"MJPG"
          + struct.pack("<IiiII", AW * AH * 3, 0, 0, 0, 0))
movi = lst(b"movi", ck(b"00dc", FRAME1), ck(b"00dc", FRAME2))
body = b"AVI " + lst(b"hdrl", avih, lst(b"strl", strh, strf)) + movi
with open(os.path.join(OUT, "fixture_tiny.avi"), "wb") as f:
    f.write(b"RIFF" + struct.pack("<I", len(body)) + body)
print(f"AVI: {AW}x{AH}, 2 frames, {2 * AUS // 1000} ms, codec MJPG, "
      f"frame bytes {len(FRAME1)}/{len(FRAME2)}")
