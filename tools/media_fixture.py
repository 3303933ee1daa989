#!/usr/bin/env python3
"""Cross-implementation media-container fixtures (the P19 murmur3 recipe,
applied to the round-8 real-decode work).

Writes BMP / RIFF-WAVE / YUV4MPEG2 files with INDEPENDENT Python
struct.pack code — no logic shared with the Scala builders in
MediaCodecs.scala — plus a manifest.json of the metadata a correct parser
must extract (null = the parser must reject the file). MediaCodecsSpec
pins graft.functions.MediaCodecs against these bytes, so a compensating
builder/parser bug on the Scala side (both ends big-endian, both ends
unpadded rows) cannot pass: these files come from a second implementation.

Variants deliberately include shapes the Scala BUILDERS never emit —
top-down BMPs (negative height), 32/8bpp, palette offsets, stereo WAV,
LIST/fact chunks before data, odd-sized chunks (RIFF even padding),
C444/Cmono Y4M, per-frame parameters, non-25fps — so the parsers are
pinned as format parsers, not as inverses of one Scala builder.

    python3 tools/media_fixture.py src/test/resources/media

Deterministic output (no time/env input); the generated files are
committed so `sbt test` is self-contained.
"""
import json
import os
import struct
import sys


def bmp(width, height, bpp=24, topdown=False, palette_entries=0, pad_pixels=0):
    """Build a BI_RGB BMP. height signed; topdown stores it negative."""
    row = (width * bpp + 31) // 32 * 4
    data_offset = 14 + 40 + 4 * palette_entries
    pix = bytearray()
    for y in range(height):
        r = bytearray(row)
        for i in range(row):
            r[i] = (7 * y + 13 * i) % 256
        pix += r
    pix += bytes(pad_pixels)  # trailing slack after the pixel array
    size = data_offset + len(pix)
    h = struct.pack("<2sIHHI", b"BM", size, 0, 0, data_offset)
    dib = struct.pack("<IiiHHIIiiII", 40, width, -height if topdown else height,
                      1, bpp, 0, row * height, 2835, 2835, palette_entries, 0)
    pal = b"".join(struct.pack("<BBBB", i % 256, (i * 3) % 256, (i * 7) % 256, 0)
                   for i in range(palette_entries))
    return h + dib + pal + bytes(pix)


def wav(rate, frames, channels=1, bits=16, pre_chunks=(), post_chunks=()):
    block = channels * bits // 8
    data = bytearray()
    for i in range(frames * block):
        data.append((11 * i) % 256)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)

    def chunk(cid, payload):
        pad = b"\x00" if len(payload) % 2 else b""
        return struct.pack("<4sI", cid, len(payload)) + payload + pad

    body = b"WAVE"
    for cid, payload in pre_chunks:
        body += chunk(cid, payload)
    body += chunk(b"fmt ", fmt)
    for cid, payload in post_chunks:
        body += chunk(cid, payload)
    body += chunk(b"data", bytes(data))
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def y4m(width, height, frames, fn=25, fd=1, chroma="420", frame_params=False,
        truncate=0):
    fb = {"420": width * height * 3 // 2, "422": width * height * 2,
          "444": width * height * 3, "mono": width * height}[chroma]
    out = bytearray(f"YUV4MPEG2 W{width} H{height} F{fn}:{fd} Ip A1:1 "
                    f"C{chroma}\n".encode("ascii"))
    for f in range(frames):
        out += (f"FRAME Xcount={f}\n" if frame_params else "FRAME\n").encode()
        out += bytes((f + 3 * i) % 256 for i in range(fb))
    if truncate:
        out = out[:-truncate]
    return bytes(out)


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/media"
    os.makedirs(out_dir, exist_ok=True)
    cases = []

    def put(name, payload, expect):
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(payload)
        cases.append({"file": name, "expect": expect})

    # ---- BMP: parse must yield (width, height-magnitude, bpp) ----
    put("img_7x5_24.bmp", bmp(7, 5),
        {"format": "bmp", "width": 7, "height": 5, "bpp": 24})
    put("img_64x48_24.bmp", bmp(64, 48),
        {"format": "bmp", "width": 64, "height": 48, "bpp": 24})
    put("img_5x3_topdown.bmp", bmp(5, 3, topdown=True),
        {"format": "bmp", "width": 5, "height": 3, "bpp": 24})
    put("img_6x4_32.bmp", bmp(6, 4, bpp=32),
        {"format": "bmp", "width": 6, "height": 4, "bpp": 32})
    put("img_9x2_8pal.bmp", bmp(9, 2, bpp=8, palette_entries=256),
        {"format": "bmp", "width": 9, "height": 2, "bpp": 8})
    put("bad_truncated.bmp", bmp(16, 16)[:100], None)
    put("bad_magic.bmp", b"XX" + bmp(4, 4)[2:], None)

    # ---- WAV: parse must yield (rate, channels, bits, frames) ----
    put("snd_8000_100.wav", wav(8000, 100),
        {"format": "wav", "rate": 8000, "channels": 1, "bits": 16,
         "frames": 100})
    put("snd_44100_stereo.wav", wav(44100, 64, channels=2),
        {"format": "wav", "rate": 44100, "channels": 2, "bits": 16,
         "frames": 64})
    put("snd_list_chunk.wav",
        wav(16000, 33, pre_chunks=((b"LIST", b"INFOIART" + b"graft\x00"),)),
        {"format": "wav", "rate": 16000, "channels": 1, "bits": 16,
         "frames": 33})
    # odd-size chunk before data exercises RIFF even-padding in the walk
    put("snd_odd_chunk.wav",
        wav(22050, 10, post_chunks=((b"note", b"abc"),)),
        {"format": "wav", "rate": 22050, "channels": 1, "bits": 16,
         "frames": 10})
    put("snd_8bit.wav", wav(8000, 40, bits=8),
        {"format": "wav", "rate": 8000, "channels": 1, "bits": 8,
         "frames": 40})
    put("bad_truncated.wav", wav(8000, 100)[:80], None)
    # declared RIFF size larger than the file
    bad = bytearray(wav(8000, 4))
    struct.pack_into("<I", bad, 4, 10 ** 6)
    put("bad_riffsize.wav", bytes(bad), None)

    # ---- Y4M: parse must yield (w, h, fps num/den, frame count) ----
    put("vid_16x12_3f.y4m", y4m(16, 12, 3),
        {"format": "y4m", "width": 16, "height": 12, "fn": 25, "fd": 1,
         "frames": 3})
    put("vid_8x8_c444.y4m", y4m(8, 8, 2, fn=30, fd=1, chroma="444"),
        {"format": "y4m", "width": 8, "height": 8, "fn": 30, "fd": 1,
         "frames": 2})
    put("vid_6x4_mono.y4m", y4m(6, 4, 5, fn=24, fd=1, chroma="mono"),
        {"format": "y4m", "width": 6, "height": 4, "fn": 24, "fd": 1,
         "frames": 5})
    put("vid_frame_params.y4m", y4m(4, 4, 4, fn=30000, fd=1001,
                                    frame_params=True),
        {"format": "y4m", "width": 4, "height": 4, "fn": 30000, "fd": 1001,
         "frames": 4})
    put("vid_0frames.y4m", y4m(10, 10, 0),
        {"format": "y4m", "width": 10, "height": 10, "fn": 25, "fd": 1,
         "frames": 0})
    put("bad_truncated.y4m", y4m(16, 16, 2, truncate=5), None)
    put("bad_nodims.y4m", b"YUV4MPEG2 F25:1 Ip\nFRAME\n", None)

    put("bad_garbage.bin", bytes(range(64)), None)

    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(cases, f, indent=1)
    print(f"wrote {len(cases)} fixtures -> {out_dir}")


if __name__ == "__main__":
    main()
