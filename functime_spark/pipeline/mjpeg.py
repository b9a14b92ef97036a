"""Motion-JPEG AVI reader/writer (pure Python + the vendored baseline
JPEG codec) — a REAL in-container video path for the multimodal seam.

Video in training pipelines is a container (RIFF/AVI here) wrapping
per-frame compressed images; MJPEG is the degenerate-but-real codec
whose frames are ordinary baseline JPEGs, so the vendored T.81 codec
(pipeline/jpeg.py) covers the payload and this module only speaks
RIFF: `encode_mjpeg_avi` writes a standards-shaped AVI ('avih' +
'strl'/'strh'/'strf' headers, 'movi' chunk list, 'idx1' index) and
`decode_mjpeg_avi` walks any AVI's chunks, collects the '00dc'/'00db'
frame payloads, and JPEG-decodes them (optionally every Nth frame —
the frame-sampling access pattern, which never decodes skipped
frames).

Inter-frame codecs (H.264 etc.) remain behind the external-lib seam;
this proves the container-parse + per-frame-decode plumbing with a
format real tools (ffmpeg, OpenCV) also produce and consume.
"""

from __future__ import annotations

import struct

import numpy as np

from functime_spark.pipeline.jpeg import decode_jpeg, encode_jpeg


def encode_mjpeg_avi(
    frames: list,
    fps: int = 10,
    quality: int = 85,
    subsample: str = "420",
) -> bytes:
    """Encode HxWx3 (or HxW gray) uint8 frames as an MJPEG AVI."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = np.asarray(frames[0]).shape[:2]
    payloads = []
    for f in frames:
        f = np.asarray(f)
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share one size")
        payloads.append(encode_jpeg(f, quality=quality, subsample=subsample))

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def lst(fourcc: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", fourcc + data)

    n = len(payloads)
    max_sz = max(len(p) for p in payloads)
    # avih: usec/frame, maxbytes/sec, pad, flags(HASINDEX), frames,
    # initial, streams, bufsize, w, h, reserved[4]
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, max_sz * fps, 0, 0x10, n, 0, 1, max_sz, w, h,
        0, 0, 0, 0,
    )
    # strh: 'vids'/'MJPG', flags, prio+lang, initial, scale, rate,
    # start, length, bufsize, quality, samplesize, rcFrame
    strh = struct.pack(
        "<4s4sIIIIIIIIII4H",
        b"vids", b"MJPG", 0, 0, 0, 1, fps, 0, n, max_sz, 0xFFFFFFFF, 0,
        0, 0, w, h,
    )
    # strf: BITMAPINFOHEADER with biCompression='MJPG'
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_chunks = [chunk(b"00dc", p) for p in payloads]
    movi = lst(b"movi", b"".join(movi_chunks))
    # idx1: fourcc, flags(KEYFRAME), offset (from 'movi' fourcc), size
    off = 4
    idx = b""
    for p, c in zip(payloads, movi_chunks):
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(p))
        off += len(c)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_mjpeg_avi(payload: bytes, every_n: int = 1) -> dict:
    """Decode an MJPEG AVI: returns {"frames": [HxW[x3] uint8, ...],
    "width", "height", "fps", "n_frames"} with only every `every_n`-th
    frame DECODED (skipped frames are never JPEG-decoded — the cheap
    frame-sampling path); n_frames counts all frames in the file."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload (bad RIFF/AVI magic)")
    fps = 0
    w = h = 0

    frames_raw: list = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal fps, w, h
        while pos + 8 <= end:
            fourcc = buf[pos:pos + 4]
            size = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
            data_start = pos + 8
            if fourcc == b"LIST":
                walk(buf, data_start + 4, data_start + size)
            elif fourcc == b"avih":
                usec = struct.unpack("<I", buf[data_start:data_start + 4])[0]
                fps = round(1_000_000 / usec) if usec else 0
            elif fourcc == b"strf":
                _, bw, bh = struct.unpack(
                    "<Iii", buf[data_start:data_start + 12]
                )
                w, h = bw, abs(bh)
            elif fourcc[2:4] in (b"dc", b"db"):
                frames_raw.append(buf[data_start:data_start + size])
            pos = data_start + size + (size % 2)

    walk(payload, 12, len(payload))
    if not frames_raw:
        raise ValueError("AVI contains no video frame chunks")
    every_n = max(1, int(every_n))
    frames = [
        decode_jpeg(frames_raw[i])["array"]
        for i in range(0, len(frames_raw), every_n)
    ]
    if not (w and h):
        h, w = frames[0].shape[:2]
    return {
        "frames": frames,
        "width": w,
        "height": h,
        "fps": fps,
        "n_frames": len(frames_raw),
    }


def decode_mjpeg_first_frame(payload: bytes) -> dict:
    """Decoder-seam adapter (bytes -> {"array", ...}): the first frame
    as the representative array, video metadata alongside — what
    extract_features_media pools when decoder='mjpeg'."""
    d = decode_mjpeg_avi(payload, every_n=1_000_000_000)
    return {
        "array": d["frames"][0],
        "width": d["width"],
        "height": d["height"],
        "fps": d["fps"],
        "n_frames": d["n_frames"],
        "mode": "video",
    }
