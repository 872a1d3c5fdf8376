"""Multimodal columns: opaque `binary` payloads + typed metadata.

Web-scale corpora carry image/audio/video alongside text. The Spark-side
contract: payloads stay opaque `binary` columns; metadata (size, sniffed
container type) is JVM-side column algebra; decode / feature-extract /
resize / frame-sample run as Arrow-batched `mapInPandas` with REAL
schemas, partitioning, and batch shapes.

Codecs: BMP (24-bit), PPM (P6), and WAV (PCM16) are decoded NATIVELY
here — dependency-free parsers of the public container formats — so the
decode/feature stage is a real, oracle-checked pipeline component.
Compressed containers (JPEG/PNG/FLAC/WEBM) raise NotImplementedError:
that call site is where PIL/ffmpeg plug in (not installed in this
environment); nothing else changes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# magic-byte prefixes → container kind (hex, uppercase as Spark's hex())
MAGIC_PREFIXES = [
    ("89504E47", "png"),
    ("FFD8FF", "jpeg"),
    ("47494638", "gif"),
    ("52494646", "riff"),  # wav/webp/avi share RIFF
    ("664C6143", "flac"),
    ("1A45DFA3", "webm"),
]


def binary_meta(
    df: DataFrame, bin_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_bytes, magic_hex, kind) — metadata without touching Python."""
    magic = F.upper(F.hex(F.expr(f"substring({bin_col}, 1, 4)")))
    kind = F.lit("unknown")
    for prefix, name in reversed(MAGIC_PREFIXES):
        kind = F.when(magic.startswith(prefix), F.lit(name)).otherwise(kind)
    return df.select(
        F.col(id_col).alias("id"),
        F.expr(f"octet_length({bin_col})").alias("n_bytes"),
        magic.alias("magic_hex"),
        kind.alias("kind"),
    )


# ---------------------------------------------------------------------------
# Real, dependency-free codecs for the uncompressed container formats
# (BMP 24-bit, PPM P6, WAV PCM16). These are pure public-format parsers —
# enough to make decode/feature-extract a first-class, oracle-checked
# pipeline stage without image/audio libraries. Compressed formats
# (JPEG/PNG/FLAC...) still raise: that is where PIL/ffmpeg would plug in.


def write_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Encode an uncompressed 24-bit bottom-up BMP (BITMAPINFOHEADER).
    `rgb` is row-major top-down RGB, len == width*height*3."""
    import struct

    stride = ((width * 3 + 3) // 4) * 4
    img_size = stride * height
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = []
    pad = b"\x00" * (stride - width * 3)
    for y in range(height - 1, -1, -1):  # bottom-up
        row = rgb[y * width * 3 : (y + 1) * width * 3]
        # RGB → BGR per pixel
        r = np.frombuffer(row, dtype=np.uint8).reshape(width, 3)[:, ::-1]
        rows.append(r.tobytes() + pad)
    return header + info + b"".join(rows)


def decode_bmp(payload: bytes):
    """Decode an uncompressed 24-bit BMP → (w, h, 3, uint8 RGB array
    row-major top-down). Raises ValueError on unsupported variants."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, width, height = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    comp = struct.unpack_from("<I", payload, 30)[0]
    if hdr_size < 40 or bpp != 24 or comp != 0:
        raise ValueError("unsupported BMP variant")
    bottom_up = height > 0
    height = abs(height)
    stride = ((width * 3 + 3) // 4) * 4
    data = np.frombuffer(payload, dtype=np.uint8, count=stride * height, offset=off)
    rows = data.reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        rows = rows[::-1]
    return width, height, 3, rows[:, :, ::-1].reshape(-1)  # BGR → RGB, flat


def write_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Encode a binary PPM (P6, maxval 255)."""
    return f"P6\n{width} {height}\n255\n".encode() + rgb


def decode_ppm(payload: bytes):
    """Decode a binary PPM (P6) → (w, h, 3, uint8 RGB flat array)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header: magic, width, height, maxval — whitespace separated, then
    # exactly one whitespace byte before the raster
    fields: list[bytes] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment line
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(payload[i:j])
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = (int(x) for x in fields)
    if maxval != 255:
        raise ValueError("unsupported PPM maxval")
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    return w, h, 3, arr


def write_wav(samples, sample_rate: int = 16000, channels: int = 1) -> bytes:
    """Encode PCM16 WAV from an int16 numpy array (interleaved)."""
    import struct

    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * channels * 2, channels * 2, 16,
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav(payload: bytes):
    """Decode PCM16 WAV → (channels, sample_rate, int16 numpy array)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        sz = struct.unpack_from("<I", payload, i + 4)[0]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", payload, i + 8)
        elif cid == b"data":
            data = payload[i + 8 : i + 8 + sz]
        i += 8 + sz + (sz & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _br, _ba, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError("unsupported WAV encoding")
    return channels, rate, np.frombuffer(data, dtype="<i2")


# ---------------------------------------------------------------------------
# RIFF/AVI: a real, dependency-free demuxer for uncompressed ('DIB ')
# AVI — the public container format (RIFF 'AVI ' → LIST hdrl [avih +
# LIST strl [strh + strf]] → LIST movi ['00db' DIB frames] → idx1).
# Frames are the same bottom-up padded-stride BGR raster BMP uses, so
# the frame decode shares decode_bmp's core. Compressed codecs inside
# AVI ('00dc' with non-DIB strf) still raise — that is the ffmpeg plug
# point; the CONTAINER walk below is complete.


def _dib_decode(frame: bytes, width: int, height: int) -> np.ndarray:
    """Bottom-up 24-bit DIB raster → flat top-down RGB uint8 array
    (the BMP pixel-array layout without the BMP file headers)."""
    stride = ((width * 3 + 3) // 4) * 4
    data = np.frombuffer(frame, dtype=np.uint8, count=stride * height)
    rows = data.reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
    return rows[::-1][:, :, ::-1].reshape(-1)


def _dib_encode(width: int, height: int, rgb: bytes) -> bytes:
    """Flat top-down RGB → bottom-up padded-stride BGR DIB raster."""
    stride = ((width * 3 + 3) // 4) * 4
    pad = b"\x00" * (stride - width * 3)
    rows = []
    for y in range(height - 1, -1, -1):
        row = rgb[y * width * 3 : (y + 1) * width * 3]
        r = np.frombuffer(row, dtype=np.uint8).reshape(width, 3)[:, ::-1]
        rows.append(r.tobytes() + pad)
    return b"".join(rows)


def write_avi(frames, width: int, height: int, fps: int = 30) -> bytes:
    """Encode an uncompressed AVI: each frame is flat top-down RGB bytes
    of length width*height*3, stored as a '00db' DIB chunk, with an
    idx1 index. Minimal but spec-complete for single-video-stream DIB."""
    import struct

    stride = ((width * 3 + 3) // 4) * 4
    fsz = stride * height
    n = len(frames)
    # MainAVIHeader (56 bytes)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // max(fps, 1),  # dwMicroSecPerFrame
        fsz * fps,                 # dwMaxBytesPerSec
        0, 0x10,                   # padding, AVIF_HASINDEX
        n, 0, 1, fsz, width, height, 0, 0, 0, 0,
    )
    # AVIStreamHeader (56 bytes) — fccType 'vids', handler 'DIB '
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n, fsz, 0xFFFFFFFF, 0,
        0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, fsz, 2835, 2835, 0, 0
    )

    def chunk(cid: bytes, data: bytes) -> bytes:
        return cid + struct.pack("<I", len(data)) + data + (
            b"\x00" if len(data) & 1 else b""
        )

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi_frames = b"".join(chunk(b"00db", _dib_encode(width, height, f))
                           for f in frames)
    movi = lst(b"movi", movi_frames)
    # idx1 offsets are relative to the 'movi' fourcc position + 4
    idx_entries = []
    off = 4
    for _ in range(n):
        idx_entries.append(struct.pack("<4sIII", b"00db", 0x10, off, fsz))
        off += 8 + fsz + (fsz & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def demux_avi(payload: bytes):
    """Walk a RIFF/AVI container → (width, height,
    [(frame_idx, data_offset, data_size)]) for the video '00db'/'00dc'
    chunks inside LIST movi. Offsets are absolute byte positions of the
    frame DATA in the payload — the frame-sampling contract. Raises
    ValueError when the container is not AVI."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    width = height = None
    frames: list[tuple[int, int, int]] = []

    def walk(start: int, end: int) -> None:
        nonlocal width, height
        i = start
        while i + 8 <= end:
            cid = payload[i : i + 4]
            sz = struct.unpack_from("<I", payload, i + 4)[0]
            data0 = i + 8
            if cid == b"LIST":
                walk(data0 + 4, data0 + sz)
            elif cid == b"avih":
                width, height = struct.unpack_from("<II", payload, data0 + 32)
            elif cid[2:4] in (b"db", b"dc") and cid[:2].isdigit():
                frames.append((len(frames), data0, sz))
            i = data0 + sz + (sz & 1)

    walk(12, len(payload))
    if width is None:
        raise ValueError("AVI without avih header")
    return width, height, frames


def decode_avi_frames(payload: bytes):
    """(width, height, [flat top-down RGB arrays]) — demux + DIB-decode
    every frame (uncompressed '##db' chunks from any stream number;
    compressed '##dc' raises)."""
    w, h, frames = demux_avi(payload)
    out = []
    for idx, off, sz in frames:
        if payload[off - 6 : off - 4] != b"db":
            raise NotImplementedError("compressed AVI stream needs ffmpeg")
        out.append(_dib_decode(payload[off : off + sz], w, h))
    return w, h, out


def synth_avi(doc_id: int) -> bytes:
    """Deterministic test video: (1 + id%13) × (1 + id%7), 1 + id%4
    frames; frame k's flat RGB bytes are (id + k + j) % 256. The
    header layout is fixed-size, so frame k's data offset has the
    closed form 232 + k·(8 + stride·h) — the mm_frame_sample_avi
    oracle recomputes it in SQL."""
    w = 1 + doc_id % 13
    h = 1 + doc_id % 7
    n = 1 + doc_id % 4
    frames = [
        ((doc_id + k + np.arange(w * h * 3)) % 256).astype(np.uint8).tobytes()
        for k in range(n)
    ]
    return write_avi(frames, w, h)


def synth_bmp(doc_id: int) -> bytes:
    """Deterministic test image: a (1 + id%31) × (1 + id%17) 24-bit BMP
    whose flat RGB bytes are (doc_id + k) % 256 — closed-form oracle:
    pixel-byte sum = S(seed+n) − S(seed), S(m) = (m//256)·32640 +
    (m%256)(m%256−1)/2."""
    w = 1 + doc_id % 31
    h = 1 + doc_id % 17
    n = w * h * 3
    pix = ((doc_id % 256 + np.arange(n)) % 256).astype(np.uint8).tobytes()
    return write_bmp(w, h, pix)


def decode_image(payload: bytes, fake: bool = False):
    """Container dispatch → (w, h, channels, uint8 flat pixel array).

    Real decode for BMP and PPM; other containers raise unless
    fake=True requests the deterministic test double (the plug point
    for PIL/ffmpeg on compressed formats)."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if fake:
        n = len(payload)
        w = 1 + n % 64
        h = 1 + (n // 64) % 64
        arr = np.frombuffer(
            payload[: w * h * 3].ljust(w * h * 3, b"\0"), dtype=np.uint8
        )
        return w, h, 3, arr
    raise NotImplementedError(
        "no codec for this container in this environment (BMP/PPM/WAV "
        "decode natively; JPEG/PNG need an image library)"
    )


def decode_features(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    feature_dim: int = 16,
    fake: bool = False,
) -> DataFrame:
    """Decode + feature-extract:
    (id, width, height, channels, pix_sum, features).

    Arrow-batched mapInPandas over the REAL decoders (decode_image —
    BMP/PPM native); pix_sum is the exact integer sum of decoded pixel
    bytes (oracle-comparable), features = per-stripe means of the
    normalized pixel array, length `feature_dim` (a stand-in for an
    embedding model forward pass — same batch shape, same schema).
    """
    schema = (
        "id long, width int, height int, channels int, pix_sum long, "
        "features array<float>"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, cs, sums, feats = [], [], [], [], [], []
            for i, payload in zip(pdf[id_col], pdf[bin_col]):
                w, h, c, arr = decode_image(bytes(payload), fake)
                sums.append(int(arr.astype(np.int64).sum()))
                stripes = np.array_split(arr.astype(np.float32) / 255.0, feature_dim)
                feats.append(
                    [float(s.mean()) if len(s) else 0.0 for s in stripes]
                )
                ids.append(i)
                ws.append(w)
                hs.append(h)
                cs.append(c)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "width": ws,
                    "height": hs,
                    "channels": cs,
                    "pix_sum": sums,
                    "features": feats,
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema=schema)


def frame_sample(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    every_n_bytes: int = 1024,
    fake: bool = False,
    every_n_frames: int = 1,
) -> DataFrame:
    """Video frame-sampling: (id, frame_idx, frame_offset).

    fake=False demuxes REAL RIFF/AVI containers (demux_avi — the native
    chunk walk) and emits every every_n_frames-th video frame with its
    actual byte offset in the payload; non-AVI payloads raise inside the
    task (compressed containers are ffmpeg's job). fake=True keeps the
    deterministic byte-block double (one 'frame' per every_n_bytes) for
    shape/plumbing tests and the legacy oracle.
    """
    if fake:
        return (
            df.select(
                F.col(id_col).alias("id"),
                F.expr(f"octet_length({bin_col})").alias("_nb"),
            )
            .select(
                "id",
                F.posexplode(
                    F.expr(
                        f"sequence(0, greatest(cast(_nb/{every_n_bytes} as int)-1, 0))"
                    )
                ).alias("frame_idx", "frame_offset_block"),
            )
            .withColumn("frame_offset", F.col("frame_offset_block") * every_n_bytes)
            .drop("frame_offset_block")
        )

    step = max(int(every_n_frames), 1)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs = [], [], []
            for i, payload in zip(pdf[id_col], pdf[bin_col]):
                _w, _h, frames = demux_avi(bytes(payload))
                for fidx, off, _sz in frames[::step]:
                    ids.append(i)
                    idxs.append(fidx)
                    offs.append(off)
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_offset": pd.Series(offs, dtype="int64"),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(
        run, schema="id long, frame_idx long, frame_offset long"
    )
