"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct — the Spark-side plumbing (schema, partitioning,
Arrow batch shape, UDF signatures) is real and tested. IMAGE/VIDEO
codec work is STUBBED for compressed formats (``decode_backend=
'fake'`` is a deterministic byte-derived fake; PIL/av/cv2 are not in
this container) — but BMP image decode/resize/encode and WAV audio
decode are REAL stdlib implementations: ``image_features`` parses
actual 24-bit BMP pixels (and ``resize_images(decode_backend='real')``
resamples them), mirroring how AUDIO decode is REAL: WAV
container parsing + sample statistics via the stdlib ``wave`` module
(``audio_features``) — the synthetic corpus's audio blobs are valid
PCM WAV files.

Operators:
- ``attach_media_metadata``: sniff container type + size from magic
  bytes (pure column ops on the binary prefix).
- ``decode_features``: mapInPandas batch "decode" -> fixed-size feature
  vector per blob (the plumbing for an embedding/extract stage).
- ``audio_features``: REAL WAV decode -> (sample_rate, channels,
  frames, duration, rms, peak) per audio blob; undecodable blobs get
  ok=false rows, never task failures.
- ``resize_images`` / ``sample_frames``: same shape, different typed
  output (stub transforms), demonstrating batch-in/batch-out contracts.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("media_kind", T.StringType(), True),   # image|audio|video|unknown
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("sha", T.StringType(), True),
])

_MAGIC = [
    (b"BM", "image"),
    (b"\x89PNG", "image"),
    (b"\xff\xd8\xff", "image"),
    (b"GIF8", "image"),
    (b"RIFF", "audio"),
    (b"ID3", "audio"),
    (b"YUV4MPEG2", "video"),
    (b"\x00\x00\x00\x18ftyp", "video"),
    (b"\x1aE\xdf\xa3", "video"),
]


def attach_media_metadata(df: DataFrame, payload_col: str = "payload",
                          id_col: str = "media_id") -> DataFrame:
    """Magic-byte sniffing with built-in expressions (no Python)."""
    p = F.col(payload_col)
    kind = F.lit("unknown")
    for magic, k in reversed(_MAGIC):
        hexs = magic.hex()
        kind = F.when(F.hex(F.substring(p, 1, len(magic))) == hexs.upper(),
                      F.lit(k)).otherwise(kind)
    return df.select(
        F.col(id_col).alias("media_id"),
        p.alias("payload"),
        kind.alias("media_kind"),
        F.length(p).cast("long").alias("n_bytes"),
        F.sha2(p, 256).alias("sha"),
    )


def codec_capabilities() -> dict:
    """Which OPTIONAL codec backends are importable in this
    environment. The stdlib container codecs (WAV/BMP/Y4M) are always
    on; compressed formats (JPEG/PNG via PIL, mp4/mkv via av,
    flac/ogg via soundfile) auto-activate when their library exists —
    in this container all three are absent and the compressed paths
    honestly yield ok=false / NotImplementedError."""
    import importlib

    caps = {}
    for name, mod in (("pil", "PIL.Image"), ("av", "av"),
                      ("soundfile", "soundfile")):
        try:
            importlib.import_module(mod)
            caps[name] = True
        except Exception:  # noqa: BLE001 — absent or broken == off
            caps[name] = False
    return caps


def _pil_image_stats(blob: bytes):
    """JPEG/PNG leg of image_features, active only when PIL imports
    (worker-side probe — raises ImportError otherwise, folding into
    the ok=false row). Produces the same contract as the BMP path:
    (w, h, floor integer channel means over RGB)."""
    import io

    from PIL import Image  # noqa: F401 — capability probe by import

    im = Image.open(io.BytesIO(blob)).convert("RGB")
    w, h = im.size
    n = w * h
    sums = [0, 0, 0]
    for r, g, b in im.getdata():
        sums[0] += r
        sums[1] += g
        sums[2] += b
    return w, h, sums[0] // n, sums[1] // n, sums[2] // n


def _fake_decode(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder: sha256-expanded
    pseudo-features. Replace with a real codec on a cluster image."""
    out = []
    counter = 0
    while len(out) < dim:
        h = hashlib.sha256(payload + counter.to_bytes(4, "big")).digest()
        out.extend((b - 128) / 128.0 for b in h)
        counter += 1
    return out[:dim]


FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("media_kind", T.StringType(), True),
    T.StructField("features", T.ArrayType(T.FloatType()), True),
])


def decode_features(media: DataFrame, dim: int = 32,
                    decode_backend: str = "fake") -> DataFrame:
    """Batch decode -> feature vectors. Arrow-batched mapInPandas; the
    real backend is a stub (no codec libs in this container)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_backend == "real":
                raise NotImplementedError(
                    "real decoders (PIL/av/soundfile) not available in this "
                    "container; use decode_backend='fake'")
            feats = [
                _fake_decode(bytes(p) if p is not None else b"", dim)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_kind": pdf["media_kind"],
                "features": feats,
            })

    return media.select("media_id", "media_kind", "payload").mapInPandas(
        fn, schema=FEATURES_SCHEMA)


AUDIO_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("ok", T.BooleanType(), False),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("n_channels", T.IntegerType(), True),
    T.StructField("sample_width", T.IntegerType(), True),
    T.StructField("n_frames", T.LongType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("rms", T.IntegerType(), True),
    T.StructField("peak", T.IntegerType(), True),
])


def audio_features(media: DataFrame) -> DataFrame:
    """REAL audio decode for WAV blobs (stdlib ``wave``): container
    header (rate/channels/width/frames) + PCM sample statistics
    (RMS + peak absolute amplitude, computed over the raw frames).
    Non-audio rows are filtered upstream by media_kind; undecodable
    blobs yield ok=false rows (pipeline-safe, no task failure)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import struct
        import wave

        cols = [f.name for f in AUDIO_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                blob = bytes(p or b"")
                try:
                    with wave.open(io.BytesIO(blob), "rb") as wf:
                        rate = wf.getframerate()
                        nch = wf.getnchannels()
                        width = wf.getsampwidth()
                        nframes = wf.getnframes()
                        frames = wf.readframes(nframes)
                    if width == 2:
                        samples = struct.unpack(f"<{len(frames) // 2}h", frames)
                    elif width == 1:
                        samples = tuple(b - 128 for b in frames)
                    else:
                        raise ValueError(f"unsupported sample width {width}")
                    n = len(samples)
                    rms = int((sum(s * s for s in samples) / n) ** 0.5) if n else 0
                    peak = max((abs(s) for s in samples), default=0)
                    rows.append((int(mid), True, rate, nch, width,
                                 nframes, int(nframes * 1000 / rate) if rate else 0,
                                 rms, peak))
                except Exception:  # noqa: BLE001 — malformed blob -> ok=false
                    rows.append((int(mid), False, None, None, None,
                                 None, None, None, None))
            yield pd.DataFrame(rows, columns=cols)

    aud = media.filter(F.col("media_kind") == "audio")
    return aud.select("media_id", "payload").mapInPandas(fn, schema=AUDIO_SCHEMA)


RESIZE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("payload", T.BinaryType(), True),
])


def resize_images(media: DataFrame, width: int = 64, height: int = 64,
                  decode_backend: str = "fake") -> DataFrame:
    """Image resize. ``decode_backend='real'`` DELEGATES to
    :func:`resize_bmp_images` (one real BMP-resample implementation in
    this module — including its eager geometry validation) and adapts
    to this function's legacy schema: null payload for formats whose
    codecs aren't in the container (JPEG/PNG). ``'fake'`` emits the
    deterministic sha-derived stub payload for every image row."""
    if decode_backend == "real":
        out = resize_bmp_images(media, width, height)
        return out.select(
            "media_id",
            F.lit(width).alias("width"), F.lit(height).alias("height"),
            F.when(F.col("ok"), F.col("payload")).alias("payload"))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = [
                hashlib.sha256(bytes(p or b"") + b"resize").digest()[: width * height // 128]
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": width, "height": height,
                "payload": thumbs,
            })

    img = media.filter(F.col("media_kind") == "image")
    return img.select("media_id", "payload").mapInPandas(fn, schema=RESIZE_SCHEMA)


FRAMES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("frame_sha", T.StringType(), True),
])


def sample_frames(media: DataFrame, every_n: int = 10,
                  max_frames: int = 4, decode_backend: str = "fake") -> DataFrame:
    """Frame-sampling stub for video blobs: one output row per sampled
    frame (demonstrates the 1->N batch contract)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_backend == "real":
                raise NotImplementedError("real frame decode not available")
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                blob = bytes(p or b"")
                for i in range(max_frames):
                    fsha = hashlib.sha256(
                        blob + (i * every_n).to_bytes(4, "big")).hexdigest()
                    rows.append((mid, i * every_n, fsha))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_sha"])

    vid = media.filter(F.col("media_kind") == "video")
    return vid.select("media_id", "payload").mapInPandas(fn, schema=FRAMES_SCHEMA)


DECIMATED_AUDIO_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("ok", T.BooleanType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("media_kind", T.StringType(), False),
])


def decimate_wav(media: DataFrame, factor: int = 2) -> DataFrame:
    """REAL audio downsampling for PCM WAV blobs: keep every
    ``factor``-th sample AND divide the sample rate by ``factor``
    (duration preserved), RE-ENCODING a valid WAV — the audio leg of
    the decode->transform->encode round-trip family
    (sample_video_frames / resize_bmp_images). The training-data use:
    normalize a crawled audio corpus to one sample rate before
    feature extraction. Plain decimation (no anti-alias filter) is
    the deterministic, oracle-able baseline; a real pipeline would
    low-pass first — that coefficient choice doesn't change the
    Spark-side shape. Compressed audio (mp3 etc.) yields ok=false.

    ``factor`` must divide the blob's sample rate (out rate =
    rate // factor; a non-dividing rate would silently drift the
    duration since kept-frame count rounds UP while the rate rounds
    DOWN) — non-dividing blobs come back ok=false. The factor itself
    is validated eagerly driver-side: a bad parameter must raise at
    call time, never be swallowed row-by-row into all-ok=false."""
    if not isinstance(factor, int) or factor < 1:
        raise ValueError(f"decimate_wav: factor must be an int >= 1, "
                         f"got {factor!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import struct
        import wave

        cols = [f.name for f in DECIMATED_AUDIO_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    with wave.open(io.BytesIO(bytes(p or b"")), "rb") as wf:
                        rate = wf.getframerate()
                        nch = wf.getnchannels()
                        width = wf.getsampwidth()
                        frames = wf.readframes(wf.getnframes())
                    if width != 2 or nch != 1:
                        raise ValueError("decimate: 16-bit mono only")
                    if rate % factor != 0:
                        raise ValueError("decimate: factor must divide rate")
                    samples = struct.unpack(f"<{len(frames) // 2}h", frames)
                    kept = samples[::factor]
                    buf = io.BytesIO()
                    with wave.open(buf, "wb") as out:
                        out.setnchannels(1)
                        out.setsampwidth(2)
                        out.setframerate(rate // factor)
                        out.writeframes(
                            struct.pack(f"<{len(kept)}h", *kept))
                    rows.append((int(mid), True, buf.getvalue(), "audio"))
                except Exception:  # noqa: BLE001 — undecodable -> ok=false
                    rows.append((int(mid), False, None, "audio"))
            yield pd.DataFrame(rows, columns=cols)

    aud = media.filter(F.col("media_kind") == "audio")
    return aud.select("media_id", "payload").mapInPandas(
        fn, schema=DECIMATED_AUDIO_SCHEMA)


def synth_wav(i: int, rate: int = 8000) -> bytes:
    """A VALID deterministic PCM WAV blob (mono, 16-bit): triangle-ish
    samples, frame count varying with the id — parsed for real by
    ``audio_features``."""
    import io
    import struct
    import wave

    n_frames = 200 + (i % 7) * 100
    samples = [((i * 37 + j * 13) % 2048) - 1024 for j in range(n_frames)]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(struct.pack(f"<{n_frames}h", *samples))
    return buf.getvalue()


def synth_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic media corpus: cycles through PNG/JPEG-style magic
    prefixes with sha-derived bodies, VALID WAV audio blobs (real
    decode path), MP4-style prefixes and junk."""
    prefixes = [b"\x89PNG\r\n", b"\xff\xd8\xff\xe0", None,  # None -> real WAV
                b"\x00\x00\x00\x18ftypmp42", b"junk"]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                if i % len(prefixes) == 2:
                    payload = synth_wav(i)
                else:
                    body = hashlib.sha256(f"media:{i}".encode()).digest() * (1 + i % 4)
                    payload = prefixes[i % len(prefixes)] + body
                rows.append((i, payload))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    base = spark.range(n)
    raw = base.mapInPandas(gen, schema="media_id long, payload binary")
    return attach_media_metadata(raw)


# ---------------------------------------------------------------------------
# REAL image decode: BMP (uncompressed 24-bit) — like WAV for audio,
# the one image container a stdlib-only environment can honestly
# decode, resize, and re-encode. JPEG/PNG stay behind the declared
# codec stubs (no PIL/cv2 in this container).

def encode_bmp(width: int, height: int, pixels: list) -> bytes:
    """Encode rows of (r, g, b) tuples (row 0 = TOP) as a valid
    uncompressed 24-bit BITMAPINFOHEADER BMP (bottom-up, 4-byte row
    padding)."""
    import struct

    row_bytes = width * 3
    pad = (4 - row_bytes % 4) % 4
    img_size = (row_bytes + pad) * height
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       img_size, 2835, 2835, 0, 0)
    body = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up storage
        for x in range(width):
            r, g, b = pixels[y][x]
            body += bytes((b, g, r))
        body += b"\x00" * pad
    return header + info + bytes(body)


def decode_bmp(blob: bytes):
    """Parse an uncompressed 24-bit BMP -> (width, height, rows of
    (r, g, b), row 0 = TOP). Raises ValueError on anything else."""
    import struct

    if len(blob) < 54 or blob[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", blob, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", blob, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", blob, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0 or h == 0:
        raise ValueError("unsupported BMP variant")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    if len(blob) < data_off + (row_bytes + pad) * h:
        raise ValueError("truncated BMP")
    rows = []
    for ry in range(h):
        off = data_off + ry * (row_bytes + pad)
        row = [(blob[off + 3 * x + 2], blob[off + 3 * x + 1],
                blob[off + 3 * x]) for x in range(w)]
        rows.append(row)
    if bottom_up:
        rows.reverse()
    return w, h, rows


def resize_bmp(blob: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor BMP resize (real pixels in, real pixels out)."""
    w, h, rows = decode_bmp(blob)
    out = [[rows[y * h // height][x * w // width] for x in range(width)]
           for y in range(height)]
    return encode_bmp(width, height, out)


IMAGE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("ok", T.BooleanType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("mean_r", T.IntegerType(), True),
    T.StructField("mean_g", T.IntegerType(), True),
    T.StructField("mean_b", T.IntegerType(), True),
])


def image_features(media: DataFrame) -> DataFrame:
    """REAL image decode for BMP blobs: container header (dimensions)
    + per-channel integer pixel means (floor(sum/count) — exact, so
    the driver oracle re-derives them analytically). JPEG/PNG blobs
    auto-activate the PIL leg when the library exists (same integer-
    means contract; see codec_capabilities); without it they yield
    ok=false rows, never task failures: the same honest split as
    audio_features vs compressed audio."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in IMAGE_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                blob = bytes(p or b"")
                try:
                    w, h, px = decode_bmp(blob)
                    n = w * h
                    sums = [0, 0, 0]
                    for row in px:
                        for r, g, b in row:
                            sums[0] += r
                            sums[1] += g
                            sums[2] += b
                    rows.append((int(mid), True, w, h,
                                 sums[0] // n, sums[1] // n, sums[2] // n))
                except Exception:  # noqa: BLE001 — not a BMP
                    try:  # compressed leg: only if PIL imports worker-side
                        w, h, mr, mg, mb = _pil_image_stats(blob)
                        rows.append((int(mid), True, w, h, mr, mg, mb))
                    except Exception:  # noqa: BLE001 — no codec -> ok=false
                        rows.append((int(mid), False, None, None,
                                     None, None, None))
            yield pd.DataFrame(rows, columns=cols)

    img = media.filter(F.col("media_kind") == "image")
    return img.select("media_id", "payload").mapInPandas(fn, schema=IMAGE_SCHEMA)


RESIZED_IMAGE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("ok", T.BooleanType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("media_kind", T.StringType(), False),
])


def resize_bmp_images(media: DataFrame, width: int,
                      height: int) -> DataFrame:
    """REAL distributed image resize for BMP blobs: decode ->
    nearest-neighbor resample -> RE-ENCODE a valid BMP, so the output
    payload feeds any downstream image op (image_features over it is
    the driver-verified path — the image analog of
    sample_video_frames). The training-data use: normalize a crawled
    image corpus to a fixed input geometry before feature extraction.
    Non-BMP blobs (JPEG/PNG — no codecs here) yield ok=false. Target
    geometry is validated eagerly driver-side (a bad parameter must
    raise at call time, not be swallowed per-row into ok=false)."""
    if not (isinstance(width, int) and isinstance(height, int)
            and width >= 1 and height >= 1):
        raise ValueError(f"resize_bmp_images: width/height must be ints "
                         f">= 1, got {width!r}x{height!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in RESIZED_IMAGE_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    blob = resize_bmp(bytes(p or b""), width, height)
                    rows.append((int(mid), True, blob, "image"))
                except Exception:  # noqa: BLE001 — non-BMP -> ok=false
                    rows.append((int(mid), False, None, "image"))
            yield pd.DataFrame(rows, columns=cols)

    img = media.filter(F.col("media_kind") == "image")
    return img.select("media_id", "payload").mapInPandas(
        fn, schema=RESIZED_IMAGE_SCHEMA)


def synth_bmp(i: int) -> bytes:
    """A VALID deterministic 24-bit BMP whose pixels are a pure
    function of (i, x, y) — decoded for real by image_features and the
    DuckDB oracle re-derives the channel means analytically."""
    w, h = 4 + (i % 5), 3 + (i % 4)
    rows = [[((i * 5 + x * 23 + y * 31) % 256,
              (i * 11 + x * 3 + y * 17) % 256,
              (i * 7 + x * 13 + y * 29) % 256)
             for x in range(w)] for y in range(h)]
    return encode_bmp(w, h, rows)


# ---------------------------------------------------------------------------
# REAL video decode: Y4M (YUV4MPEG2) — the standard UNCOMPRESSED video
# container (plain-text header + raw 4:2:0 planes per FRAME marker),
# parseable without codec libs; the video analog of WAV/BMP above.
# Compressed video (mp4/mkv) stays behind the declared stubs.

def encode_y4m(width: int, height: int, frames: list) -> bytes:
    """Encode luma planes (list of row-major Y byte lists, one per
    frame) as Y4M 4:2:0 with neutral chroma."""
    out = bytearray(f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C420\n"
                    .encode("ascii"))
    cw, ch = width // 2, height // 2
    for y_plane in frames:
        out += b"FRAME\n"
        out += bytes(y_plane)
        out += bytes([128]) * (cw * ch) * 2  # neutral U and V
    return bytes(out)


def decode_y4m(blob: bytes):
    """Parse Y4M 4:2:0 -> (width, height, [luma planes as bytes]).
    Raises ValueError on anything that isn't plain Y4M 420."""
    nl = blob.find(b"\n")
    if nl < 0 or not blob.startswith(b"YUV4MPEG2"):
        raise ValueError("not a Y4M stream")
    w = h = None
    colorspace = "C420"
    for tok in blob[:nl].split()[1:]:
        t = tok.decode("ascii", errors="replace")
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("C"):
            colorspace = t
    if not w or not h or w % 2 or h % 2:
        raise ValueError("bad Y4M geometry")
    if not colorspace.startswith("C420"):
        raise ValueError(f"unsupported colorspace {colorspace}")
    frame_bytes = w * h + 2 * (w // 2) * (h // 2)
    frames = []
    pos = nl + 1
    while pos < len(blob):
        fnl = blob.find(b"\n", pos)
        if fnl < 0 or not blob[pos:fnl].startswith(b"FRAME"):
            raise ValueError("bad FRAME marker")
        start = fnl + 1
        if start + frame_bytes > len(blob):
            raise ValueError("truncated frame")
        frames.append(blob[start:start + w * h])  # luma plane only
        pos = start + frame_bytes
    return w, h, frames


VIDEO_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("ok", T.BooleanType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("frame_idx", T.IntegerType(), True),
    T.StructField("mean_y", T.IntegerType(), True),
])


def video_features(media: DataFrame) -> DataFrame:
    """REAL video decode for Y4M blobs: one row per frame with the
    integer mean luma (floor(sum/n) — analytically oracle-able).
    Non-Y4M video blobs (mp4/mkv — codecs not in this container)
    yield a single ok=false row. Demonstrates the 1->N frame-expand
    batch contract with real pixels."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in VIDEO_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, frames = decode_y4m(bytes(p or b""))
                    for fi, y_plane in enumerate(frames):
                        rows.append((int(mid), True, w, h, fi,
                                     sum(y_plane) // (w * h)))
                except Exception:  # noqa: BLE001 — non-Y4M -> ok=false
                    rows.append((int(mid), False, None, None, None, None))
            yield pd.DataFrame(rows, columns=cols)

    vid = media.filter(F.col("media_kind") == "video")
    return vid.select("media_id", "payload").mapInPandas(fn, schema=VIDEO_SCHEMA)


SAMPLED_VIDEO_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("ok", T.BooleanType(), False),
    T.StructField("n_frames_in", T.IntegerType(), True),
    T.StructField("n_frames_kept", T.IntegerType(), True),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("media_kind", T.StringType(), False),
])


def sample_video_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL frame sampling for Y4M blobs: decode, keep every
    ``every_n``-th frame (0, n, 2n, ...), RE-ENCODE as a valid Y4M
    stream — the output payload is itself decodable, so samplers
    compose with every downstream video op (``video_features`` over
    the sampled payload is the driver-verified path). The training-
    data use: frame-sample a video corpus before expensive per-frame
    feature extraction, cutting decode+compute by ~every_n while
    keeping temporal coverage.

    Non-Y4M blobs (mp4/mkv — no codecs in this container) yield
    ok=false with a null payload, same contract as video_features.
    ``every_n`` is validated eagerly driver-side (a bad parameter must
    raise at call time, not be swallowed per-row into ok=false)."""
    if not isinstance(every_n, int) or every_n < 1:
        raise ValueError(f"sample_video_frames: every_n must be an int "
                         f">= 1, got {every_n!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in SAMPLED_VIDEO_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, frames = decode_y4m(bytes(p or b""))
                    kept = frames[::every_n]
                    blob = encode_y4m(w, h, [list(f) for f in kept])
                    rows.append((int(mid), True, len(frames), len(kept),
                                 blob, "video"))
                except Exception:  # noqa: BLE001 — non-Y4M -> ok=false
                    rows.append((int(mid), False, None, None, None, "video"))
            yield pd.DataFrame(rows, columns=cols)

    vid = media.filter(F.col("media_kind") == "video")
    return vid.select("media_id", "payload").mapInPandas(
        fn, schema=SAMPLED_VIDEO_SCHEMA)


def synth_y4m(i: int) -> bytes:
    """A VALID deterministic Y4M blob: luma[f][y][x] =
    (i*7 + f*31 + y*13 + x*5) % 256 over w=4+(i%3)*2, h=4+(i%2)*2,
    2+(i%3) frames — decoded for real by video_features, means
    re-derived analytically by the DuckDB oracle."""
    w, h = 4 + (i % 3) * 2, 4 + (i % 2) * 2
    frames = [
        [(i * 7 + f * 31 + y * 13 + x * 5) % 256
         for y in range(h) for x in range(w)]
        for f in range(2 + (i % 3))
    ]
    return encode_y4m(w, h, frames)
