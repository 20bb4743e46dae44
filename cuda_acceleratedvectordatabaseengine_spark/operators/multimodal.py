"""Multimodal asset pipeline: opaque binary payload columns with typed
metadata, decoded/featurized via Arrow-batched ``mapInPandas``.

The reference has no multimodal surface at all (its only payload is the
float vector, proto/vdb.proto:10-13); this is part of the LLM-pipeline
extension. The design treats image/audio/video exactly the way a 100 TB
training-data pipeline must:

- payloads are opaque ``binary`` columns — never strings, never driver-side;
- typed metadata rides in a ``map<string,string>`` column so partition
  pruning and filtering happen on cheap scalar columns (``kind``), not on
  the blob;
- decode/feature-extract runs inside ``mapInPandas`` so blobs stream
  through executors in Arrow batches and never concentrate on the driver;
- the DECODE step itself is pluggable. Real codecs (PIL / soundfile /
  ffmpeg) are not in this container, so the default decoder is a
  clearly-marked DETERMINISTIC FAKE that folds raw payload bytes into a
  numeric signal. The Spark-side plumbing — schema, batch shape, UDF
  signature, partitioning — is real and is what the tests pin down. Swap
  ``decoder=`` with a real codec function in production.

The extracted features are ordinary ``array<float>`` embedding columns, so
everything downstream (exact k-NN, IVF, PQ, near-dup) composes unchanged —
that composition is the point of the module.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

KINDS = ("image", "audio", "video")

# {asset_id, kind, payload, meta}: the multimodal ingest schema.
ASSETS = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# {asset_id, kind, feature}: featurization output — an embedding table.
FEATURES = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType(), containsNull=False), False),
    ]
)


def documents_as_assets(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic adapter: the driver's ``documents`` table re-expressed
    as a binary-asset table (payload = UTF-8 bytes of the text, kind cycling
    by ``doc_id % 3``). Exists so the multimodal plumbing is exercised on
    driver-generated data instead of hand-rolled fixtures."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int")).alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.create_map(
            F.lit("lang"), F.col("lang"),
            F.lit("source"), F.col("source"),
            F.lit("n_chars"), F.col("n_chars").cast("string"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# Decode step (the pluggable boundary)
# ---------------------------------------------------------------------------


def fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """DETERMINISTIC FAKE decoder — stands in for PIL/soundfile/ffmpeg,
    which are not installed in this container.

    Interprets the raw payload bytes as a uint8 signal. Deterministic (pure
    function of the bytes), cheap, and locality-preserving: near-identical
    payloads produce near-identical signals, so downstream similarity search
    over the features behaves like it would with a real decoder."""
    sig = np.frombuffer(payload, dtype=np.uint8)
    return sig if sig.size else np.zeros(1, dtype=np.uint8)


def _netpbm_decode(data: bytes) -> np.ndarray:
    """Binary netpbm (P5 gray / P6 rgb) — a real image format decodable
    with pure numpy, no codec library. Header: magic, width, height,
    maxval as whitespace-separated tokens with ``#`` comments, then one
    whitespace byte and the raw samples."""
    magic = data[:2]
    channels = {b"P5": 1, b"P6": 3}[magic]
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(data[start:pos]))
    width, height, maxval = vals
    pos += 1  # the single whitespace after maxval
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    return np.frombuffer(
        data, dtype=np.uint8, count=width * height * channels, offset=pos
    )


def _wav_decode(data: bytes) -> np.ndarray:
    """RIFF/WAVE PCM via the stdlib ``wave`` module — no codec library."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        frames = w.readframes(w.getnframes())
        dtype = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}[
            w.getsampwidth()
        ]
    return np.frombuffer(frames, dtype=dtype)


def _iter_riff_chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) walking a RIFF chunk
    run; chunks are word-aligned (odd sizes pad one byte)."""
    import struct

    pos = start
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def _avi_video_stream(payload: bytes):
    """Walk a RIFF AVI tree and bind the FIRST 'vids' stream: returns
    ``(width, height, bit_count, compression, frames_raw)`` — the strf
    BITMAPINFOHEADER fields plus that stream's movi ``NNdb``/``NNdc``
    chunk payloads in order — or None when the buffer is not an AVI or
    has no video stream. Shared by the raw-DIB and MJPEG tiers."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    header = None  # (width, height, bit_count, compression)
    # Streams are numbered by strl order; the strf we bind and the movi
    # chunks we collect must both belong to the stream whose strh
    # fccType is 'vids' — a multi-stream AVI with the audio stream
    # listed first (extended WAVEFORMATEX can be >= 40 bytes) would
    # otherwise misparse the header or interleave audio chunks.
    n_strl = 0
    vid_stream: "int | None" = None
    frames_raw: "list[bytes]" = []

    def walk(start: int, end: int) -> None:
        nonlocal header, n_strl, vid_stream
        for fourcc, p, size in _iter_riff_chunks(payload, start, end):
            if fourcc == b"LIST":
                if payload[p : p + 4] == b"strl":
                    stream_idx = n_strl
                    n_strl += 1
                    is_vids = False
                    for cc, cp, csz in _iter_riff_chunks(
                        payload, p + 4, p + size
                    ):
                        if cc == b"strh" and csz >= 4:
                            is_vids = payload[cp : cp + 4] == b"vids"
                        elif cc == b"strf" and is_vids and csz >= 40:
                            w, h = struct.unpack_from("<ii", payload, cp + 4)
                            (bits,) = struct.unpack_from("<H", payload, cp + 14)
                            (comp,) = struct.unpack_from("<I", payload, cp + 16)
                            if header is None:
                                header = (w, h, bits, comp)
                                vid_stream = stream_idx
                else:
                    walk(p + 4, p + size)  # skip the list-type fourcc
            elif (
                fourcc[2:4] in (b"db", b"dc")
                and size > 0
                and vid_stream is not None
                and fourcc[:2] == b"%02d" % vid_stream
            ):
                frames_raw.append(payload[p : p + size])

    walk(12, len(payload))
    if header is None or not frames_raw:
        return None
    w, h, bits, comp = header
    return w, h, bits, comp, frames_raw


def _avi_rawdib_frames(payload: bytes) -> "list[np.ndarray] | None":
    """Pure-stdlib demux of an UNCOMPRESSED-DIB RIFF AVI (BI_RGB video
    stream, the container ffmpeg writes with ``-c:v rawvideo``): bind the
    video stream via ``_avi_video_stream``, reassemble each bottom-up
    4-byte-row-padded DIB, convert 24-bit BGR to grayscale with the
    BT.601 weights (what cv2's COLOR_BGR2GRAY computes); 8-bit frames are
    taken as grayscale directly. Returns None when the container is not a
    raw-DIB AVI (compressed codecs route to MJPEG/av/cv2) — the same
    no-codec-library discipline as the netpbm image and RIFF/WAVE audio
    decoders."""
    stream = _avi_video_stream(payload)
    if stream is None:
        return None
    w, h, bits, comp, frames_raw = stream
    if comp != 0 or bits not in (8, 24):  # BI_RGB only
        return None
    bottom_up = h > 0
    h = abs(h)
    bypp = bits // 8
    stride = ((w * bypp + 3) // 4) * 4
    out = []
    for raw in frames_raw:
        if len(raw) < stride * h:
            return None  # not the raw-DIB framing after all
        M = np.frombuffer(raw[: stride * h], dtype=np.uint8).reshape(h, stride)
        M = M[:, : w * bypp]
        if bottom_up:
            M = M[::-1]
        if bits == 24:
            bgr = M.reshape(h, w, 3).astype(np.float64)
            gray = (
                0.114 * bgr[:, :, 0]
                + 0.587 * bgr[:, :, 1]
                + 0.299 * bgr[:, :, 2]
            )
            out.append(np.round(gray).clip(0, 255).astype(np.uint8))
        else:
            out.append(np.ascontiguousarray(M))
    return out


_MJPG_FOURCCS = (0x47504A4D, 0x67706A6D, 0x4745504A)  # 'MJPG', 'mjpg', 'JPEG'


def _avi_mjpeg_frames(payload: bytes) -> "list[np.ndarray] | None":
    """MJPEG-in-AVI demux + decode with NO codec library: each movi chunk
    of an MJPG/mjpg/JPEG-fourcc video stream is one complete baseline
    JPEG (SOI..EOI), decoded to its luma plane by the pure-numpy codec
    (``functions.jpeg.decode_gray``) — compressed video now exercises in
    CI under the same zero-dependency discipline as the raw-DIB tier.
    Returns None when the stream is not MJPEG; raises
    ``NotImplementedError`` (propagated to the av/cv2 routing) when a
    frame uses a JPEG feature outside the baseline subset."""
    from ..functions import jpeg

    stream = _avi_video_stream(payload)
    if stream is None:
        return None
    w, h, _bits, comp, frames_raw = stream
    if comp not in _MJPG_FOURCCS:
        return None
    if not all(f[:2] == b"\xff\xd8" for f in frames_raw):
        return None  # not JPEG-framed after all
    h = abs(h)
    out = []
    for f in frames_raw:
        g = jpeg.decode_gray(f)
        if (h, w) != g.shape and h and w:
            raise ValueError(
                f"MJPEG frame {g.shape} disagrees with AVI header ({h}, {w})"
            )
        out.append(g)
    return out


def _video_frames(payload: bytes) -> "list[np.ndarray]":
    """Demux a real video container into grayscale uint8 frame arrays:
    uncompressed-DIB and MJPEG AVIs decode with the pure-stdlib/numpy
    tiers (``_avi_rawdib_frames`` / ``_avi_mjpeg_frames`` — always
    available, like netpbm/WAV); other codecs use the first importable
    backend — ``av`` (PyAV/ffmpeg), then ``cv2`` (needs a temp file; its
    VideoCapture API is path-based). Raises ``NotImplementedError``
    naming both when a compressed codec is hit with neither installed."""
    import io

    raw = _avi_rawdib_frames(payload)
    if raw is not None:
        return raw
    raw = _avi_mjpeg_frames(payload)
    if raw is not None:
        return raw

    try:
        import av
    except ImportError:
        av = None
    if av is not None:
        with av.open(io.BytesIO(payload)) as container:
            frames = [
                f.to_ndarray(format="gray") for f in container.decode(video=0)
            ]
        if not frames:
            raise ValueError("av demuxed zero frames from payload")
        return frames
    try:
        import cv2
    except ImportError:
        raise NotImplementedError(
            "video decode needs a frame demuxer; install av (PyAV) or "
            "opencv-python, or use the fixed-frame sample_frames layout"
        ) from None
    import os
    import tempfile

    fd, path = tempfile.mkstemp(suffix=".video")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(payload)
        cap = cv2.VideoCapture(path)
        frames = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(
                cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY).astype(np.uint8)
            )
        cap.release()
        if not frames:
            raise ValueError("cv2 demuxed zero frames from payload")
        return frames
    finally:
        os.unlink(path)


def real_decode(payload: bytes, kind: str) -> np.ndarray:
    """Real-codec decoder, the production ``decoder=`` swap-in.

    Always available (pure numpy / stdlib): binary netpbm images (P5/P6)
    and RIFF/WAVE PCM audio. Optional (import-gated, not in every
    container): PIL for other image formats, soundfile for other audio
    containers, av/cv2 for video demuxing (``_video_frames``). Raises
    ``NotImplementedError`` naming the missing dependency rather than
    failing obscurely mid-job."""
    if kind == "image":
        if payload[:2] in (b"P5", b"P6"):
            return _netpbm_decode(payload)
        try:
            from PIL import Image
        except ImportError:
            raise NotImplementedError(
                "image payload is not binary netpbm and PIL is not "
                "installed; install pillow or pass a codec-backed decoder"
            ) from None
        import io

        return np.asarray(Image.open(io.BytesIO(payload)), dtype=np.uint8).ravel()
    if kind == "audio":
        if payload[:4] == b"RIFF":
            return _wav_decode(payload)
        try:
            import soundfile as sf
        except ImportError:
            raise NotImplementedError(
                "audio payload is not RIFF/WAVE and soundfile is not "
                "installed; install soundfile or pass a codec-backed decoder"
            ) from None
        import io

        sig, _rate = sf.read(io.BytesIO(payload), dtype="float32")
        return np.asarray(sig).ravel()
    if kind == "video":
        return np.concatenate([f.ravel() for f in _video_frames(payload)])
    raise NotImplementedError(f"unknown asset kind {kind!r}")


def _featurize(sig: np.ndarray, dim: int) -> np.ndarray:
    """Fold a variable-length uint8 signal into a fixed ``dim``-length
    float32 feature: mean of ``dim`` equal-width chunks, scaled to [0,1].
    Deterministic; similar signals -> similar features (so the features are
    meaningful inputs to k-NN/dedup, not noise)."""
    n = sig.size
    if n < dim:
        sig = np.pad(sig, (0, dim - n), constant_values=0)
        n = dim
    edges = (np.arange(dim + 1) * n) // dim
    csum = np.concatenate([[0.0], np.cumsum(sig, dtype=np.float64)])
    chunk = (csum[edges[1:]] - csum[edges[:-1]]) / np.maximum(edges[1:] - edges[:-1], 1)
    return (chunk / 255.0).astype(np.float32)


def extract_features(
    assets: DataFrame,
    dim: int = 64,
    decoder: Callable[[bytes, str], np.ndarray] = fake_decode,
) -> DataFrame:
    """Binary payloads -> fixed-dim ``array<float>`` features, Arrow-batched.

    ``mapInPandas`` (not a scalar pandas_udf) so each batch can be processed
    as one numpy pass and the blob column is dropped before the exchange —
    the output carries only ids + features, which is what shuffles."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _featurize(decoder(p, k), dim)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                }
            )

    return assets.mapInPandas(run, schema=FEATURES)


# ---------------------------------------------------------------------------
# Transform stubs with real Spark plumbing
# ---------------------------------------------------------------------------


def resize_images(
    assets: DataFrame,
    width: int,
    height: int,
    decoder: Callable[[bytes, str], np.ndarray] = fake_decode,
) -> DataFrame:
    """Resize the decoded image signal to ``width*height`` samples
    (area-mean downscale on the decoded 1-D fake signal; a real decoder
    would produce HxWxC and this becomes a true resample). Output payload is
    the resized signal re-encoded as bytes — stays binary, stays columnar."""
    out_n = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = []
            for p, k in zip(pdf["payload"], pdf["kind"]):
                sig = decoder(p, k)
                resized.append(_featurize(sig, out_n) * 255.0)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "payload": [r.astype(np.uint8).tobytes() for r in resized],
                    "meta": pdf["meta"],
                }
            )

    return assets.filter(F.col("kind") == "image").mapInPandas(run, schema=ASSETS)


def sample_frames(
    assets: DataFrame,
    frame_bytes: int = 256,
    every_n: int = 10,
    demux: bool = False,
) -> DataFrame:
    """Frame sampling for video payloads.

    Default (``demux=False``): a payload is treated as a sequence of
    fixed-size frames (``frame_bytes`` each, the deterministic stand-in
    for real container parsing); every ``every_n``-th frame is emitted as
    its own row with the frame's byte-slice as payload. ``sequence`` +
    ``explode`` keeps this JVM-side and scales linearly — no driver
    involvement, no Python.

    ``demux=True``: payloads are REAL video containers — each is demuxed
    with the first importable backend (av, then cv2; ``_video_frames``)
    inside an Arrow-batched ``mapInPandas``, and every ``every_n``-th
    decoded grayscale frame is emitted as raw uint8 bytes. Same output
    schema; raises ``NotImplementedError`` on the executors when no
    demuxer is installed (``frame_bytes`` is ignored — real frames carry
    their own dimensions)."""
    if demux:

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = {"asset_id": [], "frame_idx": [], "frame_payload": [],
                       "meta": []}
                for aid, payload, meta in zip(
                    pdf["asset_id"], pdf["payload"], pdf["meta"]
                ):
                    frames = _video_frames(payload)
                    for i in range(0, len(frames), every_n):
                        out["asset_id"].append(aid)
                        out["frame_idx"].append(i)
                        out["frame_payload"].append(
                            frames[i].astype(np.uint8).tobytes()
                        )
                        out["meta"].append(meta)
                yield pd.DataFrame(out)

        return assets.filter(F.col("kind") == "video").mapInPandas(
            run,
            schema="asset_id long, frame_idx int, frame_payload binary, "
                   "meta map<string,string>",
        )

    n_frames = (F.length("payload") / F.lit(frame_bytes)).cast("int")
    return (
        assets.filter(F.col("kind") == "video")
        .withColumn("n_frames", F.greatest(n_frames, F.lit(1)))
        .withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))),
        )
        .select(
            "asset_id",
            "frame_idx",
            F.substring(
                F.col("payload"), F.col("frame_idx") * frame_bytes + 1, frame_bytes
            ).alias("frame_payload"),
            "meta",
        )
    )


def asset_stats(assets: DataFrame) -> DataFrame:
    """Per-kind ingest statistics over the blob column — metadata-only agg
    (octet lengths), never materializes payloads on the driver."""
    return (
        assets.groupBy("kind")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.round(F.avg(F.length("payload")), 6).alias("avg_bytes"),
        )
        .orderBy("kind")
    )
