"""Multimodal (image/audio/video) columns — greenfield scale extension.

No reference counterpart (the reference is tabular+graph only); this
is the training-data-pipeline surface a 100 TB multimodal corpus
needs. Design:

 * media rows are ``(media_id, kind, payload: binary, meta: struct)``
   — the payload is opaque bytes, the typed ``meta`` struct carries
   width/height/sample_rate/n_frames/format so planning-time decisions
   (filtering, frame fan-out sizing) never touch the bytes;
 * decode / feature-extraction run as Arrow-batched ``mapInPandas``
   over the binary column — the ONLY sane shape for Python media
   libs at scale (one Python worker per partition, zero per-row
   overhead);
 * the actual pixel/sample decode is STUBBED: the container has no
   PIL/ffmpeg/torchaudio. ``decode_image(..., impl="pil")`` raises
   ``NotImplementedError`` at the clearly-marked seam where the real
   library call goes; the default ``impl="fake"`` is a deterministic
   bytes->stats transform so the Spark-side plumbing (schema,
   partitioning, UDF signature, batch shape) is fully real and tested;
 * frame sampling is JVM-side: ``explode(sequence(...))`` sized from
   ``meta.n_frames`` — the fan-out never deserializes the payload.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

META_FIELDS = (
    "width int, height int, sample_rate int, n_frames int, format string"
)
MEDIA_FIELDS = f"media_id bigint, kind string, payload binary, meta struct<{META_FIELDS}>"


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/benchmarks."""
    return media_from_ids(spark.range(n).select(F.col("id").alias("media_id")), seed=seed)


def media_from_ids(ids: DataFrame, id_col: str = "media_id", seed: int = 42) -> DataFrame:
    """Deterministic media rows keyed on an existing id column (e.g.
    documents.doc_id) — the fixture generator behind the mm* driver
    queries.

    Payload bytes are md5-derived from (seed, media_id) — stable across
    runs and engines (the DuckDB oracle re-derives the same bytes from
    the hex text); sizes/metadata vary per row so code paths that
    depend on them are exercised.
    """
    base = ids.select(F.col(id_col).cast("bigint").alias("media_id"))
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("media_id") % 3 + 1).cast("int"),
    )
    payload = F.unhex(
        F.concat(
            *[
                F.md5(F.concat_ws(":", F.lit(seed), F.col("media_id"), F.lit(i)))
                for i in range(2)  # 2 x 32 hex chars -> 32 bytes
            ]
        )
    )
    meta = F.struct(
        (F.col("media_id") % 8 * 32 + 64).cast("int").alias("width"),
        (F.col("media_id") % 5 * 32 + 64).cast("int").alias("height"),
        F.when(kind == "audio", F.lit(16000)).otherwise(F.lit(None).cast("int")).alias("sample_rate"),
        F.when(kind == "video", (F.col("media_id") % 7 + 2).cast("int"))
        .otherwise(F.lit(None).cast("int"))
        .alias("n_frames"),
        F.when(kind == "image", F.lit("png"))
        .when(kind == "audio", F.lit("wav"))
        .otherwise(F.lit("mp4"))
        .alias("format"),
    )
    return base.select("media_id", kind.alias("kind"), payload.alias("payload"), meta.alias("meta"))


def decode_image(media: DataFrame, impl: str = "fake") -> DataFrame:
    """Decode image payloads -> per-image pixel statistics.

    ``impl="pil"`` is the real-library seam (unavailable here);
    ``impl="fake"`` computes deterministic stats from the raw bytes so
    the distributed plumbing is testable. Output:
    (media_id, width, height, mean_byte, std_byte).
    """
    import numpy as np
    import pandas as pd

    schema = "media_id bigint, width int, height int, mean_byte double, std_byte double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if impl == "pil":
                # REAL IMPLEMENTATION SEAM: PIL.Image.open(io.BytesIO(b))
                raise NotImplementedError(
                    "image decode requires PIL/Pillow, not available in this "
                    "environment — plug the real decoder in here"
                )
            rows = {
                "media_id": pdf["media_id"],
                "width": [m["width"] for m in pdf["meta"]],
                "height": [m["height"] for m in pdf["meta"]],
                "mean_byte": [
                    float(np.frombuffer(b, dtype=np.uint8).mean()) for b in pdf["payload"]
                ],
                "std_byte": [
                    float(np.frombuffer(b, dtype=np.uint8).std()) for b in pdf["payload"]
                ],
            }
            yield pd.DataFrame(rows)

    imgs = media.filter(F.col("kind") == "image")
    return imgs.select("media_id", "payload", "meta").mapInPandas(run, schema)


def media_features(media: DataFrame, dim: int = 16, impl: str = "fake") -> DataFrame:
    """Feature-extract every payload into a fixed-``dim`` float vector
    -> (media_id, embedding array<float>). Arrow-batched; the fake
    impl hashes byte windows (deterministic), the real seam is where a
    vision/audio encoder forward pass goes."""
    import numpy as np
    import pandas as pd

    schema = "media_id bigint, embedding array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if impl != "fake":
                raise NotImplementedError(
                    "real encoders (torchvision/torchaudio) not available — "
                    "plug the model forward pass in here"
                )
            out = []
            for b in pdf["payload"]:
                arr = np.frombuffer(b, dtype=np.uint8).astype(np.float64)
                reps = -(-dim * 4 // max(len(arr), 1))  # pad by tiling
                arr = np.tile(arr, reps)[: dim * 4].reshape(dim, 4)
                vec = (arr.mean(axis=1) / 255.0).astype(np.float32)
                out.append([float(x) for x in vec])
            yield pd.DataFrame({"media_id": pdf["media_id"], "embedding": out})

    return media.select("media_id", "payload").mapInPandas(run, schema)


def resize_meta(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: rewrite the meta struct (the real pixel resize
    belongs in the decode_image seam); payload passes through opaque."""
    return media.withColumn(
        "meta",
        F.struct(
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.n_frames").alias("n_frames"),
            F.col("meta.format").alias("format"),
        ),
    )


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame fan-out: one row per sampled frame index.

    JVM-side ``explode(sequence(0, n_frames-1, every_n))`` — sized
    from metadata, payload untouched (a real pipeline would pass
    (payload, frame_idx) to a decoder UDF next). Output:
    (media_id, frame_idx, frame_key binary) with a deterministic
    per-frame key for downstream joins.
    """
    vids = media.filter(F.col("kind") == "video")
    idx = F.explode(
        F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
    ).alias("frame_idx")
    out = vids.select("media_id", "payload", idx)
    frame_key = F.unhex(F.md5(F.concat_ws(":", F.hex("payload"), F.col("frame_idx"))))
    return out.select("media_id", "frame_idx", frame_key.alias("frame_key"))
