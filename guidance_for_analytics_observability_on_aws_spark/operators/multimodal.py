"""Multimodal column operators (group M).

Image/audio/video are modeled as opaque ``binary`` payload columns with
typed metadata, per the large-scale training-pipeline pattern: the engine
plans partitioning/sampling/feature-extraction over metadata (cheap,
JVM-side), and only the decode step touches bytes — here a deterministic
STUB behind Arrow-batched ``mapInPandas`` (the real image/audio libs are not
in this container; the Spark-side plumbing — schema, batching, UDF
signature — is real and tested).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, frame_idx bigint, frame_bytes binary, frame_sha8 string"
)


def binary_meta(documents: DataFrame) -> DataFrame:
    """M1: binary payload + typed metadata per modality."""
    payload = F.encode(F.col("text"), "UTF-8")
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return documents.select(
        "doc_id",
        modality.alias("modality"),
        F.octet_length(payload).cast("long").alias("byte_len"),
        F.substring(F.hex(payload), 1, 8).alias("magic_hex"),
        F.when(F.col("doc_id") % 3 == 0, 64 + (F.col("doc_id") * 7) % 1856)
        .cast("long")
        .alias("width"),
        F.when(F.col("doc_id") % 3 == 0, 64 + (F.col("doc_id") * 13) % 1016)
        .cast("long")
        .alias("height"),
        F.when(F.col("doc_id") % 3 == 1, 8000 * (1 + F.col("doc_id") % 5))
        .cast("long")
        .alias("sample_rate"),
        F.when(F.col("doc_id") % 3 == 1, F.col("n_chars") * 10)
        .cast("long")
        .alias("duration_ms"),
        F.when(F.col("doc_id") % 3 == 2, F.floor(F.col("n_chars") / 16))
        .cast("long")
        .alias("n_frames"),
    )


def frame_sample_plan(documents: DataFrame, stride: int = 5) -> DataFrame:
    """M2: frame-sampling plan for video payloads (every ``stride``-th frame).

    Pure metadata explosion — the scalable pattern is to plan frame indices
    relationally and only decode the selected frames.
    """
    meta = binary_meta(documents).filter(
        (F.col("modality") == "video") & (F.col("n_frames") >= 1)
    )
    frames = meta.select(
        "doc_id",
        "n_frames",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(stride))
        ).alias("frame_idx"),
    )
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        "n_frames",
        (F.col("frame_idx") * 1000.0 / 24.0).alias("frame_ts_ms"),
    )


def decode_frames_stub(documents: DataFrame, stride: int = 5) -> DataFrame:
    """M3 (rows-only): Arrow-batched decode stub via ``mapInPandas``.

    Produces a deterministic fake 16-byte frame payload per planned frame
    (md5 of ``doc_id:frame_idx``) — stands in for an image/video decoder
    while exercising the real distributed plumbing: metadata-driven frame
    plan, Arrow batch transfer, binary output column.
    """
    plan = frame_sample_plan(documents, stride).select("doc_id", "frame_idx")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys = (
                pdf["doc_id"].astype(str) + ":" + pdf["frame_idx"].astype(str)
            )
            digests = [hashlib.md5(k.encode()).digest() for k in keys]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "frame_idx": pdf["frame_idx"],
                    "frame_bytes": digests,
                    "frame_sha8": [d.hex()[:8] for d in digests],
                }
            )

    return plan.mapInPandas(decode, schema=DECODED_SCHEMA)


def feature_extract(documents: DataFrame) -> DataFrame:
    """M4: REAL content feature extraction over the payload column.

    A 16-bin code-point-nibble histogram + summary moments per document —
    the shape of a classical content-signature featurizer (byte histogram /
    entropy), computed entirely with JVM-side array expressions: no decode,
    no Python, no shuffle (per-row map). The histogram doubles as the
    input feature vector for the similarity/dedup operators.
    """
    codes = F.transform(F.split(F.col("text"), ""), lambda c: F.ascii(c))
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    base = documents.select(
        "doc_id", modality.alias("modality"), codes.alias("codes")
    )
    hist = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda b: F.size(F.filter(F.col("codes"), lambda c: c % 16 == b)).cast(
            "long"
        ),
    )
    return base.select(
        "doc_id",
        "modality",
        F.size("codes").cast("long").alias("n_units"),
        F.aggregate(
            "codes", F.lit(0).cast("long"), lambda acc, c: acc + c
        ).alias("code_sum"),
        F.array_join(hist.cast("array<string>"), ",").alias("nibble_hist"),
    )


RESIZED_SCHEMA = (
    "doc_id bigint, in_width bigint, in_height bigint, "
    "out_width bigint, out_height bigint, resized_sha8 string"
)


def resize_images_stub(documents: DataFrame, target_w: int = 64) -> DataFrame:
    """M5 (rows-only): image resize STUB via Arrow-batched ``mapInPandas``.

    The real pixel work needs an image library this container does not
    have, so the resample is a deterministic fake (md5 of the resize key);
    everything around it is the real distributed plumbing: metadata-driven
    routing to image rows only, aspect-ratio-preserving integer target
    dims, Arrow batch transfer, stable output schema. Swap the body for
    PIL/torchvision on a real cluster and nothing else changes.
    """
    plan = (
        binary_meta(documents)
        .filter(F.col("modality") == "image")
        .select("doc_id", "width", "height")
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_w = pd.Series([target_w] * len(pdf), index=pdf.index)
            out_h = (pdf["height"] * target_w // pdf["width"]).clip(lower=1)
            keys = (
                pdf["doc_id"].astype(str)
                + ":" + out_w.astype(str) + ":" + out_h.astype(str)
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "in_width": pdf["width"],
                    "in_height": pdf["height"],
                    "out_width": out_w,
                    "out_height": out_h,
                    "resized_sha8": [
                        hashlib.md5(k.encode()).hexdigest()[:8] for k in keys
                    ],
                }
            )

    return plan.mapInPandas(resize, schema=RESIZED_SCHEMA)


def decoded_frame_summary(documents: DataFrame, stride: int = 5) -> DataFrame:
    """Aggregated view of the decode stub (stable schema for rows-only check)."""
    decoded = decode_frames_stub(documents, stride)
    return decoded.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_decoded_frames"),
        F.min("frame_idx").alias("first_frame"),
        F.max("frame_idx").alias("last_frame"),
        F.sum(F.octet_length("frame_bytes")).alias("total_bytes"),
    )


def audio_chunk_plan(documents: DataFrame, chunk_ms: int = 10000) -> DataFrame:
    """M6: audio chunking plan — fixed-duration windows from metadata.

    The time-domain twin of M2's frame sampling: chunk boundaries and exact
    per-chunk sample counts are planned entirely from (duration, rate)
    metadata — the decode stage later touches only the chunks it needs.
    Sample counts stay exact integers (rates are multiples of 8 kHz, so
    ``ms * rate DIV 1000`` never truncates).
    """
    audio = binary_meta(documents).filter(
        (F.col("modality") == "audio") & (F.col("duration_ms") >= 1)
    )
    chunks = audio.select(
        "doc_id",
        "sample_rate",
        "duration_ms",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.floor((F.col("duration_ms") - 1) / chunk_ms).cast("long"),
            )
        ).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * chunk_ms
    end = F.least(start + chunk_ms, F.col("duration_ms"))
    return chunks.select(
        "doc_id",
        "chunk_idx",
        start.alias("chunk_start_ms"),
        end.alias("chunk_end_ms"),
        F.expr(f"(least(chunk_idx * {chunk_ms} + {chunk_ms}, duration_ms)"
               f" - chunk_idx * {chunk_ms}) * sample_rate DIV 1000").alias("n_samples"),
    )


def shard_manifest(documents: DataFrame, shard_bytes: int = 65536) -> DataFrame:
    """M7: byte-balanced shard manifest for distributed media processing.

    Media decode jobs are BYTE-bound, not row-bound: sharding by row count
    gives one worker 10 GB of video while another gets thumbnails. The
    manifest assigns every payload to the shard its FIRST byte lands in —
    ``shard = floor(cum_bytes_before / shard_bytes)`` per modality, via
    the shared two-phase prefix sum (no whole-modality window task). The
    decode fleet then maps one task per (modality, shard) with bounded
    input bytes — the manifest is the planning half of M3's decode.
    """
    from .pipeline import _prefix_sum

    meta = binary_meta(documents).select("doc_id", "modality", "byte_len")
    cum = _prefix_sum(meta, "modality", ["doc_id"], "byte_len", "cum_bytes")
    sharded = cum.withColumn(
        "shard",
        F.floor((F.col("cum_bytes") - F.col("byte_len")) / F.lit(shard_bytes)).cast(
            "long"
        ),
    )
    return sharded.groupBy("modality", "shard").agg(
        F.count(F.lit(1)).alias("n_payloads"),
        F.sum("byte_len").alias("shard_bytes"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def media_fingerprints(
    documents: DataFrame | None, corpused: DataFrame | None = None
) -> DataFrame:
    """M8's (doc_id, modality, payload_md5, byte_len) payload-fingerprint
    extraction — split out (the batch/stream twin discipline) so the
    ingest gate M11 hashes arriving payloads with the IDENTICAL
    definition: md5 over the RAW BYTES, modality derived from payload
    content (md5 mod 3). Pass ``corpused=`` for a frame that is already
    augmented (e.g. a filtered stream) — passing it as ``documents``
    would re-apply corpus() and plant plants-of-plants.
    """
    from ..functions.hashing import md5_int
    from ..functions.text import corpus

    src = corpus(documents) if corpused is None else corpused
    payload = F.encode(F.col("text"), "UTF-8")
    modality = (
        F.when(md5_int(F.col("text"), 4) % 3 == 0, "image")
        .when(md5_int(F.col("text"), 4) % 3 == 1, "audio")
        .otherwise("video")
    )
    return src.select(
        "doc_id",
        modality.alias("modality"),
        F.md5(payload).alias("payload_md5"),
        F.octet_length(payload).cast("long").alias("byte_len"),
    )


def mm_dedup_exact(documents: DataFrame) -> DataFrame:
    """M8: exact payload dedup per modality — D1 extended to binary
    columns.

    Image/audio/video dedup at ingest starts with byte-identical payload
    removal (re-crawled assets, mirrored URLs): md5 over the RAW BYTES
    (never a decoded representation — decode is expensive and lossy), one
    shuffle on a (modality, 16-byte-digest) key exactly like D1. Keeps the
    lowest doc_id per group and reports the reclaimable byte volume —
    media dedup is judged in bytes, not rows.

    Runs over the augmented corpus (the planted byte-identical copies are
    the true positives). Modality is derived from the payload CONTENT
    (md5 mod 3) rather than M1's doc_id convention: a re-crawled copy of
    an image is still an image, whatever row id it landed on — and this
    is what makes "dedup within modality" well-defined for the synthetic
    payloads.
    """
    hashed = media_fingerprints(documents)
    return (
        hashed.groupBy("modality", "payload_md5")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keep_doc_id"),
            F.max("byte_len").alias("payload_bytes"),
            ((F.count(F.lit(1)) - 1) * F.max("byte_len")).alias(
                "reclaimable_bytes"
            ),
        )
        .filter(F.col("n_copies") >= 2)
    )


def mm_media_sample(documents: DataFrame, budget_den: int = 4) -> DataFrame:
    """M9: deterministic BYTE-budget media sample per modality — media
    training sets are budgeted in bytes, not documents (a video weighs
    10⁴ images), so "take 25% of the corpus" must mean 25% of each
    modality's BYTES, selected reproducibly: rank payloads by the md5
    permutation (content-independent — re-crawls keep their selection
    status, P1/P2's determinism contract) and keep the prefix whose
    cumulative byte count fits ``total_bytes DIV budget_den``.

    Scale shape: cumulative bytes come from the shared TWO-PHASE prefix
    sum (``pipeline._prefix_sum`` — range-partitioned local windows +
    broadcast offsets; no whole-modality window task, M7's posture), the
    per-modality budgets are a 3-row broadcast, and the report is one
    tiny rollup. All-BIGINT arithmetic (budgets by integer division,
    inclusive cum ≤ budget selection); utilization is one final division.
    """
    from .pipeline import _prefix_sum

    meta = binary_meta(documents).select(
        "doc_id",
        "modality",
        "byte_len",
        F.md5(F.col("doc_id").cast("string")).alias("sample_key"),
    )
    budgets = meta.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum("byte_len").cast("long").alias("total_bytes"),
    ).select(
        "modality",
        "n_total",
        "total_bytes",
        F.expr(f"total_bytes DIV {budget_den}").alias("budget_bytes"),
    )
    cum = _prefix_sum(
        meta, "modality", ["sample_key", "doc_id"], "byte_len", "cum_bytes"
    )
    flagged = cum.join(F.broadcast(budgets), "modality").withColumn(
        "selected", F.when(F.col("cum_bytes") <= F.col("budget_bytes"), 1).otherwise(0)
    )
    return (
        flagged.groupBy("modality")
        .agg(
            F.max("n_total").alias("n_total"),
            F.max("total_bytes").alias("total_bytes"),
            F.max("budget_bytes").alias("budget_bytes"),
            F.sum("selected").cast("long").alias("n_selected"),
            F.sum(F.col("selected") * F.col("byte_len")).cast("long").alias(
                "selected_bytes"
            ),
        )
        .select(
            "modality",
            "n_total",
            "total_bytes",
            "budget_bytes",
            "n_selected",
            "selected_bytes",
            F.try_divide(
                F.col("selected_bytes").cast("double"),
                F.col("budget_bytes").cast("double"),
            ).alias("budget_utilization"),
        )
        .orderBy("modality")
    )


def mm_frame_dedup(documents: DataFrame, min_shared: int = 1) -> DataFrame:
    """M10: CROSS-VIDEO shared-frame detection — near-dup videos by
    frame-content overlap, the media-granular analogue of D29's chunk
    containment: M8 only catches byte-identical payloads, but re-encoded
    clips, trims and compilations share FRAMES, not bytes. Each video's
    frames are content-addressed fingerprints (md5 of the frame-sized
    payload slice — M1's ``n_frames = n_chars DIV 16`` frame geometry, so
    frame i is the 16-char slice at offset 16·i; a real decoder would
    emit per-frame perceptual hashes through the same plan); pairs
    sharing ≥ ``min_shared`` distinct frames are reported with
    both-direction containments (shared/n_frames — a trim is contained
    in its source at ~1.0 while the source's containment is partial).

    Scale shape: frames explode in the SAME projection that slices them
    (the `_shingle_rows` lesson — no per-element re-evaluation), one
    distinct, and the pair join keys on frame fingerprints whose fan-out
    is content-bounded; sizes join back broadcast (|videos| rows). All
    BIGINT counts + two exact divisions — full hash-exact oracle.
    """
    vids = documents.filter(F.col("doc_id") % 3 == 2).filter(
        F.col("n_chars") >= 16
    )
    fps = (
        vids.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0), (F.col("n_chars") / 16).cast("long") - 1
                    ),
                    lambda i: F.md5(
                        F.substring(
                            F.col("text"), (i * 16 + 1).cast("int"), 16
                        )
                    ),
                )
            ).alias("fp"),
        )
        .distinct()
    )
    sizes = fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    shared = (
        fps.alias("a")
        .join(
            fps.alias("b"),
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_frames"))
        .filter(F.col("n_shared_frames") >= int(min_shared))
    )
    return (
        shared.join(
            F.broadcast(
                sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("n_a"))
            ),
            "doc_a",
        )
        .join(
            F.broadcast(
                sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("n_b"))
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "n_shared_frames",
            "n_a",
            "n_b",
            (F.col("n_shared_frames") / F.col("n_a")).alias("containment_a"),
            (F.col("n_shared_frames") / F.col("n_b")).alias("containment_b"),
        )
    )
