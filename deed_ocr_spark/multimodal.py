"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (task brief): image/audio/video travel as opaque ``binary`` columns
with typed metadata structs; decode / feature-extract / resize /
frame-sample run as Arrow-batched kernels over ``mapInPandas``. The
imaging/audio libraries are not in this container, so the *pixel/sample*
work is STUBBED (deterministic crc32-derived fakes, clearly marked); the
Spark-side plumbing — schemas, batching, partitioning, UDF signatures — is
real and tested. On a cluster, ship PIL/libvips/ffmpeg via
``spark-submit --archives`` and swap the stub internals only.

Reference anchor: page images are the reference's media artifacts
(/root/reference/deed_ocr/utils/pdf_converter.py:101-155); it re-encodes
PNG bytes and base64 — here those payloads stay binary end-to-end.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_TABLE_DDL = (
    "doc_id string, media_ref string, media_kind string, payload binary, "
    "meta struct<width:int,height:int,duration_ms:int,codec:string>"
)

DECODED_DDL = (
    "doc_id string, media_ref string, media_kind string, width int, height int, "
    "n_bytes bigint, codec string, sha bigint"
)

RESIZED_DDL = (
    "doc_id string, media_ref string, out_width int, out_height int, payload binary"
)

FRAMES_DDL = (
    "doc_id string, media_ref string, frame_idx int, ts_ms int, payload binary"
)


def _crc(s: pd.Series) -> pd.Series:
    return s.map(lambda r: zlib.crc32(str(r).encode("utf-8")))


# --- durable media table (signature-table machinery) --------------------------
# Bumped whenever synth_media_table / the extraction that feeds it changes
# meaning — part fingerprints include it, so stale tables rebuild.
# rev 2: chunk-partitioned layout (round-6) — tier reads prune whole
# chunk=N directories instead of relying on row-group doc_id stats.
MEDIA_FAMILY_REV = 2
# Incremental unit: one corpus chunk of this many documents. Growth by
# whole chunks appends (per-doc work, new chunks never depend on old docs);
# growth that splits the tail chunk rebuilds.
MEDIA_CHUNK_DOCS = 1000


def _media_listing(n_docs: int, seed: int) -> dict:
    from deed_ocr_spark.corpus import CORPUS_VERSION

    stamp = f"{seed}:{CORPUS_VERSION}:{MEDIA_FAMILY_REV}"
    parts = {}
    for i in range(n_docs // MEDIA_CHUNK_DOCS):
        a, b = i * MEDIA_CHUNK_DOCS, (i + 1) * MEDIA_CHUNK_DOCS
        parts[f"chunk-{i:06d}"] = f"{a}:{b}:{stamp}"
    if n_docs % MEDIA_CHUNK_DOCS:
        a = (n_docs // MEDIA_CHUNK_DOCS) * MEDIA_CHUNK_DOCS
        parts[f"tail-{a}-{n_docs}"] = f"{a}:{n_docs}:{stamp}"
    return parts


def _media_part_range(name: str) -> tuple[int, int]:
    if name.startswith("chunk-"):
        i = int(name.split("-", 1)[1])
        return i * MEDIA_CHUNK_DOCS, (i + 1) * MEDIA_CHUNK_DOCS
    _tag, a, b = name.split("-")
    return int(a), int(b)


def _existing_media_docs(family_dir: str) -> int:
    """Highest doc index (exclusive) already covered by the family's
    current version — 0 when the table does not exist yet."""
    from deed_ocr_spark.signatures import (
        _current_version_dir,
        _processed_parts,
        _read_manifest,
    )

    cur = _current_version_dir(family_dir)
    if cur is None:
        return 0
    parts = _processed_parts(cur, _read_manifest(cur))
    return max((_media_part_range(p)[1] for p in parts), default=0)


def ensure_media_table(spark, n_docs: int, seed: int = 42) -> str:
    """Materialize the media table (media_ref → payload + typed meta) as a
    durable content-keyed parquet table and return its current version dir.

    In production the media table IS its own table — the analog of the
    reference's saved page images (utils/pdf_converter.py:128-155) as a
    durable artifact — so registered consumers (m1) scan it rather than
    persisting a derived frame in the session cache (the pattern class
    behind the round-3 d7 swing). Maintenance rides the same versioned /
    locked / incremental machinery as the dedup signature families: media
    rows are strictly per-document, so a corpus that grows by whole chunks
    appends only the new chunks' rows.

    ONE family per seed serves every corpus size as a SUPERSET table:
    the maintained listing covers ``max(n_docs, docs already on disk)``,
    so a smaller tier asking after a larger one (driver at sf0.001 after
    bench at sf0.1) returns the existing table untouched instead of
    thrashing full rebuilds, and a larger ask appends the new chunks.
    Callers wanting exactly ``n_docs`` documents filter with
    ``media_docs_filter`` — doc ids are zero-padded, so the range
    predicate is a pushdown-friendly string comparison.

    The table is HIVE-PARTITIONED by ``chunk`` (the maintenance unit —
    round-5 VERDICT #6): a tier read's chunk predicate prunes whole
    ``chunk=N`` directories at planning time (``PartitionFilters``), so
    a small tier over a much larger superset family never even lists the
    bigger tiers' files — row-group doc_id stats remain as the
    second-level filter within the selected chunks. Read it with
    ``read_media_table``, never raw recursive parquet (which drops the
    partition column)."""
    from functools import reduce

    from deed_ocr_spark.corpus import corpus_range_df
    from deed_ocr_spark.job import extract_spans
    from deed_ocr_spark.signatures import ensure_table, family_dir_for

    family_dir = family_dir_for(f"synthetic-media:{seed}", "media")

    # CALLABLE listing: the superset rule reads the table's own current
    # state, so it must be re-evaluated under the maintenance lock — a
    # dict snapshotted before the lock would let a smaller tier, racing a
    # larger tier's build, rebuild the table down to its own stale view.
    def listing() -> dict:
        return _media_listing(
            max(n_docs, _existing_media_docs(family_dir)), seed
        )

    def build(parts) -> DataFrame:
        frames = [
            synth_media_table(
                extract_spans(corpus_range_df(spark, a, b, seed))
            ).withColumn(
                # doc ids are "doc-<13 digits>" (corpus.doc_id_for)
                "chunk",
                (
                    F.substring("doc_id", 5, 13).cast("long")
                    / MEDIA_CHUNK_DOCS
                ).cast("int"),
            )
            for a, b in sorted(_media_part_range(p) for p in parts)
        ]
        return reduce(DataFrame.unionByName, frames)

    return ensure_table(
        spark, family_dir, listing, build, partition_by=["chunk"]
    )


def read_media_table(spark, version_dir: str) -> DataFrame:
    """Scan the chunk-partitioned media family (version root + add dirs,
    partition column restored from the directory names)."""
    from deed_ocr_spark.signatures import read_partitioned_table

    return read_partitioned_table(spark, version_dir, "chunk")


def media_docs_filter(media: DataFrame, n_docs: int) -> DataFrame:
    """Restrict a (possibly superset) media table to the first ``n_docs``
    documents. ``doc_id_for`` zero-pads, so lexicographic < is numeric <
    and the predicate pushes down to the parquet scan; when the frame
    carries the ``chunk`` partition column, the derived chunk bound
    additionally prunes whole partition directories at planning time."""
    from deed_ocr_spark.corpus import doc_id_for

    out = media.filter(F.col("doc_id") < doc_id_for(n_docs))
    if "chunk" in media.columns:
        out = out.filter(
            F.col("chunk") <= (max(n_docs, 1) - 1) // MEDIA_CHUNK_DOCS
        )
    return out


def synth_media_table(spans_out: DataFrame) -> DataFrame:
    """Build a media table from extraction output: every media_ref span
    becomes a row with a deterministic fake binary payload + typed meta.

    Real pipelines would join media_ref → object-store bytes; the synthetic
    payload keeps the binary column path exercised end-to-end.
    """
    media = spans_out.filter(F.col("kind") == "media_ref").select("doc_id", "media_ref")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            crc = _crc(pdf["media_ref"])
            kind = np.where(crc % 3 == 0, "image", np.where(crc % 3 == 1, "audio", "video"))
            payload = [
                bytes((c >> (8 * (i % 4))) & 0xFF for i in range(64 + c % 192))
                for c in crc
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "media_kind": kind,
                    "payload": payload,
                    "meta": [
                        {
                            "width": int(64 + c % 1024),
                            "height": int(64 + (c // 1024) % 1024),
                            "duration_ms": int(c % 60000),
                            "codec": "png" if c % 2 == 0 else "jpeg",
                        }
                        for c in crc
                    ],
                }
            )

    return media.mapInPandas(gen, MEDIA_TABLE_DDL)


def encode_payload_b64(media: DataFrame) -> DataFrame:
    """Base64-encode the binary payload (F10): the reference converts page
    PNG bytes to base64 strings for its API payloads
    (utils/pdf_converter.py:91, ocr/gemini_ocr.py:215). Engine-native
    ``F.base64`` — JVM-side, no Python; ``decode_payload_b64`` inverts it
    byte-exactly. Binary columns otherwise stay binary end-to-end (the
    base64 hop exists only where a text transport needs it)."""
    return media.withColumn("payload_b64", F.base64("payload"))


def decode_payload_b64(media: DataFrame) -> DataFrame:
    """Inverse of ``encode_payload_b64`` (reference: base64.b64decode at
    ocr/gemini_ocr.py:215): restores the binary payload column."""
    return media.withColumn("payload", F.unbase64("payload_b64")).drop("payload_b64")


def decode_media(media: DataFrame) -> DataFrame:
    """Decode kernel: binary payload → dimensions/codec/feature hash.

    STUB: real decode would be ``PIL.Image.open(io.BytesIO(b))`` per
    element inside the same batch loop; everything else (schema, Arrow
    batching, vectorized metadata math) is the production shape.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            n_bytes = pdf["payload"].map(len).astype("int64")
            crc = pdf["payload"].map(lambda b: zlib.crc32(b))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "media_kind": pdf["media_kind"],
                    "width": pdf["meta"].map(lambda m: m["width"]).astype("int32"),
                    "height": pdf["meta"].map(lambda m: m["height"]).astype("int32"),
                    "n_bytes": n_bytes,
                    "codec": pdf["meta"].map(lambda m: m["codec"]),
                    "sha": crc.astype("int64"),
                }
            )

    return media.mapInPandas(kernel, DECODED_DDL)


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize kernel for image rows (STUB pixels, real shape math: aspect
    ratio preserved, longest side → max_side, mirroring the reference's
    dpi-controlled render sizing utils/pdf_converter.py:51-52)."""
    imgs = media.filter(F.col("media_kind") == "image")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            w = pdf["meta"].map(lambda m: m["width"]).astype("float64")
            h = pdf["meta"].map(lambda m: m["height"]).astype("float64")
            scale = np.minimum(1.0, max_side / np.maximum(w, h))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "out_width": np.maximum(1, (w * scale).round()).astype("int32"),
                    "out_height": np.maximum(1, (h * scale).round()).astype("int32"),
                    # STUB: real path re-encodes resized pixels
                    "payload": pdf["payload"],
                }
            )

    return imgs.mapInPandas(kernel, RESIZED_DDL)


def sample_frames(media: DataFrame, every_ms: int = 1000, max_frames: int = 8) -> DataFrame:
    """Frame-sampling kernel for video rows: 1 doc row → N frame rows
    (UDTF shape). Timestamps are real plumbing; frame bytes are STUB."""
    vids = media.filter(F.col("media_kind") == "video")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            # vectorized 1→N fan-out: frame counts from the metadata column,
            # then numpy repeat for the row explosion (no per-row iteration)
            dur = pdf["meta"].map(lambda m: int(m["duration_ms"])).to_numpy()
            n = np.minimum(max_frames, np.maximum(1, dur // every_ms)).astype(np.int64)
            idx = np.repeat(np.arange(len(pdf)), n)
            # ragged per-row arange without a Python loop
            frame_idx = np.arange(n.sum()) - np.repeat(np.cumsum(n) - n, n)
            payload16 = pdf["payload"].map(lambda b: b[:16]).to_numpy()
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy()[idx],
                    "media_ref": pdf["media_ref"].to_numpy()[idx],
                    "frame_idx": frame_idx.astype("int32"),
                    "ts_ms": (frame_idx * every_ms).astype("int32"),
                    "payload": payload16[idx],
                }
            )

    return vids.mapInPandas(kernel, FRAMES_DDL)
