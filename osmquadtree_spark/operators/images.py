"""Image-column operators: decode / verify / resize / footprint as
Arrow-batched mapInPandas stages.

The multimodal pattern: image payloads ride as opaque binary columns with
typed metadata (w, h, fmt); pixel work happens in vectorized pandas stages
whose batch shape is (rows × decoded ndarray); everything returns flat
columns so downstream joins/aggregations stay JVM-side. Codecs come from
sources.images (PPM/PNG real, JPEG a deterministic fake — the plumbing,
schemas and batch shapes are the production contract).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels import quadtree as qtk
from ..sources import images as img

DECODE_STATS_SCHEMA = (
    "image_id string, w int, h int, fmt string, pix_sum bigint, pix_min int, pix_max int, "
    "decode_ok boolean"
)


def decode_stats(images: DataFrame) -> DataFrame:
    """Decode every image and emit per-image pixel statistics — the
    verification stage for the decoded-pixel invariant (allclose / PSNR).
    mapInPandas: one Arrow batch in, one flat stats frame out."""

    def run(batches):
        for pdf in batches:
            out = {
                "image_id": pdf["image_id"],
                "w": pdf["w"],
                "h": pdf["h"],
                "fmt": pdf["fmt"],
                "pix_sum": [],
                "pix_min": [],
                "pix_max": [],
                "decode_ok": [],
            }
            for fmt, data, w, h in zip(pdf["fmt"], pdf["bytes"], pdf["w"], pdf["h"]):
                try:
                    pix = img.decode_image(fmt, bytes(data))
                    ok = pix.shape == (h, w, 3)
                    out["pix_sum"].append(int(pix.sum(dtype=np.int64)))
                    out["pix_min"].append(int(pix.min()))
                    out["pix_max"].append(int(pix.max()))
                    out["decode_ok"].append(bool(ok))
                except Exception:
                    out["pix_sum"].append(0)
                    out["pix_min"].append(-1)
                    out["pix_max"].append(-1)
                    out["decode_ok"].append(False)
            yield pd.DataFrame(out)

    return images.mapInPandas(run, DECODE_STATS_SCHEMA)


VERIFY_SCHEMA = "image_id string, fmt string, psnr double, exact boolean, caption_ok boolean"


def verify_roundtrip(images: DataFrame) -> DataFrame:
    """Per-row invariant check against the deterministic generator: decoded
    pixels byte-exact for lossless formats, PSNR ≥ 40 dB for lossy; caption
    byte-equal. This is the post-tiling verification pass of the north rule
    (rows can arrive in any order/partition — the expectation is recomputed
    from image_id alone)."""

    def run(batches):
        for pdf in batches:
            rows = []
            for image_id, data, fmt, caption, phash, w, h in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["caption"],
                pdf["phash"], pdf["w"], pdf["h"],
            ):
                i = int(image_id[3:])
                expect = img.pixels_for(int(phash), int(w), int(h))
                got = img.decode_image(fmt, bytes(data))
                p = img.psnr(expect, got)
                rows.append(
                    {
                        "image_id": image_id,
                        "fmt": fmt,
                        "psnr": float(p),
                        "exact": bool(np.array_equal(expect, got)),
                        "caption_ok": caption == img.caption_for(i),
                    }
                )
            yield pd.DataFrame(rows)

    return images.mapInPandas(run, VERIFY_SCHEMA)


RESIZE_SCHEMA = "image_id string, fmt string, out_w int, out_h int, bytes binary"


def resize(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize, re-encoded in the row's own format — the
    feature-extraction plumbing stage (decode → ndarray op → encode)."""

    def run(batches):
        for pdf in batches:
            rows = []
            for image_id, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                pix = img.decode_image(fmt, bytes(data))
                h, w, _ = pix.shape
                yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                small = pix[np.ix_(yi, xi)]
                rows.append(
                    {
                        "image_id": image_id,
                        "fmt": fmt,
                        "out_w": out_w,
                        "out_h": out_h,
                        "bytes": img.CODECS[fmt][0](small),
                    }
                )
            yield pd.DataFrame(rows)

    return images.mapInPandas(run, RESIZE_SCHEMA)


def with_footprint(images: DataFrame) -> DataFrame:
    """Attach the deterministic georeferenced footprint + quadtree cell id
    (FIXTURES.md §1 rule): pandas UDF over (phash, w, h, image_id index)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("minx bigint, miny bigint, maxx bigint, maxy bigint, qt bigint")
    def fp(image_id: pd.Series, phash: pd.Series, w: pd.Series, h: pd.Series) -> pd.DataFrame:
        idx = image_id.str[3:].astype(np.int64).to_numpy()
        minx, miny, maxx, maxy = img.footprints(
            phash.to_numpy("int64"), w.to_numpy("int32"), h.to_numpy("int32"), idx
        )
        qt = qtk.calculate(minx, miny, maxx, maxy)
        return pd.DataFrame(
            {"minx": minx, "miny": miny, "maxx": maxx, "maxy": maxy, "qt": qt}
        )

    out = images.withColumn("_fp", fp("image_id", "phash", "w", "h"))
    return out.select("*", "_fp.minx", "_fp.miny", "_fp.maxx", "_fp.maxy", "_fp.qt").drop("_fp")


def phash_near_dup(
    catalog: DataFrame,
    max_hamming: int = 3,
    id_col: str = "img_idx",
    phash_col: str = "phash",
    bucket_cap: int | None = 100_000,
    metrics_path: str | None = None,
) -> DataFrame:
    """64-bit perceptual-hash near-dup pairs — the image-payload twin of
    dedup.simhash_pairs, over the north-rule input shape's ``phash``
    column (a lossy re-encode perturbs a perceptual hash by a few bits,
    so image near-dup detection is a hamming ball around phash).

    Pigeonhole block join: the 64 bits split into ``max_hamming + 1``
    contiguous blocks, so any pair within hamming ≤ max_hamming agrees on
    at least one whole block and the candidate stage is an equi-join on
    (block_idx, block_value) — no pairwise scan, the only shape that
    survives a 10^12-image catalog. The signature is one bigint and rides
    the join (no re-join stage); ``bucket_cap`` drops degenerate blocks
    (flat-color images collapse to few distinct phashes at scale) with
    drops committed to the run metrics (see dedup.cap_hot_buckets).
    Returns (img_a, img_b, hamming) with img_a < img_b."""
    from ..cache import cached
    from .dedup import cap_hot_buckets, register_pair_volume

    n_blocks = max_hamming + 1
    parts = []
    for k in range(n_blocks):
        lo, hi = 64 * k // n_blocks, 64 * (k + 1) // n_blocks
        parts.append(
            F.struct(
                F.lit(k).alias("blk"),
                F.shiftright(F.col(phash_col), lo)
                .bitwiseAND(F.lit((1 << (hi - lo)) - 1))
                .alias("val"),
            )
        )
    blocks = catalog.select(
        F.col(id_col).alias("_pid"), F.col(phash_col).alias("_ph"),
        F.explode(F.array(*parts)).alias("_b"),
    ).select("_pid", "_ph", F.col("_b.blk").alias("blk"), F.col("_b.val").alias("val"))
    blocks = cached(
        cap_hot_buckets(blocks, ["blk", "val"], bucket_cap, metrics_path,
                        "image_phash_dedup")
    )
    if metrics_path is not None:
        register_pair_volume(metrics_path, "image_phash_dedup", blocks, ["blk", "val"])
    a = blocks.select(F.col("_pid").alias("img_a"), F.col("_ph").alias("_pha"), "blk", "val")
    b = blocks.select(F.col("_pid").alias("img_b"), F.col("_ph").alias("_phb"), "blk", "val")
    hamming = F.bit_count(F.col("_pha").bitwiseXOR(F.col("_phb"))).cast("bigint")
    return (
        a.join(b, ["blk", "val"])
        .filter(F.col("img_a") < F.col("img_b"))
        .dropDuplicates(["img_a", "img_b"])
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("img_a", "img_b", "hamming")
    )
