"""Multimodal payload operators over the opaque binary image column.

The engine treats image bytes as an opaque ``binary`` column with typed
metadata (w, h, fmt) and processes them only inside Arrow-batched
``mapInArrow`` stages — the pattern a 100 TB training-data pipeline
needs: bytes never leave their partition, no shuffle, Python touches
each batch once.

Operators:
  decode_features  — decode + per-channel mean/std feature extraction
  resize_images    — nearest-neighbour resize (pure numpy; no Pillow in
                     the sandbox) re-encoded as raw SPIM
  validate_payload — per-row PSNR vs the regenerated original +
                     caption equality (the BASELINE.json:16 invariant)

Unsupported lossy formats (jpeg/...) raise NotImplementedError in
decode_image — explicitly stubbed, never silently faked.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame

from ..sources.images import MAGIC, decode_image, pixels_of, psnr


def _iter_images(batch: pa.RecordBatch):
    ids = batch.column("image_id").to_pylist()
    bts = batch.column("bytes").to_pylist()
    fmts = batch.column("fmt").to_pylist()
    return zip(ids, bts, fmts)


def decode_features(images: DataFrame) -> DataFrame:
    """(image_id, w, h, mean_r, mean_g, mean_b, std_gray)."""
    schema = "image_id string, w int, h int, mean_r double, mean_g double, mean_b double, std_gray double"

    def run(batches):
        for batch in batches:
            out = {k: [] for k in ("image_id", "w", "h", "mean_r", "mean_g", "mean_b", "std_gray")}
            for iid, data, fmt in _iter_images(batch):
                px = decode_image(data, fmt)
                means = px.reshape(-1, 3).mean(axis=0)
                gray = px.astype(np.float64).mean(axis=2)
                out["image_id"].append(iid)
                out["w"].append(px.shape[1])
                out["h"].append(px.shape[0])
                out["mean_r"].append(float(means[0]))
                out["mean_g"].append(float(means[1]))
                out["mean_b"].append(float(means[2]))
                out["std_gray"].append(float(gray.std()))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out["image_id"], pa.string()),
                    pa.array(out["w"], pa.int32()),
                    pa.array(out["h"], pa.int32()),
                    pa.array(out["mean_r"], pa.float64()),
                    pa.array(out["mean_g"], pa.float64()),
                    pa.array(out["mean_b"], pa.float64()),
                    pa.array(out["std_gray"], pa.float64()),
                ],
                names=["image_id", "w", "h", "mean_r", "mean_g", "mean_b", "std_gray"],
            )

    return images.select("image_id", "bytes", "fmt").mapInArrow(run, schema)


def resize_images(images: DataFrame, tw: int, th: int) -> DataFrame:
    """Nearest-neighbour resize to (tw, th); output raw SPIM bytes."""
    schema = "image_id string, bytes binary, w int, h int, fmt string"

    def run(batches):
        header = MAGIC + np.int32(tw).tobytes() + np.int32(th).tobytes()
        for batch in batches:
            ids, datas = [], []
            for iid, data, fmt in _iter_images(batch):
                px = decode_image(data, fmt)
                h, w = px.shape[:2]
                yi = (np.arange(th) * h // th).astype(np.intp)
                xi = (np.arange(tw) * w // tw).astype(np.intp)
                rs = px[yi][:, xi]
                ids.append(iid)
                datas.append(header + rs.tobytes())
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.string()),
                    pa.array(datas, pa.binary()),
                    pa.array([tw] * len(ids), pa.int32()),
                    pa.array([th] * len(ids), pa.int32()),
                    pa.array(["raw"] * len(ids), pa.string()),
                ],
                names=["image_id", "bytes", "w", "h", "fmt"],
            )

    return images.select("image_id", "bytes", "fmt").mapInArrow(run, schema)


def validate_rows(ids, bts, fmts, caps):
    """ONE definition of per-image validity — decode, PSNR vs the
    regenerated original (inf → 1e9 sentinel for lossless), caption
    contract — shared by ``validate_payload`` and the fused
    validate+assign pass so the two can never drift apart.

    Returns (psnr_db float64 array, caption_ok bool array).

    A row whose payload cannot be decoded at all (NULL bytes, truncated
    container, malformed id) is REPORTED — psnr_db = NaN,
    caption_ok = False — never raised: one corrupt row in a dirty
    corpus must not kill the validation job whose purpose is finding
    such rows.  (Unknown-codec NotImplementedError still raises: that
    is a configuration error, not dirty data.)"""
    n = len(ids)
    ps = np.empty(n, dtype=np.float64)
    cap_ok = np.empty(n, dtype=bool)
    for k in range(n):
        try:
            i = int(ids[k][3:])
            px = decode_image(bts[k], fmts[k])
            orig = pixels_of(i, px.shape[1], px.shape[0])
            p = psnr(px, orig)
            ps[k] = 1e9 if p == float("inf") else p
            digest = hashlib.blake2b(ids[k].encode()).digest()
            cap_ok[k] = caps[k] == f"synthetic image {i} :: {digest[:12].hex()}"
        except NotImplementedError:
            raise  # missing codec is a config error, not a bad row
        except Exception:
            ps[k] = np.nan
            cap_ok[k] = False
    return ps, cap_ok


def validate_payload(images: DataFrame) -> DataFrame:
    """Per-row fidelity vs the regenerated original: PSNR (dB; inf →
    1e9 sentinel for lossless) + caption equality (BASELINE.json:16)."""
    schema = "image_id string, psnr_db double, caption_ok boolean"

    def run(batches):
        for batch in batches:
            ids = batch.column("image_id").to_pylist()
            bts = batch.column("bytes").to_pylist()
            fmts = batch.column("fmt").to_pylist()
            caps = batch.column("caption").to_pylist()
            ps, cap_ok = validate_rows(ids, bts, fmts, caps)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.string()),
                    pa.array(ps, pa.float64()),
                    pa.array(cap_ok, pa.bool_()),
                ],
                names=["image_id", "psnr_db", "caption_ok"],
            )

    return images.select("image_id", "bytes", "fmt", "caption").mapInArrow(run, schema)
