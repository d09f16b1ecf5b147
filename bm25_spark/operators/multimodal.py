"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` stages.

The Spark-side plumbing (schemas, batch shapes, partitioning, UDF
signatures) is real and tested; the actual media decoding is STUBBED —
this container has no image/audio libraries — behind ``_decode_stub``,
which derives deterministic fake pixel/sample data from the bytes' md5.
Swapping in PIL/libav means replacing only the ``_decode_stub`` body.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOB_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("blob", T.BinaryType(), False),
        T.StructField("mime", T.StringType(), True),
    ]
)

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("channels", T.IntegerType(), False),
        T.StructField("mean_pixel", T.DoubleType(), False),
        # False marks a lenient-mode fallback row: the configured decoder
        # could not decode the blob and the deterministic stub substituted
        # — its width/height/mean_pixel are fabricated and downstream
        # consumers can (and should) filter on this instead of trusting
        # them. Always True for strict 'pil' and for 'stub' (the stub IS
        # the configured decoder there).
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def attach_blobs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fake media table from a text corpus: blob = utf-8 bytes
    (stands in for encoded media; real pipelines read binary files/Iceberg
    binary columns the same way)."""
    return docs.select(
        "doc_id",
        F.lit("image").alias("modality"),
        F.encode(F.col(text_col), "utf-8").alias("blob"),
        F.lit("application/octet-stream").alias("mime"),
    )


def _decode_stub(blob: bytes) -> np.ndarray:
    """STUB decoder (no media libs in this container): derives a
    deterministic (h, w, 3) uint8 array from md5(blob). NOT a real decode —
    real decoding is the 'pil' backend (get_decoder)."""
    h = hashlib.md5(blob).digest()
    w_px = 4 + h[0] % 13
    h_px = 4 + h[1] % 13
    rng = np.frombuffer(
        hashlib.md5(blob + b"px").digest() * ((w_px * h_px * 3) // 16 + 1),
        dtype=np.uint8,
    )[: w_px * h_px * 3]
    return rng.reshape(h_px, w_px, 3)


def _decode_pil(blob: bytes) -> np.ndarray:
    """Real image decode via Pillow -> (h, w, 3) uint8 RGB array."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(blob)) as img:
        return np.asarray(img.convert("RGB"))


def _pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _resolve_backend(backend: str) -> str:
    """Resolve ``'auto'`` ONCE, on the driver, at stage-construction time —
    one consistent choice for the whole job. (Resolving per-executor would
    silently mix real-decode and stub rows in a single result on a cluster
    where only some executors have Pillow; with driver resolution, a
    misconfigured executor instead fails loudly with ImportError.)"""
    if backend == "auto":
        resolved = "pil" if _pil_available() else "stub"
        import logging

        logging.getLogger(__name__).info(
            "image decode backend='auto' resolved to %r on the driver",
            resolved,
        )
        return resolved
    if backend not in ("pil", "stub"):
        raise ValueError(f"unknown decode backend: {backend!r}")
    return backend


def verify_decode_backend(spark, backend: str = "auto", probes: int | None = None):
    """Startup probe for cluster runs: resolve ``backend`` on the driver,
    and when it resolves to 'pil', run one tiny mapInPandas job that
    imports Pillow inside ``probes`` (default: defaultParallelism) tasks —
    failing fast with ONE clear error instead of mid-pipeline ImportErrors
    inside decode stages on executors that lack Pillow. Returns the
    resolved backend name ('pil'/'stub'). Call once before a decode
    pipeline on a real cluster; cheap no-op job when resolution is
    'stub'."""
    resolved = _resolve_backend(backend)
    if resolved != "pil":
        return resolved
    n = probes or spark.sparkContext.defaultParallelism

    def check(batches):
        for _ in batches:
            pass
        yield pd.DataFrame({"ok": [_pil_available()]})

    bad = (
        spark.range(n)
        .repartition(n)
        .mapInPandas(check, "ok boolean")
        .filter(~F.col("ok"))
        .count()
    )
    if bad:
        raise ImportError(
            f"decode backend resolved to 'pil' on the driver but Pillow "
            f"is not importable in {bad}/{n} probe task(s) on the "
            "executors — install Pillow cluster-wide or pass "
            "backend='stub' explicitly"
        )
    return resolved


def get_decoder(backend: str = "auto"):
    """Image-decode backend dispatch. The returned callable imports its
    lib lazily inside the task:

    - ``'pil'``  — Pillow (real decode); ImportError if absent
    - ``'stub'`` — deterministic md5-derived fake (always available;
      what the DuckDB contract oracle mirrors)
    - ``'auto'`` — 'pil' when importable, else 'stub'

    Decode stages below take ``backend`` and default to 'auto': real
    decode wherever Pillow exists, the deterministic stub elsewhere (this
    sandbox). Under auto-resolved 'pil', a blob Pillow cannot decode falls
    back to the stub PER ROW (logged with a count) instead of failing the
    job — non-image bytes (attach_blobs' fakes, corrupt files in a real
    100 TB crawl) must not kill the stage when the user never asked for
    strict decoding. Explicit ``'pil'`` stays strict: you asked for real
    decode, so corrupt data raises. Pass ``'stub'`` explicitly when
    determinism across environments matters (the contract oracle does —
    it mirrors the stub's md5-derived pixels)."""
    backend = _resolve_backend(backend)
    if backend == "pil":
        if not _pil_available():
            raise ImportError(
                "backend='pil' requires Pillow (pip install pillow)"
            )
        return _decode_pil
    return _decode_stub


def _row_decoder(backend: str):
    """Per-row decode for the mapInPandas stages. ``make()`` returns
    ``(dec, state)`` where ``dec(blob) -> (array, ok)`` — ``ok`` False
    marks a lenient-mode stub fallback (auto-resolved 'pil' only) — and
    ``state['fallbacks']`` counts them so the stage can emit the final
    per-task total (``_log_fallbacks``), not just the first failure."""
    resolved = _resolve_backend(backend)
    lenient = backend == "auto" and resolved == "pil"

    def make():
        decode = get_decoder(resolved)
        state = {"fallbacks": 0}
        if not lenient:
            return (lambda blob: (decode(blob), True)), state

        def dec(blob: bytes):
            try:
                return decode(blob), True
            except Exception:
                if state["fallbacks"] == 0:
                    import logging

                    logging.getLogger(__name__).warning(
                        "auto/pil decode failed; falling back to stub "
                        "pixels for undecodable blobs in this task "
                        "(decode_ok=False on those rows; final count "
                        "logged at task end)"
                    )
                state["fallbacks"] += 1
                return _decode_stub(blob), False

        return dec, state

    return make


def _log_fallbacks(stage: str, state: dict) -> None:
    """Emit the final per-task fallback total (the first-failure warning
    above only marks the onset)."""
    if state["fallbacks"]:
        import logging

        logging.getLogger(__name__).warning(
            "%s: %d blob(s) in this task were undecodable by the "
            "auto-resolved 'pil' backend and carry deterministic stub "
            "pixels (decode_ok=False where the schema exposes it)",
            stage, state["fallbacks"],
        )


def decode_images(blobs: DataFrame, backend: str = "auto") -> DataFrame:
    """(doc_id, byte_len, width, height, channels, mean_pixel): decode +
    feature-extract via mapInPandas — Arrow batches in, Arrow batches out;
    partitioning preserved (narrow). ``backend``: see get_decoder."""
    make_decoder = _row_decoder(backend)

    def run(batches):
        decode, state = make_decoder()
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"].astype("int64"),
                "byte_len": pdf["blob"].map(len).astype("int64"),
            }
            decoded = [decode(bytes(b)) for b in pdf["blob"]]
            dims = [d for d, _ in decoded]
            out["width"] = pd.Series([d.shape[1] for d in dims], dtype="int32")
            out["height"] = pd.Series([d.shape[0] for d in dims], dtype="int32")
            out["channels"] = pd.Series([d.shape[2] for d in dims], dtype="int32")
            out["mean_pixel"] = pd.Series(
                [round(float(d.mean()), 4) for d in dims], dtype="float64"
            )
            out["decode_ok"] = pd.Series(
                [ok for _, ok in decoded], dtype="bool"
            )
            yield pd.DataFrame(out)
        _log_fallbacks("decode_images", state)

    return blobs.mapInPandas(run, schema=IMAGE_META_SCHEMA)


def resize_images(
    blobs: DataFrame, target: int = 8, backend: str = "auto"
) -> DataFrame:
    """(doc_id, blob): resize = decode + nearest-neighbor subsample +
    re-encode (bytes of the resized array). ``backend``: see get_decoder."""
    make_decoder = _row_decoder(backend)

    def run(batches):
        decode, state = make_decoder()
        for pdf in batches:
            out_blobs = []
            for b in pdf["blob"]:
                arr, _ok = decode(bytes(b))
                ys = np.linspace(0, arr.shape[0] - 1, target).astype(int)
                xs = np.linspace(0, arr.shape[1] - 1, target).astype(int)
                out_blobs.append(arr[np.ix_(ys, xs)].tobytes())
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "blob": out_blobs}
            )
        _log_fallbacks("resize_images", state)

    return blobs.mapInPandas(
        run,
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("blob", T.BinaryType(), False),
            ]
        ),
    )


def sample_frames(blobs: DataFrame, n_frames: int = 4) -> DataFrame:
    """(doc_id, frame_idx, frame): video frame sampling — the blob is split
    into n_frames deterministic chunks (stub for keyframe extraction).
    One-to-many mapInPandas: batch shape changes, schema explicit."""

    def run(batches):
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame": []}
            for doc_id, b in zip(pdf["doc_id"], pdf["blob"]):
                raw = bytes(b)
                step = max(1, len(raw) // n_frames)
                for i in range(n_frames):
                    rows["doc_id"].append(int(doc_id))
                    rows["frame_idx"].append(i)
                    rows["frame"].append(raw[i * step : (i + 1) * step])
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(run, schema=FRAME_SCHEMA)
