"""Multimodal binary columns: decode / resize / frame-sample plumbing.

The training-data mandate treats image/audio/video as opaque ``binary``
columns with typed metadata extracted by Arrow-batched passes. The
actual codecs (PIL/ffmpeg/...) are not in this container, so the decode
step is STUBBED: ``media_meta`` parses the deterministic fake container
from sources/pages.media_blob (header ``VID1;w=..;h=..;f=..;`` +
payload) with exactly the plumbing a real decoder plugs into — one
``mapInPandas`` over the binary column, whole-batch pandas string ops,
no per-row Python — and computes the downstream math a pipeline needs:

- thumbnail resize: fit into ``thumb`` x ``thumb`` preserving aspect,
  integer floor division (``w * thumb // max(w, h)``, min 1);
- frame sampling: up to ``max_frames`` evenly spaced frame indices,
  ``idx_k = k * f // n`` (the ffmpeg-style select-every-nth dual).

Swap ``_parse_fake`` for a real decoder (guarded by the import-try
below) and every downstream column keeps working — that is the point
of the exercise. All emitted values derive from the shared SQL
arithmetic, so the operator is fully DuckDB-oracled despite the
binary input.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

try:  # real decoders would slot in here; absent in this container
    import PIL  # noqa: F401
    HAVE_REAL_CODECS = True
except ImportError:
    HAVE_REAL_CODECS = False

MEDIA_SCHEMA = ("doc_id bigint, kind string, width int, height int, "
                "n_frames int, thumb_w int, thumb_h int, "
                "n_sampled int, sample_sum bigint, payload_len int")


def _parse_fake(blobs: pd.Series) -> pd.DataFrame:
    """Vectorized fake-container parse: bytes -> header fields.
    Malformed / null blobs yield NA fields (never a raise)."""
    s = blobs.str.decode("utf-8", "replace").astype("string")
    ext = s.str.extract(r"^(VID1);w=(\d+);h=(\d+);f=(\d+);(p*)$")
    return pd.DataFrame({
        "kind": ext[0],
        "width": pd.to_numeric(ext[1], errors="coerce"),
        "height": pd.to_numeric(ext[2], errors="coerce"),
        "n_frames": pd.to_numeric(ext[3], errors="coerce"),
        "payload_len": ext[4].str.len(),
    })


def media_meta(df: DataFrame, media_col: str = "media",
               key: str = "doc_id", thumb: int = 64,
               max_frames: int = 3) -> DataFrame:
    """binary media column -> typed metadata + resize/sample plan."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            meta = _parse_fake(pdf[media_col])
            # nullable Int64 end to end: a malformed or null blob
            # yields a row of NULL metadata, never a task failure
            w = meta["width"].astype("Int64")
            h = meta["height"].astype("Int64")
            f = meta["n_frames"].astype("Int64")
            m = w.where(w >= h, h)
            tw = (w * thumb // m).clip(lower=1)
            th = (h * thumb // m).clip(lower=1)
            ns = f.clip(upper=max_frames)
            # sum of the evenly spaced frame indices k*f//ns
            ssum = f - f  # NA-propagating zero
            for k in range(max_frames):
                ssum = ssum + (k * f // ns).where(ns > k, 0)
            yield pd.DataFrame({
                "doc_id": pdf[key],
                "kind": meta["kind"],
                "width": w.astype("Int32"),
                "height": h.astype("Int32"),
                "n_frames": f.astype("Int32"),
                "thumb_w": tw.astype("Int32"),
                "thumb_h": th.astype("Int32"),
                "n_sampled": ns.astype("Int32"),
                "sample_sum": ssum.astype("Int64"),
                "payload_len":
                    meta["payload_len"].astype("Int32"),
            })

    return df.mapInPandas(run, MEDIA_SCHEMA)
