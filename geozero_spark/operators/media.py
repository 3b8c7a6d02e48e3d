"""Multimodal binary columns: decode / resize / frame-sample plumbing.

The training-data mandate treats image/audio/video as opaque ``binary``
columns with typed metadata extracted by Arrow-batched passes.
``media_meta`` types three container formats by magic bytes:

- **PNG**: real header parse — signature + IHDR width/height (public
  spec; the IHDR chunk is required first);
- **JPEG**: real header parse — marker WALK to the first SOFn frame
  header (ITU T.81), skipping APPn/DQT/... segments by their lengths;
- the deterministic fake video container from sources/pages.media_blob
  (``VID1;w=..;h=..;f=..;`` + payload).

Full pixel decode (PIL/ffmpeg/...) is not in this container, so that
step stays STUBBED behind HAVE_REAL_CODECS — but the header typing is
real-bytes real, and the plumbing is exactly what a full decoder plugs
into: one ``mapInPandas`` over the binary column, batch-vectorized
dispatch, per-row work bounded by header size (never payload size).
Downstream it computes the math a pipeline needs:

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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# SOFn markers that carry frame dimensions (public JPEG spec, ITU T.81
# table B.1) — everything C0..CF except DHT (C4), JPG (C8), DAC (CC)
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def _png_dims(b: bytes):
    """(width, height) from the IHDR chunk, which the spec requires
    first; None when malformed."""
    if len(b) >= 24 and b[12:16] == b"IHDR":
        return (int.from_bytes(b[16:20], "big"),
                int.from_bytes(b[20:24], "big"))
    return None


def _jpeg_dims(b: bytes):
    """(width, height) from the first SOFn marker. A real marker WALK
    (skip APPn/DQT/... by their segment lengths), not a fixed-offset
    peek — bounded by the header, never touches entropy-coded data."""
    i, n = 2, len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:
            return None
        m = b[i + 1]
        if m in _JPEG_SOF:
            if i + 9 <= n:
                return (int.from_bytes(b[i + 7:i + 9], "big"),
                        int.from_bytes(b[i + 5:i + 7], "big"))
            return None
        if m in (0xD9, 0xDA):  # EOI / start-of-scan: no SOF seen
            return None
        if m == 0xFF:  # fill byte: consumes ONE byte (T.81 B.1.1.2),
            i += 1     # the next 0xFF+marker pair is re-tested whole
            continue
        if 0xD0 <= m <= 0xD7 or m == 0x01:  # standalone markers
            i += 2
            continue
        seg = int.from_bytes(b[i + 2:i + 4], "big")
        if seg < 2:
            return None
        i += 2 + seg
    return None


def _parse_media(blobs: pd.Series) -> pd.DataFrame:
    """Dispatch by magic bytes: real PNG / JPEG headers (public specs,
    no codec required — stills, n_frames=1, payload_len=blob bytes)
    or the fake video container. The fake path stays whole-batch
    vectorized; the still paths cost O(header bytes) per row — the
    per-row work is marker arithmetic only, independent of payload
    size. Unknown magic / malformed / null -> NA row."""
    filled = blobs.where(blobs.notna(), b"")
    is_png = filled.str[:8] == _PNG_SIG
    is_jpg = filled.str[:2] == b"\xff\xd8"
    out = _parse_fake(blobs.where(~(is_png | is_jpg), b""))
    for mask, parser, kind in ((is_png, _png_dims, "PNG"),
                               (is_jpg, _jpeg_dims, "JPEG")):
        if not mask.any():
            continue
        dims = [parser(bytes(b)) for b in filled[mask]]
        idx = out.index[mask]
        out.loc[idx, "kind"] = [kind if d else None for d in dims]
        out.loc[idx, "width"] = [
            float(d[0]) if d else None for d in dims]
        out.loc[idx, "height"] = [
            float(d[1]) if d else None for d in dims]
        out.loc[idx, "n_frames"] = [1.0 if d else None for d in dims]
        out.loc[idx, "payload_len"] = [
            float(len(b)) if d else None
            for b, d in zip(filled[mask], dims)]
    return out


def media_meta(df: DataFrame, media_col: str = "media",
               key: str = "doc_id", thumb: int = 64,
               max_frames: int = 3) -> DataFrame:
    """binary media column -> typed metadata + resize/sample plan."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            meta = _parse_media(pdf[media_col])
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
