"""Array/window sinks (SURVEY.md §2.1 K3-K6).

Each sink renders a clipped window (binary u8 row-major + w/h) into the
reference's array formats.  Formats are produced per-row inside
``mapInPandas`` (distributed) or via the pure helpers (tests/driver side).
"""

from __future__ import annotations

import io as _io
import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BinaryType, StringType, StructField, StructType


# ---------------------------------------------------------------------------
# K4 — CSV: header "row/col,0,1,..." then "y,v,v,..."
# (src/extractor/array_strategy.rs:99-127)
# ---------------------------------------------------------------------------

def window_to_csv(window: np.ndarray) -> str:
    h, w = window.shape
    lines = ["row/col," + ",".join(str(x) for x in range(w))]
    for y in range(h):
        lines.append(str(y) + "," + ",".join(str(int(v)) for v in window[y]))
    return "\n".join(lines) + "\n"


# ---------------------------------------------------------------------------
# K5 — JSON: {"width","height","data":[[...]]}
# (src/extractor/array_strategy.rs:136-176)
# ---------------------------------------------------------------------------

def window_to_json(window: np.ndarray) -> str:
    h, w = window.shape
    return json.dumps({"width": w, "height": h,
                       "data": [[int(v) for v in row] for row in window]})


# ---------------------------------------------------------------------------
# K6 — NPY: '<u1', shape=(h, w).  The reference hand-rolls the v1.0 header
# (src/extractor/array_strategy.rs:185-212) with home-grown length math;
# parity is np.load equivalence, not byte equality (SURVEY.md §2.1 K6 note).
# ---------------------------------------------------------------------------

def window_to_npy(window: np.ndarray) -> bytes:
    buf = _io.BytesIO()
    np.save(buf, window.astype(np.uint8))
    return buf.getvalue()


# ---------------------------------------------------------------------------
# K3 — PNG extension forcing for transparent (circle-masked) outputs
# (src/utils/mask_utils.rs:72-116)
# ---------------------------------------------------------------------------

def ensure_png_extension(path: str) -> str:
    if path.lower().endswith(".png"):
        return path
    stem = path.rsplit(".", 1)[0] if "." in path.rsplit("/", 1)[-1] else path
    return stem + ".png"


def output_name_col(path: F.Column, shape: F.Column) -> F.Column:
    """Column flavor: circle-shaped outputs force .png."""
    png = F.concat(F.regexp_replace(path, r"\.[^./]+$", ""), F.lit(".png"))
    return F.when(F.lower(shape) == "circle", png).otherwise(path)


# ---------------------------------------------------------------------------
# distributed sink: render every window row to the chosen format
# ---------------------------------------------------------------------------

_SINK_SCHEMA = StructType([
    StructField("query_id", StringType()),
    StructField("media_ref", StringType()),
    StructField("format", StringType()),
    StructField("payload", BinaryType()),
])


def render_windows(windows: DataFrame, fmt: str) -> DataFrame:
    """fmt ∈ {csv, json, npy}; one payload per window row."""
    if fmt not in ("csv", "json", "npy"):
        raise ValueError(f"Unknown array format '{fmt}' (csv|json|npy)")

    def gen(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                win = np.frombuffer(bytes(r.window), dtype=np.uint8) \
                    .reshape(int(r.region_h), int(r.region_w))
                if fmt == "csv":
                    payload = window_to_csv(win).encode()
                elif fmt == "json":
                    payload = window_to_json(win).encode()
                else:
                    payload = window_to_npy(win)
                rows.append((r.query_id, r.media_ref, fmt, bytearray(payload)))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              _SINK_SCHEMA.fields])

    return windows.mapInPandas(gen, _SINK_SCHEMA)
