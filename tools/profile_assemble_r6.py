#!/usr/bin/env python
"""In-UDF phase timing for the big-raster extract assembly: monkeypatch
the kernels with timed wrappers, run the broadcast-tiles extract once,
and dump per-worker phase totals (local mode: workers share /tmp)."""
from __future__ import annotations

import glob
import json
import os
import sys
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROF_DIR = "/tmp/assemble_prof"


def main() -> None:
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from rasterkit_spark import kernels as K
    from rasterkit_spark.fixtures import corpus as CP
    from rasterkit_spark.operators import extract as EX
    from rasterkit_spark.session import get_spark

    os.makedirs(PROF_DIR, exist_ok=True)
    for f in glob.glob(PROF_DIR + "/*.json"):
        os.unlink(f)

    spark = get_spark("profile-assemble-r6",
                      cores=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    c = CP.build_corpus(n_media=8, n_docs=50, n_queries=96,
                        sizes=(2048,), tile_size=256,
                        rps_choices=(256,), levels=2, null_rps_every=0)
    sdfs = c.to_spark(spark)
    sdfs["queries_bbox"] = sdfs["queries_bbox"].crossJoin(
        spark.range(256).select(F.col("id").alias("_rep"))) \
        .withColumn("query_id", F.concat_ws("_", "query_id", "_rep")) \
        .drop("_rep")
    for k in ("media_catalog", "tiles", "queries_bbox"):
        sdfs[k] = sdfs[k].cache()
        sdfs[k].count()

    # instrumented _assemble: phase timers accumulated in module globals,
    # dumped per python worker at process exit via a wrapping iterator
    orig_assemble = EX._assemble

    def timed_assemble(pdf, emit_window=True):
        tt = timed_assemble.t
        t0 = time.time()
        first = pdf.iloc[0]
        rx, ry = int(first.region_x), int(first.region_y)
        rw, rh = int(first.region_w), int(first.region_h)
        cw, ch = int(first.chunk_w), int(first.chunk_h)
        comp, pred = int(first.compression), int(first.predictor)
        spp = int(getattr(first, "samples_per_pixel", 1) or 1)
        shape = (rh, rw) if spp == 1 else (rh, rw, spp)
        out = np.zeros(shape, dtype=np.uint8)
        tt["setup"] += time.time() - t0
        for row in pdf.itertuples():
            t1 = time.time()
            chunk = EX._decode_chunk_cached(bytes(row.blob), comp, pred, cw,
                                            ch, spp, first.media_ref,
                                            int(row.tile_x), int(row.tile_y),
                                            int(getattr(row, "level", 0) or 0))
            t2 = time.time()
            tt["decode"] += t2 - t1
            K.clip_chunk_into(out, chunk, cw, ch,
                              int(row.tile_x) * cw, int(row.tile_y) * ch,
                              rx, ry, rw, rh, spp)
            tt["clip"] += time.time() - t2
            tt["rows"] += 1
        t3 = time.time()
        buf = out.tobytes()
        sha = hashlib.sha256(buf).hexdigest()
        tt["sha"] += time.time() - t3
        tt["bytes"] += len(buf)
        t4 = time.time()
        res = pd.DataFrame([{
            "query_id": first.query_id, "media_ref": first.media_ref,
            "region_x": rx, "region_y": ry, "region_w": rw, "region_h": rh,
            "window": bytearray(buf) if emit_window else None,
            "window_sha256": sha,
            "new_origin_x": float(first.new_origin_x),
            "new_origin_y": float(first.new_origin_y),
            "samples_per_pixel": spp,
        }])
        tt["emit"] += time.time() - t4
        tt["windows"] += 1
        return res

    timed_assemble.t = dict(setup=0.0, decode=0.0, clip=0.0, sha=0.0,
                            emit=0.0, rows=0, windows=0, bytes=0)

    orig_stream_lookup = EX._assemble_stream_lookup

    def wrapped_stream_lookup(pdf_iter, tile_map, emit_window=True):
        EX._assemble = timed_assemble
        t0 = time.time()
        nrows = 0

        def counting_iter():
            nonlocal nrows
            for pdf in pdf_iter:
                nrows += len(pdf)
                yield pdf

        yield from orig_stream_lookup(counting_iter(), tile_map, emit_window)
        tt = dict(timed_assemble.t)
        tt["task_wall"] = time.time() - t0
        tt["in_rows"] = nrows
        path = f"{PROF_DIR}/{os.getpid()}_{time.time_ns()}.json"
        with open(path, "w") as f:
            json.dump(tt, f)
        for k in timed_assemble.t:
            timed_assemble.t[k] = 0 if isinstance(timed_assemble.t[k], int) \
                else 0.0

    EX._assemble_stream_lookup = wrapped_stream_lookup

    t0 = time.time()
    n = EX.extract(sdfs["queries_bbox"], sdfs["media_catalog"],
                   sdfs["tiles"], broadcast_tiles=True,
                   emit_window=False).count()
    wall = time.time() - t0
    print(f"extract wall: {wall:.2f}s windows={n}")

    tot: dict = {}
    files = glob.glob(PROF_DIR + "/*.json")
    for fp in files:
        with open(fp) as f:
            d = json.load(f)
        for k, v in d.items():
            tot[k] = tot.get(k, 0) + v
    print(f"tasks dumped: {len(files)}")
    for k in ("task_wall", "setup", "decode", "clip", "sha", "emit"):
        print(f"  {k}: {tot.get(k, 0):.2f} core-s")
    acc = sum(tot.get(k, 0) for k in ("setup", "decode", "clip", "sha",
                                      "emit"))
    print(f"  accounted: {acc:.2f} / task_wall {tot.get('task_wall', 0):.2f}"
          f" (rest = pandas groupby/concat/arrow)")
    print(f"  rows={tot.get('rows')} in_rows={tot.get('in_rows')} "
          f"windows={tot.get('windows')} window_MB={tot.get('bytes', 0)/1e6:.0f}")
    spark.stop()


if __name__ == "__main__":
    main()
