"""Multimodal decode throughput (one-off evidence for BENCH/SCALE).

Builds a deterministic mixed-media table (PNG / baseline+progressive
JPEG / GIF / WAV / FLAC / MJPEG-AVI payloads), writes it to parquet,
and times ``extract_features(stub=False)`` end-to-end — the map-only
Arrow path every codec shares.  Prints one JSON line.

    python scripts/bench_media.py [--rows 3000] [--cpus 8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_payload(i: int) -> tuple[bytes, str]:
    rng = np.random.default_rng(1000 + i)
    kind = i % 6
    if kind == 0:  # PNG
        from dqmtools_spark.functions.pngcodec import encode_png

        px = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
        return encode_png(px.tobytes(), 24, 24, 3), "image"
    blocks = [
        [np.where(rng.random((8, 8)) < 0.15, rng.integers(-80, 80, (8, 8)), 0)
         for _ in range(3)]
        for _ in range(3)
    ]
    comp = [{"id": 1, "h": 1, "v": 1, "tq": 0, "blocks": blocks}]
    if kind == 1:  # baseline JPEG
        from dqmtools_spark.functions.jpegcodec import encode_jpeg_from_coeffs

        return encode_jpeg_from_coeffs(24, 24, comp, {0: [1] * 64}), "image"
    if kind == 2:  # progressive JPEG
        from dqmtools_spark.functions.jpegcodec import (
            encode_progressive_jpeg_from_coeffs,
        )

        scans = [
            {"comps": [1], "ss": 0, "se": 0, "ah": 0, "al": 1},
            {"comps": [1], "ss": 0, "se": 0, "ah": 1, "al": 0},
            {"comps": [1], "ss": 1, "se": 63, "ah": 0, "al": 1},
            {"comps": [1], "ss": 1, "se": 63, "ah": 1, "al": 0},
        ]
        return (
            encode_progressive_jpeg_from_coeffs(24, 24, comp, {0: [1] * 64}, scans),
            "image",
        )
    if kind == 3:  # GIF
        from dqmtools_spark.functions.gifcodec import encode_gif

        pal = [(j, (j * 7) % 256, (j * 13) % 256) for j in range(16)]
        ind = rng.integers(0, 16, 24 * 24).tolist()
        return encode_gif(24, 24, pal, ind), "image"
    if kind == 4:  # WAV (0.25 s mono sine)
        from dqmtools_spark.functions.wavcodec import encode_wav

        t = np.arange(2000) / 8000.0
        x = 0.4 * np.sin(2 * np.pi * (200 + i % 17 * 20) * t)
        return encode_wav(8000, x, bits=16), "audio"
    if kind == 5 and i % 12 == 5:  # MJPEG-AVI (3 frames), every other slot
        from dqmtools_spark.functions.avicodec import encode_avi
        from dqmtools_spark.functions.jpegcodec import encode_jpeg_from_coeffs

        frames = [
            encode_jpeg_from_coeffs(24, 24, comp, {0: [1] * 64}) for _ in range(3)
        ]
        return encode_avi(24, 24, 10.0, frames), "video"
    # FLAC (0.25 s mono)
    from dqmtools_spark.functions.flaccodec import encode_flac

    t = np.arange(2000)
    x = (6000 * np.sin(2 * np.pi * (110 + i % 13 * 15) * t / 8000)).astype(np.int64)
    return encode_flac(8000, x, mode="fixed2", blocksize=1024), "audio"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=3000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 8)))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dqmtools_spark.operators.multimodal import MEDIA_SCHEMA, extract_features
    from dqmtools_spark.session import get_spark

    spark = get_spark(master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    total_bytes = 0
    for i in range(args.rows):
        payload, kind = build_payload(i)
        total_bytes += len(payload)
        rows.append((i, kind, bytearray(payload), None))
    tmp = tempfile.mkdtemp(prefix="bench_media_")
    spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(4 * args.cpus).write.parquet(
        os.path.join(tmp, "media")
    )
    df = spark.read.parquet(os.path.join(tmp, "media"))

    def timed() -> tuple[float, int]:
        t0 = time.perf_counter()
        n = (
            extract_features(spark.read.parquet(os.path.join(tmp, "media")), stub=False)
            .agg(F.count("feature"))
            .collect()[0][0]
        )
        return time.perf_counter() - t0, n

    timed()  # warmup: codegen + Python worker spawn
    reps = [timed() for _ in range(3)]
    best, n_feats = min(reps)
    shutil.rmtree(tmp, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "media_decode_payloads_per_sec",
                "value": round(args.rows / best, 1),
                "rows": args.rows,
                "decoded_non_null": n_feats,
                "mb": round(total_bytes / 1e6, 2),
                "mb_per_sec": round(total_bytes / 1e6 / best, 2),
                "best_sec": round(best, 3),
                "rep_sec": [round(s, 3) for s, _ in reps],
                "cpus": args.cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
