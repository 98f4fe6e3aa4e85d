"""Two-parallelism scaling evidence on a large encoded-tokens input.

Same protocol as bench.py's encode leg (full warm pass, then timed
scan -> chunk -> stats -> select -> encode -> manifest agg), pointed at an
arbitrarily large input. Run with N and 4N cores on the SAME input: both
legs below the box's ~8-worker memory-bandwidth knee, so the ratio
measures engine scaling, not the memory wall (BENCH/BASELINE.md).

Usage: python scripts/scaling_soak.py <tokens_parquet_dir> [n_cores] [n4_cores]
Round-3 result on the 50M-row / 43.3 GiB soak input: 0.2031 GiB/s at 2
cores, 0.7039 GiB/s at 8 — efficiency 0.866 at 4x parallelism.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parquet_to_arrow_spark.session import get_spark
from parquet_to_arrow_spark.sources.io import encode_parquet_dir


def measure(path: str, cores: int) -> dict:
    spark = get_spark(app=f"scaling_soak_{cores}", cores=cores)
    encode_parquet_dir(spark, path).count()  # warm: workers + page cache
    t0 = time.time()
    row = (
        encode_parquet_dir(spark, path)
        .agg(
            F.sum("raw_bytes").alias("raw"),
            F.sum("enc_bytes").alias("enc"),
            F.sum("n_rows").alias("rows"),
        )
        .collect()[0]
    )
    dt = time.time() - t0
    spark.stop()
    raw_gib = row["raw"] / (1 << 30)
    out = {
        "cores": cores,
        "rows": row["rows"],
        "raw_gib": round(raw_gib, 3),
        "ratio": round(row["raw"] / max(row["enc"], 1), 3),
        "seconds": round(dt, 1),
        "gib_per_s": round(raw_gib / dt, 4),
    }
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    path = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n4 = int(sys.argv[3]) if len(sys.argv) > 3 else 4 * n
    a = measure(path, n)
    b = measure(path, n4)
    eff = b["gib_per_s"] / ((n4 / n) * a["gib_per_s"])
    print(json.dumps({"scaling": {"n": a, "n4": b, "efficiency": round(eff, 3)}}))
