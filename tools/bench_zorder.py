"""Measure Z-order data skipping on lineitem (sources/layout.py).

Writes three layouts of the same sf-dir lineitem projection —
natural (as-loaded), single-column sort, Z-order on (ship_day,
l_partkey) — with small parquet row groups, then measures, from the
footers, the fraction of row groups a selective predicate on EACH
dimension can skip, and the wall time of the same filtered aggregate
query on every layout (min of N).

Usage: python tools/bench_zorder.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from readwise_vector_db_spark.session import get_spark
    from readwise_vector_db_spark.sources import layout as L

    spark = get_spark("bench_zorder")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.datediff("l_shipdate", F.lit("1992-01-01").cast("date")).alias("ship_day"),
        "l_partkey",
        "l_quantity",
        "l_extendedprice",
    )
    n = li.count()
    day_lo, day_hi, pk_lo, pk_hi = li.agg(
        F.min("ship_day"), F.max("ship_day"), F.min("l_partkey"), F.max("l_partkey")
    ).collect()[0]
    # ~one month of ship days, ~2% of the part keys
    d_a, d_b = day_lo + (day_hi - day_lo) // 2, day_lo + (day_hi - day_lo) // 2 + 30
    p_a = pk_lo + (pk_hi - pk_lo) // 2
    p_b = p_a + max(1, (pk_hi - pk_lo) // 50)

    root = tempfile.mkdtemp(prefix="zorder_bench_")
    layouts = {}
    try:
        nat = os.path.join(root, "natural")
        li.repartition(8).write.mode("overwrite").option(
            "parquet.block.size", 1 << 18
        ).parquet(nat)
        layouts["natural"] = nat

        srt = os.path.join(root, "sorted_day")
        (
            li.repartitionByRange(8, "ship_day")
            .sortWithinPartitions("ship_day")
            .write.mode("overwrite")
            .option("parquet.block.size", 1 << 18)
            .parquet(srt)
        )
        layouts["sorted_day"] = srt

        zrd = os.path.join(root, "zorder")
        L.write_zordered(
            li, zrd, ["ship_day", "l_partkey"], bits=10, num_files=8,
            rowgroup_bytes=1 << 18,
        )
        layouts["zorder"] = zrd

        report = {"rows": n, "layouts": {}}
        for name, path in layouts.items():
            ranges = L.rowgroup_ranges(path, ["ship_day", "l_partkey"])
            both = sum(
                1
                for r in ranges
                if (
                    "ship_day" in r
                    and (r["ship_day"][1] < d_a or r["ship_day"][0] > d_b)
                )
                or (
                    "l_partkey" in r
                    and (r["l_partkey"][1] < p_a or r["l_partkey"][0] > p_b)
                )
            )
            entry = {
                "row_groups": len(ranges),
                "prune_day": round(L.pruned_fraction(ranges, "ship_day", d_a, d_b), 3),
                "prune_part": round(
                    L.pruned_fraction(ranges, "l_partkey", p_a, p_b), 3
                ),
                "prune_conj": round(both / max(1, len(ranges)), 3),
            }
            preds = {
                "day_only": F.col("ship_day").between(d_a, d_b),
                "part_only": F.col("l_partkey").between(p_a, p_b),
                "conj": (F.col("ship_day").between(d_a, d_b))
                & (F.col("l_partkey").between(p_a, p_b)),
            }
            for pname, pred in preds.items():
                walls = []
                for _ in range(reps):
                    t0 = time.monotonic()
                    spark.read.parquet(path).filter(pred).agg(
                        F.count(F.lit(1)), F.sum("l_extendedprice")
                    ).collect()
                    walls.append(time.monotonic() - t0)
                entry[f"wall_{pname}_min_s"] = round(min(walls), 4)
            report["layouts"][name] = entry
            print(name, entry, flush=True)
        print(json.dumps(report))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
