"""sf10 PAIR-RUNG spot sweep (r8 verdict task 6): run the
pair-emitting rungs against the 500k-doc / 200k-vector sf10 tiling
(scripts/make_sf10_pairs.py) and record their output row counts as a
4th growth-gate artifact — Spark rows only, no DuckDB oracle (the
three full-registry sweeps already pin VALUE correctness at three SFs;
this artifact adds one more decade of N to the LINEARITY evidence,
which only needs counts). Since r10 the two planted-clone audits run
here too, recording identical-clone RECALL — at this N the
identical-signature rescue operates in its star regime, which no
full-sweep SF reaches, so this artifact is the only recall evidence
for that code path at scale (gated in tests/test_scale_growth.py).

Usage:  SPARK_GRAFT_CPUS=24 python scripts/sweep_sf10_pairs.py
Writes: ORACLE_LOCAL_SF10_PAIRS.json (committed; read by
        tests/test_scale_growth.py)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.path.join(REPO, ".localdata", "sf10_pairs")
OUT = os.path.join(REPO, "ORACLE_LOCAL_SF10_PAIRS.json")

PAIR_RUNGS = [
    "q_dedup_simhash",
    "q_dedup_simhash_portable",
    "q_dedup_minhash_lsh",
    "q_dedup_minhash_portable",
    "q_dedup_embedding",
    "q_dedup_embedding_lsh",
    "q_multimodal_image_ahash",
]

#: r9 verdict task 6: the planted-clone audits run at sf10 too, with
#: RECALL recorded, not just rows — at this N the identical-signature
#: rescue's star regime takes over (_IDENT_GROUP_CAP exceeded by the
#: multiplicity-10 tiling inside the audit slice), and only this
#: artifact exercises it at scale. rung -> (pair_type label of the
#: guaranteed clone class, callable(spark) -> planted count).
AUDIT_RUNGS = {
    "q_dedup_simhash_audit": "clone_same_set",
    "q_dedup_embedding_lsh_audit": "clone_identical",
}


def _planted(spark: SparkSession, name: str) -> int:
    """Number of guaranteed-findable clones each audit plants at this
    dataset — recomputed from the data, not hard-coded."""
    from pyspark.sql import functions as F

    from azurestorage_blueprints_spark.queries.dedup import _ELA_SLICE, _SHA_SLICE
    from azurestorage_blueprints_spark.tables import table

    if name == "q_dedup_simhash_audit":
        d = table(spark, SF_DIR, "documents").filter(F.col("doc_id") < _SHA_SLICE)
        tok = F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != ""))
        return d.filter(tok > 0).count()
    return (
        table(spark, SF_DIR, "embeddings").filter(F.col("vec_id") < _ELA_SLICE).count()
    )


def main() -> int:
    from azurestorage_blueprints_spark.queries import load_all

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '24')}]"
        )
        .appName("sf10-pair-spot-sweep")
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_SHUFFLE_PARTS", "64"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    art: dict[str, dict] = {}
    if os.path.exists(OUT) and os.environ.get("SWEEP_RESUME"):
        with open(OUT) as f:
            art = json.load(f)
    for name in PAIR_RUNGS + sorted(AUDIT_RUNGS):
        if name in art and art[name].get("spark_rows") is not None:
            print(f"{name}: resume-skip ({art[name]['spark_rows']} rows)")
            continue
        t0 = time.perf_counter()
        try:
            df = registry[name].fn(spark, SF_DIR)
            if name in AUDIT_RUNGS:
                label = AUDIT_RUNGS[name]
                counts = {
                    r["pair_type"]: r["n"]
                    for r in df.groupBy("pair_type").count().withColumnRenamed(
                        "count", "n"
                    ).collect()
                }
                planted = _planted(spark, name)
                art[name] = {
                    "spark_rows": sum(counts.values()),
                    "err": "rows_only_spot_sweep",
                    "secs": round(time.perf_counter() - t0, 1),
                    "recall": {
                        "class": label,
                        "found": counts.get(label, 0),
                        "planted": planted,
                        "by_type": counts,
                    },
                }
                print(
                    f"{name}: {art[name]['spark_rows']} rows, "
                    f"{label} {counts.get(label, 0)}/{planted} in {art[name]['secs']}s"
                )
            else:
                rows = df.count()
                art[name] = {
                    "spark_rows": rows,
                    "err": "rows_only_spot_sweep",
                    "secs": round(time.perf_counter() - t0, 1),
                }
                print(f"{name}: {rows} rows in {art[name]['secs']}s")
        except Exception as exc:  # noqa: BLE001
            art[name] = {"spark_rows": None, "err": f"{type(exc).__name__}: {exc}"[:300]}
            print(f"{name}: ERROR {art[name]['err']}")
        spark.catalog.clearCache()
        with open(OUT, "w") as f:  # per-query atomic rewrite (resume-safe)
            json.dump(art, f, indent=1)
    bad = [n for n, r in art.items() if r.get("spark_rows") is None]
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
