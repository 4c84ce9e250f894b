#!/usr/bin/env python
"""Round-13 optimization measurement helper.

Usage:
  python scripts/measure_r13.py q_name [q_name ...] [--runs N] [--plan] [--tag T]
  python scripts/measure_r13.py --all [--runs N] [--json PATH]

Times each query with the noop sink on the bench session (median of N,
default 3, after one warm-up), optionally dumping .explain("formatted")
to plans/r13/<name>_<tag>.txt. ``--all`` sweeps the full bench HEADLINE
list (the sf1 re-baseline instrument — VERDICT r12 item 1) and writes a
sorted cost table; ``--json`` additionally persists {name: {med,min,max}}
so the 8-core/32-core ratio pass can be computed offline.

This is the round's A/B instrument, NOT the driver bench: bench.py and
its BENCH_KEYS scheme stay frozen (VERDICT r12 item 2).
"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from azurestorage_blueprints_spark.queries import load_all
from azurestorage_blueprints_spark.session import get_spark


def main():
    args = [a for a in sys.argv[1:]]
    runs = 3
    plan = False
    tag = "probe"
    json_path = None
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--runs":
            runs = int(args[i + 1]); i += 2
        elif a == "--plan":
            plan = True; i += 1
        elif a == "--tag":
            tag = args[i + 1]; i += 2
        elif a == "--json":
            json_path = args[i + 1]; i += 2
        elif a == "--all":
            import bench
            names.extend(bench.HEADLINE); i += 1
        else:
            names.append(a); i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="measure_r13")
    reg = load_all()
    results = {}
    for name in names:
        fn = reg[name].fn
        try:
            spark.sparkContext.setJobDescription(f"{name}: warmup")
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            spark.catalog.clearCache()
            if plan:
                import contextlib, io
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    # fresh build: a post-clearCache explain of the warm-up
                    # df re-expands any persisted intermediate and hides the
                    # InMemoryRelation the query actually runs with
                    fn(spark, sf_dir).explain("formatted")
                os.makedirs("plans/r13", exist_ok=True)
                with open(f"plans/r13/{name}_{tag}.txt", "w") as f:
                    f.write(buf.getvalue())
                spark.catalog.clearCache()
            samples = []
            for r in range(runs):
                spark.sparkContext.setJobDescription(f"{name}: run {r}")
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                samples.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
            samples.sort()
            med = samples[len(samples) // 2]
            results[name] = {
                "med": round(med, 3),
                "min": round(samples[0], 3),
                "max": round(samples[-1], 3),
            }
            print(
                f"RESULT {name}: med={med:.3f} min={samples[0]:.3f} "
                f"max={samples[-1]:.3f} n={runs}",
                flush=True,
            )
            spark.sparkContext._jvm.System.gc()
            time.sleep(1.5)
        except Exception as exc:  # noqa: BLE001
            results[name] = {"err": f"{type(exc).__name__}: {exc}"[:200]}
            print(f"ERROR {name}: {results[name]['err']}", flush=True)
    if len(results) > 1:
        ok = [(v["med"], k) for k, v in results.items() if "med" in v]
        ok.sort(reverse=True)
        total = sum(m for m, _ in ok)
        print(f"\nTOTAL med: {total:.1f} s over {len(ok)} queries")
        print("TOP 20 by median:")
        for m, k in ok[:20]:
            print(f"  {m:8.3f}  {k}")
    if json_path:
        with open(json_path, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f"wrote {json_path}")


if __name__ == "__main__":
    main()
