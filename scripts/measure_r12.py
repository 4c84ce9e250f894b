#!/usr/bin/env python
"""Round-12 optimization measurement helper.

Usage: python scripts/measure_r12.py q_name [q_name ...] [--runs N] [--plan]
Times each query with the noop sink on the bench session (median of N,
default 3, after one warm-up), optionally dumping .explain("formatted")
to plans/r12/<name>_<tag>.txt (tag via --tag, default 'probe').
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from azurestorage_blueprints_spark.queries import load_all
from azurestorage_blueprints_spark.session import get_spark


def main():
    args = [a for a in sys.argv[1:]]
    runs = 3
    plan = False
    tag = "probe"
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
        else:
            names.append(a); i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="measure_r12")
    reg = load_all()
    for name in names:
        fn = reg[name].fn
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
            with open(f"plans/r12/{name}_{tag}.txt", "w") as f:
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
        print(f"RESULT {name}: med={med:.3f} min={samples[0]:.3f} max={samples[-1]:.3f} n={runs}", flush=True)
        spark.sparkContext._jvm.System.gc()
        time.sleep(1.5)


if __name__ == "__main__":
    main()
