#!/usr/bin/env python
"""Dump the capped-LM pre-pass plans (threshold selection over docce)
for the streaming gates — the piece the r12 persist optimization
changes. Usage: python scripts/dump_gate_plans.py <tag>"""
import contextlib, io, os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from azurestorage_blueprints_spark.session import get_spark

tag = sys.argv[1]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="dump_gate_plans")

from azurestorage_blueprints_spark.queries.streaming_q import _capped_lm_parts
from azurestorage_blueprints_spark.queries.curation import _ppl_thresholds

parts = _capped_lm_parts(spark, sf_dir)
d, s_dep, oovtbl, docce = parts[:4]
thr = _ppl_thresholds(docce)


def dump(df, name):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    with open(f"plans/r12/{name}_{tag}.txt", "w") as f:
        f.write(buf.getvalue())


dump(thr, "stream_ppl_gate_prepass_thresholds")
dump(docce, "stream_ppl_gate_prepass_docce")
spark.catalog.clearCache()
print("plans dumped", tag)
