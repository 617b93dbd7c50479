"""Dump full-query explain with staging patched to identity, so the
edge-build subtree (the part the sym-edges change rewrote) is visible
in the plan instead of hiding behind a localCheckpoint ExistingRDD.
Usage: python dump_nostage.py <repo_root> <out_dir> <suffix> <key...>"""
import io, os, sys
from contextlib import redirect_stdout

root, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
names = sys.argv[4:]
sys.path.insert(0, root)
os.makedirs(out_dir, exist_ok=True)

import steaminganalysis_spark.staging as staging
staging.stage = lambda df, tag, bucket_col=None: df  # identity: keep lineage visible

from steaminganalysis_spark.registry import collect_queries
from steaminganalysis_spark.session import get_spark

spark = get_spark(app_name="sa-nostage-explain")
Q, _ = collect_queries()
for name in names:
    df = Q[name](spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    p = os.path.join(out_dir, f"{name}_nostage_{suffix}.txt")
    open(p, "w").write(buf.getvalue())
    print("wrote", p, file=sys.stderr)
