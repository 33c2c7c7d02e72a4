#!/usr/bin/env bash
# North-star execution form (BASELINE.json): the pipeline launched via
# `spark-submit --py-files` against a MULTI-EXECUTOR cluster.  In this
# sandbox the cluster is Spark's local-cluster[EXECUTORS,CORES,MEM]
# master — real separate executor JVM processes with netty shuffle and
# closure/py-files shipping, i.e. the same code paths a standalone/YARN
# cluster exercises, minus the network.
#
# Usage: tools/spark_submit_cluster_demo.sh [workdir]
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="${1:-/tmp/nm_submit_demo}"
MASTER="${NM_DEMO_MASTER:-local-cluster[2,2,1536]}"
SPARK_SUBMIT="$(command -v spark-submit \
    || echo "$(python -c 'import pyspark, os; print(os.path.dirname(pyspark.__file__))')/bin/spark-submit")"

rm -rf "$WORK" && mkdir -p "$WORK"

# 1. package the engine the way a real cluster deployment ships it
(cd "$REPO" && zip -qr "$WORK/namematch_spark.zip" namematch_spark)

# 2. prepare inputs + config (driver-side prep, plain local session)
python - "$WORK" <<'EOF'
import sys, yaml
work = sys.argv[1]
sys.path.insert(0, "/root/repo")
from namematch_spark.session import get_spark
from namematch_spark.sources.records import person_records
from pyspark.sql import functions as F
spark = get_spark(app_name="nm-demo-prep", master="local[4]",
                  conf={"spark.sql.shuffle.partitions": "8"})
spark.sparkContext.setLogLevel("ERROR")
recs = person_records(spark, "/root/testdata/sf0.001")
recs.write.mode("overwrite").parquet(f"{work}/people.parquet")
cfg = {
    "data_files": {"curr": {"filepath": f"{work}/people.parquet",
                            "record_id_col": "record_id",
                            "file_type": "new"}},
    "variables": [
        {"name": "first_name", "compare_type": "String",
         "curr_col": "first_name"},
        {"name": "last_name", "compare_type": "LastName",
         "curr_col": "last_name"},
        {"name": "dob", "compare_type": "Date",
         "check": "Date - %Y-%m-%d", "curr_col": "dob"},
        {"name": "age", "compare_type": "Numeric", "curr_col": "age"},
        {"name": "gender", "compare_type": "Categorical",
         "check": ["M", "F"], "curr_col": "gender"},
        {"name": "uid", "compare_type": "UniqueID", "curr_col": "uid"},
    ],
    "num_trees": 5,
    "name_prob": False,
}
with open(f"{work}/config.yaml", "w") as f:
    yaml.safe_dump(cfg, f)
spark.stop()
EOF

# 3. the actual submit: multi-executor master, engine shipped via
#    --py-files, CLI as the application (master comes from spark-submit
#    — the CLI defers to it)
"$SPARK_SUBMIT" \
    --master "$MASTER" \
    --conf spark.executor.memory=1g \
    --conf spark.sql.shuffle.partitions=8 \
    --conf spark.executorEnv.PYTHONPATH="$WORK/namematch_spark.zip" \
    --py-files "$WORK/namematch_spark.zip" \
    "$REPO/namematch_spark/cli.py" \
    --config "$WORK/config.yaml" \
    --output-dir "$WORK/out" \
    run

echo "--- outputs:"
ls -l "$WORK/out"
python - "$WORK" <<'EOF'
import sys, glob
import pandas as pd
work = sys.argv[1]
files = glob.glob(f"{work}/out/curr_with_clusterid/*.csv")
df = pd.concat(pd.read_csv(f) for f in files)
print(f"clustered rows: {len(df)}, clusters: {df['cluster_id'].nunique()}")
assert len(df) > 0 and df["cluster_id"].nunique() > 1
print("SPARK-SUBMIT MULTI-EXECUTOR DEMO: OK")
EOF
