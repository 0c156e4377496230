#!/usr/bin/env bash
# Worked cluster-submit examples for eggv_spark — the Spark-native
# equivalent of the reference's PBS/Torque bootstrap
# (/root/reference/eggv/cluster.py:52-111).  Where the reference
# provisioned a Dask scheduler + PBS worker jobs, a Spark deployment
# hands the same decision to spark-submit's --master: the session
# factory (eggv_spark/session.py:get_session) deliberately leaves
# master=None in production so these invocations control placement.
#
# All three examples run the same driver program: the `eggv-spark
# complete` CLI (eggv_spark/cli.py), which retrieves GVF/GTF builds,
# processes, annotates, and writes TSVs — the full reference pipeline.
#
# Sizing rules of thumb baked into the numbers below (hg38 build is
# ~436 GB per the reference readme; scale linearly for bigger data):
#   executor-memory >= 4 GB/core so a 128 MB input split plus its
#     shuffle state never spills pathologically;
#   shuffle partitions ~2-3x total cores — AQE coalesces down, so
#     err high (the CLI's --shuffle-partitions flag feeds
#     spark.sql.shuffle.partitions).
set -euo pipefail

EGGV_PY="${EGGV_PY:-$(command -v python3)}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"

# Package the library for executors (pyspark ships the driver code
# automatically only for single-file jobs).
(cd "$REPO" && zip -qr /tmp/eggv_spark.zip eggv_spark)

case "${1:-yarn}" in
  yarn)
    # --- YARN (Hadoop) cluster: 50 executors x 8 cores = 400 cores ---
    spark-submit \
      --master yarn \
      --deploy-mode cluster \
      --name eggv-complete-hg38 \
      --num-executors 50 \
      --executor-cores 8 \
      --executor-memory 32g \
      --driver-memory 8g \
      --py-files /tmp/eggv_spark.zip \
      --conf spark.sql.adaptive.enabled=true \
      --conf spark.dynamicAllocation.enabled=true \
      --conf spark.dynamicAllocation.maxExecutors=200 \
      "$REPO/eggv_spark/cli.py" \
      complete --species hg38 --data-dir hdfs:///data/eggv \
      --shuffle-partitions 1200
    ;;
  k8s)
    # --- Kubernetes: container image must carry this repo + pyspark ---
    spark-submit \
      --master k8s://https://k8s-apiserver:6443 \
      --deploy-mode cluster \
      --name eggv-complete-hg38 \
      --conf spark.kubernetes.container.image=eggv-spark:latest \
      --conf spark.executor.instances=50 \
      --conf spark.kubernetes.executor.request.cores=8 \
      --executor-memory 32g \
      --py-files /tmp/eggv_spark.zip \
      local:///opt/eggv/eggv_spark/cli.py \
      complete --species hg38 --data-dir s3a://bucket/eggv \
      --shuffle-partitions 1200
    ;;
  standalone)
    # --- Spark standalone master (closest analog to the reference's
    #     "custom scheduler address" mode, eggv/cluster.py:144-151) ---
    spark-submit \
      --master spark://spark-master:7077 \
      --total-executor-cores 128 \
      --executor-memory 32g \
      --py-files /tmp/eggv_spark.zip \
      "$REPO/eggv_spark/cli.py" \
      complete --species mm10 --data-dir /shared/eggv \
      --shuffle-partitions 384
    ;;
  local)
    # --- single machine smoke (what this repo's tests exercise) ---
    "$EGGV_PY" -m eggv_spark.cli complete \
      --species mm10 --master 'local[8]' \
      --data-dir /tmp/eggv-data --shuffle-partitions 32
    ;;
  *)
    echo "usage: $0 [yarn|k8s|standalone|local]" >&2
    exit 2
    ;;
esac
