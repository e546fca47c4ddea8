#!/usr/bin/env bash
# Launch the temporal-walk replay via spark-submit --py-files at two
# parallelism levels (the sandbox proxy for N and 4N executors) and
# append the evidence to BENCH/SPARK_SUBMIT.md.
#
# Usage: tools/spark_submit_scaling.sh [replicas] [sf_dir]
set -euo pipefail
cd "$(dirname "$0")/.."

REPLICAS="${1:-512}"
SF_DIR="${2:-/root/testdata/sf0.1}"

python tools/make_pyfiles.py

OUT=BENCH/SPARK_SUBMIT.md
mkdir -p BENCH
{
  echo "# spark-submit --py-files scaling run ($(date -u '+%Y-%m-%d %H:%M UTC'))"
  echo
  echo "Engine shipped as \`dist/online_centrality_spark.zip\` (no repo on the"
  echo "executors' path); job = \`jobs/replay_job.py\`; same input both levels."
  echo
  echo '```'
} > "$OUT"

for CORES in 8 32; do
  echo "== local[$CORES] ==" | tee -a "$OUT"
  spark-submit \
    --master "local[$CORES]" \
    --conf spark.sql.shuffle.partitions="$CORES" \
    --conf spark.ui.showConsoleProgress=false \
    --py-files dist/online_centrality_spark.zip \
    jobs/replay_job.py --sf-dir "$SF_DIR" --replicas "$REPLICAS" \
    2>/dev/null | grep '"job"' | tee -a "$OUT"
done
echo '```' >> "$OUT"
echo "wrote $OUT"
