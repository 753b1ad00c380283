#!/usr/bin/env bash
# north_rule launch path: spark-submit --py-files <pkg.zip> jobs/crawl_job.py
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP=$(python -c "import sys; sys.path.insert(0,'$REPO'); from spiders_for_all_spark.submit import package_pyfiles; print(package_pyfiles())")
MASTER="${SPARK_MASTER:-local[8]}"
exec spark-submit --master "$MASTER" --py-files "$ZIP" "$REPO/jobs/crawl_job.py" "$@"
