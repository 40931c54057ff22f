#!/usr/bin/env bash
# Launch the checkpoint-resumable KG pipeline via spark-submit
# --py-files (north_rule launch mode). Example:
#
#   scripts/submit.sh --input fixtures/bench --out /tmp/wh --run-id r1
#
# KGX_CORES controls the local master's parallelism (default 32); on a
# real cluster replace --master with your cluster manager URL — the
# pipeline itself is agnostic (one explicit conv_id repartition, AQE,
# broadcast dims; no driver-side collect of bulk data).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="${TMPDIR:-/tmp}/kgx_pyfiles.zip"

python - "$REPO" "$ZIP" <<'EOF'
import os, sys, zipfile
repo, zpath = sys.argv[1], sys.argv[2]
with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
    for dp, dns, fns in os.walk(os.path.join(repo, "kgx")):
        dns[:] = [d for d in dns if d != "__pycache__"]
        for fn in fns:
            if fn.endswith(".py") or fn.endswith(".npz"):
                p = os.path.join(dp, fn)
                z.write(p, os.path.relpath(p, repo))
EOF

exec spark-submit \
  --master "local[${KGX_CORES:-32}]" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.shuffle.partitions="${KGX_CORES:-32}" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.ui.enabled=false \
  --py-files "$ZIP" \
  "$REPO/kgx/spark/run.py" "$@"
