#!/bin/bash
# Scaling rehearsal: runs the Bench leg child entry in fresh JVMs, exactly
# as Bench.runLegJvm does, and prints per-leg times + efficiency.
# Usage: tools/scaling_rehearsal.sh [entities] [nCores] [pairsCount]
set -u
ENTITIES=${1:-40000}
N=${2:-1}
PAIRS=${3:-1}
DOCSPER=4
XMX=${SPARK_DRIVER_MEM:-16g}
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

# Pre-generate the corpora once at full parallelism (same path Bench
# main uses), unless the caller already exported GRAFT_SCALE_CORPUS.
if [ -z "${GRAFT_SCALE_CORPUS:-}" ]; then
  CORPUS_BASE=$(mktemp -d /tmp/graft-rehearsal-corpus.XXXXXX)
  echo "pre-generating corpus at $CORPUS_BASE ..."
  java $ADD_OPENS -Xmx$XMX -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -cp "$CP" \
    graft.Bench gen "$ENTITIES" "$DOCSPER" "$CORPUS_BASE" \
    2>/tmp/leg_gen_err.log
  export GRAFT_SCALE_CORPUS="$CORPUS_BASE/full"
  export GRAFT_SCALE_WARM="$CORPUS_BASE/warm"
fi

leg() { # cores
  java $ADD_OPENS -Xmx$XMX -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -cp "$CP" \
    graft.Bench leg "$1" "$ENTITIES" "$DOCSPER" 2>/tmp/leg_err_$1.log \
    | grep GRAFT_LEG_RESULT
}

for i in $(seq 1 $PAIRS); do
  echo "=== pair $i (entities=$ENTITIES, N=$N) ==="
  T0=$(date +%s)
  RN=$(leg $N)
  T1=$(date +%s)
  R4=$(leg $((N*4)))
  T2=$(date +%s)
  SN=$(echo "$RN" | sed -E 's/.*"sec":([0-9.]+).*/\1/')
  S4=$(echo "$R4" | sed -E 's/.*"sec":([0-9.]+).*/\1/')
  echo "legN:  $RN  (wall $((T1-T0))s)"
  echo "leg4N: $R4  (wall $((T2-T1))s)"
  python3 -c "print(f'efficiency: {($SN/$S4)/4:.3f}  speedup {($SN/$S4):.2f}x')"
done
