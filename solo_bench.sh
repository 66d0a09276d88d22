#!/bin/bash
# Solo, fresh-JVM-per-query timing runs (guard: nothing else running).
CLASSES="$1"; shift
OUT="$1"; shift
ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
: > "$OUT"
for q in "$@"; do
  echo "=== $q ===" >> "$OUT"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 java $ADDOPENS -Xmx8g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CLASSES:/opt/spark/jars/*" graft.tools.Timing "$q" 2>/dev/null \
    | grep -E "^$q" >> "$OUT"
done
cat "$OUT"
