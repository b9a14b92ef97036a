#!/usr/bin/env bash
# Real-Spark-Connect validation (VERDICT r6 #3): boot the in-container
# Connect SERVER (pyspark ships spark-connect_2.13), drive it with the
# real shaded JVM CLIENT (jars/connect-repl/spark-connect-client-jvm),
# and check the RPCs functime_spark's Connect seams depend on.
#
# The PYTHON Connect client cannot run here: pyspark.sql.connect needs
# grpcio/protobuf, which are not in the image and cannot be installed
# (no network). That bound is documented in SCALE.md; the Python-side
# seam behavior stays covered by the forced-fallback suite
# (FUNCTIME_SPARK_NO_LOCAL_CHECKPOINT / FUNCTIME_SPARK_NO_SC_BROADCAST).
set -euo pipefail

PORT="${CONNECT_PORT:-15999}"
SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.001}"
J="$(python3 -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "jars"))')"
SUBMIT="$(dirname "$J")/bin/spark-submit"
HERE="$(cd "$(dirname "$0")" && pwd)"

echo "== starting Spark Connect server on :$PORT"
"$SUBMIT" --class org.apache.spark.sql.connect.service.SparkConnectServer \
  --master "local[4]" --conf "spark.connect.grpc.binding.port=$PORT" \
  spark-internal > /tmp/connect_server.log 2>&1 &
SERVER_PID=$!
trap 'kill $SERVER_PID 2>/dev/null || true' EXIT

for i in $(seq 1 60); do
  if python3 -c "import socket; s=socket.socket(); s.settimeout(1); s.connect(('127.0.0.1', $PORT))" 2>/dev/null; then
    break
  fi
  sleep 2
done

echo "== compiling probe"
CLIENT="$J/connect-repl/spark-connect-client-jvm_2.13-4.1.2.jar"
javac -encoding UTF-8 \
  -cp "$CLIENT:$J/spark-sql-api_2.13-4.1.2.jar:$J/spark-common-utils_2.13-4.1.2.jar:$J/spark-core_2.13-4.1.2.jar:$J/scala-library-2.13.17.jar" \
  -d /tmp/connect_probe "$HERE/ConnectProbe.java"

echo "== running probe against sc://localhost:$PORT"
java --add-opens=java.base/java.nio=org.apache.arrow.memory.core,ALL-UNNAMED \
  -cp "/tmp/connect_probe:$CLIENT:$J/*" \
  ConnectProbe "sc://localhost:$PORT" "$SF" 2>&1 \
  | grep -vE "^[0-9]{2}/[0-9]{2}|WARN|log4j|^\s+at "
