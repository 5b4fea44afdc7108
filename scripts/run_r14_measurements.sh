#!/bin/bash
# Round-14 measurement chain: the TA bucket-rule + stored-tails serve
# re-measure (base, 100x, 1000x — r13 verdict item 1), the minhash
# collapse A/B on boilerplate fixtures (item 2), and the quiet-window
# provenance items (Vamana 1000x serve at 7 iters, graph build curves
# re-recorded with the build-time estimator in the JVM — item 6).
set -e
cd /root/repo
JF="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED -Dio.netty.tryReflectionSetAccessible=true"
CP="target/scala-2.13/classes:/opt/spark/jars/*"

echo "=== [1/4] TA stage re-attribution: base, 100x, 1000x (r13 verdict item 1) ==="
SPARK_GRAFT_CPUS=32 java -Xmx16g -Xms16g $JF -cp "$CP" graft.TaStages \
  /root/testdata/sf0.1 5 2>/dev/null | tail -1
SPARK_GRAFT_CPUS=32 java -Xmx16g -Xms16g $JF -cp "$CP" graft.TaStages \
  /tmp/graft_scale_100x 5 2>/dev/null | tail -1
SPARK_GRAFT_CPUS=32 java -Xmx16g -Xms16g $JF -cp "$CP" graft.TaStages \
  /tmp/graft_scale_1000x 5 2>/dev/null | tail -1

echo "=== [2/4] TA 1000x serve decade re-measure (7 iters, fresh JVM) ==="
SPARK_GRAFT_ITERS=7 python3 scripts/bench_scaling.py 1000 q_ta_persisted

echo "=== [3/4] Vamana 1000x serve quiet-window re-run + build curves with the estimator (7 iters) ==="
SPARK_GRAFT_ITERS=7 python3 scripts/bench_scaling.py 1000 q_vamana_serve q_hnsw_serve

echo "=== [4/4] minhash collapse A/B (boilerplate fixtures; see r14_minhash_ab.log for the full set) ==="
# boiler fixtures: gen_scale_fixture.py <mult> <dir> documents <verbatim_frac>
# 100x frac 0.5 -> clouds of 51 (direct wins: small clouds); 300x frac 1.0
# -> clouds of 300 (collapse wins: direct pre-distinct volume 1.8B rows)
java -Xmx16g -Xms16g $JF -cp "$CP" graft.MinhashStages \
  /tmp/graft_scale_1000x 3 fast 2>/dev/null | tail -1
echo "=== DONE ==="
