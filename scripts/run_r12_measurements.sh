#!/bin/bash
# Round-12 measurement chain (idle box): the q_vamana_knn commit A/B,
# the filtered-beam auto-rule ladder at 100x, TA serve stage attribution
# (base + 100x), the 1000x serve-family decade, and the IVF
# cluster-bucket layout probe.
set -e
cd /root/repo
JF="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED -Dio.netty.tryReflectionSetAccessible=true"
CP="target/scala-2.13/classes:/opt/spark/jars/*"

echo "=== [1/5] q_vamana_knn commit A/B (r11 verdict item 1) ==="
# interleaved fresh-JVM reps at the r10 commit (worktree) vs HEAD; see
# bench_isolated.json records.r12_vamana_ab for the recorded result.
# git worktree add /tmp/r10wt 70c1ef9 && (cd /tmp/r10wt && sbt -batch compile)
# then 4x per commit: SPARK_GRAFT_ONLY=q_vamana_knn SPARK_GRAFT_ITERS=5 \
#   java -Xmx16g -Xms16g $JF -cp "<commit>/target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench

echo "=== [2/5] filtered-beam ladder + auto rungs at 100x (vamana 4x50k) ==="
SPARK_GRAFT_CPUS=32 GRAFT_DUP_MULT=100 \
  java -Xmx16g -Xms16g $JF -cp "$CP" graft.FilteredBeamScale \
  /tmp/graft_scale_100x vamana 4 64 128 192 256 320 448 640 1280 \
  2>/dev/null | tail -1 | tee /tmp/fbs_vamana_r12.json

echo "=== [3/5] TA serve stage attribution (base + 100x) ==="
SPARK_GRAFT_CPUS=32 java -Xmx16g -Xms16g $JF -cp "$CP" graft.TaStages \
  /root/testdata/sf0.1 5 2>/dev/null | tail -1 | tee /tmp/tastages_base.json
SPARK_GRAFT_CPUS=32 java -Xmx16g -Xms16g $JF -cp "$CP" graft.TaStages \
  /tmp/graft_scale_100x 5 2>/dev/null | tail -1 | tee /tmp/tastages_100x.json

echo "=== [4/5] 1000x serve decade (persisted serves, build once per JVM) ==="
python3 scripts/gen_scale_fixture.py 1000 /tmp/graft_scale_1000x documents
SPARK_GRAFT_ITERS=5 python3 scripts/bench_scaling.py 1000 \
  q_hnsw_serve q_vamana_serve q_spann_serve q_ta_persisted

echo "=== [5/5] IVF cluster-bucket layout probe at 1000x (nlist=rows/256, B=256) ==="
SPARK_GRAFT_CPUS=32 java -Xmx16g -Xms16g $JF -cp "$CP" graft.IvfScale \
  /tmp/graft_scale_1000x 0 4 5 256 2>/dev/null | tail -1 | tee /tmp/ivfscale_bucket_r12.json
echo "=== DONE ==="
