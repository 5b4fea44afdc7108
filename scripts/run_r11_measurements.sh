#!/bin/bash
# Round-11 measurement chain (idle box): scaling curves for the
# persisted-serve families, MinHash stage attribution, the 1000x vector
# decade, the large-nlist IVF point, and filtered recall at 100x.
set -e
cd /root/repo
JF="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED -Dio.netty.tryReflectionSetAccessible=true"
CP="target/scala-2.13/classes:/opt/spark/jars/*"

echo "=== [1/6] fixtures 10x/30x/100x ==="
python3 scripts/gen_scale_fixture.py 10 /tmp/graft_scale_10x both
python3 scripts/gen_scale_fixture.py 30 /tmp/graft_scale_30x both
python3 scripts/gen_scale_fixture.py 100 /tmp/graft_scale_100x both

echo "=== [2/6] serve-family scaling 10x/30x/100x ==="
python3 scripts/bench_scaling.py 10 q_hnsw_serve q_vamana_serve q_ta_persisted
python3 scripts/bench_scaling.py 30 q_hnsw_serve q_vamana_serve q_ta_persisted
python3 scripts/bench_scaling.py 100 q_hnsw_serve q_vamana_serve q_ta_persisted

echo "=== [3/6] minhash stage attribution (base + 100x) ==="
java -Xmx16g -Xms16g $JF -cp "$CP" graft.MinhashStages /root/testdata/sf0.1 3 \
  2>/dev/null | tail -1 | tee /tmp/mh_base.json
java -Xmx16g -Xms16g $JF -cp "$CP" graft.MinhashStages /tmp/graft_scale_100x 3 \
  2>/dev/null | tail -1 | tee /tmp/mh_100x.json

echo "=== [4/6] 1000x vector decade (FLAT / IVF-pruned / SPANN) ==="
python3 scripts/gen_scale_fixture.py 1000 /tmp/graft_scale_1000x embeddings
python3 scripts/bench_scaling.py 1000 q_flat_knn q_ivf_pruned_knn q_spann_knn

echo "=== [5/6] large-nlist IVF (deployment rule rows/256) ==="
java -Xmx16g -Xms16g $JF -cp "$CP" graft.IvfScale /tmp/graft_scale_100x 0 4 5 \
  2>/dev/null | tail -1 | tee /tmp/ivfscale_100x.json
java -Xmx16g -Xms16g $JF -cp "$CP" graft.IvfScale /tmp/graft_scale_1000x 0 4 5 \
  2>/dev/null | tail -1 | tee /tmp/ivfscale_1000x.json

echo "=== [6/6] filtered recall at 100x (ef=64 << n) ==="
SPARK_GRAFT_ONLY=q_filtered_recall SPARK_GRAFT_CPUS=32 \
  java -Xmx16g -Xms16g $JF -cp "$CP" graft.Verify /tmp/graft_scale_100x /tmp/filtrec_100x \
  2>/dev/null
python3 - <<'EOF'
import duckdb
print(duckdb.sql("SELECT * FROM '/tmp/filtrec_100x/q_filtered_recall/*.parquet' ORDER BY family, selectivity").fetchall())
EOF
echo "=== DONE ==="
