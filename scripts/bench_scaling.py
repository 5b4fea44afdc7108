#!/usr/bin/env python3
"""Time-vs-rows scaling curves for the headline families (r9 verdict
item 4): run the headline queries at 1x (sf0.1 as-is) and Nx (the
seeded synthetic fixture from gen_scale_fixture.py), fresh JVM per
(scale, query) with the suite's preallocated-heap flags and graft.Bench's
per-iteration external-CPU audit, and record medians + the ratio into
bench_scaling.json.

Usage: python3 scripts/bench_scaling.py [mult] [q_a q_b ...]
Defaults: mult=10, the seven headline families.
"""
import json, os, subprocess, sys

HEADLINE = ["q_flat_knn", "q_ivf_pruned_knn", "q_spann_knn", "q_binary_knn",
            "q_sq8_knn", "q_minhash_lsh", "q_dup_spans_capped",
            # r10 verdict item 2: the production-beam persisted graph
            # serves and the TA lexical serve — the families whose
            # scaling is least obvious (per-shard graph memory vs parts;
            # TA ladder depth vs corpus)
            "q_hnsw_serve", "q_vamana_serve", "q_ta_persisted"]

# which fixture tables each query family reads — a vectors-only sweep
# (the 1000x decade) must not pay for a 5M-document text fixture
DOC_QUERIES = {"q_minhash_lsh", "q_dup_spans_capped", "q_ta_persisted",
               "q_ta_topk", "q_bm25", "q_winnow_pairs", "q_dup_spans",
               "q_minhash_lsh_fast", "q_minhash_fast_cands"}


def tables_needed(queries):
    docs = any(q in DOC_QUERIES for q in queries)
    embs = any(q not in DOC_QUERIES for q in queries)
    if docs and embs:
        return "both"
    return "documents" if docs else "embeddings"

JVM_FLAGS = [
    "-Xmx16g", "-Xms16g",
    "--add-opens=java.base/java.lang=ALL-UNNAMED",
    "--add-opens=java.base/java.lang.invoke=ALL-UNNAMED",
    "--add-opens=java.base/java.lang.reflect=ALL-UNNAMED",
    "--add-opens=java.base/java.io=ALL-UNNAMED",
    "--add-opens=java.base/java.net=ALL-UNNAMED",
    "--add-opens=java.base/java.nio=ALL-UNNAMED",
    "--add-opens=java.base/java.util=ALL-UNNAMED",
    "--add-opens=java.base/java.util.concurrent=ALL-UNNAMED",
    "--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED",
    "--add-opens=java.base/jdk.internal.ref=ALL-UNNAMED",
    "--add-opens=java.base/sun.nio.ch=ALL-UNNAMED",
    "--add-opens=java.base/sun.nio.cs=ALL-UNNAMED",
    "--add-opens=java.base/sun.security.action=ALL-UNNAMED",
    "--add-opens=java.base/sun.util.calendar=ALL-UNNAMED",
    "-Dio.netty.tryReflectionSetAccessible=true",
]


def run_scale(sf_dir, queries, iters):
    out = {}
    for q in queries:
        detail = f"/tmp/scale_{os.path.basename(sf_dir)}_{q}.json"
        env = dict(os.environ, SPARK_GRAFT_ONLY=q, SPARK_GRAFT_CPUS="32",
                   SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_ITERS=str(iters),
                   SPARK_GRAFT_DETAIL=detail)
        print(f"[scaling] {sf_dir} {q}", flush=True)
        subprocess.run(
            ["java", *JVM_FLAGS, "-cp",
             "target/scala-2.13/classes:/opt/spark/jars/*", "graft.Bench"],
            env=env, check=True, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL)
        d = json.load(open(detail))
        out[q] = {
            "median": d["queries"][q],
            "iters": d["iters"][q],
            "ext_cores": d.get("ext_cores", {}).get(q, []),
        }
    return out


def main():
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    queries = sys.argv[2:] or HEADLINE
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.chdir(repo)
    iters = int(os.environ.get("SPARK_GRAFT_ITERS", "5"))
    big = f"/tmp/graft_scale_{mult}x"
    # every NEEDED table must exist (a generation run killed between
    # writes must not leave a half-built fixture that is silently reused
    # forever); tables the selected queries never read are not generated
    # — the 1000x vector sweep skips the 5M-document text fixture
    need = tables_needed(queries)
    missing = [t for t in (["embeddings"] if need in ("both", "embeddings") else [])
               + (["documents"] if need in ("both", "documents") else [])
               if not os.path.exists(f"{big}/{t}.parquet")]
    if missing:
        subprocess.run([sys.executable, "scripts/gen_scale_fixture.py",
                        str(mult), big,
                        "both" if len(missing) == 2 else missing[0]],
                       check=True)
    base = run_scale("/root/testdata/sf0.1", queries, iters)
    scaled = run_scale(big, queries, iters)
    # graft.Bench exits 0 on per-query failure and records the -1.0
    # sentinel median — refuse to fold a failed run into the committed
    # curve as a garbage negative ratio (the bench_isolated.py guard)
    failed = sorted(q for q in queries
                    if base[q]["median"] < 0 or scaled[q]["median"] < 0)
    if failed:
        sys.exit(f"[scaling] NOT recording: failed queries {failed}")
    rows = {}
    for q in queries:
        b, s = base[q]["median"], scaled[q]["median"]
        rows[q] = {
            "base_s": b, "scaled_s": s,
            "ratio": round(s / b, 2) if b > 0 else None,
            # per-row provenance: a later merge into this multiplier slot
            # may run at a different SPARK_GRAFT_ITERS and re-measures its
            # own base — slot-level iters_per_point alone would present
            # mixed-provenance rows as one homogeneous curve
            "iters_per_point": iters,
            "base_iters": base[q]["iters"], "scaled_iters": scaled[q]["iters"],
            "base_ext_cores": base[q]["ext_cores"],
            "scaled_ext_cores": scaled[q]["ext_cores"],
        }
    # merge by multiplier so successive runs (10x, 30x, ...) accumulate
    # into one artifact instead of overwriting each other's curves
    prior = {}
    if os.path.exists("bench_scaling.json"):
        try:
            prior = json.load(open("bench_scaling.json")).get("scales", {})
        except Exception:
            prior = {}
    # merge at the query level too: a follow-up run that adds one query
    # at an existing multiplier must not drop that scale's other curves
    slot = prior.get(f"{mult}x", {"mult": mult, "iters_per_point": iters,
                                  "queries": {}})
    slot["queries"].update(rows)
    prior[f"{mult}x"] = slot
    out = {"note": "median per (scale, query), fresh JVM each; iteration 1 "
                   "carries JIT + any buildOnce artifact generation, so the "
                   "median reflects steady-state serve cost; ratio = "
                   "scaled/base at Nx rows",
           "scales": prior}
    with open("bench_scaling.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({q: r["ratio"] for q, r in rows.items()}))


if __name__ == "__main__":
    main()
