#!/usr/bin/env python3
"""r12 verdict item 4: interleaved commit A/B for the two zero-steal
clean-record movers (q_mlm_mask 1.143->1.537, q_ta_batch 1.161->1.544,
r11->r12 clean records, steal ~ 0 on every iteration). Same discipline
as records.r12_vamana_ab: fresh JVM per rep, reps interleaved r11/r12
back-to-back on the same box, SPARK_GRAFT_ITERS=5, median per rep.

Usage: python3 scripts/ab_movers_r13.py
Requires /tmp/r11wt (abd9402) and /tmp/r12wt (337e335) compiled.
Merges the result into bench_isolated.json records.r13_mover_ab.
"""
import json, os, subprocess

QUERIES = ["q_mlm_mask", "q_ta_batch"]
REPS = 4
COMMITS = [("r11", "/tmp/r11wt"), ("r12", "/tmp/r12wt")]

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


def run_rep(tree, q):
    detail = f"/tmp/ab_{q}.json"
    env = dict(os.environ, SPARK_GRAFT_ONLY=q, SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
               SPARK_GRAFT_ITERS="5", SPARK_GRAFT_DETAIL=detail)
    subprocess.run(
        ["java", *JVM_FLAGS, "-cp",
         f"{tree}/target/scala-2.13/classes:/opt/spark/jars/*", "graft.Bench"],
        env=env, check=True, stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL)
    d = json.load(open(detail))
    return {
        "median": d["queries"][q],
        "iters": d["iters"][q],
        "steal_cores": d.get("steal_cores", {}).get(q, []),
        "ext_cores": d.get("ext_cores", {}).get(q, []),
    }


def main():
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    rec = {
        "purpose": "r12 verdict item 4 / what's-wrong 1: attribute the two "
                   "zero-steal r11->r12 clean-record movers (q_mlm_mask "
                   "1.143->1.537, q_ta_batch 1.161->1.544); neither file is "
                   "in the r12 diff, so A/B the commits directly",
        "harness": f"{REPS} interleaved reps per commit (r11=abd9402 worktree "
                   "vs r12=337e335 worktree), fresh JVM per rep, "
                   "SPARK_GRAFT_ITERS=5, median per rep, same box back-to-back",
    }
    for q in QUERIES:
        per = {name: [] for name, _ in COMMITS}
        for rep in range(REPS):
            for name, tree in COMMITS:
                print(f"[ab] {q} rep {rep + 1}/{REPS} {name}", flush=True)
                per[name].append(run_rep(tree, q))
        rec[q] = {name: {
            "medians": [r["median"] for r in runs],
            "iters": [r["iters"] for r in runs],
            "steal_cores": [r["steal_cores"] for r in runs],
        } for name, runs in per.items()}
    art = json.load(open("bench_isolated.json"))
    art.setdefault("records", {})["r13_mover_ab"] = rec
    with open("bench_isolated.json", "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps({q: {n: rec[q][n]["medians"] for n, _ in COMMITS}
                      for q in QUERIES}))


if __name__ == "__main__":
    main()
