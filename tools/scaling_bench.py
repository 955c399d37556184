"""Two-cluster-size scaling protocol (north rule: throughput scaling
efficiency ≥ 0.8 from N to 4N executors; sandbox proxy = local[8] vs
local[32] on identical input, via spark-submit --py-files).

1. Writes a fixed ~900k-turn synthetic transcripts parquet (once).
2. Launches tools/kg_job.py at local[8] then local[32].
3. efficiency = throughput_4N / (4 × throughput_N); updates the
   "Measured scaling" section of BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
INPUT = os.environ.get("SCALE_INPUT", "/tmp/gliner_scale_input.parquet")
N_CONVS = int(os.environ.get("SCALE_N_CONVS", "96000"))


def ensure_input() -> None:
    if os.path.exists(os.path.join(INPUT, "_SUCCESS")):
        return
    from gliner_spark.plans.session import build_session
    from gliner_spark.sources.transcripts import synth_transcripts

    spark = build_session(app_name="scale-input", master="local[32]",
                          shuffle_partitions=256)
    spark.sparkContext.setLogLevel("ERROR")
    synth_transcripts(spark, N_CONVS).repartition(256).write.mode(
        "overwrite"
    ).parquet(INPUT)
    spark.stop()


def run_at(cores: int, zip_path: str) -> dict:
    env = dict(os.environ)
    env["SCALE_INPUT"] = INPUT
    cmd = [
        "spark-submit",
        "--master",
        f"local[{cores}]",
        "--py-files",
        zip_path,
        os.path.join(REPO, "tools", "kg_job.py"),
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, env=env, timeout=2400
    )
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and "turns_per_sec" in line:
            return json.loads(line)
    raise RuntimeError(
        f"no result line from local[{cores}]:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main():
    from gliner_spark.plans.session import (
        _set_worker_env_defaults,
        build_package_zip,
    )

    # must be in OUR env before spark-submit forks: the JVM (and the python
    # workers it forks) inherit it from this process, not from kg_job.py,
    # which runs after the JVM is already up
    _set_worker_env_defaults()
    ensure_input()
    zip_path = build_package_zip()
    repeats = int(os.environ.get("SCALE_REPEATS", "2"))

    def best_of(cores: int) -> dict:
        runs = [run_at(cores, zip_path) for _ in range(repeats)]
        return max(runs, key=lambda r: r["turns_per_sec"])

    lo = best_of(8)
    hi = best_of(32)
    eff = hi["turns_per_sec"] / (4 * lo["turns_per_sec"])
    result = {
        "n_cores": 8,
        "n4_cores": 32,
        "n_turns": lo["n_turns"],
        "throughput_n": lo["turns_per_sec"],
        "throughput_4n": hi["turns_per_sec"],
        "wall_n_s": lo["wall_s"],
        "wall_4n_s": hi["wall_s"],
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))

    baseline = os.path.join(REPO, "BASELINE.md")
    with open(baseline) as f:
        txt = f.read()
    section = (
        "\n## Measured scaling (this sandbox)\n\n"
        "Flagship fused NER+RE triple extraction over identical parquet\n"
        f"input ({result['n_turns']} synthetic turns, 256 partitions),\n"
        f"best of {repeats} runs per level, via\n"
        "`spark-submit --py-files` (`tools/scaling_bench.py`). Both runs use\n"
        "`spark.task.cpus=2` (each task = 1 CPU-bound python worker + its\n"
        "JVM-side Arrow/scan thread — real-cluster executor sizing for\n"
        "Python-UDF-heavy stages; without it the 4N run oversubscribes the\n"
        "box 2 threads/core and measures contention, not the dataflow):\n\n"
        "| cores | wall (s) | turns/sec |\n|---|---|---|\n"
        f"| local[8] (N) | {result['wall_n_s']} | {result['throughput_n']} |\n"
        f"| local[32] (4N) | {result['wall_4n_s']} | {result['throughput_4n']} |\n\n"
        f"**Scaling efficiency N→4N: {result['scaling_efficiency']}** "
        "(target ≥ 0.8).\n"
    )
    # replace ONLY this section — stop at the next heading (the greedy
    # [\s\S]* version once ate the e2e-pipeline section that follows)
    m = re.search(r"\n## Measured scaling \(this sandbox\)\n", txt)
    if m:
        rest = txt[m.end():]
        nxt = re.search(r"\n## ", rest)
        tail = rest[nxt.start():] if nxt else ""
        txt = txt[: m.start()] + tail
    if not txt.endswith("\n"):
        txt += "\n"
    with open(baseline, "w") as f:
        f.write(txt + section)
    print(f"updated {baseline}")


if __name__ == "__main__":
    main()
