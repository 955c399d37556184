"""Two-cluster-size scaling protocol (north rule: throughput scaling
efficiency ≥ 0.8 from N to 4N executors; sandbox proxy = local[8] vs
local[32] on identical input, via spark-submit --py-files).

1. Writes a fixed ~900k-turn synthetic transcripts parquet (once).
2. Runs SCALE_PROTOCOL_RUNS (default 5) PAIRED protocol runs, each
   launching tools/kg_job.py at local[8] then local[32]; per-run
   efficiency = throughput_4N / (4 × throughput_N).
3. Headline = MEDIAN of the per-run efficiencies, band = min–max — the
   shared VM has ±40% noisy-neighbor variance (r02 band 0.76–0.959), so
   a best-of headline could mask a real regression behind one quiet
   run; a median of ≥5 cannot. Exits nonzero if the median is < 0.8.
4. Updates the "Measured scaling" section of BASELINE.md.
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
    cmd = []
    if os.environ.get("SCALE_PIN", "1") == "1" and cores < os.cpu_count():
        # local[N] caps TASK SLOTS at N, not threads: the JVM's GC/Arrow/
        # netty/scan pools still size themselves to (and run on) all 32
        # cores, so an unpinned "8-core" run is really 8 slots on a
        # 32-core machine — more machine than an 8-core cluster node has,
        # which inflates throughput_N and understates scaling efficiency.
        # taskset restricts the whole process tree (JVM + forked python
        # workers) to N physical cores; the JVM reads the affinity mask
        # for availableProcessors so its pools size honestly too.
        cmd = ["taskset", "-c", f"0-{cores - 1}"]
    cmd += [
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
    runs = int(os.environ.get("SCALE_PROTOCOL_RUNS", "5"))

    pairs: list[tuple[float, dict, dict]] = []
    for i in range(runs):
        lo = run_at(8, zip_path)
        hi = run_at(32, zip_path)
        eff = hi["turns_per_sec"] / (4 * lo["turns_per_sec"])
        pairs.append((eff, lo, hi))
        print(
            json.dumps(
                {
                    "protocol_run": i + 1,
                    "of": runs,
                    "efficiency": round(eff, 3),
                    "throughput_n": lo["turns_per_sec"],
                    "throughput_4n": hi["turns_per_sec"],
                }
            ),
            flush=True,
        )

    import statistics

    effs = sorted(e for e, _, _ in pairs)
    med = statistics.median(effs)
    # representative pair for the wall/throughput table: closest to median
    _, lo, hi = min(pairs, key=lambda p: abs(p[0] - med))
    result = {
        "n_cores": 8,
        "n4_cores": 32,
        "n_turns": lo["n_turns"],
        "n_protocol_runs": runs,
        "throughput_n": lo["turns_per_sec"],
        "throughput_4n": hi["turns_per_sec"],
        "wall_n_s": lo["wall_s"],
        "wall_4n_s": hi["wall_s"],
        "scaling_efficiency": round(med, 3),
        "efficiency_band": [round(effs[0], 3), round(effs[-1], 3)],
    }
    print(json.dumps(result))

    baseline = os.path.join(REPO, "BASELINE.md")
    with open(baseline) as f:
        txt = f.read()
    section = (
        "\n## Measured scaling (this sandbox)\n\n"
        "Flagship fused NER+RE triple extraction over identical parquet\n"
        f"input ({result['n_turns']} synthetic turns, 256 partitions),\n"
        f"MEDIAN of {runs} paired protocol runs (each = one local[8] +\n"
        "one local[32] launch; per-run efficiency, then median — outlier-\n"
        "proof against this VM's ±40% noisy-neighbor variance), via\n"
        "`spark-submit --py-files` (`tools/scaling_bench.py`). All runs use\n"
        "`spark.task.cpus=2` (each task = 1 CPU-bound python worker + its\n"
        "JVM-side Arrow/scan thread — real-cluster executor sizing for\n"
        "Python-UDF-heavy stages; without it the 4N run oversubscribes the\n"
        "box 2 threads/core and measures contention, not the dataflow).\n"
        "Median protocol run:\n\n"
        "| cores | wall (s) | turns/sec |\n|---|---|---|\n"
        f"| local[8] (N) | {result['wall_n_s']} | {result['throughput_n']} |\n"
        f"| local[32] (4N) | {result['wall_4n_s']} | {result['throughput_4n']} |\n\n"
        f"**Scaling efficiency N→4N: median {result['scaling_efficiency']}"
        f"** (target ≥ 0.8), band "
        f"{result['efficiency_band'][0]}–{result['efficiency_band'][1]} "
        f"across the {runs} runs.\n"
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
    if med < 0.8:
        print(
            f"FAIL: median scaling efficiency {med:.3f} < 0.8 over {runs} "
            f"protocol runs (band {effs[0]:.3f}-{effs[-1]:.3f}) — a real "
            "regression, not a noisy outlier",
            file=sys.stderr,
        )
        sys.exit(1)


if __name__ == "__main__":
    main()
