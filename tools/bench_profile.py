"""Per-job time attribution for bench queries (guide §1: measure first).

Runs the named queries (default: the bench HEADLINE list) with the
Spark event log enabled, then parses the log to attribute wall time
inside each query to its individual jobs and stages -- the local-mode
stand-in for the Spark UI (disabled in this harness). Prints, per
query, the timed wall of the LAST trial plus every job that ran in it
(duration, number of stages, stage names truncated), so the expensive
job inside a 10-job query is visible instead of guessed.

Usage: python tools/bench_profile.py [query ...]
       python tools/bench_profile.py --trials 3 nlp_tfidf nlp_relevance

Methodology matches bench.py (collect() on local[$SPARK_GRAFT_CPUS],
warmup query first, release_all between trials); this tool is
diagnostic only and changes nothing the driver measures.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/cats-bench-profile-events"


def main() -> None:
    args = [a for a in sys.argv[1:]]
    trials = 2
    if "--trials" in args:
        i = args.index("--trials")
        trials = int(args[i + 1])
        del args[i : i + 2]

    from conversation_analysis_tools_spark.operators.cache import release_all
    from conversation_analysis_tools_spark.session import get_spark

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        master=f"local[{cpus}]",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            # plain-text single-file log: no zstd bindings on this box
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = args or bench.HEADLINE

    qs["group_counts"](spark, sf_dir).collect()

    sc = spark.sparkContext
    walls: dict[str, list[float]] = {}
    for name in names:
        walls[name] = []
        for i in range(trials):
            if i == trials - 1:
                sc.setJobGroup(f"profile:{name}", name)
            t0 = time.time()
            qs[name](spark, sf_dir).collect()
            walls[name].append(time.time() - t0)
            if i == trials - 1:
                sc.setLocalProperty("spark.jobGroup.id", None)
                sc.setLocalProperty("spark.job.description", None)
                sc.setLocalProperty("spark.job.interruptOnCancel", None)
            release_all()
    spark.stop()

    report(names, walls)


def report(names, walls) -> None:
    # one application log file in EVDIR (possibly .inprogress)
    paths = []
    for f in os.listdir(EVDIR):
        p = os.path.join(EVDIR, f)
        if f.startswith("."):
            continue
        if os.path.isdir(p):  # Spark 4 rolling event log v2 directory
            paths += [
                os.path.join(p, g)
                for g in os.listdir(p)
                if g.startswith("events_")
            ]
        else:
            paths.append(p)
    events = []
    for p in paths:
        if p.endswith(".zstd"):
            import zstandard

            with open(p, "rb") as fb:
                data = zstandard.ZstdDecompressor().stream_reader(fb).read()
            lines = data.decode("utf-8", errors="replace").splitlines()
        else:
            with open(p) as f:
                lines = f.read().splitlines()
        for line in lines:
            try:
                events.append(json.loads(line))
            except json.JSONDecodeError:
                pass

    job_group: dict[int, str] = {}
    job_t0: dict[int, float] = {}
    job_dur: dict[int, float] = {}
    job_stages: dict[int, list[int]] = {}
    stage_info: dict[int, tuple[str, float, int]] = {}
    for ev in events:
        k = ev.get("Event")
        if k == "SparkListenerJobStart":
            jid = ev["Job ID"]
            props = ev.get("Properties") or {}
            job_group[jid] = props.get("spark.jobGroup.id", "")
            job_t0[jid] = ev.get("Submission Time", 0) / 1000.0
            job_stages[jid] = [
                s["Stage ID"] for s in ev.get("Stage Infos", [])
            ]
        elif k == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in job_t0:
                job_dur[jid] = ev.get("Completion Time", 0) / 1000.0 - job_t0[jid]
        elif k == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sub = si.get("Submission Time")
            com = si.get("Completion Time")
            dur = (com - sub) / 1000.0 if sub and com else 0.0
            stage_info[si["Stage ID"]] = (
                si.get("Stage Name", ""),
                dur,
                si.get("Number of Tasks", 0),
            )

    for name in names:
        grp = f"profile:{name}"
        jids = sorted(j for j, g in job_group.items() if g == grp)
        w = walls[name]
        print(f"\n=== {name}: trials={['%.3f' % x for x in w]} "
              f"last-trial jobs={len(jids)} "
              f"job-sum={sum(job_dur.get(j, 0) for j in jids):.3f}s ===")
        for j in jids:
            stages = job_stages.get(j, [])
            ran = [s for s in stages if s in stage_info]
            names_s = ",".join(
                f"{stage_info[s][0].split(' at ')[0]}:{stage_info[s][1]:.2f}s"
                for s in sorted(ran, key=lambda s: -stage_info[s][1])[:4]
            )
            print(
                f"  job {j}: {job_dur.get(j, float('nan')):6.3f}s "
                f"stages={len(stages)} ran={len(ran)} [{names_s}]"
            )


if __name__ == "__main__":
    main()
