"""SparkSession factory.

Defaults are chosen for correctness-test runs on ``local[N]`` but every
knob is the one you would also set on a 1000-executor cluster reading
100 TB:

* AQE on (runtime coalescing, skew-join splitting, dynamic join
  strategy switch) -- at 100 TB the static ``shuffle.partitions``
  number is always wrong for *some* stage; AQE re-plans per stage.
* ``spark.sql.shuffle.partitions`` sized from the parallelism of the
  session rather than the 200 default (on a real cluster this would be
  2-3x total cores; AQE coalesces down when partitions are small).
* Arrow enabled for the few grouped-pandas operators (TextRank) so the
  Python boundary is batched, never row-at-a-time.
* Session timezone pinned to UTC so timestamp bucketing is
  deterministic and matches the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _local_scratch() -> str | None:
    """RAM-backed scratch root for LOCAL-mode runs, or None.

    Shuffle blocks, spills, broadcast files, and temporary streaming
    checkpoints are pure scratch: losing them loses nothing durable.
    On the local harness box /tmp sits on a virtio disk whose iowait
    dominates shuffle-heavy queries, while /dev/shm is an idle
    RAM-backed tmpfs -- so local mode points scratch there when the
    mount exists, is writable, AND has >= 32 GiB free (tmpfs capacity
    competes with process memory: a spill-heavy job on a small tmpfs
    would trade slow-but-finishing for ENOSPC, so a small or crowded
    /dev/shm falls back to disk scratch). Cluster deployments never
    take this path (non-local master): scratch placement there
    belongs to the cluster config (SSD-backed ``spark.local.dir`` per
    node / DFS checkpoints)."""
    root = "/dev/shm/cats-spark-scratch"
    try:
        # capacity probe BEFORE creating anything: a crowded tmpfs
        # must not even get the (empty) scratch root
        st = os.statvfs("/dev/shm")
        if st.f_bavail * st.f_frsize < 32 * 1024**3:
            return None
        # per-process scratch dir + sweep of dead sessions' debris:
        # crashed JVMs leave blockmgr-*/spark-* trees that would pin
        # RAM until reboot. Each session owns root/pid-<pid>, stamped
        # with the owner's /proc start time so a RECYCLED pid (same
        # number, different process -- os.kill(pid, 0) would call it
        # alive, or EPERM for another user's process) is still
        # reclaimed: the stamp and the current /proc starttime can
        # only differ if the original owner died.
        d = os.path.join(root, f"pid-{os.getpid()}")
        os.makedirs(d, exist_ok=True)
        try:
            own = _proc_starttime(os.getpid())
        except PermissionError:  # pragma: no cover - hidepid self-read
            own = None
        if own is not None:
            with open(os.path.join(d, ".owner-start"), "w") as f:
                f.write(own)
        _sweep_stale_scratch(root)
        probe = os.path.join(d, ".probe")
        with open(probe, "w"):
            pass
        os.remove(probe)
        return d
    except OSError:
        return None


def _proc_starttime(pid: int) -> str | None:
    """The process's start time in clock ticks since boot
    (/proc/<pid>/stat field 22) -- the (pid, starttime) pair uniquely
    names a process for the life of a boot, unlike the recyclable pid
    alone. None when the process is GONE or /proc is unavailable
    (non-Linux); PermissionError propagates -- on /proc mounted with
    hidepid, another user's LIVE process reads as EACCES/EPERM, and
    folding that into None would let the sweep rmtree a live foreign
    session's scratch. comm is parsed by splitting after the LAST ')',
    the standard defense against spaces/parens in the executable
    name."""
    try:
        with open(f"/proc/{pid}/stat") as f:
            rest = f.read().rsplit(")", 1)[1].split()
        return rest[19]
    except PermissionError:
        raise
    except (OSError, IndexError):
        return None


def _touched_within(path: str, seconds: float) -> bool:
    """True when ``path`` or anything under it has an mtime within the
    last ``seconds``. Early-exits on the first fresh entry, so a live
    scratch tree answers after a few stats; a true orphan pays one
    full walk immediately before its removal."""
    import time

    cutoff = time.time() - seconds
    try:
        if os.path.getmtime(path) > cutoff:
            return True
    except OSError:
        return True  # vanished mid-scan: do not treat as orphan
    for dirpath, dirnames, filenames in os.walk(path):
        for name in dirnames + filenames:
            try:
                if os.path.getmtime(os.path.join(dirpath, name)) > cutoff:
                    return True
            except OSError:
                continue
    return False


def _sweep_stale_scratch(root: str) -> None:
    """Reclaim scratch dirs whose owning session is provably gone.

    pid-* entries: dead when /proc/<pid> is absent, or present with a
    DIFFERENT start time than the dir's stamp (recycled pid). An
    unstamped dir (written by a pre-stamp version) with a live pid is
    left alone, and so is one whose /proc stat read is DENIED
    (hidepid: live process owned by another user). Without /proc (non-Linux), falls back to the
    os.kill(pid, 0) liveness probe, treating only ProcessLookupError
    as dead. Entries NOT named pid-* are legacy flat-layout debris
    (blockmgr-*/spark-* from before per-pid dirs); tmpfs never
    survives reboot, so an entry is an orphan only when NOTHING under
    it (recursively, early-exit scan) was touched within the hour --
    the top-level mtime alone goes quiet on a LIVE session whose
    writes land deep inside blockmgr subdirs, and deleting a live
    session's shuffle files mid-run is worse than leaving debris."""
    import shutil
    import time

    have_proc = os.path.exists("/proc/self/stat")
    for entry in os.listdir(root):
        path = os.path.join(root, entry)
        if not entry.startswith("pid-"):
            try:
                if not _touched_within(path, 3600):
                    shutil.rmtree(path, ignore_errors=True)
            except OSError:
                pass
            continue
        try:
            pid = int(entry[4:])
        except ValueError:
            continue
        if pid == os.getpid():
            continue
        dead = False
        if have_proc:
            try:
                st = _proc_starttime(pid)
            except PermissionError:
                continue  # hidepid: alive but foreign -- leave it alone
            if st is None:
                dead = True  # no /proc/<pid>/stat: process gone
            else:
                try:
                    with open(os.path.join(path, ".owner-start")) as f:
                        stamp = f.read().strip()
                    dead = stamp != "" and stamp != st  # recycled pid
                except OSError:
                    pass  # unstamped dir, live pid: leave it
        else:
            try:
                os.kill(pid, 0)
            except ProcessLookupError:
                dead = True
            except OSError:
                pass  # EPERM: alive but not ours
        if dead:
            shutil.rmtree(path, ignore_errors=True)


def get_spark(
    app_name: str = "conversation-analysis-tools-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (falling back to
    ``local[*]``) so the same entry points work under the driver harness
    and on a real cluster (where ``master`` is provided by spark-submit
    and this argument stays None).
    """
    builder = SparkSession.builder.appName(app_name)

    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master is not None:
        builder = builder.master(master)

    if shuffle_partitions is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        shuffle_partitions = max(cpus, 8)

    conf = {
        # --- planner / optimizer ---
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        # --- scan sizing: at 100 TB this bounds per-task input ---
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
        "spark.sql.parquet.filterPushdown": "true",
        "spark.sql.parquet.aggregatePushdown": "true",
        # InferFiltersFromGenerate copies the ENTIRE generator child
        # expression into an inferred size()>0 filter that predicate
        # pushdown then sinks below projections and exchanges -- for
        # our explode(regexp/shingle/minhash(...)) chains the heavy
        # expression is then evaluated twice per row, the second time
        # below the parallelizing repartition (measured 2.1x wall on
        # the shingle path, 5 regexp evals per row in the pushed
        # filter). The rule only ever prunes empty arrays, which our
        # generators produce rarely; excluding it is strictly better
        # for this workload.
        "spark.sql.optimizer.excludedRules": (
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
        ),
        # Wide-aggregate codegen: the default 100-field cap drops the
        # threshold-tuned MinHash signature aggregate (up to 2*256
        # min columns, operators/dedup.tuned_lsh_pairs) out of
        # whole-stage codegen into interpreted mode -- measured 3.2x
        # on the sf1 signature stage (1.3 s -> 0.4 s). 600 covers the
        # widest plan in this repo INCLUDING the clamp edge (b=256 ->
        # 512 hash columns + id and join-side columns; a 500 cap
        # would silently re-introduce the interpreted regression
        # exactly at thresholds <= ~0.123 where the solver hits the
        # clamp). Spark splits oversized generated methods itself and
        # falls back per-plan past hugeMethodLimit, so the only cost
        # is compile time on plans that were already near the cap.
        "spark.sql.codegen.maxFields": "600",
        # PySpark wraps every DataFrame-API call in a call-site
        # capture (errors/utils._with_origin) that costs a conf.get +
        # origin set/clear py4j round trip each, plus a Python stack
        # walk -- ~3 socket round trips per Column/DataFrame method.
        # Plan-build-heavy operators pay seconds of this (measured:
        # 4,499 round trips building edit_distance_pairs). The flag
        # only enriches error MESSAGES with Python call sites; plans
        # and results are untouched, so it is off engine-wide.
        "spark.python.sql.dataFrameDebugging.enabled": "false",
        # --- Python boundary: Arrow batches, never per-row pickling ---
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        # --- determinism for the oracle comparison ---
        "spark.sql.session.timeZone": "UTC",
        # local-mode niceties (harmless on a cluster)
        "spark.ui.enabled": "false",
        "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
    }
    if master is not None and master.startswith("local"):
        scratch = _local_scratch()
        if scratch:
            local_dir = os.path.join(scratch, "local")
            tmp_dir = os.path.join(scratch, "tmp")
            os.makedirs(local_dir, exist_ok=True)
            os.makedirs(tmp_dir, exist_ok=True)
            conf["spark.local.dir"] = local_dir
            # temporary streaming checkpoints (memory-sink drains) are
            # created under java.io.tmpdir and auto-deleted on stop
            conf["spark.driver.extraJavaOptions"] = f"-Djava.io.tmpdir={tmp_dir}"
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)

    return builder.getOrCreate()
