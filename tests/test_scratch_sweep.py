"""Stale-scratch sweep: recycled-pid detection via /proc start-time
stamps, legacy flat-layout reclamation (session.py)."""

import os
import time

import pytest

from conversation_analysis_tools_spark.session import (
    _proc_starttime,
    _sweep_stale_scratch,
)

pytestmark = pytest.mark.skipif(
    not os.path.exists("/proc/self/stat"), reason="needs Linux /proc"
)


def _mk(root, name, stamp=None):
    d = os.path.join(root, name)
    os.makedirs(d)
    if stamp is not None:
        with open(os.path.join(d, ".owner-start"), "w") as f:
            f.write(stamp)
    return d


def test_own_starttime_parses():
    st = _proc_starttime(os.getpid())
    assert st is not None and st.isdigit()


def test_sweep_dead_recycled_live_and_legacy(tmp_path):
    root = str(tmp_path)
    # dead pid: no /proc entry -> swept even without a stamp
    dead_pid = 4194000  # near pid_max; vanishingly unlikely to exist
    while os.path.exists(f"/proc/{dead_pid}"):
        dead_pid -= 1
    dead = _mk(root, f"pid-{dead_pid}")
    # recycled pid: pid 1 is alive but its start time can never match
    # a bogus stamp -> swept (os.kill(1, 0) would have said EPERM/alive)
    recycled = _mk(root, "pid-1", stamp="999999999999")
    # live pid, correct stamp: a child we spawn (this process is
    # skipped by pid, and the PARENT pid is unreliable -- a daemonized
    # test runner reparents to pid 1 and would collide with the
    # recycled entry above)
    import subprocess

    child = subprocess.Popen(["sleep", "60"])
    live = _mk(root, f"pid-{child.pid}", stamp=_proc_starttime(child.pid) or "")
    # live pid, pre-stamp dir (no marker): must be left alone
    unstamped = _mk(root, "pid-1x")  # malformed -> ignored entirely
    legacy_old = _mk(root, "blockmgr-legacy")
    os.utime(legacy_old, (time.time() - 7200, time.time() - 7200))
    legacy_new = _mk(root, "spark-recent")

    try:
        _sweep_stale_scratch(root)
    finally:
        child.terminate()
        child.wait()

    assert not os.path.exists(dead)
    assert not os.path.exists(recycled)
    assert os.path.exists(live)
    assert os.path.exists(unstamped)
    assert not os.path.exists(legacy_old)  # >1 h orphan reclaimed
    assert os.path.exists(legacy_new)  # too fresh to reclaim


def test_sweep_keeps_unstamped_live_pid(tmp_path):
    root = str(tmp_path)
    d = _mk(root, "pid-1")  # alive, no stamp -> cannot prove recycled
    _sweep_stale_scratch(root)
    assert os.path.exists(d)


def test_sweep_leaves_permission_denied_pid(tmp_path, monkeypatch):
    """hidepid-style /proc: a foreign user's LIVE process reads as
    PermissionError from /proc/<pid>/stat. That must mean
    alive-but-foreign (leave the dir), never dead -- folding it into
    the None/gone case would rmtree a live session's shuffle scratch
    mid-run."""
    from conversation_analysis_tools_spark import session as sess

    root = str(tmp_path)
    d = _mk(root, "pid-2", stamp="123")

    def denied(pid):
        if pid == 2:
            raise PermissionError(13, "Permission denied")
        return _proc_starttime(pid)

    monkeypatch.setattr(sess, "_proc_starttime", denied)
    sess._sweep_stale_scratch(root)
    assert os.path.exists(d)
