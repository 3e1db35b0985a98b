"""Control layer: job scheduler queues + signals.

Reference behaviors: `src/control/jobs.{c,h}` (5 priority queues,
droppable SYSTEM_FG, serialized USER_EXPORT, reserved device worker),
`signal.{c,h}` (pub/sub)."""

import threading
import time

from ansel_tpu.control import Scheduler, SignalBus
from ansel_tpu.control.jobs import (JobState, QUEUE_SYSTEM_FG,
                                    QUEUE_USER_EXPORT)


def test_jobs_run_and_report():
    s = Scheduler(workers=2)
    try:
        job = s.dispatch(lambda j: 41 + 1, description="math")
        assert job.wait(5.0)
        assert job.state is JobState.FINISHED and job.result == 42
        bad = s.dispatch(lambda j: 1 / 0)
        assert bad.wait(5.0)
        assert bad.state is JobState.FAILED
        assert isinstance(bad.error, ZeroDivisionError)
    finally:
        s.shutdown()


def test_export_queue_is_serialized():
    s = Scheduler(workers=4)
    active = []
    peak = []
    lock = threading.Lock()

    def work(job):
        with lock:
            active.append(1)
            peak.append(len(active))
        time.sleep(0.05)
        with lock:
            active.pop()

    try:
        jobs = [s.dispatch(work, queue_id=QUEUE_USER_EXPORT)
                for _ in range(4)]
        for j in jobs:
            assert j.wait(10.0)
        assert max(peak) == 1  # one export at a time (jobs.h USER_EXPORT)
    finally:
        s.shutdown()


def test_droppable_queue_replaces_stale_thumbnails():
    s = Scheduler(workers=1)
    try:
        blocker = threading.Event()
        s.dispatch(lambda j: blocker.wait(5.0))  # occupy the worker
        j1 = s.dispatch(lambda j: "old", queue_id=QUEUE_SYSTEM_FG,
                        drop_key="thumb:42")
        j2 = s.dispatch(lambda j: "new", queue_id=QUEUE_SYSTEM_FG,
                        drop_key="thumb:42")
        blocker.set()
        assert j2.wait(5.0)
        assert j2.result == "new"
        assert j1.state is JobState.CANCELLED
    finally:
        s.shutdown()


def test_device_jobs_use_reserved_worker():
    s = Scheduler(workers=2)
    names = []

    def record(job):
        names.append(threading.current_thread().name)

    try:
        jobs = [s.dispatch(record, device=True) for _ in range(3)]
        for j in jobs:
            assert j.wait(5.0)
        assert set(names) == {"device-worker"}
    finally:
        s.shutdown()


def test_signals_pub_sub():
    bus = SignalBus()
    got = []
    h = bus.connect("HISTORY_CHANGED", lambda **kw: got.append(kw))
    bus.emit("HISTORY_CHANGED", imgid=7)
    bus.disconnect("HISTORY_CHANGED", h)
    bus.emit("HISTORY_CHANGED", imgid=8)
    assert got == [{"imgid": 7}]


def test_scheduler_emits_job_signals():
    bus = SignalBus()
    events = []
    bus.connect("JOB_FINISHED", lambda **kw: events.append(
        kw["job"].state))
    s = Scheduler(workers=1, signals=bus)
    try:
        job = s.dispatch(lambda j: None)
        assert job.wait(5.0)
        time.sleep(0.05)
        assert JobState.FINISHED in events
    finally:
        s.shutdown()


def test_conf_resolution_order(tmp_path, monkeypatch):
    """runtime > env > file > default (common/conf.c semantics)."""
    from ansel_tpu.core import conf

    conf.register("test.knob", 10)
    assert conf.get_int("test.knob") == 10
    rc = tmp_path / "rc"
    rc.write_text("test.knob=20\n")
    conf.load_file(str(rc))
    assert conf.get_int("test.knob") == 20
    monkeypatch.setenv("ANSEL_TPU_TEST_KNOB", "30")
    assert conf.get_int("test.knob") == 30
    conf.set("test.knob", 40)
    assert conf.get_int("test.knob") == 40
    conf.save_file(str(tmp_path / "rc2"))
    assert "test.knob=40" in (tmp_path / "rc2").read_text()


def test_structured_log_ring_and_domains(capsys):
    from ansel_tpu.core import log

    log.clear()
    log.log("perf", "hidden")         # domain disabled -> ring only
    log.enable("perf")
    log.log("perf", "stage timing", op="exposure", ms=1.5)
    log.disable("perf")
    recs = log.records("perf")
    assert len(recs) == 2
    assert "op=exposure" in recs[1][2]
    err = capsys.readouterr().err
    assert "hidden" not in err and "stage timing" in err
