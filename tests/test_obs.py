"""Observability tests: logger sinks, metrics stream, job registry
leases / one-writer lock / vacuum, job manager cancellation
(SURVEY §5)."""

import time

from tpu2048.obs.jobs import JobManager, JobRegistry
from tpu2048.obs.logging import Logger
from tpu2048.obs.metrics import MetricsWriter, train_history
from tpu2048.store.artifacts import MemoryStore


def test_logger_store_sink_and_tail():
    store = MemoryStore()
    log = Logger(store=store, key="l/test.txt", console=False)
    log.add("line one")
    log.add("line two")
    assert log.tail() == "line one\nline two\n"
    log.clear()
    assert log.tail() == ""


def test_metrics_writer_and_history():
    store = MemoryStore()
    mw = MetricsWriter(store, "agent1")
    mw.write({"kind": "ma100", "episodes": 100, "ma100": 1500})
    mw.write({"kind": "ma100", "episodes": 200, "ma100": 2500})
    mw.write({"kind": "summary1000", "episodes": 1000, "avg1000": 2000.0})
    recs = mw.read()
    assert len(recs) == 3
    assert all("ts" in r for r in recs)
    assert train_history(store, "agent1") == [1500, 2500]


def test_registry_lease_lock_and_release():
    store = MemoryStore()
    reg = JobRegistry(store, lease_sec=60)
    assert reg.acquire("agent", "bob", parent="sess1")
    # another session cannot take the lease (one-training-per-agent)
    assert not reg.acquire("agent", "bob", parent="sess2")
    # same parent refreshes fine
    assert reg.acquire("agent", "bob", parent="sess1")
    assert reg.holder("agent", "bob") == "sess1"
    reg.release("agent", "bob")
    assert reg.holder("agent", "bob") is None
    assert reg.acquire("agent", "bob", parent="sess2")


def test_registry_expiry_and_vacuum():
    store = MemoryStore()
    reg = JobRegistry(store, lease_sec=0.05)
    store.save("l/orphan.txt", "zombie log")
    assert reg.acquire("log", "l/orphan.txt", parent="sess1")
    assert reg.acquire("agent", "bob", parent="sess1")
    time.sleep(0.1)
    # expired lease no longer blocks a new owner
    assert reg.acquire("agent", "bob", parent="sess2")
    removed = reg.vacuum()
    assert "log/l/orphan.txt" in removed
    assert not store.exists("l/orphan.txt")  # orphan log reaped


def test_heartbeat_extends_leases():
    store = MemoryStore()
    reg = JobRegistry(store, lease_sec=0.2)
    reg.acquire("agent", "bob", parent="sess1")
    for _ in range(3):
        time.sleep(0.1)
        reg.heartbeat("sess1")
    assert reg.holder("agent", "bob") == "sess1"


def test_job_manager_runs_and_cancels():
    jm = JobManager()
    seen = []

    def body(job):
        while not job.should_stop():
            seen.append(1)
            time.sleep(0.01)
        return "stopped"

    job = jm.start(body, "train", "bob")
    time.sleep(0.05)
    assert job.alive
    jm.cancel("train", "bob")
    job.thread.join(timeout=2)
    assert not job.alive
    assert job.result == "stopped"
    assert len(seen) > 0


def test_job_manager_new_job_supersedes_old():
    jm = JobManager()

    def body(job):
        while not job.should_stop():
            time.sleep(0.01)
        return "done"

    j1 = jm.start(body, "watch", "bob")
    j2 = jm.start(body, "watch", "bob")
    j1.thread.join(timeout=2)
    assert not j1.alive  # superseded job was cancelled
    assert j2.alive
    j2.cancel()
    j2.thread.join(timeout=2)


def test_job_manager_exclusive_lock():
    store = MemoryStore()
    reg = JobRegistry(store, lease_sec=60)
    jm = JobManager(registry=reg)

    def body(job):
        while not job.should_stop():
            time.sleep(0.01)

    jm.start(body, "agent", "bob", parent="sess1", exclusive=True)
    try:
        import pytest

        with pytest.raises(RuntimeError):
            jm2 = JobManager(registry=reg)
            jm2.start(body, "agent", "bob", parent="sess2", exclusive=True)
    finally:
        jm.cancel("agent", "bob")


def test_job_error_captured():
    jm = JobManager()

    def body(job):
        raise ValueError("boom")

    job = jm.start(body, "train", "x")
    job.thread.join(timeout=2)
    assert job.error == "ValueError: boom"


def test_memory_telemetry_snapshot_and_monitor():
    """Memory telemetry parity (reference start.py:131-141): RSS
    sampling into an appendable memory_usage.txt artifact, rate-limited
    and trimmed."""
    from tpu2048.obs import telemetry
    from tpu2048.store.artifacts import MemoryStore

    s = telemetry.snapshot()
    assert s["rss_mb"] > 10  # a real python process
    store = MemoryStore()
    mon = telemetry.MemoryMonitor(store, min_interval=0.0, max_lines=5)
    assert mon.sample(tag="t") is not None
    assert "rss = " in store.load("memory_usage.txt")
    # rate limit: immediate resample is suppressed
    mon.min_interval = 60.0
    assert mon.sample() is None
    # trim keeps the artifact bounded
    mon.min_interval = 0.0
    for _ in range(10):
        mon.sample()
    assert len(store.load("memory_usage.txt").splitlines()) <= 5
    assert "rss = " in mon.tail()


def test_service_heartbeat_samples_memory():
    from tpu2048.apps.service import AppService
    from tpu2048.store.artifacts import MemoryStore

    svc = AppService(MemoryStore())
    svc.memory.min_interval = 0.0
    svc.heartbeat("web")
    st = svc.system_stats()
    assert st["now"]["rss_mb"] > 0
    assert "rss = " in st["history"]
