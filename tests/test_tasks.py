"""Task DB state machine over both backends (reference tasks/tests/main.rs
randomized workload model)."""

import random

import pytest

from raiko_tpu.tasks import TaskDescriptor, TaskStatus, get_task_manager


@pytest.fixture(params=["memory", "sqlite"])
def manager(request, tmp_path):
    if request.param == "sqlite":
        return get_task_manager(str(tmp_path / "tasks.db"))
    return get_task_manager(None)


def _key(i=0):
    return TaskDescriptor(
        chain_id=167009,
        blockhash=bytes([i]) * 32,
        proof_system="native",
        prover="0x" + "11" * 20,
    )


def test_enqueue_and_status(manager):
    key = _key()
    hist = manager.enqueue_task(key)
    assert hist[-1][0] == TaskStatus.REGISTERED
    # re-enqueue returns existing history
    hist2 = manager.enqueue_task(key)
    assert len(hist2) == 1
    manager.update_task_progress(key, TaskStatus.WORK_IN_PROGRESS)
    manager.update_task_progress(key, TaskStatus.WORK_IN_PROGRESS)  # no dup
    hist = manager.get_task_proving_status(key)
    assert [s for s, _, _ in hist] == [
        TaskStatus.REGISTERED,
        TaskStatus.WORK_IN_PROGRESS,
    ]


def test_proof_roundtrip(manager):
    key = _key(1)
    manager.enqueue_task(key)
    manager.update_task_progress(key, TaskStatus.SUCCESS, proof=b"\x01\x02")
    assert manager.get_task_proof(key) == b"\x01\x02"
    with pytest.raises(KeyError):
        manager.get_task_proof(_key(9))


def test_report_and_prune(manager):
    for i in range(3):
        manager.enqueue_task(_key(i))
    manager.update_task_progress(_key(1), TaskStatus.SUCCESS, proof=b"p")
    tasks = manager.list_all_tasks()
    assert len(tasks) == 3
    statuses = {k.blockhash[0]: s for k, s in tasks}
    assert statuses[1] == TaskStatus.SUCCESS
    assert statuses[0] == TaskStatus.REGISTERED
    manager.prune_db()
    assert manager.list_all_tasks() == []


def test_id_store(manager):
    key = (167009, b"\x05" * 32, "tpu_stark")
    manager.store_id(key, "session-123")
    assert manager.read_id(key) == "session-123"
    manager.remove_id(key)
    assert manager.read_id(key) is None


def test_randomized_workload(manager):
    rng = random.Random(0)
    keys = [_key(i) for i in range(10)]
    expected = {}
    for _ in range(200):
        k = rng.choice(keys)
        op = rng.random()
        if op < 0.3:
            manager.enqueue_task(k)
            expected.setdefault(k, TaskStatus.REGISTERED)
        elif op < 0.7:
            st = rng.choice(
                [
                    TaskStatus.WORK_IN_PROGRESS,
                    TaskStatus.PROOF_FAILURE_GENERIC,
                    TaskStatus.CANCELLED,
                ]
            )
            manager.update_task_progress(k, st)
            expected[k] = st
        else:
            manager.update_task_progress(k, TaskStatus.SUCCESS, proof=b"z")
            expected[k] = TaskStatus.SUCCESS
    for k, st in expected.items():
        hist = manager.get_task_proving_status(k)
        assert hist[-1][0] == st
