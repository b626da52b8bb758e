import json
import os
import subprocess
import sys
import time
from pathlib import Path

from nerfsys_tpu.orchestration.mediator import (
    cleanup_logs,
    handle_config,
    write_temp_config,
)
from nerfsys_tpu.orchestration.queues import (
    KafkaConsumer,
    KafkaProducer,
    KafkaTopicManager,
)


def conf(tmp_path):
    return {"bootstrap.servers": f"file://{tmp_path}/queue", "group.id": "t"}


def test_file_queue_roundtrip(tmp_path):
    c = conf(tmp_path)
    KafkaTopicManager(c).create_topic("jobs")
    prod = KafkaProducer(c)
    cons = KafkaConsumer(c, "jobs")
    prod.send("jobs", {"op": "train", "x": 1})
    prod.send("jobs", {"op": "eval", "x": 2})
    assert cons.receive(timeout=2) == {"op": "train", "x": 1}
    assert cons.receive(timeout=2) == {"op": "eval", "x": 2}
    assert cons.receive(timeout=0.3) is None  # drained


def test_file_queue_offset_persistence(tmp_path):
    c = conf(tmp_path)
    KafkaProducer(c).send("jobs", {"n": 1})
    cons1 = KafkaConsumer(c, "jobs")
    assert cons1.receive(timeout=2)["n"] == 1
    # a new consumer with the same group resumes after the offset
    KafkaProducer(c).send("jobs", {"n": 2})
    cons2 = KafkaConsumer(c, "jobs")
    assert cons2.receive(timeout=2)["n"] == 2


def test_file_queue_groups_independent(tmp_path):
    c1 = {**conf(tmp_path), "group.id": "a"}
    c2 = {**conf(tmp_path), "group.id": "b"}
    KafkaProducer(c1).send("jobs", {"n": 1})
    assert KafkaConsumer(c1, "jobs").receive(timeout=2)["n"] == 1
    assert KafkaConsumer(c2, "jobs").receive(timeout=2)["n"] == 1


def test_poison_message_skipped(tmp_path):
    c = conf(tmp_path)
    KafkaTopicManager(c).create_topic("jobs")
    qdir = Path(tmp_path) / "queue" / "jobs"
    (qdir / f"{1:020d}.json").write_text("{not json")
    KafkaProducer(c).send("jobs", {"ok": True})
    cons = KafkaConsumer(c, "jobs")
    assert cons.receive(timeout=2) == {"ok": True}


def test_handle_config_runs_subprocess(tmp_path):
    """handle_config must spawn an isolated process that consumes the temp
    config; use a trivial echo runner script."""
    marker = tmp_path / "ran.json"
    runner = tmp_path / "fake_runner.py"
    runner.write_text(
        "import json, sys\n"
        "i = sys.argv.index('--configPath')\n"
        f"cfg = json.load(open(sys.argv[i+1]))\n"
        f"json.dump(cfg, open({str(marker)!r}, 'w'))\n"
    )
    job_id, t = handle_config(
        {"op": "train", "seed": 7}, runner=str(runner), threads=[]
    )
    t.join(timeout=30)
    assert marker.exists()
    out = json.loads(marker.read_text())
    assert out["op"] == "train" and out["seed"] == 7
    assert out["job_id"] == job_id
    assert "fname" in out


def test_write_temp_config_and_cleanup(tmp_path):
    p = write_temp_config({"a": 1})
    assert json.loads(Path(p).read_text()) == {"a": 1}
    Path(p).unlink()

    logs = tmp_path / "logs"
    (logs / "job1").mkdir(parents=True)
    (logs / "example").mkdir()
    (logs / "mediator.log").write_text("x")
    cleanup_logs(str(logs), exclude_files=["example"])
    assert not (logs / "job1").exists()
    assert (logs / "example").exists()
    assert not (logs / "mediator.log").exists()


def test_mediator_end_to_end(tmp_path):
    """Full loop: send_config -> mediator (max_jobs=1) -> fake runner ran."""
    marker = tmp_path / "ran.txt"
    runner = tmp_path / "fake_runner.py"
    runner.write_text(
        f"open({str(marker)!r}, 'w').write('ok')\n"
    )
    broker = f"file://{tmp_path}/queue"
    cfg_file = tmp_path / "job.json"
    cfg_file.write_text(json.dumps({"op": "eval"}))

    # cwd is a tmp dir so the mediator's logs/ tree (mediator.log, per-job
    # dirs) lands there, not in the repo checkout
    env = dict(os.environ, PYTHONPATH="/root/repo")
    subprocess.run(
        [sys.executable, "-m", "nerfsys_tpu.orchestration.send_config",
         str(cfg_file), "--broker", broker],
        check=True, cwd=str(tmp_path), env=env,
    )
    subprocess.run(
        [sys.executable, "-m", "nerfsys_tpu.orchestration.mediator",
         "--broker", broker, "--runner", str(runner), "--max_jobs", "1"],
        check=True, cwd=str(tmp_path), timeout=60, env=env,
    )
    assert (tmp_path / "logs" / "mediator.log").exists()
    deadline = time.time() + 15
    while not marker.exists() and time.time() < deadline:
        time.sleep(0.2)
    assert marker.exists()


def test_distributed_helpers_single_process():
    import numpy as np

    from nerfsys_tpu.parallel.distributed import (
        all_reduce_host_scalars,
        broadcast_from_host0,
        local_stride,
        maybe_initialize,
        process_info,
    )

    assert maybe_initialize() is False  # single-process: no-op
    rank, world = process_info()
    assert rank == 0 and world >= 1
    idx = local_stride(10)
    np.testing.assert_array_equal(idx, np.arange(0, 10, world))
    out = all_reduce_host_scalars({"a": 1.0, "b": 2.0})
    assert out == {"a": 1.0, "b": 2.0}
    tree = {"x": np.ones(3)}
    np.testing.assert_array_equal(broadcast_from_host0(tree)["x"], tree["x"])
