"""Mediator: long-lived job orchestrator driven by a config queue.

Counterpart of /root/reference/mediator.py:26-262. Receives JSON job configs
from a queue (Kafka or the file-queue fallback, see queues.py), assigns a
job_id and log name, writes a temp config file, and launches each job as an
ISOLATED `python -m nerfsys_tpu.runner` subprocess in a daemon thread. Jobs
never share a process; the mediator only tracks exit codes.

Device control: the reference sets CUDA_VISIBLE_DEVICES per job; the TPU
equivalent exposed here is TPU_VISIBLE_CHIPS / JAX_PLATFORMS passthrough via
the job's 'devices' field.

Run:  python -m nerfsys_tpu.orchestration.mediator \
          --broker file:///tmp/nerfsys_queue --topic nerf-configs
"""
from __future__ import annotations

import argparse
import datetime
import json
import logging
import os
import shutil
import subprocess
import tempfile
import threading
import uuid
from pathlib import Path
from typing import Iterable, Optional

from nerfsys_tpu.orchestration.queues import KafkaConsumer, KafkaTopicManager

logger = logging.getLogger("mediator")


def setup_logging(logs_dir="logs"):
    logs_dir = Path(logs_dir)
    logs_dir.mkdir(parents=True, exist_ok=True)
    log_path = logs_dir / "mediator.log"
    logger.setLevel(logging.INFO)
    logger.propagate = False
    fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    fh = logging.FileHandler(str(log_path), mode="a")
    fh.setFormatter(fmt)
    logger.addHandler(fh)
    ch = logging.StreamHandler()
    ch.setFormatter(fmt)
    logger.addHandler(ch)
    logger.info("========================= Starting Mediator =========================")


def cleanup_logs(logs_dir="logs", exclude_files: Optional[Iterable] = None):
    """Delete everything under logs/ except the excluded names
    (reference :49-64 / scripts/cleanup_logs.sh)."""
    if not os.path.isdir(logs_dir):
        return
    exclude = set(exclude_files or [])
    for name in os.listdir(logs_dir):
        if name in exclude:
            continue
        path = os.path.join(logs_dir, name)
        if os.path.isdir(path):
            shutil.rmtree(path)
        else:
            os.remove(path)


def listen_for_config(broker: str, topic: str, group_id: str):
    """Blocking generator of job-config dicts from the queue (:70-88)."""
    consumer = KafkaConsumer(
        {
            "bootstrap.servers": broker,
            "group.id": group_id,
            "auto.offset.reset": "latest",
        },
        topic,
    )
    logger.info(f"Listening for NeRF configs on topic '{topic}'...")
    try:
        while True:
            message = consumer.receive()
            if message is None:
                continue
            logger.info("Received new NeRF configuration")
            yield message
    finally:
        consumer.close()


def launch_process(
    script, config_path: Optional[str] = None, cwd: Optional[str] = None,
    devices: Optional[str] = None,
) -> subprocess.Popen:
    """Launch a runner subprocess with its own device visibility (:94-125)."""
    if isinstance(script, list):
        cmd = script
    elif isinstance(script, str):
        cmd = ["python", "-m", script] if not script.endswith(".py") else [
            "python", script
        ]
        if config_path:
            cmd.extend(["--configPath", config_path])
    else:
        raise TypeError("script must be a str or list")

    env = os.environ.copy()
    if cwd is not None:
        env["PYTHONPATH"] = (
            os.path.abspath(cwd) + os.pathsep + env.get("PYTHONPATH", "")
        )
    if devices is not None and str(devices).lower() != "all":
        # device selection: honored by both CUDA and TPU runtimes
        env["CUDA_VISIBLE_DEVICES"] = str(devices)
        env["TPU_VISIBLE_CHIPS"] = str(devices)
    return subprocess.Popen(
        cmd, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        cwd=cwd, env=env,
    )


def write_temp_config(cfg: dict) -> str:
    with tempfile.NamedTemporaryFile(mode="w", suffix=".json", delete=False) as tmp:
        json.dump(cfg, tmp, indent=4)
        return tmp.name


def handle_config(
    config: dict,
    devices: Optional[str] = None,
    runner: str = "nerfsys_tpu.runner",
    cwd: Optional[str] = None,
    threads: Optional[list] = None,
):
    """Assign job identity and spawn the job thread (:137-212)."""
    job_id = uuid.uuid4().hex[:12]
    op = config.get("op", "train")
    date = datetime.date.today().strftime("%y%m%d")
    config = dict(config)
    config["job_id"] = job_id
    config.setdefault("fname", f"{job_id}/{date}_{op}")
    logger.info(f"[job {job_id}] op={op} fname={config['fname']}")

    def run_nerf_thread():
        tmp_path = write_temp_config(config)
        try:
            proc = launch_process(
                runner, config_path=tmp_path, cwd=cwd, devices=devices
            )
            logger.info(f"[job {job_id}] started pid={proc.pid}")
            code = proc.wait()
            level = logging.INFO if code == 0 else logging.ERROR
            logger.log(level, f"[job {job_id}] exited with code {code}")
        except Exception:
            logger.exception(f"[job {job_id}] launcher crashed")
        finally:
            try:
                os.remove(tmp_path)
            except OSError:
                pass

    t = threading.Thread(target=run_nerf_thread, daemon=True, name=f"job-{job_id}")
    t.start()
    if threads is not None:
        threads.append(t)
    return job_id, t


def main(argv=None):
    p = argparse.ArgumentParser(description="NeRF job mediator")
    p.add_argument("--broker", default="file:///tmp/nerfsys_queue")
    p.add_argument("--topic", default="nerf-configs")
    p.add_argument("--group", default="nerf-mediator")
    p.add_argument("--devices", default="all")
    p.add_argument("--runner", default="nerfsys_tpu.runner")
    p.add_argument("--cwd", default=None)
    p.add_argument("--cleanup", action="store_true",
                   help="wipe logs/ (except 'example') on startup")
    p.add_argument("--max_jobs", type=int, default=None,
                   help="exit after handling N jobs (testing)")
    args = p.parse_args(argv)

    setup_logging()
    if args.cleanup:
        cleanup_logs(exclude_files=["example", "mediator.log"])

    KafkaTopicManager({"bootstrap.servers": args.broker}).create_topic(args.topic)

    handled = 0
    threads: list = []
    for config in listen_for_config(args.broker, args.topic, args.group):
        try:
            handle_config(config, devices=args.devices, runner=args.runner,
                          cwd=args.cwd, threads=threads)
        except Exception:
            logger.exception("failed to handle config")
        handled += 1
        if args.max_jobs is not None and handled >= args.max_jobs:
            logger.info(f"handled {handled} jobs; draining and exiting")
            for t in threads:
                t.join()
            break


if __name__ == "__main__":
    main()
