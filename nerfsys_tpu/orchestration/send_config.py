"""CLI client: publish a job-config JSON to the mediator's queue.

Counterpart of /root/reference/scripts/send_config.py:26-63.

    python -m nerfsys_tpu.orchestration.send_config configs/train.json \
        --broker file:///tmp/nerfsys_queue --topic nerf-configs
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

from nerfsys_tpu.orchestration.queues import KafkaProducer, KafkaTopicManager


def main(argv=None):
    p = argparse.ArgumentParser(description="Send a NeRF job config")
    p.add_argument("config", help="path to the job config JSON")
    p.add_argument("--broker", default="file:///tmp/nerfsys_queue")
    p.add_argument("--topic", default="nerf-configs")
    args = p.parse_args(argv)

    cfg = json.loads(Path(args.config).read_text())
    conf = {"bootstrap.servers": args.broker}
    KafkaTopicManager(conf).create_topic(args.topic)
    KafkaProducer(conf).send(args.topic, cfg)
    print(f"sent {args.config} (op={cfg.get('op', 'train')}) to '{args.topic}'")


if __name__ == "__main__":
    main()
