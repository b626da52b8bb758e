"""Job-queue transport: Kafka when available, durable file queue otherwise.

Counterpart of /root/reference/kafka_utils/ (consumer.py, producer.py,
topic_manager.py) with the same public surface:

    KafkaTopicManager(conf).create_topic(topic)
    KafkaProducer(conf).send(topic, dict)       # JSON-encoded, flushed
    KafkaConsumer(conf, topic).receive()        # blocking, returns dict

The reference hard-depends on confluent-kafka (librdkafka). This image has no
Kafka, so the same API is also served by a durable directory-based queue
(one JSON file per message, consumer offset persisted), selected
automatically when confluent_kafka is not importable or when the bootstrap
config uses the 'file://' scheme. The mediator and send_config work
identically over either transport.
"""
from __future__ import annotations

import json
import os
import time
import uuid
from pathlib import Path
from typing import Optional

try:
    import confluent_kafka as _ck  # type: ignore

    _HAVE_KAFKA = True
except ImportError:
    _ck = None
    _HAVE_KAFKA = False


def _file_root(conf: dict) -> Optional[Path]:
    """file:// bootstrap -> queue root dir; also the fallback without kafka."""
    bootstrap = str(conf.get("bootstrap.servers", ""))
    if bootstrap.startswith("file://"):
        return Path(bootstrap[len("file://"):])
    if not _HAVE_KAFKA:
        return Path(conf.get("file.queue.root", "/tmp/nerfsys_queue"))
    return None


# ------------------------------ file backend ---------------------------------
class _FileTopic:
    """One topic = one directory of zero-padded sequence-numbered JSON files."""

    def __init__(self, root: Path, topic: str):
        self.dir = Path(root) / topic
        self.dir.mkdir(parents=True, exist_ok=True)

    def append(self, payload: dict):
        # two-phase write so readers never see partial JSON
        seq = time.time_ns()
        tmp = self.dir / f".{seq}_{uuid.uuid4().hex[:6]}.tmp"
        tmp.write_text(json.dumps(payload))
        tmp.rename(self.dir / f"{seq:020d}.json")

    def messages_after(self, offset: int):
        files = sorted(
            f for f in self.dir.iterdir()
            if f.suffix == ".json" and not f.name.startswith(".")
        )
        return [f for f in files if int(f.stem) > offset]


class FileQueueProducer:
    def __init__(self, conf: dict):
        self.root = _file_root(conf) or Path("/tmp/nerfsys_queue")

    def send(self, topic: str, value: dict):
        _FileTopic(self.root, topic).append(value)

    def flush(self, timeout: Optional[float] = None):
        pass  # writes are synchronous


class FileQueueConsumer:
    def __init__(self, conf: dict, topic: str):
        self.root = _file_root(conf) or Path("/tmp/nerfsys_queue")
        self.topic = _FileTopic(self.root, topic)
        group = conf.get("group.id", "default")
        self._offset_file = self.topic.dir / f".offset_{group}"
        self._offset = (
            int(self._offset_file.read_text())
            if self._offset_file.exists()
            else 0
        )

    def receive(self, timeout: Optional[float] = None, poll_s: float = 0.25):
        """Block until a message arrives (or timeout); returns dict or None."""
        deadline = None if timeout is None else time.time() + timeout
        while True:
            msgs = self.topic.messages_after(self._offset)
            if msgs:
                f = msgs[0]
                try:
                    value = json.loads(f.read_text())
                except json.JSONDecodeError:
                    # skip poison message, advance offset
                    self._offset = int(f.stem)
                    self._offset_file.write_text(str(self._offset))
                    continue
                self._offset = int(f.stem)
                self._offset_file.write_text(str(self._offset))
                return value
            if deadline is not None and time.time() >= deadline:
                return None
            time.sleep(poll_s)

    def close(self):
        pass


class FileQueueTopicManager:
    def __init__(self, conf: dict):
        self.root = _file_root(conf) or Path("/tmp/nerfsys_queue")

    def create_topic(self, topic: str, num_partitions: int = 1,
                     replication_factor: int = 1):
        _FileTopic(self.root, topic)  # mkdir is creation
        return True


# ------------------------------ kafka backend --------------------------------
class _KafkaProducer:
    def __init__(self, conf: dict):
        self._p = _ck.Producer({"bootstrap.servers": conf["bootstrap.servers"]})

    def send(self, topic: str, value: dict):
        self._p.produce(topic, json.dumps(value).encode("utf-8"))
        self._p.flush()

    def flush(self, timeout: Optional[float] = None):
        self._p.flush(timeout or -1)


class _KafkaConsumer:
    def __init__(self, conf: dict, topic: str):
        self._c = _ck.Consumer(
            {
                "bootstrap.servers": conf["bootstrap.servers"],
                "group.id": conf.get("group.id", "nerfsys"),
                "auto.offset.reset": conf.get("auto.offset.reset", "earliest"),
            }
        )
        self._c.subscribe([topic])

    def receive(self, timeout: Optional[float] = None):
        deadline = None if timeout is None else time.time() + timeout
        while True:
            msg = self._c.poll(1.0)
            if msg is not None and not msg.error():
                return json.loads(msg.value().decode("utf-8"))
            if deadline is not None and time.time() >= deadline:
                return None

    def close(self):
        self._c.close()


class _KafkaTopicManager:
    def __init__(self, conf: dict):
        self._admin = _ck.admin.AdminClient(
            {"bootstrap.servers": conf["bootstrap.servers"]}
        )

    def create_topic(self, topic: str, num_partitions: int = 1,
                     replication_factor: int = 1):
        meta = self._admin.list_topics(timeout=10)
        if topic in meta.topics:
            return True
        fut = self._admin.create_topics(
            [_ck.admin.NewTopic(topic, num_partitions, replication_factor)]
        )
        fut[topic].result()
        return True


# ------------------------------ public factories -----------------------------
def KafkaProducer(conf: dict):
    return FileQueueProducer(conf) if _file_root(conf) else _KafkaProducer(conf)


def KafkaConsumer(conf: dict, topic: str):
    return (
        FileQueueConsumer(conf, topic)
        if _file_root(conf)
        else _KafkaConsumer(conf, topic)
    )


def KafkaTopicManager(conf: dict):
    return (
        FileQueueTopicManager(conf)
        if _file_root(conf)
        else _KafkaTopicManager(conf)
    )
