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
import logging
import os
import time
import uuid
from pathlib import Path
from typing import Optional

try:
    import confluent_kafka as _ck  # type: ignore
    # admin is a real SUBMODULE: `import confluent_kafka` alone does not
    # bind .admin (the reference imports it explicitly, topic_manager.py:6)
    import confluent_kafka.admin as _ck_admin  # type: ignore

    _HAVE_KAFKA = True
except ImportError:
    _ck = None
    _ck_admin = None
    _HAVE_KAFKA = False

_log = logging.getLogger(__name__)


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
# Same message-handling contract as the reference kafka_utils
# (consumer.py:32-56, producer.py:23-40, topic_manager.py:17-44); covered
# against a stubbed confluent_kafka module by tests/test_kafka_stub.py.
class _KafkaProducer:
    def __init__(self, conf: dict):
        self._p = _ck.Producer({"bootstrap.servers": conf["bootstrap.servers"]})

    def send(self, topic: str, value: dict):
        # log-and-reraise on broker failure (producer.py:30-36)
        try:
            self._p.produce(topic, json.dumps(value).encode("utf-8"))
            self._p.flush()
        except _ck.KafkaException as e:
            _log.error("failed to send message to %s: %s", topic, e)
            raise

    def flush(self, timeout: Optional[float] = None):
        self._p.flush(timeout or -1)


class _KafkaConsumer:
    def __init__(self, conf: dict, topic: str):
        self._c = _ck.Consumer(
            {
                "bootstrap.servers": conf["bootstrap.servers"],
                "group.id": conf.get("group.id", "nerfsys"),
                "auto.offset.reset": conf.get("auto.offset.reset", "earliest"),
                "enable.auto.commit": conf.get("enable.auto.commit", True),
            }
        )
        self._c.subscribe([topic])

    def receive(self, timeout: Optional[float] = None):
        """Reference poll loop (consumer.py:32-56): skip empty polls, log+skip
        broker errors and empty payloads, return None on a JSON decode
        failure. `timeout` here is an OVERALL deadline (the mediator needs
        bounded waits); the reference's arg is just the poll interval."""
        deadline = None if timeout is None else time.time() + timeout
        while True:
            msg = self._c.poll(1.0 if timeout is None else min(1.0, timeout))
            if msg is not None:
                if msg.error():
                    _log.error("Kafka error: %s", msg.error())
                elif msg.value() is None:
                    _log.warning("received empty message, skipping")
                else:
                    raw = msg.value()
                    try:
                        text = (raw.decode("utf-8")
                                if isinstance(raw, (bytes, bytearray)) else raw)
                        return json.loads(text)
                    except Exception as e:  # decode error -> None, not raise
                        _log.error("failed to decode JSON message: %s", e)
                        return None
            if deadline is not None and time.time() >= deadline:
                return None

    def close(self):
        self._c.close()


class _KafkaTopicManager:
    def __init__(self, conf: dict):
        self._admin = _ck_admin.AdminClient(
            {"bootstrap.servers": conf["bootstrap.servers"]}
        )

    def create_topic(self, topic: str, num_partitions: int = 1,
                     replication_factor: int = 1):
        meta = self._admin.list_topics(timeout=10)
        if topic in meta.topics:
            return True
        fut = self._admin.create_topics(
            [_ck_admin.NewTopic(topic, num_partitions, replication_factor)]
        )
        # create-failure is logged, not raised (topic_manager.py:38-44) —
        # a concurrent create (TopicAlreadyExists) must not kill the mediator
        try:
            fut[topic].result()
            return True
        except Exception as e:
            _log.error("failed to create topic %r: %s", topic, e)
            return False


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
