"""Real-Kafka branch of orchestration/queues.py against a stubbed
confluent_kafka module (this image has no broker and no librdkafka — the
stub is the only way the `_ck` code path ever executes).

The stub's surface mirrors what the reference kafka_utils consume
(consumer.py:32-56, producer.py:23-40, topic_manager.py:6,17-44):
Producer.produce/flush, Consumer.poll->msg{error,value}, subscribe, close,
admin.AdminClient.list_topics/create_topics returning {topic: future}.
"""
from __future__ import annotations

import importlib
import json
import sys
import types

import pytest


class _Msg:
    def __init__(self, value=None, error=None):
        self._v = value
        self._e = error

    def value(self):
        return self._v

    def error(self):
        return self._e


class _FakeFuture:
    def __init__(self, exc=None):
        self._exc = exc

    def result(self, timeout=None):
        if self._exc is not None:
            raise self._exc
        return None


def _build_fake_ck(poll_script=None, existing_topics=(), create_exc=None,
                   produce_exc=None):
    ck = types.ModuleType("confluent_kafka")
    admin = types.ModuleType("confluent_kafka.admin")

    class KafkaException(Exception):
        pass

    calls = {"produced": [], "flushes": 0, "subscribed": None,
             "closed": False, "created": [], "consumer_conf": None,
             "polls": 0}

    class Producer:
        def __init__(self, conf):
            calls["producer_conf"] = conf

        def produce(self, topic, value=None):
            if produce_exc:
                raise KafkaException("boom")
            calls["produced"].append((topic, value))

        def flush(self, timeout=None):
            calls["flushes"] += 1
            return 0

    class Consumer:
        def __init__(self, conf):
            calls["consumer_conf"] = conf
            self._script = list(poll_script or [])

        def subscribe(self, topics):
            calls["subscribed"] = topics

        def poll(self, timeout=None):
            calls["polls"] += 1
            return self._script.pop(0) if self._script else None

        def close(self):
            calls["closed"] = True

    class _Meta:
        def __init__(self, topics):
            self.topics = {t: object() for t in topics}

    class AdminClient:
        def __init__(self, conf):
            calls["admin_conf"] = conf

        def list_topics(self, timeout=None):
            return _Meta(existing_topics)

        def create_topics(self, new_topics):
            calls["created"].extend(
                (t.topic, t.num_partitions, t.replication_factor)
                for t in new_topics
            )
            return {t.topic: _FakeFuture(create_exc) for t in new_topics}

    class NewTopic:
        def __init__(self, topic, num_partitions=1, replication_factor=1):
            self.topic = topic
            self.num_partitions = num_partitions
            self.replication_factor = replication_factor

    ck.Producer = Producer
    ck.Consumer = Consumer
    ck.KafkaException = KafkaException
    admin.AdminClient = AdminClient
    admin.NewTopic = NewTopic
    ck.admin = admin
    return ck, admin, calls


@pytest.fixture
def queues_with_fake(monkeypatch):
    """Install a fake confluent_kafka, reload queues to take the _ck branch,
    and restore the kafka-less module state afterwards."""
    installed = {}

    def make(**kw):
        ck, admin, calls = _build_fake_ck(**kw)
        monkeypatch.setitem(sys.modules, "confluent_kafka", ck)
        monkeypatch.setitem(sys.modules, "confluent_kafka.admin", admin)
        import nerfsys_tpu.orchestration.queues as q

        installed["q"] = importlib.reload(q)
        assert installed["q"]._HAVE_KAFKA
        return installed["q"], calls

    yield make

    if installed:
        for m in ("confluent_kafka", "confluent_kafka.admin"):
            sys.modules.pop(m, None)
        importlib.reload(installed["q"])
        assert not installed["q"]._HAVE_KAFKA


CONF = {"bootstrap.servers": "broker-1:9092"}


def test_producer_sends_json_and_flushes(queues_with_fake):
    q, calls = queues_with_fake()
    p = q.KafkaProducer(CONF)
    assert type(p).__name__ == "_KafkaProducer"  # kafka branch, not file
    p.send("jobs", {"a": 1, "b": [2, 3]})
    (topic, raw), = calls["produced"]
    assert topic == "jobs"
    assert json.loads(raw.decode("utf-8")) == {"a": 1, "b": [2, 3]}
    assert calls["flushes"] == 1
    p.flush()
    assert calls["flushes"] == 2


def test_producer_send_failure_logged_and_raised(queues_with_fake, caplog):
    q, calls = queues_with_fake(produce_exc=True)
    p = q.KafkaProducer(CONF)
    with caplog.at_level("ERROR"):
        with pytest.raises(Exception, match="boom"):
            p.send("jobs", {"x": 1})
    assert any("failed to send" in r.message for r in caplog.records)


def test_consumer_subscribes_and_decodes(queues_with_fake):
    payload = json.dumps({"op": "train"}).encode("utf-8")
    q, calls = queues_with_fake(poll_script=[
        None,                    # empty poll -> keep waiting
        _Msg(error="brokerdown"),  # broker error -> log + skip
        _Msg(value=None),        # empty payload -> warn + skip
        _Msg(value=payload),     # the real message
    ])
    c = q.KafkaConsumer(CONF, "jobs")
    assert type(c).__name__ == "_KafkaConsumer"
    assert calls["subscribed"] == ["jobs"]
    assert calls["consumer_conf"]["enable.auto.commit"] is True
    assert c.receive(timeout=5.0) == {"op": "train"}
    assert calls["polls"] == 4
    c.close()
    assert calls["closed"]


def test_consumer_str_payload_and_decode_error(queues_with_fake):
    # str payloads decode too (consumer.py:50 handles both); broken JSON
    # returns None instead of raising
    q, _ = queues_with_fake(poll_script=[_Msg(value='{"k": 7}')])
    assert q.KafkaConsumer(CONF, "t").receive(timeout=2.0) == {"k": 7}

    q, _ = queues_with_fake(poll_script=[_Msg(value=b"{not json")])
    assert q.KafkaConsumer(CONF, "t").receive(timeout=2.0) is None


def test_consumer_timeout_returns_none(queues_with_fake):
    q, calls = queues_with_fake(poll_script=[])
    assert q.KafkaConsumer(CONF, "t").receive(timeout=0.05) is None
    assert calls["polls"] >= 1


def test_topic_manager_creates_only_missing(queues_with_fake):
    q, calls = queues_with_fake(existing_topics=("have",))
    tm = q.KafkaTopicManager(CONF)
    assert type(tm).__name__ == "_KafkaTopicManager"
    assert tm.create_topic("have") is True
    assert calls["created"] == []  # create-if-exists short-circuits
    assert tm.create_topic("need", num_partitions=3) is True
    assert calls["created"] == [("need", 3, 1)]


def test_topic_manager_create_failure_logged_not_raised(queues_with_fake,
                                                        caplog):
    q, calls = queues_with_fake(create_exc=RuntimeError("already exists"))
    tm = q.KafkaTopicManager(CONF)
    with caplog.at_level("ERROR"):
        assert tm.create_topic("racy") is False
    assert any("failed to create topic" in r.message for r in caplog.records)


def test_file_backend_still_selected_for_file_urls(queues_with_fake,
                                                   tmp_path):
    """With kafka importable, file:// bootstrap still routes to the file
    backend (the two transports coexist)."""
    q, _ = queues_with_fake()
    conf = {"bootstrap.servers": f"file://{tmp_path}"}
    p = q.KafkaProducer(conf)
    assert type(p).__name__ == "FileQueueProducer"
    p.send("t", {"v": 1})
    assert q.KafkaConsumer(conf, "t").receive(timeout=2.0) == {"v": 1}
