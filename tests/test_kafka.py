"""Kafka transport smoke (S1-S3).

The keying/payload contracts run everywhere (pure DataFrame projections,
no broker).  The end-to-end round-trip needs a real broker AND the
spark-sql-kafka connector jar: set ``PB_KAFKA_BROKERS=host:9092`` to run
it (e.g. against ``docker run -p 9092:9092 apache/kafka``); it skips
cleanly otherwise — matching the reference's transport semantics
(`transport/KafkaEntityEventTransport.kt:35-84`).
"""

from __future__ import annotations

import json
import os
import uuid

import pytest
from pyspark.sql import functions as F

BROKERS = os.environ.get("PB_KAFKA_BROKERS")


class TestKeyingContracts:
    def test_alert_payload_keyed_by_entity(self, spark):
        from pulseboard_spark.streaming.pipeline import alert_kafka_payload

        alerts = spark.createDataFrame(
            [("a1", "u1", "R1", "HIGH"), ("a2", "u2", "R2", "LOW")],
            "alert_id string, entity_id string, rule string, severity string",
        )
        rows = alert_kafka_payload(alerts).collect()
        assert {r.key for r in rows} == {"u1", "u2"}
        body = json.loads(next(r.value for r in rows if r.key == "u1"))
        assert body == {"alert_id": "a1", "entity_id": "u1", "rule": "R1", "severity": "HIGH"}

    def test_cdp_payload_key_coalesces_like_reference(self, spark):
        """key = coalesce(userId, anonymousId, eventId) — the reference's
        partition key (`cdp/model/CdpEvent.kt:28-30`)."""
        from pulseboard_spark.streaming.pipeline import cdp_kafka_payload

        events = spark.createDataFrame(
            [
                ("e1", "u1", "anon1"),
                ("e2", None, "anon2"),
                ("e3", None, None),
            ],
            "event_id string, user_id_raw string, anon_id_raw string",
        )
        keys = {r.key for r in cdp_kafka_payload(events).collect()}
        assert keys == {"u1", "anon2", "e3"}


@pytest.mark.skipif(not BROKERS, reason="PB_KAFKA_BROKERS not set — no broker available")
class TestKafkaRoundTrip:
    def test_entity_events_round_trip(self, spark, tmp_path):
        """Produce JSON entity events via the batch kafka writer, then read
        them back through kafka_entity_source and check the parsed view."""
        from pulseboard_spark.streaming.pipeline import kafka_entity_source

        topic = f"pb-smoke-{uuid.uuid4().hex[:8]}"
        msgs = [
            json.dumps(
                {
                    "event_id": i,
                    "ts": "2026-01-01T00:00:%02d" % i,
                    "payload": {
                        "entityId": f"u{i % 3}",
                        "profile": "SASE",
                        "type": "login",
                        "value": float(i),
                        "tags": {},
                    },
                }
            )
            for i in range(10)
        ]
        df = spark.createDataFrame([(m,) for m in msgs], "value string").select(
            F.lit("k").alias("key"), "value"
        )
        try:
            df.write.format("kafka").option("kafka.bootstrap.servers", BROKERS).option(
                "topic", topic
            ).save()
        except Exception as exc:  # connector jar missing → honest skip
            pytest.skip(f"kafka connector unavailable: {exc}")

        src = kafka_entity_source(spark, BROKERS, topic, starting_offsets="earliest")
        q = (
            src.writeStream.format("memory")
            .queryName("pb_kafka_smoke")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        rows = spark.sql("SELECT * FROM pb_kafka_smoke").collect()
        assert len(rows) == 10
        assert {r.entity_id for r in rows} == {"u0", "u1", "u2"}
        assert all(r.type == "login" for r in rows)
