"""Control plane (C1-C9): start/stop/update/status over streaming queries.

Mirrors the reference's lifecycle contract:
- start gated by CanStart (http_server.go:56-63, config.go:60-65) → F4
- stop kills the running pipeline (scheduler.go:92-103) → F5
- update mutates config but does NOT affect a running pipeline — takes
  effect on next start (http_server.go:70-79; TODO at executor.go:73) → C5
- status reports per-query state (http_server.go:81-100) → C7
- terminal states drop out of the registry (scheduler.go:150-160) → F6/C8

The Mesos scheduler/executor machinery (C2/C3/C9/C10) is Spark's own
cluster manager; nothing to re-implement.
"""

from __future__ import annotations

import tempfile
from dataclasses import replace
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from syscol_spark.config import CollectorConfig


class CollectorManager:
    def __init__(self, spark: SparkSession, config: CollectorConfig | None = None):
        self.spark = spark
        self.config = config or CollectorConfig()
        self._query: StreamingQuery | None = None
        self._checkpoint_dir: str | None = None

    # C5: live update — running query unaffected (reference contract)
    def update(self, **kwargs: Any) -> CollectorConfig:
        self.config = replace(self.config, **kwargs)
        return self.config

    # C6 start (F4 gate)
    def start(self, *, checkpoint_dir: str | None = None, key_by_slave: bool = False) -> StreamingQuery:
        ok, reason = self.config.can_start()
        if not ok:
            raise RuntimeError(f"cannot start: {reason}")
        if self.is_running():
            raise RuntimeError("already started")
        from syscol_spark.streaming.pipeline import build_pipeline

        self._checkpoint_dir = checkpoint_dir or tempfile.mkdtemp(prefix="syscol-ckpt-")
        writer = build_pipeline(
            self.spark, self.config, checkpoint_dir=self._checkpoint_dir, key_by_slave=key_by_slave
        )
        self._query = writer.queryName(f"syscol-{self.config.topic}").start()
        return self._query

    # C6 stop / F5
    def stop(self) -> None:
        if self._query is not None:
            self._query.stop()
            self._query = None

    def is_running(self) -> bool:
        return self._query is not None and self._query.isActive

    # K4: delivery-report stream. The reference wires a per-record metadata
    # channel that is dead in practice (nil chan, kafka_producer.go:124,154);
    # here progress reports actually arrive, one per micro-batch.
    def progress_history(self, limit: int = 16) -> list[dict]:
        if self._query is None:
            return []
        return [p for p in (self._query.recentProgress or [])][-limit:]

    # C7 status
    def status(self) -> dict:
        if self._query is None:
            return {"active": False, "config": self.config.to_json()}
        return {
            "active": self._query.isActive,
            "query_id": str(self._query.id),
            "status": self._query.status,
            "last_progress": self._query.lastProgress,
            "config": self.config.to_json(),
        }
