"""Remote vector-store contract tests with stubbed client modules.

The qdrant/chroma/milvus client packages are not installable here, so fake
modules are injected via sys.modules and the full reference store checklist
(ref tests/integration/run_vector_stores.py:34-369) runs against the real
store logic: insert, idempotent re-insert, fetch ordering, missing-id diff,
incremental insert, delete, persistence across reload, and factory routing.
"""

import sys
import types
import uuid

import numpy as np
import pytest

from hipporag_tpu.config import BaseConfig
from hipporag_tpu.embedding.mock import MockEmbeddingModel
from hipporag_tpu.storage import get_embedding_store

TEXTS = [
    "Erik Hort was born in Montebello.",
    "Montebello is a part of Rockland County.",
    "Paris is the capital of France.",
    "The Seine flows through Paris.",
    "Alice likes Bob.",
]


def _model():
    return MockEmbeddingModel(
        BaseConfig(embedding_model_name="mock", embedding_dim=32, save_dir="/tmp")
    )


# ----------------------------------------------------------------------
# Fake qdrant_client
# ----------------------------------------------------------------------
_QDRANT_DBS = {}  # path/url -> {collection: {point_id: (vector, payload)}}


def install_fake_qdrant(monkeypatch):
    mod = types.ModuleType("qdrant_client")
    models = types.ModuleType("qdrant_client.models")

    class Distance:
        COSINE = "Cosine"

    class VectorParams:
        def __init__(self, size, distance):
            self.size, self.distance = size, distance

    class PointStruct:
        def __init__(self, id, vector, payload):
            self.id, self.vector, self.payload = id, vector, payload

    class PointIdsList:
        def __init__(self, points):
            self.points = points

    class _Point:
        def __init__(self, pid, vector, payload):
            self.id, self.vector, self.payload = pid, vector, payload

    class QdrantClient:
        def __init__(self, path=None, url=None, api_key=None):
            self._key = path or url
            self._db = _QDRANT_DBS.setdefault(self._key, {})

        def collection_exists(self, name):
            return name in self._db

        def create_collection(self, name, vectors_config=None):
            self._db.setdefault(name, {})

        def scroll(self, name, limit, offset, with_payload, with_vectors):
            ids = sorted(self._db[name])
            start = 0 if offset is None else ids.index(offset)
            page = ids[start : start + limit]
            pts = [
                _Point(i, self._db[name][i][0], self._db[name][i][1]) for i in page
            ]
            nxt = ids[start + limit] if start + limit < len(ids) else None
            return pts, nxt

        def upsert(self, name, points):
            for p in points:
                self._db[name][p.id] = (list(p.vector), dict(p.payload))

        def delete(self, name, points_selector):
            for pid in points_selector.points:
                self._db[name].pop(pid, None)

        def close(self):
            pass

    models.Distance = Distance
    models.VectorParams = VectorParams
    models.PointStruct = PointStruct
    models.PointIdsList = PointIdsList
    mod.QdrantClient = QdrantClient
    mod.models = models
    monkeypatch.setitem(sys.modules, "qdrant_client", mod)
    monkeypatch.setitem(sys.modules, "qdrant_client.models", models)


# ----------------------------------------------------------------------
# Fake chromadb
# ----------------------------------------------------------------------
_CHROMA_DBS = {}  # path -> {collection: {id: (doc, emb)}}


def install_fake_chroma(monkeypatch):
    mod = types.ModuleType("chromadb")

    class _Collection:
        def __init__(self, data):
            self._data = data

        def get(self, include):
            ids = sorted(self._data)
            out = {"ids": ids, "documents": [self._data[i][0] for i in ids]}
            if "embeddings" in include:
                # recent chromadb returns a numpy array (ambiguous truth
                # value) — exactly the case the store must handle
                out["embeddings"] = (
                    np.asarray([self._data[i][1] for i in ids], dtype=np.float32)
                    if ids
                    else None
                )
            return out

        def upsert(self, ids, documents, embeddings):
            for i, doc, emb in zip(ids, documents, embeddings):
                self._data[i] = (doc, list(emb))

        def delete(self, ids):
            for i in ids:
                self._data.pop(i, None)

    class PersistentClient:
        def __init__(self, path):
            self._db = _CHROMA_DBS.setdefault(path, {})

        def get_or_create_collection(self, name, metadata=None):
            return _Collection(self._db.setdefault(name, {}))

    class HttpClient(PersistentClient):
        def __init__(self, host, port):
            super().__init__(f"{host}:{port}")

    mod.PersistentClient = PersistentClient
    mod.HttpClient = HttpClient
    monkeypatch.setitem(sys.modules, "chromadb", mod)


# ----------------------------------------------------------------------
# Fake pymilvus
# ----------------------------------------------------------------------
_MILVUS_DBS = {}  # uri -> {collection: {hash_id: row-dict}}


def install_fake_milvus(monkeypatch, iterator_supported=False):
    mod = types.ModuleType("pymilvus")

    class DataType:
        VARCHAR = "VARCHAR"
        FLOAT_VECTOR = "FLOAT_VECTOR"

    class _Schema:
        def add_field(self, name, dtype, **kw):
            pass

    class _IndexParams:
        def add_index(self, **kw):
            pass

    class MilvusClient:
        def __init__(self, uri, token=None, db_name=None):
            self._db = _MILVUS_DBS.setdefault(uri, {})

        def has_collection(self, name):
            return name in self._db

        def create_schema(self, auto_id=False):
            return _Schema()

        def prepare_index_params(self):
            return _IndexParams()

        def create_collection(self, name, schema=None, index_params=None, **kw):
            self._db.setdefault(name, {})

        def query_iterator(self, name, output_fields=None, batch_size=1024):
            if not iterator_supported:
                raise RuntimeError("iterator unsupported (Milvus Lite)")
            rows = [dict(r) for _, r in sorted(self._db[name].items())]
            chunks = [rows[i : i + batch_size] for i in range(0, len(rows), batch_size)]

            class _It:
                def __init__(self, chunks):
                    self._chunks = list(chunks)

                def next(self):
                    return self._chunks.pop(0) if self._chunks else []

                def close(self):
                    pass

            return _It(chunks)

        def query(self, name, filter="", limit=16384, offset=0, output_fields=None):
            rows = [dict(r) for _, r in sorted(self._db[name].items())]
            return rows[offset : offset + limit]

        def upsert(self, name, data):
            for row in data:
                self._db[name][row["hash_id"]] = dict(row)

        def delete(self, name, ids=None):
            for i in ids or []:
                self._db[name].pop(i, None)

        def close(self):
            pass

    mod.DataType = DataType
    mod.MilvusClient = MilvusClient
    monkeypatch.setitem(sys.modules, "pymilvus", mod)


# ----------------------------------------------------------------------
# The reference contract checklist, shared by all backends
# ----------------------------------------------------------------------
def run_contract(make_store):
    store = make_store("chunk")

    # insert + idempotent re-insert
    store.insert_strings(TEXTS[:4])
    assert len(store.get_all_ids()) == 4
    store.insert_strings(TEXTS[:4])
    assert len(store.get_all_ids()) == 4

    # fetch ordering across arbitrary request order
    ids = [store.get_hash_id(t) for t in TEXTS[:4]]
    shuffled = [ids[2], ids[0], ids[3], ids[1]]
    embs = store.get_embeddings(shuffled)
    for h, e in zip(shuffled, embs):
        np.testing.assert_array_equal(e, store.get_embedding(h))
    rows = store.get_rows(shuffled)
    assert [rows[h]["content"] for h in shuffled] == [
        TEXTS[2], TEXTS[0], TEXTS[3], TEXTS[1]
    ]

    # missing-id diff
    missing = store.get_missing_string_hash_ids(TEXTS)
    assert len(missing) == 1
    assert next(iter(missing.values()))["content"] == TEXTS[4]

    # incremental insert
    store.insert_strings([TEXTS[4]])
    assert store.get_missing_string_hash_ids(TEXTS) == {}

    # delete
    store.delete([ids[1]])
    assert ids[1] not in store.get_all_ids()
    assert TEXTS[1] not in store.get_all_texts()

    # persistence across reload (fresh store object, same backend state)
    store2 = make_store("chunk")
    assert set(store2.get_all_ids()) == set(store.get_all_ids())
    assert store2.get_all_texts() == {TEXTS[0], TEXTS[2], TEXTS[3], TEXTS[4]}
    for h in store2.get_all_ids():
        np.testing.assert_array_equal(
            store2.get_embedding(h), store.get_embedding(h)
        )
    # namespaces are isolated
    other = make_store("entity")
    assert other.get_all_ids() == []


def _factory_config(store_type):
    return BaseConfig(
        embedding_model_name="mock", embedding_dim=32, save_dir="/tmp",
        vector_store_type=store_type,
    )


def test_qdrant_store_contract(tmp_path, monkeypatch):
    install_fake_qdrant(monkeypatch)
    _QDRANT_DBS.clear()
    cfg = _factory_config("qdrant")
    model = _model()

    def make(ns):
        return get_embedding_store(model, str(tmp_path), 2, ns, cfg)

    store = make("chunk")
    from hipporag_tpu.storage.vector_stores.qdrant_store import QdrantEmbeddingStore

    assert isinstance(store, QdrantEmbeddingStore)
    run_contract(make)


def test_chroma_store_contract(tmp_path, monkeypatch):
    install_fake_chroma(monkeypatch)
    _CHROMA_DBS.clear()
    cfg = _factory_config("chroma")
    model = _model()

    def make(ns):
        return get_embedding_store(model, str(tmp_path), 2, ns, cfg)

    store = make("chunk")
    from hipporag_tpu.storage.vector_stores.chroma_store import ChromaEmbeddingStore

    assert isinstance(store, ChromaEmbeddingStore)
    run_contract(make)


@pytest.mark.parametrize("iterator_supported", [False, True])
def test_milvus_store_contract(tmp_path, monkeypatch, iterator_supported):
    install_fake_milvus(monkeypatch, iterator_supported=iterator_supported)
    _MILVUS_DBS.clear()
    cfg = _factory_config("milvus")
    model = _model()

    def make(ns):
        return get_embedding_store(model, str(tmp_path), 2, ns, cfg)

    store = make("chunk")
    from hipporag_tpu.storage.vector_stores.milvus_store import MilvusEmbeddingStore

    assert isinstance(store, MilvusEmbeddingStore)
    run_contract(make)


def test_milvus_fallback_query_warns_on_truncation(tmp_path, monkeypatch, caplog):
    """Milvus caps query windows at offset+limit <= 16384, so the no-iterator
    fallback cannot page past one window; it must warn loudly instead of
    silently treating truncated rows as missing (ADVICE r1). The truncated
    rows remain 'missing' and get re-embedded on the next insert."""
    import logging

    install_fake_milvus(monkeypatch, iterator_supported=False)
    _MILVUS_DBS.clear()
    from hipporag_tpu.storage.vector_stores.milvus_store import MilvusEmbeddingStore

    monkeypatch.setattr(MilvusEmbeddingStore, "FALLBACK_QUERY_PAGE", 2)
    cfg = _factory_config("milvus")
    model = _model()
    store = MilvusEmbeddingStore(model, str(tmp_path), 2, "chunk", cfg)
    store.insert_strings(TEXTS)  # 5 rows > 2-row window
    with caplog.at_level(logging.WARNING):
        reloaded = MilvusEmbeddingStore(model, str(tmp_path), 2, "chunk", cfg)
    assert any("truncated" in r.message for r in caplog.records)
    assert len(reloaded.get_all_ids()) == 2  # one window's worth
    # truncated rows look missing -> re-insert restores them (idempotent)
    reloaded.insert_strings(TEXTS)
    assert reloaded.get_missing_string_hash_ids(TEXTS) == {}

    # with the iterator available the rebuild is complete, no warning
    install_fake_milvus(monkeypatch, iterator_supported=True)
    full = MilvusEmbeddingStore(model, str(tmp_path), 2, "chunk", cfg)
    assert len(full.get_all_ids()) == 5


def test_chroma_empty_collection_embeddings_none(tmp_path, monkeypatch):
    """A None embeddings field must not crash or drop rows (ADVICE r1)."""
    install_fake_chroma(monkeypatch)
    _CHROMA_DBS.clear()
    from hipporag_tpu.storage.vector_stores.chroma_store import ChromaEmbeddingStore

    cfg = _factory_config("chroma")
    store = ChromaEmbeddingStore(_model(), str(tmp_path), 2, "chunk", cfg)
    assert store.get_all_ids() == []


def test_qdrant_uuid_mapping_stable():
    from hipporag_tpu.storage.vector_stores.qdrant_store import to_qdrant_id

    a = to_qdrant_id("chunk-abc")
    assert a == to_qdrant_id("chunk-abc")
    assert a != to_qdrant_id("chunk-abd")
    uuid.UUID(a)  # valid UUID


def test_factory_unknown_type_raises():
    with pytest.raises(ValueError, match="Unknown vector_store_type"):
        get_embedding_store(_model(), "/tmp", 2, "chunk", _factory_config("bogus"))
