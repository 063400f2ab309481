"""SqliteKVCache durability + concurrency (the framework's checkpoint
backbone, replacing the reference's per-provider FileLock+SQLite code)."""

import threading

from hipporag_tpu.storage.kv_cache import SqliteKVCache, hash_key


def test_roundtrip_and_persistence(tmp_path):
    path = str(tmp_path / "c.sqlite")
    c = SqliteKVCache(path)
    key = hash_key("llm", "model", [{"role": "user", "content": "hi"}])
    assert c.get(key) is None
    c.put(key, "response", {"tokens": 3})
    assert c.get(key) == ("response", {"tokens": 3})
    c.close()
    # reopen: value survives
    c2 = SqliteKVCache(path)
    assert c2.get(key) == ("response", {"tokens": 3})
    assert len(c2) == 1


def test_concurrent_writers_threads(tmp_path):
    path = str(tmp_path / "c.sqlite")
    cache = SqliteKVCache(path)
    n_threads, per = 8, 50
    errors = []

    def work(tid):
        try:
            for i in range(per):
                cache.put(f"k-{tid}-{i}", {"v": i})
                got = cache.get(f"k-{tid}-{i}")
                assert got is not None and got[0] == {"v": i}
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=work, args=(t,)) for t in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert len(cache) == n_threads * per


def test_hash_key_stable_and_distinct():
    a = hash_key("llm", "m", 0, 0.0, [{"role": "user", "content": "x"}])
    b = hash_key("llm", "m", 0, 0.0, [{"role": "user", "content": "x"}])
    c = hash_key("llm", "m", 0, 0.1, [{"role": "user", "content": "x"}])
    assert a == b != c


def test_get_many_batched(tmp_path):
    """get_many returns aligned results across the 900-key chunk boundary
    (the warm-re-index hot path)."""
    cache = SqliteKVCache(str(tmp_path / "c.sqlite"))
    cache.put_many([(f"k{i}", f"v{i}") for i in range(0, 2000, 2)])
    keys = [f"k{i}" for i in range(2000)]
    got = cache.get_many(keys)
    assert len(got) == 2000
    for i in range(2000):
        if i % 2 == 0:
            assert got[i] == (f"v{i}", {}), i
        else:
            assert got[i] is None, i


def test_close_reaches_worker_thread_connections(tmp_path):
    """close() must close connections opened by pool threads, not just the
    caller's (they pin the -wal/-shm files until GC otherwise)."""
    cache = SqliteKVCache(str(tmp_path / "c.sqlite"))

    def work(tid):
        cache.put(f"k{tid}", tid)

    threads = [threading.Thread(target=work, args=(t,)) for t in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(cache._all_conns) >= 2
    cache.close()
    assert cache._all_conns == []
    # the cache remains usable after close (fresh connection per thread)
    cache.put("again", 1)
    assert cache.get("again") == (1, {})


def test_embedding_cache_distinguishes_instructions(tmp_path):
    """Instruction-stateful embedders (GritLM/Cohere pass the instruction
    out-of-band, leaving the text unchanged) must not collide in the cache
    across query_to_fact / query_to_passage instructions."""
    import numpy as np

    from hipporag_tpu.config import BaseConfig
    from hipporag_tpu.embedding.base import BaseEmbeddingModel

    class StatefulEmbedder(BaseEmbeddingModel):
        """Embedding depends on the instruction, but the text doesn't."""

        def __init__(self):
            super().__init__(BaseConfig(embedding_model_name="stateful", save_dir=str(tmp_path)))
            self._instruction = ""
            self.embedding_dim = 4

        def format_with_instruction(self, text, instruction):
            self._instruction = instruction
            return text  # out-of-band: text unchanged

        def _encode_batch(self, texts):
            seed = abs(hash(self._instruction)) % 1000
            return np.full((len(texts), 4), float(seed), dtype=np.float32)

    m = StatefulEmbedder()
    m.attach_cache(str(tmp_path / "emb.sqlite"))
    a = m.batch_encode(["same text"], instruction="to_fact", norm=False)
    b = m.batch_encode(["same text"], instruction="to_passage", norm=False)
    assert not np.array_equal(a, b), "instruction collided in the cache"
    # and hits stay consistent per instruction
    a2 = m.batch_encode(["same text"], instruction="to_fact", norm=False)
    np.testing.assert_array_equal(a, a2)


def test_batch_encode_empty_returns_empty(tmp_path):
    from hipporag_tpu.config import BaseConfig
    from hipporag_tpu.embedding import get_embedding_model

    m = get_embedding_model(
        BaseConfig(embedding_model_name="mock", embedding_dim=16, save_dir=str(tmp_path))
    )
    out = m.batch_encode([])
    assert out.shape == (0, 16)


def test_qa_metrics_tolerate_empty_gold_rows():
    from hipporag_tpu.config import BaseConfig
    from hipporag_tpu.evaluation.metrics import QAExactMatch, QAF1Score

    cfg = BaseConfig(save_dir="/tmp")
    em, _ = QAExactMatch(cfg).calculate_metric_scores([[], ["x"]], ["x", "x"])
    f1, _ = QAF1Score(cfg).calculate_metric_scores([[], ["x"]], ["x", "x"])
    assert em["ExactMatch"] == 0.5 and f1["F1"] == 0.5
