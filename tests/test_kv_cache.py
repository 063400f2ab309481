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
