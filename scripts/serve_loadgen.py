"""Closed-loop HTTP load generator for a running `main.py --serve` tier.

Drives POST /retrieve with N concurrent clients for a fixed duration and
reports throughput + latency percentiles, then fetches the server's own
/stats so client-side numbers can be reconciled with the micro-batcher's
coalescing counters. Stdlib-only, like the server.

Usage:
    python main.py --dataset sample --llm_name mock --embedding_name mock \
        --serve --port 8734 &
    python scripts/serve_loadgen.py --port 8734 --clients 32 --seconds 10 \
        --query "Which county is Port Ellery in?" --top_k 5
"""

import argparse
import json
import sys
import threading
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor


def parse_args():
    p = argparse.ArgumentParser(description="HTTP load generator for --serve")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8734)
    p.add_argument("--clients", type=int, default=32)
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--top_k", type=int, default=5)
    p.add_argument(
        "--query", action="append", default=None,
        help="Query to send (repeatable; clients round-robin). Default: "
        "one generic query — add more for a mixed-working-set run.",
    )
    p.add_argument("--timeout", type=float, default=120.0)
    return p.parse_args()


def main():
    args = parse_args()
    base = f"http://{args.host}:{args.port}"
    queries = args.query or ["What does this corpus say?"]

    # warm the path (and fail fast on a dead server) before the clock
    def post(path, payload):
        req = urllib.request.Request(
            base + path, data=json.dumps(payload).encode(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=args.timeout) as resp:
            return json.loads(resp.read())

    post("/retrieve", {"query": queries[0], "top_k": args.top_k})

    stop = threading.Event()
    lats, errors = [], []
    lock = threading.Lock()

    def client(i):
        n = 0
        while not stop.is_set():
            q = queries[(i + n) % len(queries)]
            t0 = time.perf_counter()
            try:
                post("/retrieve", {"query": q, "top_k": args.top_k})
            except Exception as exc:  # noqa: BLE001 — count, keep loading
                with lock:
                    errors.append(str(exc))
                continue
            with lock:
                lats.append(time.perf_counter() - t0)
            n += 1

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=args.clients) as pool:
        futs = [pool.submit(client, i) for i in range(args.clients)]
        time.sleep(args.seconds)
        stop.set()
        for f in futs:
            f.result(timeout=args.timeout)
    wall = time.perf_counter() - t0

    lats.sort()
    n = len(lats)
    result = {
        "clients": args.clients,
        "seconds": round(wall, 2),
        "requests": n,
        "errors": len(errors),
        "qps": round(n / wall, 1),
        "p50_ms": round(1e3 * lats[n // 2], 1) if n else None,
        "p99_ms": round(1e3 * lats[min(n - 1, int(n * 0.99))], 1) if n else None,
        "error_sample": errors[:3],
    }
    try:
        with urllib.request.urlopen(base + "/stats", timeout=30) as resp:
            server = json.loads(resp.read())
        result["server_retrieve"] = {
            k: server["retrieve"].get(k)
            for k in ("requests", "batches", "mean_batch_size", "shed")
        }
        result["server_dedup_saved"] = server.get("dedup_saved")
    except Exception as exc:  # noqa: BLE001 — stats are best-effort
        result["server_stats_error"] = str(exc)
    print(json.dumps(result, indent=1))
    return 0 if not errors else 1


if __name__ == "__main__":
    sys.exit(main())
