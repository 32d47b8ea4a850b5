"""Job-level kill/resume at BENCH scale (VERDICT r4 item 7): run the
flagship ``run_web_prep_job`` over the 160k-doc replicated pages corpus
(the scaling protocol's input), SIGKILL it mid-run, resume, and assert
(a) committed partitions are skipped, not re-extracted, and (b) the
final survivor output is byte-identical to an unkilled from-scratch run.

Usage (from /root/repo — Ray workers inherit the driver cwd):
    python scripts/resume_kill_160k.py
Prints one JSON line; the result is recorded in BASELINE.md.
"""
from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICATE = 32
OUT_ROOT = "/tmp/graft_resume_160k"

_JOB = """
import glob, sys
import ray

ray.init(address="local", num_cpus=32, include_dashboard=False)
from pdf_extractor_ray.pipelines.web_prep import run_web_prep_job

files = sorted(glob.glob(sys.argv[1] + "/*.parquet"))
run_web_prep_job(files, sys.argv[2], files_per_partition=1)
ray.shutdown()
"""


def _survivor_digest(final_dir: str) -> tuple[int, str]:
    """(row count, sha256 over the sorted (url, extracted_text) stream)
    — byte-identity without holding both outputs in memory at once."""
    import pyarrow.parquet as pq

    rows = []
    for f in sorted(glob.glob(os.path.join(final_dir, "*.parquet"))):
        t = pq.read_table(f, columns=["url", "extracted_text"])
        rows.extend(zip(t.column("url").to_pylist(),
                        t.column("extracted_text").to_pylist()))
    rows.sort()
    h = hashlib.sha256()
    for u, x in rows:
        h.update(u.encode())
        h.update(b"\x00")
        h.update((x or "").encode())
        h.update(b"\x01")
    return len(rows), h.hexdigest()


def _run_job(pages_dir: str, out: str) -> None:
    subprocess.run(
        [sys.executable, "-c", _JOB, pages_dir, out],
        cwd="/root/repo", check=True,
    )


def main() -> int:
    from bench import materialize_pages

    pages_dir = materialize_pages(SF_DIR, replicate=REPLICATE)
    n_shards = len(glob.glob(os.path.join(pages_dir, "*.parquet")))
    shutil.rmtree(OUT_ROOT, ignore_errors=True)
    killed_out = os.path.join(OUT_ROOT, "killed")
    fresh_out = os.path.join(OUT_ROOT, "fresh")

    # --- leg 1: start, SIGKILL once ~40% of partitions committed
    t0 = time.time()
    proc = subprocess.Popen(
        [sys.executable, "-c", _JOB, pages_dir, killed_out],
        cwd="/root/repo", start_new_session=True,
    )
    manifest_dir = os.path.join(killed_out, "stage1", "_manifest")
    target = max(2, n_shards * 2 // 5)
    deadline = time.time() + 900
    while time.time() < deadline and proc.poll() is None:
        if len(glob.glob(os.path.join(manifest_dir, "part-*.json"))) >= target:
            break
        time.sleep(0.2)
    if proc.poll() is not None:
        print(json.dumps({"error": "job finished before the kill"}))
        return 1
    os.killpg(proc.pid, signal.SIGKILL)
    proc.wait(timeout=120)
    committed_at_kill = len(glob.glob(os.path.join(manifest_dir, "part-*.json")))
    kill_wall = time.time() - t0

    mtimes_before = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(killed_out, "stage1",
                                        "part-*", "*.parquet"))
    }

    # --- leg 2: resume to completion (fresh process, fresh Ray)
    t1 = time.time()
    _run_job(pages_dir, killed_out)
    resume_wall = time.time() - t1
    rewrote = [
        f for f, m in mtimes_before.items()
        if os.path.exists(f) and os.path.getmtime(f) != m
    ]

    # --- leg 3: unkilled from-scratch reference
    t2 = time.time()
    _run_job(pages_dir, fresh_out)
    fresh_wall = time.time() - t2

    n_resumed, d_resumed = _survivor_digest(os.path.join(killed_out, "final"))
    n_fresh, d_fresh = _survivor_digest(os.path.join(fresh_out, "final"))

    result = {
        "metric": "resume_kill_160k",
        "n_shards": n_shards,
        "committed_at_kill": committed_at_kill,
        "kill_leg_sec": round(kill_wall, 1),
        "resume_sec": round(resume_wall, 1),
        "fresh_sec": round(fresh_wall, 1),
        "rewrote_committed_parts": len(rewrote),
        "survivors_resumed": n_resumed,
        "survivors_fresh": n_fresh,
        "byte_identical": d_resumed == d_fresh,
        "digest": d_resumed[:16],
    }
    print(json.dumps(result))
    ok = (result["byte_identical"] and not rewrote
          and 0 < committed_at_kill < n_shards)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
