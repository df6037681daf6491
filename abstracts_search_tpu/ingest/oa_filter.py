"""OpenAlex works filter: {works JSONL} -> {"id","document"} JSONL.

Two interchangeable implementations of the same contract (behavior
defined by the reference's native filter, /root/reference/oa_jsonl.c:
351-414 — drop non-English, drop null/empty abstracts, reconstruct
abstract text from the inverted index, prepend title when present):

- ``OaJsonlFilter``: wraps the native C++ binary (cpp/oa_jsonl_filter.cc)
  as a subprocess pipe — the production path; a separate process
  overlaps parsing with embedding exactly like the reference's Unix
  pipeline (Makefile:62-65).
- ``filter_works_lines``: pure-Python generator with identical
  semantics — the fallback and the differential-testing oracle
  (tests assert C++ == Python on the same inputs).
"""

from __future__ import annotations

import json
import subprocess
from pathlib import Path
from typing import Iterable, Iterator

_CPP_DIR = Path(__file__).resolve().parents[2] / "cpp"
_BINARY = _CPP_DIR / "oa_jsonl_filter"


def ensure_filter_built() -> Path:
    """Build the native filter if needed; returns the binary path."""
    if not _BINARY.exists() or _BINARY.stat().st_mtime < (_CPP_DIR / "oa_jsonl_filter.cc").stat().st_mtime:
        subprocess.run(["make", "-C", str(_CPP_DIR)], check=True, capture_output=True)
    return _BINARY


def _reconstruct_abstract(inv_index: dict) -> str:
    """positions -> words, later duplicates win, join non-empty slots."""
    slots: dict[int, str] = {}
    for word, positions in inv_index.items():
        for pos in positions:
            if isinstance(pos, int) and 0 <= pos < (1 << 20):
                slots[pos] = word
    return " ".join(slots[i] for i in sorted(slots) if slots[i] != "")


def filter_record(rec: dict) -> dict | None:
    """Apply the drop/reconstruct rules to one parsed record."""
    if "language" in rec:
        if rec["language"] is None or rec["language"] != "en":
            return None
    inv = rec.get("abstract_inverted_index")
    if not inv:  # absent, null, or empty object
        return None
    abstract = _reconstruct_abstract(inv)
    if not abstract:
        return None
    work_id = rec.get("id")
    if not work_id:
        return None
    title = rec.get("title")
    document = f"{title} {abstract}" if title is not None else abstract
    return {"id": work_id, "document": document}


def filter_works_lines(lines: Iterable[str]) -> Iterator[dict]:
    """Pure-Python reference implementation (also the test oracle)."""
    for line in lines:
        line = line.strip()
        if not line:
            continue
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue  # skip malformed (the native filter warns + skips too)
        if not isinstance(rec, dict):
            continue  # top-level null/array/scalar: not a work record
        out = filter_record(rec)
        if out is not None:
            yield out


class OaJsonlFilter:
    """Streaming subprocess wrapper around the native filter.

    Usage:
        with OaJsonlFilter() as f:
            f.write(raw_jsonl_bytes)        # feed compressed-decoded bytes
            for rec in f.drain():  ...      # read available outputs
        # after close(), f.drain() yields the tail
    """

    def __init__(self):
        self.proc = subprocess.Popen(
            [str(ensure_filter_built())],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
        )

    def filter_text(self, text: str) -> list[dict]:
        """One-shot filtering of a complete input (convenience/testing)."""
        out, _ = self.proc.communicate(text.encode("utf-8"))
        return [json.loads(l) for l in out.decode("utf-8").splitlines() if l]

    def __enter__(self) -> "OaJsonlFilter":
        return self

    def __exit__(self, *exc) -> None:
        if self.proc.poll() is None:
            self.proc.kill()


def filter_stream_native(byte_chunks: Iterable[bytes], batch_size: int = 1024) -> Iterator[list[dict]]:
    """Stream raw JSONL bytes through the native filter, yielding batches.

    Uses a background writer thread so the subprocess pipe can't deadlock
    (the filter is a true streaming Unix filter, like the reference's
    `... | ./oa_jsonl | ...` stage, Makefile:64).
    """
    import threading

    proc = subprocess.Popen(
        [str(ensure_filter_built())],
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
    )

    def _feed():
        try:
            for chunk in byte_chunks:
                proc.stdin.write(chunk)
        finally:
            proc.stdin.close()

    t = threading.Thread(target=_feed, daemon=True)
    t.start()

    batch: list[dict] = []
    for line in proc.stdout:
        try:
            batch.append(json.loads(line))
        except json.JSONDecodeError:
            continue
        if len(batch) >= batch_size:
            yield batch
            batch = []
    if batch:
        yield batch
    t.join()
    proc.wait()
