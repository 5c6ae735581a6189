"""Shared epoch-write plumbing for the stateful pipelines.

One implementation of the concurrent state-family write submission so
the privacy and curation pipelines (and the composed protocol built on
them) cannot silently diverge on the crash-seam contract.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame


def write_all(
    pipeline, writes: list[tuple[DataFrame, str, str]], epoch_id: int
) -> None:
    """Submit an epoch's independent state-family writes as CONCURRENT
    Spark jobs (one driver thread each — the documented multi-threaded
    submission pattern, cluster-safe) instead of serializing them. The
    families must be independent by construction: each frame derives
    from inputs persisted and materialized before this call, so the
    racing jobs only read caches. The epoch's write wall-time drops
    from Σ(job) to ~max(job) — at small batch sizes the fixed per-job
    scheduling overhead was 70-80% of the whole epoch (round-11
    composed-gates profile, SCALE.md).

    Crash-seam contract: returns only after EVERY write succeeded, and
    the caller lands the single commit marker after that — a crash
    mid-call can leave any SUBSET of torn ``v<epoch>`` dirs (unordered,
    unlike the old sequential form), but un-markered epochs are
    invisible to every reader and a replay rewrites all of them
    (tests/test_streaming_composed.py's seam matrix).

    Bound as a method on the pipeline classes (``_write_all = write_all``);
    ``pipeline`` supplies the idempotent per-family ``_write``.
    """
    submit_writes(pipeline, writes, epoch_id)()


def submit_writes(pipeline, writes, epoch_id: int):
    """Deferred form of :func:`write_all` (round 13): SUBMIT the
    epoch's family writes as concurrent jobs and return a ``wait``
    callable. The composed pipeline uses this to overlap the privacy
    gate's writes with curation's compute — a full job wave removed
    per epoch. ``wait()`` quiesces EVERY write before raising the
    first failure (the old ``with ThreadPoolExecutor`` semantics), so
    a torn epoch still leaves a settled — if arbitrary — subset of
    ``v<epoch>`` dirs, and the caller's single commit marker only
    lands after ``wait()`` returns cleanly."""
    ex = ThreadPoolExecutor(max_workers=len(writes))
    futures = [
        ex.submit(pipeline._write, df, root, epoch_id, key)
        for df, root, key in writes
    ]

    def wait() -> None:
        errs = []
        for f in futures:
            try:
                f.result()
            except BaseException as e:  # noqa: BLE001 — re-raised below
                errs.append(e)
        ex.shutdown()
        if errs:
            raise errs[0]

    return wait


def fill_all(frames: list[DataFrame]) -> None:
    """Fill several persisted frames' caches as CONCURRENT count jobs
    (round 12). The cache fills that precede :func:`write_all` were
    submitted sequentially — at replay batch sizes each fill is mostly
    fixed job overhead, so concurrency buys ~max(job) instead of
    Σ(job), the same argument as the write side. Safe for the same
    reason: the frames are independent by construction (each is
    persisted; a count only populates its own cache entry)."""
    if not frames:
        return
    with ThreadPoolExecutor(max_workers=len(frames)) as ex:
        futures = [ex.submit(df.count) for df in frames]
        for f in futures:
            f.result()
