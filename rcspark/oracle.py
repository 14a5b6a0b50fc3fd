"""Discrete-event reference-semantics crawl simulator — SURVEY.md §5.2.

The reference mount is empty (SURVEY.md §0.1), so this pure-Python,
single-threaded simulator IS the stand-in for the Scrapy spider: priority
pop order, per-host politeness delays, robots gating, retries, redirects,
dupefilter-at-enqueue and media dedup, all per the shared spec in
rcspark.constants (which the Spark engine imports too — bit-for-bit
equality of crawl order / seen set / corpus is therefore a meaningful
cross-implementation check, engine = wave-parallel Spark, oracle =
sequential event loop).

Event model per wave: each host h with queued URLs fetches its top-budget(h)
URLs at simulated millis 0, d_h, 2·d_h, …; the event heap interleaves hosts
by (fetch_ms, host). This is the politeness-faithful quantization of
Scrapy's reactor loop that makes a BSP engine's order provable (SURVEY.md
§3.4, §7.3).
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field

import pandas as pd

from . import constants as C
from .constants import (
    DEPTH_LIMIT,
    PER_HOST_CAP,
    REDIRECT_STATUSES,
    RETRY_PRIORITY_ADJUST,
    RETRY_STATUSES,
    RETRY_TIMES,
    WAVE_SECONDS,
)
from .robots import robots_allowed_py
from .urlnorm import canon_py


@dataclass(order=True)
class Entry:
    # sort key = pop order within a host: priority DESC, discovered_wave ASC, url_canon ASC
    sort_key: tuple = field(init=False, repr=False)
    url_canon: str = field(compare=False)
    host: str = field(compare=False)
    path: str = field(compare=False)
    priority: int = field(compare=False)
    depth: int = field(compare=False)
    discovered_wave: int = field(compare=False)
    retry_count: int = field(compare=False)

    def __post_init__(self):
        self.sort_key = (-self.priority, self.discovered_wave, self.url_canon)


def host_slot(crawl_delay: float | None) -> tuple[int, int]:
    """(tick_ms, group): the per-host Slot quantization (constants.py).
    delay>0 → one request per delay tick; delay==0 → bursts of
    CONCURRENT_PER_DOMAIN per REQUEST_SERVICE_MS tick. C.DOWNLOAD_DELAY is
    read at call time so tests can exercise the burst regime by
    monkeypatching the shared constant (same as schedule.with_budget)."""
    cd = 0.0 if crawl_delay is None else float(crawl_delay)
    d_ms = int(round(max(cd, C.DOWNLOAD_DELAY) * 1000))
    if d_ms > 0:
        return d_ms, 1
    return C.REQUEST_SERVICE_MS, C.CONCURRENT_PER_DOMAIN


def host_delay_ms(crawl_delay: float | None) -> int:
    """Effective per-host tick in integer ms (shared clock, §5.3)."""
    return host_slot(crawl_delay)[0]


def host_budget(crawl_delay: float | None) -> int:
    """URLs a host may fetch per wave: min(cap, group·floor(wave_ms/tick))."""
    tick, group = host_slot(crawl_delay)
    return min(PER_HOST_CAP, group * max(1, int(WAVE_SECONDS * 1000 // tick)))


def _host_path(canon: str) -> tuple[str, str]:
    rest = canon.split("://", 1)[1]
    hostport, _, pathq = rest.partition("/")
    host = hostport.split(":")[0]
    path = "/" + pathq.split("?")[0]
    return host, path


@dataclass
class OracleResult:
    order: list[dict]          # one row per fetch attempt, in crawl order
    seen: set[str]             # canonical URLs ever enqueued
    corpus: list[dict]         # downloaded images (+ page caption)
    robots_denied: list[str]   # canon URLs dropped by the robots gate
    waves: int


def run_oracle(fixture, max_waves: int = 1_000_000) -> OracleResult:
    web = {r.url_canon: r for r in fixture.web.itertuples()}
    corpus_src = {r.url: r for r in fixture.corpus.itertuples()}
    robots = {r.host: r for r in fixture.robots.itertuples()}
    allowed_hosts = set(fixture.allowed_hosts)

    seen: set[str] = set()
    media_seen: set[str] = set()
    order: list[dict] = []
    corpus_out: list[dict] = []
    denied: list[str] = []
    pending: list[Entry] = []
    # discover() appends into whatever list `inbox` currently points at:
    # the seed frontier during bootstrap, then each wave's next_pending.
    inbox: list[Entry] = pending

    def _cd(host: str) -> float | None:
        cd = robots[host].crawl_delay if host in robots else None
        return None if cd is None or pd.isna(cd) else float(cd)

    def budget(host: str) -> int:
        return host_budget(_cd(host))

    def discover(raw: str, depth: int, priority: int, wave: int) -> None:
        canon = canon_py(raw)
        if canon is None:
            return
        host, path = _host_path(canon)
        if host not in allowed_hosts:          # offsite middleware: before enqueue
            return
        if depth > DEPTH_LIMIT:                # depth middleware: before enqueue
            return
        if canon in seen:                      # dupefilter: marks at enqueue
            return
        seen.add(canon)
        inbox.append(Entry(canon, host, path, priority, depth, wave, 0))

    # bootstrap: seeds are wave-0 discoveries
    for r in fixture.seeds.itertuples():
        discover(r.url, 0, int(r.priority), 0)

    wave = 0
    while pending and wave < max_waves:
        # --- robots gate (downloader middleware: after enqueue, before fetch)
        gated: list[Entry] = []
        for e in pending:
            rb = robots.get(e.host)
            if rb is not None and not robots_allowed_py(e.path, rb.allow_rules, rb.deny_rules):
                denied.append(e.url_canon)      # stays in seen, never fetched
            else:
                gated.append(e)

        # --- per-host pop order + politeness event heap
        by_host: dict[str, list[Entry]] = {}
        for e in gated:
            by_host.setdefault(e.host, []).append(e)
        heap: list[tuple[int, str, int, Entry]] = []
        leftover: list[Entry] = []
        for host, entries in by_host.items():
            entries.sort()
            b = budget(host)
            tick, group = host_slot(_cd(host))
            for j, e in enumerate(entries[:b], start=1):
                heapq.heappush(heap, (((j - 1) // group) * tick, host, j, e))
            leftover.extend(entries[b:])

        next_pending: list[Entry] = leftover
        inbox = next_pending
        while heap:
            fetch_ms, host, j, e = heapq.heappop(heap)
            row = web.get(e.url_canon)
            status = int(row.status) if row is not None else None
            if row is None:
                result = "failed"
            elif status in RETRY_STATUSES:
                result = "retry" if e.retry_count < RETRY_TIMES else "failed"
            elif status in REDIRECT_STATUSES:
                result = "redirect"
            elif status == 200:
                result = "fetched"
            else:
                result = "failed"
            seq = len(order)
            order.append(
                {
                    "seq": seq,
                    "wave": wave,
                    "url_canon": e.url_canon,
                    "host": host,
                    "fetch_ms": fetch_ms,
                    "status": status,
                    "result": result,
                    "priority": e.priority,
                    "depth": e.depth,
                    "retry_count": e.retry_count,
                }
            )
            if result == "retry":
                next_pending.append(
                    Entry(
                        e.url_canon,
                        e.host,
                        e.path,
                        e.priority + RETRY_PRIORITY_ADJUST,
                        e.depth,
                        wave + 1,
                        e.retry_count + 1,
                    )
                )
            elif result == "redirect":
                discover(row.redirect_to, e.depth, e.priority, wave + 1)
            elif result == "fetched":
                for raw in row.links:
                    discover(raw, e.depth + 1, 0, wave + 1)
                if row.image_url is not None:
                    iurl = canon_py(row.image_url)
                    if iurl is not None and iurl not in media_seen:
                        media_seen.add(iurl)
                        src = corpus_src.get(iurl)
                        if src is not None:
                            corpus_out.append(
                                {
                                    "image_id": src.image_id,
                                    "bytes": src.bytes,
                                    "w": int(src.w),
                                    "h": int(src.h),
                                    "fmt": src.fmt,
                                    "caption": row.caption,
                                    "phash": int(src.phash),
                                    "url_canon": iurl,
                                    "wave": wave,
                                }
                            )
        pending = next_pending
        wave += 1

    return OracleResult(
        order=order, seen=seen, corpus=corpus_out, robots_denied=denied, waves=wave
    )
