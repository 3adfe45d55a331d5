"""Prometheus text-format metrics registry (zero-dependency).

The reference exports Prometheus metrics via ``prometheus_client`` +
``prometheus_fastapi_instrumentator`` (reference ``api/routes.py:224-247``):
counters ``rows_synced_total`` / ``error_rate`` and a histogram
``sync_duration_seconds``, exposed at ``GET /metrics`` in the standard
exposition format (``text/plain; version=0.0.4``).  This module renders
the same wire format from plain Python state so a Prometheus scraper
pointed at this engine parses the output identically — no client library
needed in the container.

Format spec (public): one ``# HELP``/``# TYPE`` pair per family, samples
as ``name{labels} value``; histograms emit cumulative ``_bucket`` rows
with an ``le`` label plus ``_sum``/``_count``.
"""

from __future__ import annotations

import threading
from bisect import bisect_left
from typing import Iterable

_DEFAULT_BUCKETS = (0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0)


def _fmt(v: float) -> str:
    """Render a sample value the way prometheus_client does: floats with
    repr, but integral values as ``N.0``."""
    f = float(v)
    if f == int(f) and abs(f) < 1e15:
        return f"{int(f)}.0"
    return repr(f)


def _escape_help(s: str) -> str:
    return s.replace("\\", "\\\\").replace("\n", "\\n")


class Counter:
    def __init__(self, name: str, help_: str):
        self.name, self.help = name, help_
        self._value = 0.0
        self._lock = threading.Lock()

    def inc(self, amount: float = 1.0) -> None:
        if amount < 0:
            raise ValueError("counters can only increase")
        with self._lock:
            self._value += amount

    @property
    def value(self) -> float:
        return self._value

    def expose(self) -> Iterable[str]:
        yield f"# HELP {self.name} {_escape_help(self.help)}"
        yield f"# TYPE {self.name} counter"
        yield f"{self.name} {_fmt(self._value)}"


class Histogram:
    """Cumulative-bucket histogram matching prometheus_client's default
    layout: ``le``-labelled buckets, ``+Inf``, ``_sum`` and ``_count``."""

    def __init__(self, name: str, help_: str, buckets: tuple[float, ...] = _DEFAULT_BUCKETS):
        self.name, self.help = name, help_
        self.buckets = tuple(sorted(buckets))
        self._counts = [0] * (len(self.buckets) + 1)  # last slot = +Inf
        self._sum = 0.0
        self._count = 0
        self._lock = threading.Lock()

    def observe(self, value: float) -> None:
        with self._lock:
            self._counts[bisect_left(self.buckets, value)] += 1
            self._sum += value
            self._count += 1

    def expose(self) -> Iterable[str]:
        yield f"# HELP {self.name} {_escape_help(self.help)}"
        yield f"# TYPE {self.name} histogram"
        cum = 0
        for le, n in zip(self.buckets, self._counts):
            cum += n
            yield f'{self.name}_bucket{{le="{_fmt(le)}"}} {_fmt(cum)}'
        cum += self._counts[-1]
        yield f'{self.name}_bucket{{le="+Inf"}} {_fmt(cum)}'
        yield f"{self.name}_sum {_fmt(self._sum)}"
        yield f"{self.name}_count {_fmt(self._count)}"


class MetricsRegistry:
    """Family registry; ``render()`` is the full /metrics body."""

    CONTENT_TYPE = "text/plain; version=0.0.4; charset=utf-8"

    def __init__(self):
        self._families: list[Counter | Histogram] = []

    def counter(self, name: str, help_: str) -> Counter:
        c = Counter(name, help_)
        self._families.append(c)
        return c

    def histogram(self, name: str, help_: str, **kw) -> Histogram:
        h = Histogram(name, help_, **kw)
        self._families.append(h)
        return h

    def get(self, name: str) -> Counter | Histogram:
        for fam in self._families:
            if fam.name == name:
                return fam
        raise KeyError(name)

    def render(self) -> str:
        lines: list[str] = []
        for fam in self._families:
            lines.extend(fam.expose())
        return "\n".join(lines) + "\n"


def default_registry() -> MetricsRegistry:
    """The reference's metric families (api/routes.py:237-243) plus this
    engine's search counters."""
    reg = MetricsRegistry()
    reg.counter("rows_synced_total", "Total rows synced by the sync service")
    reg.counter("error_rate", "Total sync errors encountered")
    reg.histogram("sync_duration_seconds", "Sync duration in seconds")
    reg.counter("searches_total", "Total search requests served")
    reg.counter("results_total", "Total search results returned")
    return reg
