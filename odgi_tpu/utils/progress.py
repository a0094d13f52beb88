"""ProgressMeter: banner + rate + ETA line on stderr.

Re-implements the reference's threaded progress meter
(reference: src/algorithms/progress.hpp:20-75): an atomic counter and a
500 ms refresher printing '\\r<banner> <pct>% @ <rate> elapsed/remain',
gated by -P/--progress on the subcommands."""

from __future__ import annotations

import sys
import threading
import time


def _fmt_time(seconds: float) -> str:
    seconds = max(0.0, seconds)
    h, rem = divmod(int(seconds), 3600)
    m, s = divmod(rem, 60)
    return f"{h:02d}:{m:02d}:{s:02d}"


class ProgressMeter:
    def __init__(self, total: int, banner: str, enabled: bool = True,
                 stream=None, interval: float = 0.5):
        self.total = max(int(total), 1)
        self.banner = banner
        self.completed = 0
        self.enabled = enabled
        self.stream = stream or sys.stderr
        self.interval = interval
        self._start = time.monotonic()
        self._done = threading.Event()
        self._lock = threading.Lock()
        self._thread = None
        if enabled:
            self._print()
            self._thread = threading.Thread(target=self._run, daemon=True)
            self._thread.start()

    def _run(self):
        last = -1
        while not self._done.wait(self.interval):
            with self._lock:
                cur = self.completed
            if cur != last:
                self._print()
                last = cur

    def _print(self):
        elapsed = time.monotonic() - self._start
        rate = self.completed / elapsed if elapsed > 0 else 0.0
        remain = (self.total - self.completed) / rate if rate > 0 else 0.0
        pct = 100.0 * self.completed / self.total
        self.stream.write(
            f"\r{self.banner} {pct:5.2f}% @ {rate:.2e} bp/s "
            f"elapsed: {_fmt_time(elapsed)} remain: {_fmt_time(remain)}"
        )
        self.stream.flush()

    def increment(self, n: int = 1):
        with self._lock:
            self.completed += n

    def finish(self):
        if not self.enabled:
            return
        with self._lock:
            self.completed = self.total
        self._done.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
        self._print()
        self.stream.write("\n")
        self.stream.flush()
