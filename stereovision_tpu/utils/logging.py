"""Structured logging + per-stage perf stats.

Replaces the reference's print-based observability (Russian prints with emoji
markers everywhere, SURVEY §5) with leveled logging, and its per-30-frame
FPS/ms stats (fused_depth_map.py:3129-3151) with a reusable accumulator.
"""

from __future__ import annotations

import json
import logging
import time


def get_logger(name: str = "stereovision_tpu", level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(
            logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
        )
        logger.addHandler(h)
        logger.setLevel(level)
    return logger


class StageTimer:
    """Accumulates wall-clock per stage; reports every ``report_every`` frames
    (the reference's per-30-frame stats block, fused_depth_map.py:3129-3151)."""

    def __init__(self, report_every: int = 30, logger: logging.Logger | None = None):
        self.report_every = report_every
        self.logger = logger or get_logger()
        self._acc: dict[str, list[float]] = {}
        self._frame_t: list[float] = []
        self._n = 0
        self._last_report: dict | None = None

    class _Ctx:
        def __init__(self, timer, stage):
            self.timer, self.stage = timer, stage

        def __enter__(self):
            self.t0 = time.perf_counter()
            return self

        def __exit__(self, *exc):
            self.timer._acc.setdefault(self.stage, []).append(
                time.perf_counter() - self.t0
            )

    def stage(self, name: str) -> "StageTimer._Ctx":
        return self._Ctx(self, name)

    def frame_done(self, frame_seconds: float | None = None):
        if frame_seconds is not None:
            self._frame_t.append(frame_seconds)
        self._n += 1
        if self._n % self.report_every == 0:
            self._last_report = self.report()
            self.logger.info("perf %s", json.dumps(self._last_report))
            self._acc.clear()
            self._frame_t.clear()

    def report(self) -> dict:
        out = {
            k: round(1000 * sum(v) / max(len(v), 1), 2) for k, v in self._acc.items()
        }
        if self._frame_t:
            mean_f = sum(self._frame_t) / len(self._frame_t)
            out["fps"] = round(1.0 / mean_f, 2) if mean_f > 0 else None
        out["frames"] = self._n
        return out
