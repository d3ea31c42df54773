"""Logging with the reference's exact format (trainer.py:22-24): file
``<out>/log.txt`` + stdout, '[%H:%M:%S.%(msecs)03d] message'. Downstream
parity tooling parses these lines, so the format is part of the API."""

from __future__ import annotations

import logging
import os
import sys


def setup_logging(snapshot_path: str, filename: str = "log.txt") -> None:
    os.makedirs(snapshot_path, exist_ok=True)
    root = logging.getLogger()
    for h in list(root.handlers):
        root.removeHandler(h)
    logging.basicConfig(
        filename=os.path.join(snapshot_path, filename),
        level=logging.INFO,
        format="[%(asctime)s.%(msecs)03d] %(message)s",
        datefmt="%H:%M:%S",
        force=True,
    )
    root.addHandler(logging.StreamHandler(sys.stdout))


class MetricBuffer:
    """Deferred metric pull: the train loop appends device scalars + an emit
    callback per step and only every ``flush_every`` steps does ONE host
    sync (``jax.device_get`` on the whole buffer). Log lines / TB scalars
    come out in original order with the original format, but the hot loop
    never blocks per step — keeping the H2D/compute overlap from
    ``device_prefetch`` intact (the reference syncs every iteration,
    trainer.py:66-79; format parity is preserved at flush time)."""

    def __init__(self, flush_every: int = 20):
        self.flush_every = flush_every
        self._buf = []

    def append(self, step: int, device_values, emit) -> None:
        """``emit(step, host_values)`` is called at flush time with
        ``host_values = jax.device_get(device_values)``."""
        self._buf.append((step, device_values, emit))
        if len(self._buf) >= self.flush_every:
            self.flush()

    def flush(self) -> None:
        if not self._buf:
            return
        import jax

        host = jax.device_get([v for _, v, _ in self._buf])
        for (step, _, emit), values in zip(self._buf, host):
            emit(step, values)
        self._buf.clear()


class SummaryWriter:
    """tensorboardX writer with a no-op fallback."""

    def __init__(self, logdir: str):
        try:
            from tensorboardX import SummaryWriter as TBWriter

            self._w = TBWriter(logdir)
        except Exception:
            self._w = None

    def add_scalar(self, tag, value, step):
        if self._w is not None:
            self._w.add_scalar(tag, float(value), step)

    def add_image(self, tag, img, step):
        if self._w is not None:
            self._w.add_image(tag, img, step)

    def close(self):
        if self._w is not None:
            self._w.close()
